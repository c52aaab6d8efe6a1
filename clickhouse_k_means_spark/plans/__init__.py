from clickhouse_k_means_spark.plans.kmeans import KMeansEngine, KMeansResult
from clickhouse_k_means_spark.plans.optimal_k import (
    elbow,
    silhouette_global,
    silhouette_sampled,
)

__all__ = [
    "KMeansEngine",
    "KMeansResult",
    "elbow",
    "silhouette_global",
    "silhouette_sampled",
]
