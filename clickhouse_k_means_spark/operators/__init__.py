from clickhouse_k_means_spark.operators.limit_by import limit_by
from clickhouse_k_means_spark.operators.sampling import (
    cumulative_weights,
    weighted_pick,
)
from clickhouse_k_means_spark.operators.pivot import pivot_clusters
from clickhouse_k_means_spark.operators.topk import top_k, top_k_by_group

__all__ = [
    "limit_by",
    "cumulative_weights",
    "weighted_pick",
    "pivot_clusters",
    "top_k",
    "top_k_by_group",
]
