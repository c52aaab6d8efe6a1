"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference ``bvt123/clickhouse-k-means`` repo
(a ClickHouse-SQL k-means++ / Lloyd implementation), re-expressed
Spark-first, plus the LLM-data-pipeline operator surface (dedup,
similarity search, text analysis) built on the same distance /
top-k / aggregation core.

Layout:
    functions/   pure-Column expression library (no hot-path UDFs)
    operators/   plan helpers: limit_by, weighted sampling, dedup,
                 similarity search, pivot
    sources/     dataset adapters ((i, Y) contract), parquet readers,
                 the golden 4-cluster generator, TSV sink
    plans/       drivers: k-means++ / Lloyd fit loop, optimal-k
                 diagnostics (elbow / silhouette)
    streaming/   Structured Streaming surface (windowed aggs,
                 streaming assignment via foreachBatch)
"""

from clickhouse_k_means_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
