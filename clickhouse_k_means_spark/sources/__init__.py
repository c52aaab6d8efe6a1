from clickhouse_k_means_spark.sources.dataset import from_table, load_table, load_yh
from clickhouse_k_means_spark.sources.generator import golden_points
from clickhouse_k_means_spark.sources.sinks import write_tsv

__all__ = ["from_table", "load_table", "load_yh", "golden_points", "write_tsv"]
