"""Persistent state tables — the reference's MergeTree role.

The reference keeps the centroid log in a ``MergeTree ORDER BY step``
table (k-means.sql:10-11): state written once per step, appended
forever, read back sorted for the ``deltaFinish`` view, and TRUNCATEd
between runs (k-means.sh:7). This module is the Spark-native mapping:
an append-only partitioned parquet directory per logical table.

Scale mapping (100 TB):
- append = one atomic directory write per batch (Spark's parquet
  committer); no compaction needed because state batches are tiny
  relative to data (k rows per step, component labels per corpus pass).
- partition columns (``step``, ``run_id``, a date) give partition
  PRUNING on read-back — the ``ORDER BY step`` role: reading "latest
  two steps" touches two directories, not the log.
- readers get a plain DataFrame: every downstream operator
  (``delta_finish``, dedup canonical joins) works unchanged on
  persisted state.

A Delta/Iceberg table would add ACID upserts and snapshot isolation;
parquet-append is deliberately chosen as the dependency-free subset —
the write/read contract here (append, read, truncate) is the same
surface those formats implement, so swapping the format is a one-class
change.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class ParquetStateStore:
    """Append-only parquet state tables under one root directory."""

    def __init__(self, root: str):
        self.root = Path(root)

    def path(self, table: str) -> str:
        return str(self.root / table)

    def append(
        self, df: DataFrame, table: str, partition_by: list[str] | None = None
    ) -> None:
        """Append a batch (the reference's INSERT INTO WCR SELECT ...).

        ``partition_by`` columns become directory partitions — pruned
        on read-back filters, the MergeTree ORDER BY analogue.
        """
        w = df.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(table))

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.parquet(self.path(table))

    def exists(self, table: str) -> bool:
        return Path(self.path(table)).exists()

    def truncate(self, table: str) -> None:
        """The reference's TRUNCATE TABLE (k-means.sh:7)."""
        p = Path(self.path(table))
        if p.exists():
            shutil.rmtree(p)
