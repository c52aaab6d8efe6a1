"""Interchange formats — JSONL and CSV sources/sinks with schema
fidelity.

The reference's IO surface is parquet state plus a TSV export
(k-means.sh:3-5,45 → ``sources/sinks.py``); real pipelines also ingest
and emit line-delimited JSON and CSV. These helpers wrap Spark's
native readers/writers with the contract a pipeline needs:

- **Explicit schema on read.** Schema inference scans the data twice
  and silently widens types between runs; both readers take the
  authoritative schema (or a template DataFrame to borrow it from) so
  a 100 TB read is ONE pass and the loaded dtypes never drift.
  Corrupt lines land in a quarantine column instead of killing the
  job (PERMISSIVE + ``columnNameOfCorruptRecord``).
- **Partitioned, splittable layout.** Writers accept ``partition_by``
  for directory partitioning (pruned on read-back like any Spark
  source). Compression defaults to none for JSONL/CSV portability;
  pass ``compression='gzip'`` for archive sinks (gzip is
  non-splittable — one task per file on read — so prefer
  many-files-per-partition when writing compressed).
- **Round-trip safety.** CSV has no type system: everything rides as
  text, so read_csv REQUIRES the schema; JSONL preserves numbers/
  booleans/nulls natively. Timestamps serialize as ISO-8601 in UTC
  (the session timezone, pinned in session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_CORRUPT = "_corrupt_record"


def _schema_of(schema: StructType | DataFrame) -> StructType:
    return schema.schema if isinstance(schema, DataFrame) else schema


def write_jsonl(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    compression: str | None = None,
) -> None:
    """Write line-delimited JSON (one object per line)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | DataFrame,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read JSONL with an EXPLICIT schema (no inference pass).

    Malformed lines are quarantined into ``_corrupt_record`` when
    ``keep_corrupt`` (PERMISSIVE mode) instead of failing the read;
    by default they are dropped and the clean schema is returned.
    """
    s = _schema_of(schema)
    if keep_corrupt:
        from pyspark.sql.types import StringType, StructField

        s = StructType(list(s.fields) + [StructField(_CORRUPT, StringType())])
        return (
            spark.read.schema(s)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", _CORRUPT)
            .json(path)
        )
    return spark.read.schema(s).option("mode", "DROPMALFORMED").json(path)


def write_csv(
    df: DataFrame,
    path: str,
    sep: str = ",",
    header: bool = True,
    partition_by: list[str] | None = None,
    compression: str | None = None,
    null_token: str = "",
) -> None:
    """Write CSV (header by default; TSV = ``sep='\\t'``, the
    reference's export dialect lives in ``sinks.write_tsv``)."""
    w = (
        df.write.mode("overwrite")
        .option("sep", sep)
        .option("header", header)
        .option("nullValue", null_token)
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    if compression:
        w = w.option("compression", compression)
    w.csv(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | DataFrame,
    sep: str = ",",
    header: bool = True,
    null_token: str = "",
) -> DataFrame:
    """Read CSV with an EXPLICIT schema — CSV carries no types, so the
    schema is the only source of truth (never inferred)."""
    return (
        spark.read.schema(_schema_of(schema))
        .option("sep", sep)
        .option("header", header)
        .option("nullValue", null_token)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    compression: str = "zlib",
    bloom_filter_cols: list[str] | None = None,
) -> None:
    """Write ORC — the second columnar archive format next to parquet.

    ORC stripes carry min/max statistics per column (row-group skipping
    on read, like parquet) and ``bloom_filter_cols`` adds per-stripe
    bloom filters for point-lookup keys — worth it for high-cardinality
    equality predicates where min/max spans are too wide to skip.
    Compression is splittable at stripe granularity regardless of
    codec, so zlib (default) is safe for 100 TB scans — unlike gzip'd
    JSONL/CSV.
    """
    w = df.write.mode("overwrite").option("compression", compression)
    if bloom_filter_cols:
        w = w.option("orc.bloom.filter.columns", ",".join(bloom_filter_cols))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read ORC — schema rides in the file footer (no inference pass,
    no explicit-schema requirement); partition directories prune and
    predicates push down to the stripe level like parquet."""
    return spark.read.orc(path)
