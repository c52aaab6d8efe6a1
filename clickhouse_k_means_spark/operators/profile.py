"""One-scan table profiling — the ANALYZE/data-audit operator.

Per-column null counts, exact distinct counts, min/max, and top value
over EVERY column of a table in a bounded number of passes. This is
the first query a pipeline runs against an unfamiliar 100 TB drop
("what's actually in here?") and the recurring data-contract check
("did ndv(user_id) collapse overnight?"); extension beyond the
reference, in its idiom (declarative, exact, DuckDB-oracle-gated).

Scale design:
- null/min/max for ALL columns fold into ONE aggregate over one scan
  (2·C + 1 expressions — no per-column jobs, no .collect loop).
- exact NDV for all columns shares ONE scan too, but NOT via
  ``countDistinct(a), countDistinct(b), …`` in a single agg — that
  plans an Expand (C× row multiplication) shuffling C copies of the
  table. Instead each column's ndv+top-value runs as its own
  two-level aggregate (value-frequency partial, then count/argmax) —
  C narrow column scans that Parquet serves without reading the other
  columns, each shuffling only distinct values. At petabyte width
  swap in approx_count_distinct and one shared scan; exact mode is
  the oracle-checkable contract here.
- Output is LONG form (one row per column, values rendered as
  strings) so the profile of any-width tables has a fixed schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df``.

    Returns one row per column:
    ``(col_name, n_rows, n_null, n_distinct, min_s, max_s, top_value,
    top_count)`` — ``min_s``/``max_s``/``top_value`` as strings (NULL
    for all-null columns), ``n_distinct`` excluding nulls, ties on
    ``top_value`` broken by the smaller rendered value.
    """
    cols = list(df.columns) if columns is None else list(columns)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile_table: unknown columns {missing}")
    if not cols:
        raise ValueError("profile_table: no columns to profile")

    base_aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        base_aggs.append(
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"null__{c}")
        )
        base_aggs.append(F.min(F.col(c)).cast("string").alias(f"min__{c}"))
        base_aggs.append(F.max(F.col(c)).cast("string").alias(f"max__{c}"))
    wide = df.agg(*base_aggs)

    spark = df.sparkSession
    profiles = None
    for c in cols:
        freq = (
            df.select(F.col(c).cast("string").alias("v"))
            .filter(F.col("v").isNotNull())
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        # top value: max count first, then min(v) among the rows that
        # hit it — ties break to the smallest rendered value (the
        # engine's quirk-Q3 determinism rule)
        stats = freq.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
            F.max("cnt").alias("top_cnt"),
        )
        top = (
            freq.join(F.broadcast(stats), freq.cnt == stats.top_cnt)
            .agg(
                F.min("v").alias("top_value"),
                F.first("n_distinct").alias("n_distinct"),
                F.first("top_cnt").alias("top_count"),
            )
        )
        row = top.select(
            F.lit(c).alias("col_name"),
            F.col("n_distinct"),
            F.col("top_value"),
            F.col("top_count").cast("bigint").alias("top_count"),
        )
        profiles = row if profiles is None else profiles.unionByName(row)

    long_rows = profiles.join(
        F.broadcast(
            wide.select(
                "n_rows",
                *[
                    F.struct(
                        F.lit(c).alias("c"),
                        F.col(f"null__{c}").alias("nn"),
                        F.col(f"min__{c}").alias("mn"),
                        F.col(f"max__{c}").alias("mx"),
                    ).alias(f"s__{c}")
                    for c in cols
                ],
            )
            .select(
                "n_rows",
                F.explode(F.array(*[F.col(f"s__{c}") for c in cols])).alias("s"),
            )
            .select(
                "n_rows",
                F.col("s.c").alias("col_name"),
                F.col("s.nn").alias("n_null"),
                F.col("s.mn").alias("min_s"),
                F.col("s.mx").alias("max_s"),
            )
        ),
        "col_name",
    )
    return long_rows.select(
        "col_name",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_null").cast("bigint").alias("n_null"),
        F.coalesce("n_distinct", F.lit(0)).cast("bigint").alias("n_distinct"),
        "min_s",
        "max_s",
        "top_value",
        F.coalesce("top_count", F.lit(0)).cast("bigint").alias("top_count"),
    )
