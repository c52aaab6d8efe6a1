"""``LIMIT n BY expr`` — per-group top-n, the one reference construct
with no SQL-standard equivalent.

Reference: ``ORDER BY step desc LIMIT 1 BY j`` (k-means.sql:26,
k-means.sh:28 — latest position of each centroid) and
``ORDER BY step desc LIMIT 2 BY step`` (k-means.sql:54 — convergence
input; see SURVEY quirk Q5).

Spark mapping: ``row_number`` over ``Window.partitionBy(by).orderBy(
order)`` filtered to ``<= n``. At scale this is a single hash shuffle
on the partition keys; for top-1/top-n with small n Spark pushes a
partial ``WindowGroupLimit`` below the shuffle (Spark ≥3.5), so the
shuffle carries at most n rows per group per input partition — the same
partial/final shape ClickHouse gets from its sorted MergeTree read.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cols(cs: str | Column | Sequence[str | Column]) -> list[Column]:
    if isinstance(cs, (str, Column)):
        cs = [cs]
    return [F.col(c) if isinstance(c, str) else c for c in cs]


def limit_by(
    df: DataFrame,
    n: int,
    by: str | Column | Sequence[str | Column],
    order: str | Column | Sequence[str | Column],
) -> DataFrame:
    """First ``n`` rows per distinct ``by`` value under ``order``.

    Deterministic where the reference is block-order-dependent: callers
    must pass a total order (add a key column as tie-breaker if the
    primary order column has duplicates).
    """
    w = Window.partitionBy(*_cols(by)).orderBy(*_cols(order))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )
