"""The reference's drawing/pivot query: one series column per cluster.

Reference (k-means.sql:59-66, k-means.sh:36-45): per assigned point,
emit ``x`` and ``if(j = <id>, y, null) as p<id>`` per cluster id — a
manual pivot consumed by a scatter-plot tool (4clusters.png).

Two variants:
- ``pivot_clusters(..., exact_parity=True)``: the literal when/otherwise
  projection — zero shuffles, matches the reference column-for-column.
- ``exact_parity=False``: idiomatic ``groupBy(x).pivot(j).agg(first(y))``
  — one shuffle, one row per x (the chart shape most tools want).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_clusters(
    assigned: DataFrame,
    cluster_ids: Sequence[int],
    x: str = "x",
    y: str = "y",
    j: str = "j",
    exact_parity: bool = True,
) -> DataFrame:
    """Pivot assignment rows ``(x, y, j)`` into ``(x, p1..pk)``."""
    if exact_parity:
        cols = [F.col(x).alias("x")] + [
            F.when(F.col(j) == int(cid), F.col(y)).otherwise(F.lit(None)).alias(f"p{cid}")
            for cid in cluster_ids
        ]
        return assigned.select(*cols)
    return (
        assigned.groupBy(F.col(x).alias("x"))
        .pivot(j, [int(c) for c in cluster_ids])
        .agg(F.first(y))
        .select("x", *[F.col(str(c)).alias(f"p{c}") for c in cluster_ids])
    )
