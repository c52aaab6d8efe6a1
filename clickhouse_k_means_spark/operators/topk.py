"""Top-k helpers (reference T1/T4/T5 shapes, SURVEY §2.6).

``orderBy(...).limit(k)`` already compiles to Spark's TakeOrdered —
per-partition heaps + a k-row merge on the driver, no global sort, the
right plan at any scale. These wrappers just name the idiom and add the
per-group variant used by similarity search.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, k: int, order: str | Column | Sequence) -> DataFrame:
    """Global top-k under ``order`` (TakeOrdered plan)."""
    order = [order] if isinstance(order, (str, Column)) else list(order)
    order = [F.col(o) if isinstance(o, str) else o for o in order]
    return df.orderBy(*order).limit(k)


def top_k_by_group(
    df: DataFrame, k: int, group: str | Sequence[str], order: str | Column | Sequence
) -> DataFrame:
    """Top-k rows per group — rank-filter form; Spark ≥3.5 rewrites it
    to a partial WindowGroupLimit so only k rows per group per input
    partition reach the shuffle."""
    group = [group] if isinstance(group, str) else list(group)
    order = [order] if isinstance(order, (str, Column)) else list(order)
    order = [F.col(o) if isinstance(o, str) else o for o in order]
    w = Window.partitionBy(*group).orderBy(*order)
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .drop("__rank")
    )
