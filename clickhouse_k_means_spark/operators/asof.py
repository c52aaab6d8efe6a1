"""As-of (time-travel) join — an operator Spark's API lacks.

``as_of_join(left, right, ...)`` matches each left row to the LATEST
right row of the same key with ``right_ts <= left_ts`` (direction
"backward"; "forward" = earliest right with ``right_ts >= left_ts``).

Implementation is the union/forward-fill trick, the shuffle-minimal
idiomatic form (one hash shuffle on the key, no range join, no
per-row subquery):

1. tag right rows 0 / left rows 1 and union them,
2. sort within each key by (ts, tag) — the right row sorts before a
   left row at the same timestamp, making the match inclusive,
3. forward-fill the right payload with ``last(..., ignorenulls=True)``
   over rows unbounded-preceding..current,
4. keep only left rows.

At 100 TB this is exactly one shuffle by key + a per-partition sort —
the same cost class as any windowed aggregation; no broadcast, no
skew beyond what the key distribution already has (salt upstream for
pathological keys). DuckDB's native ``ASOF JOIN`` serves as the
correctness oracle for the entry query.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_is_left"
_TS = "__asof_ts"


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_vals: Sequence[str],
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """All left columns + the matched ``right_vals`` (null if no match).

    ``right_vals`` names must not collide with left columns (alias on
    the right DataFrame first). Ties: at equal timestamps the right row
    matches (inclusive); duplicate (key, right_ts) rows make the match
    nondeterministic — dedupe the right side first (limit_by).

    ``tolerance`` (same units as the ts columns, which must be NUMERIC
    when it is set — the engine convention is epoch seconds via
    ``sources.dataset.event_epoch_seconds``) rejects matches further
    than that from the left timestamp: a view only pairs with a
    purchase in the preceding ``tolerance`` seconds, pandas
    ``merge_asof(tolerance=...)`` semantics. Free at scale — the
    matched timestamp rides the same forward-fill window.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if tolerance is not None and tolerance < 0:
        raise ValueError(f"tolerance must be >= 0, got {tolerance}")
    keys = [key] if isinstance(key, str) else list(key)
    for v in right_vals:
        if v in left.columns:
            raise ValueError(f"right value column {v!r} collides with a left column")

    l_tagged = left.withColumn(_TS, F.col(left_ts)).withColumn(_TAG, F.lit(1))
    r_tagged = right.select(
        *keys, F.col(right_ts).alias(_TS), *right_vals
    ).withColumn(_TAG, F.lit(0))
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    if direction == "backward":
        order = [F.col(_TS).asc(), F.col(_TAG).asc()]
        frame = (Window.unboundedPreceding, Window.currentRow)
    else:
        order = [F.col(_TS).desc(), F.col(_TAG).asc()]
        frame = (Window.unboundedPreceding, Window.currentRow)
    w = Window.partitionBy(*keys).orderBy(*order).rowsBetween(*frame)

    fills = [
        F.last(F.col(v), ignorenulls=True).over(w).alias(f"__m_{v}")
        for v in right_vals
    ]
    if tolerance is not None:
        # the matched right row's timestamp rides the same window so
        # stale matches can be nulled without another join
        fills.append(
            F.last(
                F.when(F.col(_TAG) == 0, F.col(_TS)), ignorenulls=True
            ).over(w).alias("__m_ts")
        )
    filled = unioned.select("*", *fills)
    if tolerance is None:
        matched = [F.col(f"__m_{v}").alias(v) for v in right_vals]
    else:
        in_tol = F.abs(F.col(_TS) - F.col("__m_ts")) <= F.lit(float(tolerance))
        matched = [
            F.when(in_tol, F.col(f"__m_{v}")).alias(v) for v in right_vals
        ]
    out_cols = [c for c in left.columns] + matched
    return filled.filter(F.col(_TAG) == 1).select(*out_cols)
