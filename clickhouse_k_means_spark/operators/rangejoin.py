"""Range (point-in-interval) join — bucketized equi-join form.

A naive ``points JOIN intervals ON key = key AND start <= ts AND
ts <= end`` plans as a broadcast-nested-loop (or a full sort-merge on
the key with a residual filter) — O(|points|·|intervals per key|) and
a skew magnet. The scale form bucketizes time:

1. every interval explodes to the buckets it covers
   (``sequence(start div w, end div w)``),
2. every point maps to its single bucket (``ts div w``),
3. equi-join on (key, bucket) — an ordinary hash shuffle —
4. residual filter ``start <= ts <= end``.

Each (interval, bucket) pair is unique, and a point lives in exactly
one bucket, so no post-join dedup is needed. Pick ``bucket_width``
near the typical interval length: wider → fewer interval replicas,
narrower → fewer false candidates in the residual filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_B = "__bucket"


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_ts: str,
    start: str,
    end: str,
    bucket_width: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """All (point, interval) matches with ``start <= ts <= end`` per key.

    ``point_ts``/``start``/``end`` are integer epoch-like columns in
    the same unit. Output = point columns + interval columns.
    """
    if how not in ("inner",):
        raise ValueError("point_in_interval_join supports inner joins")
    w = int(bucket_width)

    def _bucket(c):
        # exact integer floor-division (values are non-negative epochs;
        # plain double division + cast would round instead of truncate)
        col = F.col(c).cast("bigint")
        return ((col - F.pmod(col, F.lit(w))) / w).cast("bigint")

    exploded = intervals.withColumn(
        _B, F.explode(F.sequence(_bucket(start), _bucket(end)))
    )
    bucketed = points.withColumn(_B, _bucket(point_ts))
    return (
        bucketed.join(exploded, [key, _B])
        .filter((F.col(start) <= F.col(point_ts)) & (F.col(point_ts) <= F.col(end)))
        .drop(_B)
    )
