"""Time-series operators: exponential time decay and LTTB downsampling.

ClickHouse-parity surface (extension beyond the reference core):

* ``decayed_stats`` — ``exponentialTimeDecayedSum/Avg`` evaluated at a
  fixed as-of instant (the aggregate-function form ClickHouse ships in
  ``AggregateFunctionExponentialMovingAverage``): each row contributes
  ``value · exp(-(asof - t)/tau)``, so recent activity dominates.
* ``lttb_downsample`` — ``largestTriangleThreeBuckets`` per series.
  ClickHouse's (and Steinarsson's thesis) formulation is sequential:
  the left anchor of bucket k is the point *selected* in bucket k-1,
  which forces a single ordered pass per series. This implementation
  uses the standard parallel variant — both anchors are the
  *centroids* of the neighboring non-empty buckets — which keeps the
  visual-fidelity property, is deterministic, and decomposes into
  groupBy + window + join (every shuffle keyed by the series key, so
  a 100 TB corpus of series processes embarrassingly parallel).

Determinism contract (shared with the rest of the engine): every
cross-engine-summed quantity is integerized per-row BEFORE
aggregation. ``exp``/``ln`` are evaluated once per row on doubles and
fixed-pointed at 1e6 (micro-units) — the same protocol the entropy /
domain-KL operators use. Truncating integer division only ever runs
on non-negative operands (inputs are rebased to the series minimum),
where Spark ``div`` and DuckDB ``//`` agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000


def decayed_stats(
    df: DataFrame,
    key: str,
    time_s: str,
    value_c: str,
    tau_s: int,
) -> DataFrame:
    """Per-key exponentially time-decayed sum / count / average.

    ``time_s`` is epoch seconds (BIGINT), ``value_c`` an exact integer
    metric (cents). The as-of instant is the global max of ``time_s``
    — computed as a one-row aggregate and broadcast, never collected.

    Per-row weight ``w = round(exp(-(asof - t)/tau) * 1e6)`` is a
    BIGINT micro-unit, so the decayed sums are order-invariant BIGINT
    aggregations; the decayed average is their truncating ratio in
    cents. Map-side combine applies to both aggregates; the only
    shuffle is the per-key groupBy.
    """
    if tau_s <= 0:
        raise ValueError(f"tau_s must be positive, got {tau_s}")
    asof = df.agg(F.max(time_s).alias("__asof"))
    w = F.round(
        F.exp(
            -(F.col("__asof") - F.col(time_s)).cast("double") / float(tau_s)
        )
        * MICRO
    ).cast("bigint")
    return (
        df.join(F.broadcast(asof))
        .select(
            F.col(key),
            w.alias("__w"),
            (w * F.col(value_c)).alias("__wv"),
        )
        .groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__w").alias("weight_micro"),
            F.sum("__wv").alias("decayed_sum_micro"),
        )
        .select(
            key,
            "n",
            "weight_micro",
            "decayed_sum_micro",
            F.expr(
                "case when weight_micro > 0 "
                "then decayed_sum_micro div weight_micro end"
            ).alias("decayed_avg_c"),
        )
    )


def lttb_downsample(
    df: DataFrame,
    key: str,
    time_s: str,
    value_c: str,
    id_col: str,
    n_buckets: int,
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling per series
    (parallel bucket-centroid-anchor variant).

    Keeps the first and last point of each series verbatim (buckets
    ``0`` and ``n_buckets-1``), splits the middle points evenly over
    ``n_buckets - 2`` buckets by rank, and from each bucket keeps the
    point whose triangle against the neighboring non-empty buckets'
    centroids has the largest area (tie → lowest ``id_col``). Series
    shorter than ``n_buckets`` pass through whole.

    Exactness: times/values are rebased to the per-series minimum
    (non-negative), centroids fixed-pointed at ×100 by truncating
    division, and the doubled triangle area is an exact BIGINT cross
    product — bounded by (span_s·100)·(span_c·100)·2 ≈ 4e17 for a
    decade-long cent-valued series, inside int64. Plan shape: one
    per-key window pass (rank/count), one per-(key, bucket) aggregate,
    one window over the tiny centroid table, one join back — every
    exchange keyed by the series key.
    """
    if n_buckets < 3:
        raise ValueError(f"n_buckets must be >= 3, got {n_buckets}")
    kc, t, v = F.col(key), F.col(time_s), F.col(value_c)
    wk = Window.partitionBy(key)
    ranked = df.select(
        kc,
        t.alias("__t"),
        v.alias("__v"),
        F.col(id_col).alias("__id"),
    ).select(
        key,
        "__t",
        "__v",
        "__id",
        F.row_number()
        .over(wk.orderBy("__t", "__id"))
        .alias("__rk"),
        F.count(F.lit(1)).over(wk).alias("__n"),
        F.min("__t").over(wk).alias("__t0"),
        F.min("__v").over(wk).alias("__v0"),
    )
    # Bucket assignment: endpoints pinned to buckets 0 / B-1, middles
    # spread over 1..B-2 by rank with pure integer division (both
    # engines truncate non-negatives identically — no float bucketing).
    mid = n_buckets - 2
    bucket = (
        F.when(F.col("__rk") == 1, F.lit(0).cast("bigint"))
        .when(F.col("__rk") == F.col("__n"), F.lit(n_buckets - 1).cast("bigint"))
        .otherwise(
            F.least(
                # this branch implies __n >= 3, so __n - 2 >= 1
                F.expr(f"(__rk - 2) * {mid} div (__n - 2)") + 1,
                F.lit(mid).cast("bigint"),
            )
        )
    )
    pts = ranked.select(
        key,
        bucket.alias("__b"),
        (F.col("__t") - F.col("__t0")).alias("__rt"),
        (F.col("__v") - F.col("__v0")).alias("__rv"),
        "__id",
        "__n",
    )
    # Short series pass through whole.
    short = pts.filter(F.col("__n") < n_buckets)
    long_ = pts.filter(F.col("__n") >= n_buckets)
    # Fixed-point bucket centroids (×100, truncating on non-negatives),
    # then previous/next NON-EMPTY bucket centroids by window.
    cent = long_.groupBy(key, "__b").agg(
        F.expr("sum(__rt) * 100 div count(1)").alias("__ct"),
        F.expr("sum(__rv) * 100 div count(1)").alias("__cv"),
    )
    wb = Window.partitionBy(key).orderBy("__b")
    anchors = cent.select(
        key,
        "__b",
        F.lag("__ct").over(wb).alias("__lt"),
        F.lag("__cv").over(wb).alias("__lv"),
        F.lead("__ct").over(wb).alias("__nt"),
        F.lead("__cv").over(wb).alias("__nv"),
    )
    area2 = F.abs(
        (F.col("__lt") - F.col("__nt")) * (F.col("__rv") * 100 - F.col("__lv"))
        - (F.col("__lt") - F.col("__rt") * 100)
        * (F.col("__nv") - F.col("__lv"))
    )
    best = (
        long_.join(anchors, [key, "__b"])
        .groupBy(key, "__b")
        .agg(
            F.min(
                F.when(
                    F.col("__lt").isNotNull() & F.col("__nt").isNotNull(),
                    F.struct((-area2).alias("na"), F.col("__id").alias("id")),
                ).otherwise(
                    # endpoint / edge buckets: keep the lowest-id point
                    F.struct(F.lit(0).cast("bigint").alias("na"), F.col("__id").alias("id"))
                )
            ).alias("__pick")
        )
        .select(key, "__b", F.col("__pick.id").alias("__id"))
    )
    kept = best.unionByName(short.select(key, "__b", "__id"))
    out = df.select(
        kc, F.col(id_col).alias("__id"), t.alias("__t"), v.alias("__v")
    ).join(kept, [key, "__id"])
    return out.select(
        key,
        F.col("__b").alias("bucket"),
        F.col("__id").alias(id_col),
        F.col("__t").alias(time_s),
        F.col("__v").alias(value_c),
    )


def rolling_zscore(
    df: DataFrame,
    key: str,
    time_s: str,
    value_c: str,
    id_col: str,
    window_rows: int = 20,
    min_rows: int = 5,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Trailing-window z-score anomaly detection per series.

    Each point is scored against the PRECEDING ``window_rows`` points
    (self excluded — a spike must not dilute its own baseline):
    ``z = (v·n − Σv) / sqrt(n·Σv² − (Σv)²)``, the algebraic form whose
    numerator and radicand are exact BIGINT window sums — the only
    float ops are one IEEE sqrt and one division on identical integer
    inputs, so the score (rounded to milli) and the flag are
    bit-deterministic across engines and partitionings. Rows with
    fewer than ``min_rows`` of history or zero variance score NULL.

    Plan: one windowed pass partitioned by the series key — the same
    single shuffle any per-key rolling statistic pays.
    """
    if window_rows < 1 or min_rows < 2:
        raise ValueError(
            f"window_rows >= 1 and min_rows >= 2 required, got "
            f"{window_rows}/{min_rows}"
        )
    w = (
        Window.partitionBy(key)
        .orderBy(time_s, id_col)
        .rowsBetween(-window_rows, -1)
    )
    v = F.col(value_c)
    n = F.count(v).over(w)
    s = F.sum(v).over(w)
    s2 = F.sum(v * v).over(w)
    rad = (n * s2 - s * s).cast("double")
    z = (v * n - s).cast("double") / F.sqrt(rad)
    z_milli = F.when(
        (n >= min_rows) & (rad > 0), F.round(z * 1000).cast("bigint")
    )
    return df.select(
        key,
        F.col(id_col),
        F.col(time_s),
        v.alias(value_c),
        z_milli.alias("z_milli"),
        # coalesce: insufficient history is NOT an anomaly (and a
        # NULL boolean renders engine-specifically — None vs NaN)
        F.coalesce(
            F.abs(z_milli) > int(z_threshold * 1000), F.lit(False)
        ).alias("is_anomaly"),
    )


def interval_union_length(
    df: DataFrame, key: str, start: str, end: str
) -> DataFrame:
    """Total length of the UNION of [start, end) intervals per key
    (ClickHouse ``intervalLengthSum`` parity) — overlapping and
    nested intervals count once.

    Classic island analysis, fully windowed: an interval opens a new
    island iff its start exceeds the running max end of every earlier
    interval (ties/adjacency merge); islands are numbered by a running
    sum of those flags; each island contributes ``max(end) −
    min(start)``. Exact BIGINT end-to-end. Plan: two window passes and
    one aggregate, all partitioned by the key — the standard per-key
    shuffle and nothing else.
    """
    if start == end:
        raise ValueError("start and end must be distinct columns")
    wp = Window.partitionBy(key).orderBy(start, end)
    prev_max = F.max(end).over(wp.rowsBetween(Window.unboundedPreceding, -1))
    opens = F.when(
        prev_max.isNull() | (F.col(start) > prev_max), 1
    ).otherwise(0)
    islands = df.select(
        F.col(key),
        F.col(start).alias("__s"),
        F.col(end).alias("__e"),
        F.sum(opens)
        .over(wp.rowsBetween(Window.unboundedPreceding, 0))
        .alias("__isl"),
    )
    return (
        islands.groupBy(key, "__isl")
        .agg((F.max("__e") - F.min("__s")).alias("__len"))
        .groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.sum("__len").alias("covered"),
        )
    )
