"""Exact distributed IQR outlier detection.

Per-group Tukey-fence outlier flagging (value outside
``[q25 - 1.5·IQR, q75 + 1.5·IQR]``) with EXACT type-7 quantiles —
the robust complement to z-score screening for metric-anomaly sweeps
over event streams (extension beyond the reference; engine idiom:
declarative plan, integer determinism, DuckDB oracle twin).

Scale design — why not ``F.percentile``: Spark's exact percentile
aggregate buffers every value of a group in executor memory, which
dies at 100 TB. Instead quantiles are computed from the VALUE-
FREQUENCY table: cents-quantized metrics have bounded distinct
cardinality, so ``groupBy(group, value).count()`` shrinks the data by
orders of magnitude in a map-side-combined shuffle, the cumulative
window then runs over the compact frequency table (per-group
partitions of distinct VALUES, not rows), and the quantile falls out
of four covered-position lookups. One more broadcast join back (group
cardinality is small by construction) flags the raw rows. Everything
after cents quantization is BIGINT: quarter-unit quantile fixed-point
(type-7 interpolation fractions at p∈{.25,.75} are quarters, so 4×
the quantile is always integral) and eighth-unit fence comparisons —
no float ULP can flip a flag between engines or partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from clickhouse_k_means_spark.sources.dataset import local_df


def _value_at(pos: Column, cum_prev: Column, cum: Column, v: Column) -> Column:
    """The sorted-position lookup: this freq row covers positions
    [cum_prev, cum); exactly one row per group covers ``pos``, so the
    max-of-when aggregate extracts its value."""
    return F.max(F.when((cum_prev <= pos) & (pos < cum), v))


def _staged_freq(
    df: DataFrame, value: str, group: str, cents: int
) -> DataFrame:
    """Shared quantile staging: cents-quantize, build the per-group
    VALUE-FREQUENCY table, and attach cumulative/total counts —
    ``(g, v, cnt, cum, cum_prev, n)``. Both quantile operators below
    interpolate off this relation."""
    b = df.select(
        F.col(group).alias("g"),
        F.round(F.col(value) * cents).cast("bigint").alias("v"),
    ).filter(F.col("v").isNotNull())
    # NULL metrics are excluded from both the frequency table AND n —
    # quantile positions must match DuckDB's quantile_cont, which
    # ignores NULLs; an unfiltered NULL group would sort first and
    # shift every position (ADVICE r5).
    freq = b.groupBy("g", "v").agg(F.count(F.lit(1)).alias("cnt"))
    wo = Window.partitionBy("g").orderBy("v")
    wall = Window.partitionBy("g")
    return freq.select(
        "g", "v", "cnt",
        F.sum("cnt").over(wo).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    ).withColumn("cum_prev", F.col("cum") - F.col("cnt"))


def iqr_outliers(
    df: DataFrame,
    value: str = "value",
    group: str = "event_type",
    cents: int = 100,
) -> DataFrame:
    """Per-group Tukey-fence outlier stats over a metric column.

    Returns ``(group, n, q25_4, q75_4, n_outliers, outlier_sum_c)``:
    ``q25_4``/``q75_4`` are 4× the exact type-7 quantiles of the
    cents-quantized metric (BIGINT — the ×4 absorbs the quarter
    interpolation fractions), ``n_outliers`` counts rows outside
    ``[q25 - 1.5·IQR, q75 + 1.5·IQR]`` and ``outlier_sum_c`` is their
    exact cents sum (an order-free checksum of the flagged set).
    """
    b = df.select(
        F.col(group).alias("g"),
        F.round(F.col(value) * cents).cast("bigint").alias("v"),
    )
    staged = _staged_freq(df, value, group, cents)

    # type-7: p25 sits at quarter-position (n-1), p75 at 3(n-1)
    i25 = F.expr("(n - 1) div 4")
    f25 = F.expr("(n - 1) % 4")
    i75 = F.expr("(3 * (n - 1)) div 4")
    f75 = F.expr("(3 * (n - 1)) % 4")
    cp, cu, v = F.col("cum_prev"), F.col("cum"), F.col("v")
    q = staged.groupBy("g").agg(
        F.first(F.col("n")).alias("n"),
        _value_at(i25, cp, cu, v).alias("lo25"),
        _value_at(i25 + 1, cp, cu, v).alias("hi25"),
        _value_at(i75, cp, cu, v).alias("lo75"),
        _value_at(i75 + 1, cp, cu, v).alias("hi75"),
        F.first(f25).alias("f25"),
        F.first(f75).alias("f75"),
    )
    # 4·quantile = 4·lo + frac4·(hi − lo); hi exists whenever frac > 0
    bounds = q.select(
        "g",
        "n",
        (
            F.lit(4) * F.col("lo25")
            + F.col("f25") * (F.coalesce("hi25", "lo25") - F.col("lo25"))
        ).alias("q25_4"),
        (
            F.lit(4) * F.col("lo75")
            + F.col("f75") * (F.coalesce("hi75", "lo75") - F.col("lo75"))
        ).alias("q75_4"),
    )
    iqr4 = F.col("q75_4") - F.col("q25_4")
    # v < q25 − 1.5·IQR  ⇔  8v < 2·q25_4 − 3·iqr_4 (and mirrored high)
    flagged = b.join(F.broadcast(bounds), "g").withColumn(
        "is_out",
        (F.lit(8) * F.col("v") < F.lit(2) * F.col("q25_4") - F.lit(3) * iqr4)
        | (F.lit(8) * F.col("v") > F.lit(2) * F.col("q75_4") + F.lit(3) * iqr4),
    )
    return (
        flagged.groupBy("g")
        .agg(
            F.first("n").alias("n"),
            F.first("q25_4").alias("q25_4"),
            F.first("q75_4").alias("q75_4"),
            F.sum(F.col("is_out").cast("bigint")).alias("n_outliers"),
            F.coalesce(
                F.sum(F.when(F.col("is_out"), F.col("v"))), F.lit(0)
            ).alias("outlier_sum_c"),
        )
        .select(
            F.col("g").alias(group),
            F.col("n").cast("bigint").alias("n"),
            F.col("q25_4").cast("bigint").alias("q25_4"),
            F.col("q75_4").cast("bigint").alias("q75_4"),
            F.col("n_outliers").cast("bigint").alias("n_outliers"),
            F.col("outlier_sum_c").cast("bigint").alias("outlier_sum_c"),
        )
    )


def winsorize_stats(
    df: DataFrame,
    value: str = "value",
    group: str = "event_type",
    lo_ppm: int = 50_000,
    hi_ppm: int = 950_000,
    cents: int = 100,
) -> DataFrame:
    """Per-group winsorization at exact type-7 quantiles (default
    p05/p95): the clipping cousin of the Tukey fences above — outliers
    are pulled to the boundary instead of flagged, the standard
    robust-mean preprocessing move.

    Returns ``(group, n, q_lo_u, q_hi_u, n_clipped_lo, n_clipped_hi,
    wsum_u)`` where ``_u`` values are micro-cent units (cents × 10⁶ —
    the scale that makes type-7 interpolation at ppm-grid quantiles
    integral) and ``wsum_u`` is the exact BIGINT sum of the clipped
    values. Same frequency-table plan as ``iqr_outliers``: no
    memory-unbounded percentile aggregate, no raw-row window.
    """
    if not (0 <= lo_ppm < hi_ppm <= 1_000_000):
        raise ValueError(f"need 0 <= lo_ppm < hi_ppm <= 1e6, got {lo_ppm}, {hi_ppm}")
    b = df.select(
        F.col(group).alias("g"),
        F.round(F.col(value) * cents).cast("bigint").alias("v"),
    )
    staged = _staged_freq(df, value, group, cents)
    cp, cu, v = F.col("cum_prev"), F.col("cum"), F.col("v")

    def _q(p_ppm: int, tag: str) -> list:
        pos = F.expr(f"((n - 1) * {p_ppm}) div 1000000")
        frac = F.expr(f"((n - 1) * {p_ppm}) % 1000000")
        return [
            _value_at(pos, cp, cu, v).alias(f"lo_{tag}"),
            _value_at(pos + 1, cp, cu, v).alias(f"hi_{tag}"),
            F.first(frac).alias(f"f_{tag}"),
        ]

    q = staged.groupBy("g").agg(
        F.first("n").alias("n"), *_q(lo_ppm, "a"), *_q(hi_ppm, "b")
    )
    bounds = q.select(
        "g", "n",
        (
            F.lit(1_000_000) * F.col("lo_a")
            + F.col("f_a") * (F.coalesce("hi_a", "lo_a") - F.col("lo_a"))
        ).alias("q_lo_u"),
        (
            F.lit(1_000_000) * F.col("lo_b")
            + F.col("f_b") * (F.coalesce("hi_b", "lo_b") - F.col("lo_b"))
        ).alias("q_hi_u"),
    )
    clipped = b.join(F.broadcast(bounds), "g").select(
        "g", "n", "q_lo_u", "q_hi_u",
        (F.col("v") * 1_000_000).alias("v_u"),
    )
    w = F.greatest(F.col("q_lo_u"), F.least(F.col("q_hi_u"), F.col("v_u")))
    return (
        clipped.groupBy("g")
        .agg(
            F.first("n").alias("n"),
            F.first("q_lo_u").alias("q_lo_u"),
            F.first("q_hi_u").alias("q_hi_u"),
            F.sum((F.col("v_u") < F.col("q_lo_u")).cast("bigint")).alias(
                "n_clipped_lo"
            ),
            F.sum((F.col("v_u") > F.col("q_hi_u")).cast("bigint")).alias(
                "n_clipped_hi"
            ),
            F.sum(w).alias("wsum_u"),
        )
        .select(
            F.col("g").alias(group),
            F.col("n").cast("bigint").alias("n"),
            F.col("q_lo_u").cast("bigint").alias("q_lo_u"),
            F.col("q_hi_u").cast("bigint").alias("q_hi_u"),
            F.col("n_clipped_lo").cast("bigint").alias("n_clipped_lo"),
            F.col("n_clipped_hi").cast("bigint").alias("n_clipped_hi"),
            F.col("wsum_u").cast("bigint").alias("wsum_u"),
        )
    )


def weighted_quantiles(
    df: DataFrame,
    value: str,
    weight: str,
    group: str,
    ps_ppm: list[int],
    cents: int = 100,
) -> DataFrame:
    """ClickHouse ``quantileExactWeighted`` parity: per group, the
    FIRST value whose cumulative weight reaches ``p · W`` (step
    quantile, no interpolation — exactly ClickHouse's definition).

    Rows with NULL values or non-positive weights are EXCLUDED
    (ClickHouse drops weight-0 rows; negative weights have no
    quantile semantics) — callers wanting a hard failure on negative
    weights should validate upstream, this operator will not shuffle
    the corpus twice to check.

    Same scale shape as the unweighted quantile operators above: the
    shuffle carries the per-(group, value) weight-frequency table
    (map-side combined), the cumulative window runs over distinct
    values, and the |groups| × |ps| probe grid rides a broadcast.
    Everything is BIGINT (cents quantization × integer weights ×
    ppm thresholds) — no float can flip a covered-position test.
    """
    if not ps_ppm:
        raise ValueError("ps_ppm must be non-empty")
    if any(p < 0 or p > 1_000_000 for p in ps_ppm):
        raise ValueError(f"ps_ppm must be within [0, 1e6]: {ps_ppm}")
    b = df.select(
        F.col(group).alias("g"),
        F.round(F.col(value) * cents).cast("bigint").alias("v"),
        F.col(weight).cast("bigint").alias("w"),
    ).filter(F.col("v").isNotNull() & (F.col("w") > 0))
    freq = b.groupBy("g", "v").agg(F.sum("w").alias("cnt"))
    wv = Window.partitionBy("g").orderBy("v")
    staged = freq.select(
        "g",
        "v",
        F.sum("cnt").over(wv).alias("cum"),
        F.sum("cnt").over(Window.partitionBy("g")).alias("tot"),
    )
    ps = local_df(
        df.sparkSession, [(int(p),) for p in sorted(set(ps_ppm))],
        "p_ppm bigint",
    )
    return (
        staged.join(F.broadcast(ps))
        .filter(F.col("cum") * 1_000_000 >= F.col("p_ppm") * F.col("tot"))
        .groupBy("g", "p_ppm")
        .agg(F.min("v").alias("q_c"))
    )
