"""Weighted sampling via cumulative-sum inverse-CDF — the k-means++
D² sampling step.

Reference (k-means.sql:21-33): per-point weight ``d`` (min squared-ish
distance to existing centroids), a grand total ``sum(d) over ()``, a
running cumulative ``sum(d) over (rows unbounded preceding..current)``,
ONE uniform draw U per query (scalar subquery, quirk Q2), then
``where total*U < cum order by cum limit 1``.

Spark mapping and scale notes:
- The reference's window has no ORDER BY (ClickHouse block order); we
  impose ``orderBy(key)`` for reproducibility (SURVEY W2). Any fixed
  order is a valid inverse-CDF permutation.
- A global running sum is single-partition in the naive form. That is
  fine for the k-row-bounded uses here (the filter+limit(1) collapses
  to a TakeOrdered over a tiny filtered set), but ``cumulative_weights``
  is still written to keep the scan parallel: the window only carries
  (key, d) pairs, and the subsequent ``limit 1`` never materializes the
  full cumulated set on one node thanks to Spark's takeOrdered.
  For a true 100 TB global cumsum use ``partitioned_cumsum`` below
  (two-pass: per-partition partials + broadcast offsets).
- U is drawn in the DRIVER (``random.Random(seed)``) and injected as a
  literal — per-row ``F.rand()`` would be a different algorithm (Q2).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cumulative_weights(
    df: DataFrame, weight: str | Column, order: str | Column
) -> DataFrame:
    """Add ``total`` (grand sum of weights) and ``cum`` (running sum in
    ``order``) columns — reference k-means.sql:21-22 (W1/W2)."""
    w = F.col(weight) if isinstance(weight, str) else weight
    o = F.col(order) if isinstance(order, str) else order
    running = Window.orderBy(o).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    everything = Window.partitionBy()
    return df.withColumn("cum", F.sum(w).over(running)).withColumn(
        "total", F.sum(w).over(everything)
    )


def weighted_pick(
    df: DataFrame, weight: str | Column, order: str | Column, u: float
) -> DataFrame:
    """One-row DataFrame: the inverse-CDF sample at threshold ``u``.

    Reference k-means.sql:31-33: ``where total * U < cum order by cum
    limit 1``. ``u`` MUST be a driver-drawn scalar (quirk Q2).
    """
    cw = cumulative_weights(df, weight, order)
    return cw.filter(F.col("total") * F.lit(float(u)) < F.col("cum")).orderBy("cum").limit(1)


def two_phase_pick(
    weighted: DataFrame,
    u: float,
    weight: str = "w",
    bucket: str = "b",
    order: Sequence[str] = ("w",),
) -> DataFrame:
    """Scale-safe inverse-CDF pick at fraction ``u`` — no global
    single-task window (SURVEY W2 note; VERDICT r1 item 3).

    ``weighted`` must carry an exact integer ``weight`` column (BIGINT —
    quantize first; float sums are order-dependent) and a ``bucket``
    column (any deterministic hash/int). Two phases:

    1. per-bucket weight sums aggregate in parallel; one small row per
       bucket reaches the driver, which locates the bucket whose
       cumulative range [offset, offset+sum) contains ``u * total``;
    2. only THAT bucket's rows (≈ n/n_buckets) get a windowed running
       sum — and the window is PARTITIONED by the (now-constant) bucket
       column, so no unpartitioned WindowExec / single-task exchange
       appears anywhere in the plan.

    The induced permutation is (bucket, *order) — any fixed order is a
    valid inverse-CDF permutation. Returns the one picked row.
    """
    from fractions import Fraction
    from math import floor

    sums = {
        r[bucket]: r["__s"]
        for r in weighted.groupBy(bucket).agg(F.sum(weight).alias("__s")).collect()
    }
    sums = {b: s for b, s in sums.items() if s}
    if not sums:
        raise ValueError("two_phase_pick: no rows with nonzero weight")
    total = sum(sums.values())
    # exact integer threshold: cum > floor(total·u) ⟺ cum > total·u for
    # integer cum (advisory r2: a bigint→double cast of a >2^53 total
    # could skip the true crossing row; Fraction(u) is the float's
    # exact rational value, so the floor is computed without rounding)
    threshold = floor(total * Fraction(u))
    offset = 0
    target_bucket, bucket_offset = None, 0
    for b in sorted(sums):
        if offset + sums[b] > threshold:
            target_bucket, bucket_offset = b, offset
            break
        offset += sums[b]
    if target_bucket is None:
        # u → 1 (threshold >= total): inverse-CDF semantics = the last
        # weighted row; cum > total-1 matches exactly the final row
        target_bucket = sorted(sums)[-1]
        bucket_offset = total - sums[target_bucket]
        threshold = total - 1
    running = (
        Window.partitionBy(bucket)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        weighted.filter(F.col(bucket) == target_bucket)
        .withColumn("cum", F.sum(weight).over(running) + F.lit(int(bucket_offset)))
        .filter(F.col("cum") > F.lit(int(threshold)))
        .orderBy("cum", *order)
        .limit(1)
    )


def partitioned_cumsum(
    df: DataFrame, weight: str, order: str, num_parts: int | None = None
) -> DataFrame:
    """Scale-path global running sum: range-partition by ``order``, cumsum
    within partitions, add broadcast per-partition offsets.

    Avoids the single-task global window; used when the cumulated set
    itself is the output (not just a limit-1 probe).
    """
    parted = df.repartitionByRange(*( [num_parts] if num_parts else [] ), F.col(order))
    pid = F.spark_partition_id()
    with_pid = parted.withColumn("__pid", pid)
    win = Window.partitionBy("__pid").orderBy(order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = with_pid.withColumn("__local_cum", F.sum(weight).over(win))
    totals = (
        local.groupBy("__pid")
        .agg(F.sum(weight).alias("__part_sum"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__part_sum").over(
                    Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0.0),
            ),
        )
        .select("__pid", "__offset")
    )
    return (
        local.join(F.broadcast(totals), "__pid")
        .withColumn("cum", F.col("__local_cum") + F.col("__offset"))
        .drop("__pid", "__local_cum", "__offset")
    )


def weighted_sample(
    df: DataFrame,
    n: int,
    weight: str | Column,
    key: str = "doc_id",
    salt: int = 7,
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement of ``n`` rows
    — Efraimidis–Spirakis A-ES (the standard one-pass distributed
    algorithm: each row gets sort key u^(1/w), the global top-n by
    that key is an exact weighted sample; Efraimidis & Spirakis 2006).

    Implemented order-equivalently as ``ln(u)/w`` descending (monotone
    transform of u^(1/w) for w > 0 — avoids pow underflow for large
    weights). u is the portable 60-bit md5 hash of (salt, key) scaled
    to [0,1), so the sample is a pure function of the key set — stable
    across partition layouts, cluster sizes, and engines (the DuckDB
    oracle replays it). Rows with NULL or non-positive weight are
    excluded (they have zero sampling probability).

    Scale shape: one narrow projection + a global top-n, which Spark
    executes as TakeOrdered (per-partition partial top-n, then a
    driver merge of n-row partials — no global sort shuffle). The
    typical use: importance-sample a corpus by quality/length weight.
    """
    if n <= 0:
        raise ValueError(f"weighted_sample: n must be > 0, got {n}")
    from clickhouse_k_means_spark.functions.hashing import hash64

    w = (F.col(weight) if isinstance(weight, str) else weight).cast("double")
    u = hash64(F.col(key).cast("string"), salt=salt) / F.lit(float(1 << 60))
    es = F.log(u) / w
    return (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn("__es", es)
        .orderBy(F.col("__es").desc(), F.col(key).asc())
        .limit(n)
        .drop("__es")
    )


def stratified_hash_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum: str,
    key: str,
    salt: int = 42,
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff
    ``hash64(salt # key) % 1e6 < rate[stratum] * 1e6``.

    The usual pipeline move — downsample over-represented sources/
    languages to a target mix. Three properties DataFrame.sample lacks:
    the decision is a pure function of the KEY (identical picks on any
    cluster size, partition layout, or engine — the DuckDB oracle
    replays it exactly); it is per-stratum; and it is a narrow filter
    (no shuffle, no RNG state), so at 100 TB it fuses into the scan
    with predicate pushdown on the stratum column intact.
    """
    from clickhouse_k_means_spark.functions.hashing import hash64

    h = F.pmod(hash64(F.col(key).cast("string"), salt=salt), F.lit(1_000_000))
    gate = F.lit(int(default_rate * 1_000_000))
    for s, r in sorted(rates.items()):
        gate = F.when(F.col(stratum) == s, F.lit(int(r * 1_000_000))).otherwise(gate)
    return df.filter(h < gate)


def domain_cap(
    df: DataFrame,
    max_per_domain: int,
    domain: str = "source",
    key: str = "doc_id",
    salt: int = 7,
) -> DataFrame:
    """Deterministic per-domain cap — the crawl-hygiene downsampler
    that stops one over-represented site from dominating a training
    mix (the hard-cap complement to ``mix_sources``' proportional
    sampling).

    Keeps at most ``max_per_domain`` rows per ``domain``, selected by
    a seeded portable hash of the key (a reproducible uniform draw —
    re-running on the same corpus keeps the SAME rows) with the key
    as total-order tie-break.

    Plan shape: Spark collapses the rank filter to WindowGroupLimit,
    which truncates each group to the cap INSIDE the shuffle (per-
    partition pre-limit before the exchange), so a pathological
    million-doc domain never materializes a full sorted partition.
    """
    from clickhouse_k_means_spark.functions.hashing import hash64
    from clickhouse_k_means_spark.operators.limit_by import limit_by

    if max_per_domain < 1:
        raise ValueError(f"max_per_domain must be >= 1, got {max_per_domain}")
    pri = hash64(F.col(key).cast("string"), salt=salt)
    return limit_by(
        df.withColumn("__pri", pri),
        max_per_domain,
        by=domain,
        order=["__pri", key],
    ).drop("__pri")
