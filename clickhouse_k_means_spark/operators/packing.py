"""Dataset assembly operators — deterministic splits and sequence
packing for training-data pipelines.

None of these exist in the reference (its pipeline ends at
clustering); they are table-stakes for the LLM-data surface this
engine extends it with: every corpus ships as train/val/test, every
pretraining run packs documents into fixed token budgets, and every
data recipe mixes domains at target proportions (``mix_sources``).

Scale shapes:
- ``hash_split`` is a pure narrow projection (one portable md5-based
  hash per row, threshold comparisons) — no shuffle, no state;
  assignment is a pure function of (key, salt) so re-runs, backfills,
  and incremental arrivals land in the same split forever.
- ``pack_sequences`` needs a GLOBAL running token total in key order —
  the classic single-partition window trap. It uses the same
  two-phase shape as the engine's weighted pick (operators/sampling
  W1/W2): phase 1 aggregates per-bucket token sums into running
  offsets (~sqrt(n) buckets by default, broadcast-joined back as a
  DataFrame, never a literal plan map), phase 2 computes
  within-bucket cumsums in parallel and adds the bucket offset. No
  SinglePartition stage at any size; buckets are contiguous key
  ranges so the global order is exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clickhouse_k_means_spark.functions.hashing import hash64
from clickhouse_k_means_spark.sources.dataset import local_df


def hash_split(
    df: DataFrame,
    key: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: int = 42,
    out: str = "split",
) -> DataFrame:
    """Deterministic dataset split by portable key hash.

    ``weights`` maps split name → proportion (must sum to ~1; default
    90/5/5 train/val/test). The 60-bit md5 hash divided by 2^60 gives
    u ∈ [0,1); split boundaries are cumulative proportions — exactly
    replayable in the DuckDB oracle via the same md5 arithmetic.
    """
    weights = weights or {"train": 0.90, "val": 0.05, "test": 0.05}
    u = hash64(F.col(key).cast("string"), salt=salt) / F.lit(float(1 << 60))
    expr: Column | None = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = u < acc
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    )
    return df.withColumn(out, expr)


def _enumerated(df: DataFrame, key: str, seed: int) -> DataFrame:
    """``training_order``'s phase 1+2 lineage, exposed pre-checkpoint
    so the plan test can pin it at ONE exchange: range-sort on the
    seeded hash, then enumerate rows in sorted order with
    ``monotonically_increasing_id()`` = (partition id << 33) |
    within-partition record counter. The id projection sits ABOVE the
    Sort and is nondeterministic, so Catalyst never reorders it below
    — the counter ticks in range-sorted row order, making
    ``__rn`` the exact within-partition rank with no window and no
    second exchange. The absolute id values vary run-to-run with
    partitioning; the (``__pid`` order, ``__rn``) pair they decompose
    into does not — and positions depend only on that pair."""
    base = df.withColumn(
        "__h", hash64(F.col(key).cast("string"), salt=seed)
    )
    return (
        base.repartitionByRange("__h", key)
        .sortWithinPartitions("__h", key)
        .withColumn("__mid", F.monotonically_increasing_id())
        .withColumn("__pid", F.shiftright("__mid", 33).cast("int"))
        .withColumn(
            "__rn",
            F.col("__mid").bitwiseAND(F.lit((1 << 33) - 1)).cast("bigint"),
        )
        .drop("__mid")
    )


def training_order(
    df: DataFrame,
    key: str = "doc_id",
    seed: int = 42,
    n_shards: int | None = None,
    out: str = "position",
) -> DataFrame:
    """Deterministic seeded GLOBAL permutation — the training-order
    shuffle every pipeline runs between assembly and tokenization
    (curriculum-free i.i.d. ordering; a different ``seed`` per epoch
    gives independent epoch orders without materializing anything).

    Position = dense rank of the portable 60-bit md5 key hash (ties
    impossible for distinct keys up to hash collisions, which the
    secondary key order resolves deterministically), so the
    permutation is a pure function of (key, seed) — replayable by the
    DuckDB oracle and stable across re-runs, partitionings, and
    cluster sizes. With ``n_shards`` each row also gets its
    ``shard`` = position % n_shards, the round-robin shard assignment
    that keeps every shard an unbiased sample of the corpus.

    Scale shape — the TWO-PHASE distributed rank, never a global
    window (``Window.orderBy`` with no partition key moves the WHOLE
    corpus to one task — the SinglePartition funnel the plan audit
    bans): (1) ONE range-partitioned sort shuffle on the uniform hash
    (Spark's TB-proven sort path, skew-free by construction; range
    partitioning guarantees partition i's (hash, key) tuples all
    precede partition i+1's, so a per-partition rank plus a partition
    offset IS the exact global rank); (2) per-partition enumeration
    via ``monotonically_increasing_id`` — a narrow projection over
    the already-sorted partitions, NOT a window (ADVICE r9: a
    ``Window.partitionBy(spark_partition_id())`` here does not match
    the child's RangePartitioning, so Catalyst inserted a SECOND
    full-data hash exchange + re-sort — 2x the shuffled bytes for
    nothing); (3) partition COUNTS (one tiny row per partition)
    collected and turned into cumulative offsets, broadcast back.
    Driver state is O(partitions), never O(rows). The plan test pins
    the pre-checkpoint lineage at exactly ONE exchange (the range
    sort).
    """
    if n_shards is not None and n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    enum = _enumerated(df, key, seed).localCheckpoint(
        eager=True
    )  # counts + join read one sort
    counts = sorted(
        (r["__pid"], r["n"])
        for r in enum.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    offsets, acc = [], 0
    for pid, n in counts:
        offsets.append((pid, acc))
        acc += n
    off_df = local_df(
        df.sparkSession, offsets, "__pid int, __off bigint"
    )
    ordered = (
        enum.join(F.broadcast(off_df), "__pid")
        .withColumn(out, (F.col("__off") + F.col("__rn")))
        .drop("__h", "__pid", "__rn", "__off")
    )
    if n_shards is not None:
        ordered = ordered.withColumn(
            "shard", F.pmod(F.col(out), F.lit(n_shards)).cast("int")
        )
    return ordered


def mix_sources(
    df: DataFrame,
    weights: dict[str, float],
    source: str = "source",
    key: str = "doc_id",
    salt: int = 13,
) -> DataFrame:
    """Deterministic domain-mixture downsampling — the data-mixing
    step of a pretraining pipeline (e.g. The Pile / LLaMA-style
    per-domain proportions).

    ``weights`` maps source name → target fraction of the output.
    The operator finds the largest output size T with ``w_s·T ≤ n_s``
    for every weighted source (the binding-domain rule: sources are
    only ever DOWNsampled, never duplicated), then hash-samples each
    source at rate ``w_s·T/n_s``. Selection is a pure function of
    (key, source, salt) — rerun-stable, backfill-safe, independent of
    partition layout. Sources absent from ``weights`` are dropped.
    Realized counts are binomial around the targets (hash-threshold
    sampling), exact in expectation.

    Scale shape: one tiny ``groupBy(source)`` count (domains are a
    curated handful — the rate CASE literal is bounded by
    ``len(weights)``), then a NARROW filter pass over the corpus — no
    shuffle, no state.
    """
    if not weights or any(w <= 0 for w in weights.values()):
        raise ValueError("mix_sources: weights must be a non-empty map of "
                         "positive fractions")
    counts = {
        r[source]: r["n"]
        for r in df.filter(F.col(source).isin(*weights))
        .groupBy(source)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    present = {s: w for s, w in weights.items() if counts.get(s)}
    if not present:
        raise ValueError(
            f"mix_sources: none of the weighted sources {sorted(weights)} "
            f"appear in column {source!r}"
        )
    total = min(counts[s] / w for s, w in present.items())
    rate_expr: Column | None = None
    for s, w in present.items():
        rate = min(1.0, w * total / counts[s])
        cond = F.col(source) == s
        rate_expr = (
            F.when(cond, rate)
            if rate_expr is None
            else rate_expr.when(cond, rate)
        )
    rate_expr = rate_expr.otherwise(F.lit(0.0))
    u = hash64(
        F.concat(F.col(key).cast("string"), F.lit("|"), F.col(source)),
        salt=salt,
    ) / F.lit(float(1 << 60))
    return df.filter(u < rate_expr)


def length_curriculum(
    df: DataFrame,
    col: str,
    n_stages: int = 4,
    key: str = "doc_id",
) -> DataFrame:
    """Curriculum staging by global quantiles of ``col`` — the
    shortest quarter of the corpus is stage 1, the longest is stage
    ``n_stages`` (curriculum-learning schedules feed short documents
    first).

    Two narrow passes: ONE exact-percentile aggregate computes the
    n_stages−1 boundaries (a single tiny row to the driver — never an
    ``ntile`` window, whose global sort is a SinglePartition stage at
    any size), then a pure CASE projection assigns stages. Stage
    assignment is reproducible: boundaries are exact interpolated
    percentiles (DuckDB ``quantile_cont`` parity, same contract as the
    ``quantiles`` gate), and every comparison is against the same
    driver-collected doubles.
    """
    if n_stages < 2:
        raise ValueError(f"length_curriculum: n_stages must be >= 2, got {n_stages}")
    probs = [i / n_stages for i in range(1, n_stages)]
    row = df.agg(
        F.percentile(F.col(col), F.array(*[F.lit(p) for p in probs])).alias("b")
    ).first()
    if row is None or row["b"] is None:
        raise ValueError(f"length_curriculum: no non-null rows in {col!r}")
    bounds = list(row["b"])
    expr: Column | None = None
    for s, b in enumerate(bounds, start=1):
        cond = F.col(col) <= F.lit(float(b))
        expr = F.when(cond, s) if expr is None else expr.when(cond, s)
    expr = expr.otherwise(n_stages)
    return df.select(key, col, expr.cast("int").alias("stage"))


def pack_sequences(
    df: DataFrame,
    tokens: str,
    key: str = "doc_id",
    budget: int = 2048,
    bucket_width: int | None = None,
) -> DataFrame:
    """Assign each document to a training pack by token budget.

    Documents are taken in ``key`` order; ``pack_id = (running token
    total BEFORE this doc) div budget`` — the budget window the doc
    STARTS in. This is the streaming-friendly approximation used at
    scale (a pack can overflow by at most one document's tokens;
    documents longer than ``budget`` own their packs); the exact
    greedy reset would need a sequential scan of the corpus.

    Output: (key, tokens, pack_id, pack_offset) — offset is the token
    position of the doc inside its pack's budget window; join back by
    ``key`` for the remaining columns (kept out of the operator so it
    adds no shuffle of its own).

    Two-phase global cumsum: per-bucket token sums roll up into running
    offsets, then within-bucket window cumsums run fully parallel and
    add the bucket offset back — no SinglePartition stage at any size.
    Buckets are contiguous key ranges (``key div width`` — INTEGRAL
    division, so 64-bit keys above 2^53 never mis-bucket the way a
    double-rounded ``/`` could).

    ``bucket_width`` (key units per bucket) defaults to a width derived
    from the key span targeting ~sqrt(n) buckets, which balances the
    two phases: the (bucket, offset) side stays ~sqrt(n) rows (a few
    hundred thousand at 10^11 docs — megabytes), and each bucket's
    sequential cumsum task stays ~sqrt(n) rows. The offsets ship as a
    broadcast-joined DataFrame, never a literal plan map (a literal
    explodes the plan at exactly the scale that needs bucketing).
    ``key`` must be numeric — a string key would cast to null and
    collapse every row into one bucket.
    """
    from pyspark.sql.types import NumericType

    if not isinstance(df.schema[key].dataType, NumericType):
        raise ValueError(
            f"pack_sequences: key column {key!r} must be numeric "
            f"(got {df.schema[key].dataType.simpleString()}); global key "
            "order is defined by contiguous numeric bucket ranges"
        )
    t = df.select(
        F.col(key), F.col(tokens).cast("bigint").alias("__t")
    ).withColumn("__k", F.col(key).cast("bigint"))
    if bucket_width is None:
        lo, hi, n = t.agg(
            F.min("__k"), F.max("__k"), F.count(F.lit(1))
        ).first()
        if not n:
            bucket_width = 1
        else:
            target = max(16, min(1 << 20, int(float(n) ** 0.5) + 1))
            span = hi - lo + 1
            bucket_width = max(1, -(-span // target))
    t = t.select(
        F.col(key), "__t", F.expr(f"__k div {int(bucket_width)}").alias("__b")
    )
    # phase 1: per-bucket totals -> running offsets (cumsum over the
    # tiny sorted bucket list) -> broadcast (bucket, offset) relation
    spark = df.sparkSession
    sums = t.groupBy("__b").agg(F.sum("__t").alias("s")).collect()
    offsets, run = [], 0
    for r in sorted(sums, key=lambda r: r["__b"]):
        offsets.append((r["__b"], run))
        run += r["s"]
    off = F.broadcast(
        local_df(spark, offsets or [(0, 0)], "__b bigint, __off bigint")
    )
    # phase 2: within-bucket cumsum (parallel across buckets) + offset
    w = (
        Window.partitionBy("__b")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("__t").over(w), F.lit(0)) + F.col("__off")
    return t.join(off, "__b").select(
        F.col(key),
        F.col("__t").alias(tokens),
        F.floor(before / budget).cast("bigint").alias("pack_id"),
        F.pmod(before, F.lit(budget)).cast("bigint").alias("pack_offset"),
    )
