"""Dataset assembly operators — deterministic splits and sequence
packing for training-data pipelines.

Neither exists in the reference (its pipeline ends at clustering);
both are table-stakes for the LLM-data surface this engine extends it
with: every corpus ships as train/val/test, and every pretraining run
packs documents into fixed token budgets.

Scale shapes:
- ``hash_split`` is a pure narrow projection (one portable md5-based
  hash per row, threshold comparisons) — no shuffle, no state;
  assignment is a pure function of (key, salt) so re-runs, backfills,
  and incremental arrivals land in the same split forever.
- ``pack_sequences`` needs a GLOBAL running token total in key order —
  the classic single-partition window trap. It uses the same
  two-phase shape as the engine's weighted pick (operators/sampling
  W1/W2): phase 1 aggregates per-bucket token sums (tiny driver list),
  phase 2 computes within-bucket cumsums in parallel and adds the
  driver-broadcast bucket offset. No SinglePartition stage at any
  size; buckets are contiguous key ranges so the global order is
  exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clickhouse_k_means_spark.functions.hashing import hash64


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


def pack_sequences(
    df: DataFrame,
    tokens: str,
    key: str = "doc_id",
    budget: int = 2048,
    bucket_width: int = 64,
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

    Two-phase global cumsum: per-bucket sums (bucket = key div
    bucket_width·budget-ish contiguous ranges) collect as one tiny
    driver list; within-bucket window cumsums run fully parallel.
    """
    b = (F.col(key) / F.lit(bucket_width)).cast("bigint").alias("__b")
    t = df.select(F.col(key), F.col(tokens).cast("bigint").alias("__t"), b)
    # phase 1: per-bucket totals -> driver -> running offsets
    sums = {
        r["__b"]: r["s"]
        for r in t.groupBy("__b").agg(F.sum("__t").alias("s")).collect()
    }
    offsets = {}
    run = 0
    for bk in sorted(sums):
        offsets[bk] = run
        run += sums[bk]
    off_map = F.create_map(
        *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
    )
    # phase 2: within-bucket cumsum (parallel across buckets) + offset
    w = (
        Window.partitionBy("__b")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("__t").over(w), F.lit(0)) + off_map[F.col("__b")]
    return t.select(
        F.col(key),
        F.col("__t").alias(tokens),
        F.floor(before / budget).cast("bigint").alias("pack_id"),
        F.pmod(before, F.lit(budget)).cast("bigint").alias("pack_offset"),
    )
