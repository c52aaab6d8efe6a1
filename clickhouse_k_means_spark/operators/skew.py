"""Skew mitigation — salted joins for hot keys.

AQE's skew-join splitting (enabled in session.py) covers sort-merge
joins at runtime; ``salted_join`` is the explicit form for when you
know the key distribution is pathological and the build side is too
large to broadcast: fact rows scatter across ``n_salts`` sub-keys,
the dim side replicates ``n_salts``×, and the join runs on
``(key, salt)`` — a hot key's rows land in ``n_salts`` tasks instead
of one.

Cost model: dim side grows ``n_salts``× (keep it the smaller side);
shuffle width per key multiplies by ``n_salts``. Worth it exactly when
one task would otherwise process a multi-GB key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the fact side salted and the dim side replicated.

    Result equals ``fact.join(dim, on, how)`` row-for-row; the salt is
    only a partitioning device (derived from a per-row id, so identical
    fact rows still spread). Supported ``how``: inner / left.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner|left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    salted_fact = fact.withColumn(
        _SALT, F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    )
    replicated_dim = dim.withColumn(
        _SALT, F.explode(F.array(*[F.lit(s) for s in range(n_salts)]))
    )
    out = salted_fact.join(replicated_dim, keys + [_SALT], how)
    return out.drop(_SALT)


def skew_report(df: DataFrame, key: str) -> DataFrame:
    """Join-key skew diagnostics — the measurement that tells you
    whether ``salted_join`` (above) or AQE skew handling is needed,
    and at what factor.

    One row: ``(n_rows, n_keys, max_count, top_key, avg_count,
    skew_ratio_x100)`` where ``skew_ratio_x100`` is
    ``100 · max_count / mean_count`` as exact BIGINT (100 = perfectly
    uniform; a hot key at 50× mean reads 5000). ``top_key`` is the
    hottest key rendered as string, ties to the smallest.

    Plan: one map-side-combined groupBy(key), then a 1-row aggregate
    over the (bounded-by-cardinality) frequency table — the same
    frequency-table trick as the exact-quantile operator, so the
    diagnostic never collects or windows raw rows. Run it on a
    sample() for a quick read at 100 TB; exact mode is the gate.
    """
    freq = df.groupBy(F.col(key).cast("string").alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    stats = freq.agg(
        F.sum("c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("c").alias("max_count"),
        # struct-min over (inverted count, key): max count wins, ties
        # break to the smallest rendered key (quirk-Q3 determinism)
        F.min(
            F.struct((-F.col("c")).alias("nc"), F.col("k").alias("k"))
        ).alias("top"),
    )
    return stats.select(
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_keys").cast("bigint").alias("n_keys"),
        F.col("max_count").cast("bigint").alias("max_count"),
        F.col("top.k").alias("top_key"),
        F.expr("n_rows div n_keys").cast("bigint").alias("avg_count"),
        F.expr("(100 * max_count * n_keys) div n_rows")
        .cast("bigint")
        .alias("skew_ratio_x100"),
    )
