"""Bloom-prefiltered joins: shrink the probe side BEFORE the shuffle.

The classic 100 TB join move: when a huge probe side joins a build
side that is too big to broadcast as rows but whose KEY SET fits a
few megabits, ship a bloom filter of the build keys and drop
non-matching probe rows before they ever reach the exchange. Spark's
runtime row-level filtering does this opportunistically
(`spark.sql.optimizer.runtime.bloomFilter.enabled`); this operator is
the explicit, plan-visible version — and it is built entirely from
DataFrame aggregates (`bloom_filter_agg` is not public SQL):

- build: k salted ``xxhash64`` probes per key → bit positions in an
  m-bit space → ``groupBy(word) . bit_or(1 << bit)`` folds them into
  an (m/64)-row word table (the bitmap, as data);
- probe: k broadcast LEFT joins of the probe side against the word
  table (word id is a pure projection of the key — no shuffle of the
  probe side), keeping rows whose k bits are ALL set.

No false negatives by construction (a present key's bits are all
set), so ``bloom_join`` — prefilter then exact join — returns exactly
the plain join's rows; false positives only cost wasted shuffle. With
m sized at ~10 bits/key the survivor overhead is ~1-2%.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bloom_build(
    build: DataFrame, key: str, m_bits: int, k_hashes: int = 2, seed: int = 42
) -> DataFrame:
    """Fold the build side's key set into an (word_id, bits) bitmap
    table of at most ``m_bits/64`` rows (only non-zero words emitted).
    One map-side-combined shuffle over word ids."""
    if m_bits < 64 or m_bits % 64:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    if k_hashes < 1:
        raise ValueError(f"k_hashes must be >= 1, got {k_hashes}")
    pos = F.explode(
        F.array(
            *[
                F.pmod(F.xxhash64(F.lit(seed + i), F.col(key)), F.lit(m_bits))
                for i in range(k_hashes)
            ]
        )
    ).alias("pos")
    return (
        build.select(pos)
        .select(
            F.expr("pos div 64").alias("word"),
            F.expr("shiftleft(1L, int(pos % 64))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )


def bloom_prefilter(
    probe: DataFrame,
    bloom: DataFrame,
    key: str,
    m_bits: int,
    k_hashes: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Keep probe rows whose key MIGHT be in the bloom (all k bits
    set). k broadcast left joins — the probe side is never shuffled;
    a word id absent from the bitmap table means bits are all zero."""
    reserved = {"__pos", "__word", "__bits"}
    clash = reserved & set(probe.columns)
    if clash:
        raise ValueError(
            f"bloom_prefilter: probe columns {sorted(clash)} collide with "
            "the operator's temp columns — rename them first"
        )
    out = probe
    for i in range(k_hashes):
        pos = F.pmod(F.xxhash64(F.lit(seed + i), F.col(key)), F.lit(m_bits))
        probed = out.withColumn("__pos", pos).withColumn(
            "__word", F.expr("__pos div 64")
        )
        out = (
            probed.join(
                F.broadcast(
                    bloom.select(
                        F.col("word").alias("__word"),
                        F.col("bits").alias("__bits"),
                    )
                ),
                "__word",
                "left",
            )
            .filter(
                F.expr("coalesce(__bits, 0L) & shiftleft(1L, int(__pos % 64))")
                != 0
            )
            .drop("__pos", "__word", "__bits")
        )
    return out


def bloom_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    bits_per_key: int = 10,
    k_hashes: int = 2,
    n_build_keys: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Exact inner join with a bloom prefilter on the probe side.

    ``m_bits`` is sized from ``n_build_keys`` (counted if not given —
    pass it when known to save a job) at ``bits_per_key`` density,
    rounded up to a multiple of 64. Returns exactly
    ``probe ⋈ build`` — the bloom can only admit extra rows into the
    shuffle, never drop a matching one.
    """
    n = n_build_keys if n_build_keys is not None else build.select(key).distinct().count()
    m_bits = max(64, ((max(1, n) * bits_per_key + 63) // 64) * 64)
    bloom = bloom_build(build, key, m_bits, k_hashes, seed)
    return bloom_prefilter(probe, bloom, key, m_bits, k_hashes, seed).join(
        build, key
    )
