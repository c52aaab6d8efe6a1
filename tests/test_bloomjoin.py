"""Bloom-prefiltered join invariants (operators/bloomjoin.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_k_means_spark.operators.bloomjoin import (
    bloom_build,
    bloom_join,
    bloom_prefilter,
)


def test_bloom_no_false_negatives_exact_join_parity(spark, sf_dir):
    from clickhouse_k_means_spark.sources.dataset import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"), "l_quantity"
    )
    sub = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("okey"))
    )
    plain = li.join(sub, "okey")
    bloomed = bloom_join(li, sub, key="okey")
    assert sorted(map(tuple, bloomed.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_bloom_prefilter_rejects_disjoint_keys(spark):
    build = spark.range(1000).selectExpr("id as k")
    probe = spark.range(1000, 101000).selectExpr("id as k")  # disjoint
    m_bits = ((1000 * 10 + 63) // 64) * 64
    bloom = bloom_build(build, "k", m_bits, k_hashes=2)
    survivors = bloom_prefilter(probe, bloom, "k", m_bits, k_hashes=2).count()
    # 10 bits/key, 2 hashes -> fp rate ~ (k*n/m)^k ~= 4%; allow slack
    assert survivors < 100000 * 0.10, survivors


def test_bloom_all_present_keys_survive_prefilter(spark):
    build = spark.range(500).selectExpr("id * 3 as k")
    m_bits = ((500 * 10 + 63) // 64) * 64
    bloom = bloom_build(build, "k", m_bits, k_hashes=3)
    kept = bloom_prefilter(build, bloom, "k", m_bits, k_hashes=3).count()
    assert kept == 500  # a key whose bits were set can never be dropped


def test_bloom_probe_side_not_shuffled(spark, sf_dir):
    """The prefilter must be broadcast joins only — no Exchange of the
    probe side before the word-table joins (the operator's point)."""
    from clickhouse_k_means_spark.sources.dataset import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey")
    )
    build = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey")
    )
    m_bits = 4096
    bloom = bloom_build(build, "okey", m_bits)
    plan = (
        bloom_prefilter(li, bloom, "okey", m_bits)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    # every shuffle exchange must belong to the bitmap build (keyed on
    # its word id) — none may repartition the probe side's key
    shuffles = [
        ln.strip()
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln
    ]
    assert shuffles and all("word" in ln for ln in shuffles), shuffles
    assert "hashpartitioning(okey" not in plan, plan


def test_bloom_validates_params(spark):
    df = spark.range(4).selectExpr("id as k")
    with pytest.raises(ValueError):
        bloom_build(df, "k", 63)
    with pytest.raises(ValueError):
        bloom_build(df, "k", 100)  # not a multiple of 64
    with pytest.raises(ValueError):
        bloom_build(df, "k", 128, k_hashes=0)


def test_bloom_prefilter_rejects_reserved_column_collision(spark):
    build = spark.range(10).selectExpr("id as k")
    probe = spark.range(10).selectExpr("id as k", "id as __word")
    bloom = bloom_build(build, "k", 128)
    with pytest.raises(ValueError, match="collide"):
        bloom_prefilter(probe, bloom, "k", 128)
