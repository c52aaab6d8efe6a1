"""Prefix-filtered set-similarity join invariants (operators/ssjoin.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_k_means_spark.functions.text import tokens
from clickhouse_k_means_spark.operators.ssjoin import (
    PPM,
    similarity_self_join,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_ssjoin_hand_computed_jaccard(spark):
    df = _docs(
        spark,
        [
            (1, "red green blue yellow"),
            (2, "red green blue purple"),  # |i|=3 |u|=5 -> 0.6
            (3, "red green"),              # vs 1: 2/4 = 0.5
            (4, "totally different words"),
        ],
    )
    out = {(r.a, r.b): r.jacc_ppm for r in
           similarity_self_join(df, threshold_ppm=600_000).collect()}
    assert out == {(1, 2): 600_000}  # the >= edge pair is KEPT


def test_ssjoin_complete_vs_brute_force(spark):
    """Completeness: the prefix-filtered result equals a brute-force
    all-pairs Jaccard on a corpus with overlapping vocab."""
    rows = [
        (i, " ".join(f"w{j}" for j in range(i % 7, i % 7 + 5 + i % 3)))
        for i in range(1, 40)
    ]
    df = _docs(spark, rows)
    t = 700_000
    got = {(r.a, r.b) for r in similarity_self_join(df, t).collect()}

    sets = df.select(
        "doc_id", F.array_distinct(tokens("text")).alias("ts")
    ).filter(F.size("ts") > 0)
    a, b = sets.alias("a"), sets.alias("b")
    brute = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("x"),
            F.col("b.doc_id").alias("y"),
            F.size(F.array_intersect("a.ts", "b.ts")).alias("i"),
            (F.size("a.ts") + F.size("b.ts")).alias("ab"),
        )
        .filter(F.col("i") * PPM >= t * (F.col("ab") - F.col("i")))
    )
    want = {(r.x, r.y) for r in brute.collect()}
    assert got == want and want  # non-vacuous


def test_ssjoin_identical_docs_and_empty_docs(spark):
    df = _docs(spark, [(1, "a b c"), (2, "a b c"), (3, ""), (4, "  !! ")])
    out = similarity_self_join(df, threshold_ppm=1_000_000).collect()
    assert [(r.a, r.b, r.jacc_ppm) for r in out] == [(1, 2, 1_000_000)]


def test_ssjoin_validates_threshold(spark):
    df = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError):
        similarity_self_join(df, threshold_ppm=0)
    with pytest.raises(ValueError):
        similarity_self_join(df, threshold_ppm=PPM + 1)


def test_position_filter_prunes_without_losing_pairs(spark, sf_dir):
    """PPJoin positional pruning (VERDICT r5 item 7): same final pairs,
    strictly fewer candidate rows entering the verify join on a real
    corpus slice."""
    from clickhouse_k_means_spark.operators.ssjoin import (
        _candidate_pairs,
        _ordered_sets,
    )

    ordered = _ordered_sets(
        spark.read.parquet(f"{sf_dir}/documents.parquet").limit(400),
        "doc_id",
        "text",
    )
    t = 600_000
    with_pos = _candidate_pairs(ordered, t, position_filter=True)
    without = _candidate_pairs(ordered, t, position_filter=False)
    n_with, n_without = with_pos.count(), without.count()
    assert n_with < n_without, (n_with, n_without)
    # soundness: pruned candidates are all below-threshold pairs
    kept = {(r.ka, r.kb) for r in with_pos.collect()}
    verify = (
        without.join(ordered.select(F.col("k").alias("ka"), F.col("ts").alias("ta")), "ka")
        .join(ordered.select(F.col("k").alias("kb"), F.col("ts").alias("tb")), "kb")
        .select(
            "ka", "kb",
            F.size(F.array_intersect("ta", "tb")).cast("bigint").alias("i"),
            (F.size("ta") + F.size("tb")).cast("bigint").alias("ab"),
        )
        .filter(F.col("i") * PPM >= t * (F.col("ab") - F.col("i")))
    )
    true_pairs = {(r.ka, r.kb) for r in verify.collect()}
    assert true_pairs <= kept
