"""Unit tests for the pure-Column expression library (SURVEY §5.1)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from clickhouse_k_means_spark.functions import (
    cosine_similarity,
    l2_distance,
    nearest_centroid,
    nearest_centroid_struct,
    sq_l2_distance,
    token_count,
    tokens,
    word_shingles,
)
from clickhouse_k_means_spark.functions.hashing import hamming64, hash64, minhash_expr
from clickhouse_k_means_spark.functions.text import (
    char_ngrams,
    punct_ratio,
    quality_score,
    stopword_ratio,
)


def test_l2_distance(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0], [3.0, 4.0]), ([1.0, 1.0], [1.0, 1.0])], "a array<double>, b array<double>"
    )
    got = [r[0] for r in df.select(l2_distance("a", "b")).collect()]
    assert got == [5.0, 0.0]


def test_sq_l2_and_literal_side(spark):
    df = spark.createDataFrame([([1.0, 2.0, 3.0],)], "a array<double>")
    got = df.select(sq_l2_distance("a", [0.0, 0.0, 0.0])).collect()[0][0]
    assert got == 14.0


def test_cosine(spark):
    df = spark.createDataFrame([([1.0, 0.0], [0.0, 1.0]), ([2.0, 0.0], [1.0, 0.0])], "a array<double>, b array<double>")
    got = [r[0] for r in df.select(cosine_similarity("a", "b")).collect()]
    assert got[0] == 0.0 and abs(got[1] - 1.0) < 1e-12


MODEL = [(1, [0.0, 0.0]), (2, [10.0, 0.0]), (3, [0.0, 10.0])]


def test_nearest_centroid_basic(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 1.0]), (2, [9.0, 1.0]), (3, [1.0, 9.0])], "i long, Y array<double>"
    )
    got = {r["i"]: r["j"] for r in df.select("i", nearest_centroid("Y", MODEL).alias("j")).collect()}
    assert got == {1: 1, 2: 2, 3: 3}


def test_nearest_centroid_tie_lowest_j(spark):
    # point equidistant from centroids 1 and 2 → quirk Q3: lowest j wins
    df = spark.createDataFrame([(1, [5.0, 0.0])], "i long, Y array<double>")
    s = df.select(nearest_centroid_struct("Y", MODEL).alias("s")).collect()[0]["s"]
    assert s["j"] == 1 and s["dist"] == 5.0


def test_tokens_and_counts(spark):
    df = spark.createDataFrame([("Hello, World! 42",), ("",)], "t string")
    rows = df.select(tokens("t").alias("tok"), token_count("t").alias("n")).collect()
    assert rows[0]["tok"] == ["hello", "world", "42"] and rows[0]["n"] == 3
    assert rows[1]["tok"] == [] and rows[1]["n"] == 0


def test_shingles_and_ngrams(spark):
    df = spark.createDataFrame([("a b c d",)], "t string")
    sh = df.select(word_shingles("t", 3).alias("s")).collect()[0]["s"]
    assert sh == ["a b c", "b c d"]
    ng = spark.createDataFrame([("abcdef",)], "t string").select(
        char_ngrams("t", 5).alias("g")
    ).collect()[0]["g"]
    assert ng == ["abcde", "bcdef"]


def test_ratios_and_quality(spark):
    df = spark.createDataFrame([("the cat sat on the mat...",)], "t string")
    r = df.select(
        punct_ratio("t").alias("p"),
        stopword_ratio("t").alias("s"),
        quality_score("t").alias("q"),
    ).collect()[0]
    assert 0 < r["p"] < 0.2
    assert abs(r["s"] - 2 / 6) < 1e-12
    assert 0.0 <= r["q"] <= 1.0


def test_unicode_tokens_and_lang_id(spark):
    """Non-Latin scripts tokenize to real tokens and language-ID uses
    script signals — a CJK/Cyrillic doc must not fall through to the
    zero-hit 'de' tiebreak (VERDICT r2 item 5)."""
    from clickhouse_k_means_spark.functions.text import lang_id, script_char_count

    df = spark.createDataFrame(
        [
            (1, "这是一个中文文档，包含汉字。"),
            (2, "Это русский документ с кириллицей."),
            (3, "the cat and the dog sat on it for a while"),
            (4, "Τα ελληνικά είναι ωραία"),  # Greek: no candidate → falls back
        ],
        "i long, t string",
    )
    got = {
        r["i"]: (r["s"]["lang"], r["n"])
        for r in df.select(
            "i", lang_id("t").alias("s"), token_count("t").alias("n")
        ).collect()
    }
    assert got[1][0] == "zh" and got[1][1] > 0  # tokens not empty
    assert got[2][0] == "ru" and got[2][1] > 0
    assert got[3][0] == "en"
    assert got[4][0] == "de" and got[4][1] > 0  # deterministic fallback
    han = df.filter(F.col("i") == 1).select(
        script_char_count("t", "Han").alias("h")
    ).collect()[0]["h"]
    assert han == 12


def test_hash64_deterministic_and_duckdb_portable(spark):
    import duckdb

    df = spark.createDataFrame([("abc",), ("xyz",)], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", hash64("s").alias("h")).collect()}
    for s, h in got.items():
        want = duckdb.sql(
            f"select ('0x' || substring(md5('{s}'), 1, 15))::BIGINT"
        ).fetchone()[0]
        assert h == want


def test_minhash_shape_and_similarity_property(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b", "c", "d"]), (2, ["a", "b", "c", "d"]), (3, ["x", "y", "z", "w"])],
        "i long, sh array<string>",
    )
    rows = df.select("i", minhash_expr("sh", 8).alias("m")).collect()
    m = {r["i"]: r["m"] for r in rows}
    assert len(m[1]) == 8
    assert m[1] == m[2]  # identical shingle sets → identical signature
    assert m[1] != m[3]


def test_hamming64(spark):
    df = spark.createDataFrame([(0b1011, 0b0010)], "a long, b long")
    assert df.select(hamming64(F.col("a"), F.col("b"))).collect()[0][0] == 2
