"""Deduplication family for the LLM-data-pipeline surface.

Exact, MinHash-LSH, SimHash, and n-gram-Jaccard dedup over a documents
table — all pure Column expressions (md5-derived hashes, higher-order
array functions), no Python UDFs, so a 100 TB dedup run is a codegen'd
scan + one hash-shuffle per self-join.

Scale design:
- Exact dedup: groupBy(hash) — one shuffle keyed by a 128-bit digest;
  skew-free by construction (hashes are uniform).
- MinHash-LSH: signatures are computed in a single narrow pass; the
  candidate-pair join shuffles on (band_idx, band_key) — bucket sizes
  are the classic LSH knob (n_bands × rows_per_band trades recall vs
  bucket size). Only same-bucket pairs are ever materialized, never the
  O(n²) cross join.
- SimHash: one 64-bit value per doc; near-dup = hamming ≤ t. The pair
  search again goes through LSH-style banding of the packed bits.
- The reference has no dedup operators; this extends its distance/
  top-k/aggregation core (SURVEY §7.8) to the pretraining-data use.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from clickhouse_k_means_spark.functions.hashing import hash64, md5_hex
from clickhouse_k_means_spark.functions.text import word_shingles


def exact_dedup(
    df: DataFrame, text: str = "text", key: str = "doc_id"
) -> DataFrame:
    """Tag each row with its content hash and a keep-first flag.

    keep=1 for the lowest ``key`` per distinct md5(text) — the exact
    (hash-groupBy) dedup policy. One shuffle on the digest.
    """
    w = Window.partitionBy("text_hash").orderBy(F.col(key).asc())
    return (
        df.select(F.col(key), md5_hex(text).alias("text_hash"))
        .withColumn(
            "keep", F.when(F.row_number().over(w) == 1, F.lit(1)).otherwise(F.lit(0))
        )
    )


def minhash_signatures(
    df: DataFrame,
    text: str = "text",
    key: str = "doc_id",
    n_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """(key, s0..s{n-1}) MinHash signature columns over word shingles.

    One narrow pass: shingle → n_hashes seeded 60-bit min-hashes
    (functions/hashing.py), each signature element its own BIGINT
    column so downstream banding/joins stay columnar.
    """
    from clickhouse_k_means_spark.functions.hashing import _salted

    sh = word_shingles(text, n=shingle_n)
    return df.select(
        F.col(key),
        *[
            F.array_min(F.transform(sh, _salted(i))).alias(f"s{i}")
            for i in range(n_hashes)
        ],
    )


def lsh_candidate_pairs(
    sigs: DataFrame, key: str = "doc_id", n_hashes: int = 8, n_bands: int = 4
) -> DataFrame:
    """Candidate near-dup pairs (a < b) sharing at least one LSH band.

    Bands are contiguous signature slices; band key = md5 of the joined
    values. The self-join shuffles on (band, band_key) only — same-
    bucket pairs, not all pairs. Output is distinct (a, b).
    """
    rows_per_band = n_hashes // n_bands
    bands = [
        F.md5(
            F.concat_ws(",", *[F.col(f"s{b * rows_per_band + r}") for r in range(rows_per_band)])
        ).alias(f"band{b}")
        for b in range(n_bands)
    ]
    banded = sigs.select(F.col(key), *bands)
    pairs = None
    for b in range(n_bands):
        left = banded.select(F.col(key).alias("a"), F.col(f"band{b}").alias("bk"))
        right = banded.select(F.col(key).alias("b"), F.col(f"band{b}").alias("bk"))
        p = left.join(right, "bk").filter(F.col("a") < F.col("b")).select("a", "b")
        pairs = p if pairs is None else pairs.unionByName(p)
    return pairs.distinct()


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text: str = "text",
    key: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard for given candidate pairs (a, b).

    Joins the distinct shingle sets in twice (broadcast if small),
    ``|A ∩ B| / |A ∪ B|`` via array_intersect/array_union sizes.
    """
    sets_df = df.select(
        F.col(key), F.array_distinct(word_shingles(text, n=shingle_n)).alias("sh")
    )
    a = sets_df.select(F.col(key).alias("a"), F.col("sh").alias("sh_a"))
    b = sets_df.select(F.col(key).alias("b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.join(a, "a")
        .join(b, "b")
        .select(
            "a",
            "b",
            (inter.cast("double") / union).alias("jaccard"),
        )
    )
