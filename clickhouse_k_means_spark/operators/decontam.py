"""Benchmark decontamination — n-gram overlap vs an evaluation set.

The standard training-data hygiene pass (GPT-3 appendix C / The Pile
§6.2 use 13-gram collision checks; n is a knob here): a training
document is CONTAMINATED if it shares at least ``min_hits`` distinct
word n-grams with any document of a benchmark/eval set. The reference
engine has no such operator; this extends the engine's text surface
(functions/text.py shingles) the same way dedup does.

Scale shape (100 TB corpus, benchmark sets are small by nature):
- corpus side: one NARROW pass — normalize, shingle
  (``transform(sequence(...))``, no explode until after dedup within
  the doc), explode to (doc_id, shingle) rows.
- benchmark side: distinct shingles of the (small) eval set —
  broadcast to every executor; the probe join is a broadcast hash
  join, no shuffle of the corpus by shingle.
- the only corpus shuffle keys on ``doc_id`` (unique — skew-free) to
  count per-doc totals and overlaps.
- nothing driver-side; output is one row per corpus doc.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from clickhouse_k_means_spark.functions.text import word_shingles


def _doc_shingles(df: DataFrame, key: str, text: str, n: int) -> DataFrame:
    """(key, sh): DISTINCT n-gram shingles per document."""
    return df.select(
        F.col(key), F.explode(F.array_distinct(word_shingles(text, n))).alias("sh")
    ).filter(F.col("sh") != "")


def ngram_overlap(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_hits: int = 1,
    doc_id: str = "doc_id",
    text: str = "text",
    bench_text: str = "text",
) -> DataFrame:
    """Per-doc contamination report vs ``benchmark``.

    Returns (doc_id, n_ngrams, n_overlap, contaminated): the count of
    the doc's distinct word n-grams, how many of them appear anywhere
    in the benchmark set, and the ``n_overlap >= min_hits`` flag.
    Documents shorter than ``n`` tokens contribute their whole
    normalized text as one shingle (the ``word_shingles`` convention —
    exact short-text matches still count).
    """
    d = _doc_shingles(docs, doc_id, text, n)
    b = (
        benchmark.select(
            F.explode(F.array_distinct(word_shingles(bench_text, n))).alias("sh")
        )
        .filter(F.col("sh") != "")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    # ONE corpus shingle pass: left broadcast join marks hits, a single
    # doc_id aggregation counts totals and overlaps together (the
    # two-pass per_doc/hits form re-shingled the corpus twice — 2x the
    # dominant cost at bench scale)
    marked = d.join(F.broadcast(b), "sh", "left")
    n_overlap = F.sum(F.coalesce("__hit", F.lit(0)))
    return marked.groupBy(doc_id).agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        n_overlap.cast("bigint").alias("n_overlap"),
        F.when(n_overlap >= min_hits, 1).otherwise(0).cast("int").alias(
            "contaminated"
        ),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_hits: int = 1,
    doc_id: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """The filter form: corpus docs with contaminated rows removed
    (anti-join on the flagged ids — the shape a pipeline composes)."""
    flagged = ngram_overlap(
        docs, benchmark, n=n, min_hits=min_hits, doc_id=doc_id, text=text
    ).filter(F.col("contaminated") == 1).select(doc_id)
    return docs.join(flagged, doc_id, "left_anti")
