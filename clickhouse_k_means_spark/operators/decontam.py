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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clickhouse_k_means_spark.functions.text import tokens


def doc_shingles(df: DataFrame, key: str, text: str, n: int) -> DataFrame:
    """(key, sh): DISTINCT n-gram shingles per document — codegen shape.

    The HOF form (``transform(sequence(...), i -> concat_ws(slice(tok,
    i+1, n)))``) evaluates interpreted, and because the lambda embeds
    the full tokenization expression it can re-derive lower/regexp/split
    work per shingle — O(doc_len · n_shingles) per document (this was
    the slowest bench query in round 4 at 7.7 s). Here tokens are
    staged ONCE, posexploded to (key, pos, token) rows, and each
    shingle is `concat_ws(token, lead(token,1) … lead(token,n-1))` over
    a per-document window — plain JVM window + string concat. The only
    corpus shuffle keys on the unique document key (skew-free), and the
    per-doc dedup reuses that partitioning (no second exchange: hash
    partitioning on ``key`` satisfies clustering on (key, sh)).

    Documents shorter than ``n`` tokens contribute their whole
    normalized text as one shingle (the ``word_shingles`` convention).
    """
    tok = df.select(F.col(key), tokens(text).alias("__tok"))
    short = (
        tok.filter(F.size("__tok") < n)
        .select(F.col(key), F.concat_ws(" ", "__tok").alias("sh"))
        .filter(F.col("sh") != "")
    )
    w = Window.partitionBy(key).orderBy("__pos")
    parts = [F.col("__t")] + [F.lead("__t", i).over(w) for i in range(1, n)]
    long = (
        tok.filter(F.size("__tok") >= n)
        .select(F.col(key), F.posexplode("__tok").alias("__pos", "__t"))
        # concat_ws skips nulls, so tail positions (fewer than n tokens
        # left) would emit short shingles — keep only full windows
        .select(
            F.col(key),
            F.concat_ws(" ", *parts).alias("sh"),
            parts[-1].isNotNull().alias("__full"),
        )
        .filter("__full")
        .drop("__full")
    )
    return long.dropDuplicates([key, "sh"]).unionByName(short)


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
    d = doc_shingles(docs, doc_id, text, n)
    # benchmark side goes through the same codegen shingle stage (a
    # synthetic row id stands in for the doc key — dropped after the
    # global distinct), keeping the whole plan HOF-free
    b = (
        doc_shingles(
            benchmark.select(
                F.monotonically_increasing_id().alias("__bid"),
                F.col(bench_text).alias("__btext"),
            ),
            "__bid",
            "__btext",
            n,
        )
        .select("sh")
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
