"""BM25 retrieval — scored top-k document search over a corpus.

The missing member of the text-scoring family (tf-idf top terms,
unigram/bigram LM, boilerplate, KL divergence all exist in
``textstats.py``): Okapi BM25 ranking of documents against a small
set of term queries, the standard lexical-retrieval operator an LLM
data pipeline uses for decontamination lookups, RAG candidate
generation, and hard-negative mining.

Exactness contract (the repo's integer fixed-point rule): the ONLY
floating-point step is one ``ln`` per distinct query term — a ratio
of two small integers, immediately rounded half-up to integer
MICRO-nats. Everything downstream (length normalization, the tf
saturation quotient, the per-document sum, ranking) is exact BIGINT
arithmetic with floor division, so results are bit-identical across
partitionings, engines, and summation orders, and the DuckDB oracle
replays the math exactly.

Formula, integerized (k1, b carried in MILLI units):

    avgdl_milli = (total_tokens * 1000) div n_docs
    norm_milli  = 1000 - b_milli + (b_milli * dl * 1000) div avgdl_milli
    denom_milli = tf * 1000 + (k1_milli * norm_milli) div 1000
    idf_micro   = round(ln((N - df + 0.5) / (df + 0.5) + 1) * 1e6)
    term_score  = (idf_micro * tf * (k1_milli + 1000)) div denom_milli
    score_micro = Σ term_score          -- micro-nat BIGINT

``idf`` is the Lucene "+1" variant — strictly positive even for terms
in most documents, so floor division never sees a negative numerator.

Plan shape at 100 TB: the postings explode is filtered to the query
vocabulary BEFORE any shuffle (an ``isin`` literal predicate on the
exploded term — the scan stage emits only matching (doc, term) pairs,
a tiny fraction of the corpus for realistic queries). Document-length
and corpus scalars are one map-side aggregate hoisted to driver
literals; df/idf is a ≤|vocab|-row relation broadcast onto the
filtered postings; the only data-scale shuffle is the
groupBy(doc, term) tf aggregation over ALREADY-FILTERED postings,
and tf is materialized ONCE (eager localCheckpoint) because it
feeds both the idf branch and the scoring join.
Top-k per query is a WindowGroupLimit (rank pushdown), never a
global sort.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from clickhouse_k_means_spark.functions.text import tokens
from clickhouse_k_means_spark.sources.dataset import local_df

# anything the tokenizer would have split on or lowercased
_NOT_TOKEN_RE = re.compile(r"[^\w]|_", re.UNICODE)


def _tf_relation(base: DataFrame, vocab: list[str]) -> DataFrame:
    """(doc_id, dl, term, tf) for query-vocabulary terms only — the
    ``isin`` literal filter sits UNDER the tf exchange, so postings
    for non-query terms never shuffle (plan-guarded in tests)."""
    return (
        base.select("doc_id", "dl", F.explode("tk").alias("term"))
        .filter(F.col("term").isin(vocab))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )


def bm25_topk(
    docs: DataFrame,
    queries: dict[int, list[str]],
    key: str = "doc_id",
    text: str = "text",
    k1_milli: int = 1200,
    b_milli: int = 750,
    top_n: int = 5,
) -> DataFrame:
    """Top-``top_n`` documents per query by integerized Okapi BM25.

    ``queries`` maps a query id to its (already-tokenized) term list;
    duplicate terms within one query are rejected rather than
    silently double-counted (the semdedup duplicate-id lesson), and
    each term must already be in the tokenizer's normal form
    (lowercase letters/digits) — an uppercase or punctuated term can
    never equal an exploded token, so it would silently match nothing.
    Returns ``(query_id, rank, doc_id, score_micro)``; ``doc_id``
    keeps the input key's type (never cast — a non-numeric key forced
    to bigint would NULL out and merge distinct documents), ties
    broken by ascending document key so the ranking is total and
    reproducible. NULL/empty texts count toward ``n_docs`` but
    contribute zero tokens.
    """
    if not queries:
        raise ValueError("bm25_topk: queries must be non-empty")
    for qid, terms in queries.items():
        if not terms:
            raise ValueError(f"bm25_topk: query {qid} has no terms")
        if len(set(terms)) != len(terms):
            raise ValueError(f"bm25_topk: query {qid} repeats a term")
        for t in terms:
            if not t or t != t.lower() or _NOT_TOKEN_RE.search(t):
                raise ValueError(
                    f"bm25_topk: query {qid} term {t!r} is not in the "
                    "tokenizer's normal form (lowercase \\w, no "
                    "punctuation) — it can never match a token"
                )
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")

    spark = docs.sparkSession
    vocab = sorted({t for ts in queries.values() for t in ts})

    # NULL-safe token column: tokens(NULL) is NULL and size(NULL) is
    # -1 under non-ANSI confs, which would corrupt total_tokens and
    # dodge the avgdl guard — coalesce to the empty array instead
    tk = F.coalesce(tokens(text), F.array().cast("array<string>"))
    base = docs.select(
        F.col(key).alias("doc_id"),
        tk.alias("tk"),
        F.size(tk).cast("bigint").alias("dl"),
    )

    # corpus scalars: one map-side-combinable aggregate, hoisted to
    # driver literals (k-sized collect — the driver-held-model rule)
    n_docs, total_tokens = base.agg(
        F.count(F.lit(1)), F.sum("dl")
    ).first()
    if not n_docs:
        raise ValueError("bm25_topk: document corpus is empty")
    avgdl_milli = (int(total_tokens) * 1000) // int(n_docs)
    if avgdl_milli == 0:
        raise ValueError("bm25_topk: corpus has no tokens")

    # postings filtered to the query vocabulary BEFORE the tf shuffle;
    # eager localCheckpoint because tf feeds BOTH the df/idf branch and
    # the scoring join — without it Catalyst re-derives the whole
    # corpus scan + explode under each consumer, doubling the dominant
    # 100 TB cost (the unigram_lm lesson; tf is vocabulary-filtered,
    # so the materialized relation is tiny)
    tf = _tf_relation(base, vocab).localCheckpoint(eager=True)

    # df per term (≤ |vocab| rows) → idf in exact micro-nats; the one
    # ln is per DISTINCT TERM over a ratio of two small integers
    idf = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df")).select(
        "term",
        F.round(
            F.log(
                (F.lit(float(n_docs)) - F.col("df") + 0.5)
                / (F.col("df") + 0.5)
                + 1.0
            )
            * 1_000_000
        )
        .cast("bigint")
        .alias("idf_micro"),
    )

    qterms = local_df(
        spark,
        [(int(qid), t) for qid, ts in sorted(queries.items()) for t in ts],
        "query_id bigint, term string",
    )

    norm_milli = (
        F.lit(1000 - b_milli)
        + F.expr(f"(({b_milli} * dl * 1000) div {avgdl_milli})")
    )
    denom_milli = F.col("tf") * 1000 + F.expr(
        f"(({k1_milli} * __norm) div 1000)"
    )
    term_score = F.expr(
        f"((idf_micro * tf * {k1_milli + 1000}) div __denom)"
    )

    scored = (
        tf.join(F.broadcast(idf), "term")
        .join(F.broadcast(qterms), "term")
        .withColumn("__norm", norm_milli)
        .withColumn("__denom", denom_milli)
        .groupBy("query_id", "doc_id")
        .agg(F.sum(term_score).cast("bigint").alias("score_micro"))
    )

    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= top_n)
        .select("query_id", "rank", "doc_id", "score_micro")
    )


def bm25_idf_reference(n_docs: int, df: int) -> int:
    """Driver-side replay of the idf fixed-pointing (test helper)."""
    return int(
        math.floor(
            math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0) * 1_000_000 + 0.5
        )
    )


def coverage_topk(
    docs: DataFrame,
    queries: dict[int, list[str]],
    key: str = "doc_id",
    text: str = "text",
    top_n: int = 5,
) -> DataFrame:
    """Top-``top_n`` documents per query by TERM COVERAGE — distinct
    query terms present in the document (the boolean-retrieval
    baseline every hybrid stack carries beside a scored ranker). Ties
    break by ascending document length (a short doc matching the same
    terms is denser) then ascending key, so the ranking is total.
    Returns ``(query_id, rank, doc_id, n_matched)``.

    Scale shape: same anatomy as ``bm25_topk`` — the postings explode
    is vocabulary-filtered BEFORE its shuffle, per-(query, doc)
    aggregation is partial-combined, top-n is WindowGroupLimit. Terms
    must be in tokenizer normal form (the bm25 validation contract).
    """
    if not queries:
        raise ValueError("coverage_topk: queries must be non-empty")
    for qid, terms in queries.items():
        if not terms or len(set(terms)) != len(terms):
            raise ValueError(
                f"coverage_topk: query {qid} is empty or repeats a term"
            )
        for t in terms:
            if not t or t != t.lower() or _NOT_TOKEN_RE.search(t):
                raise ValueError(
                    f"coverage_topk: query {qid} term {t!r} is not in "
                    "the tokenizer's normal form"
                )
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    spark = docs.sparkSession
    vocab = sorted({t for ts in queries.values() for t in ts})
    tk = F.coalesce(tokens(text), F.array().cast("array<string>"))
    base = docs.select(
        F.col(key).alias("doc_id"),
        tk.alias("tk"),
        F.size(tk).cast("bigint").alias("dl"),
    )
    postings = base.select(
        "doc_id", "dl", F.explode(F.array_distinct("tk")).alias("term")
    ).filter(F.col("term").isin(vocab))
    qterms = local_df(
        spark,
        [(int(qid), t) for qid, ts in sorted(queries.items()) for t in ts],
        "query_id bigint, term string",
    )
    matched = (
        postings.join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_matched"),
            F.min("dl").alias("dl"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("n_matched").desc(), F.col("dl").asc(), F.col("doc_id")
    )
    return (
        matched.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= top_n)
        .select("query_id", "rank", "doc_id", "n_matched")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k_const: int = 60,
    query: str = "query_id",
    key: str = "doc_id",
    rank: str = "rank",
    top_n: int = 10,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Buettcher 2009) over
    any number of per-query rankings — the standard hybrid-retrieval
    combiner (BM25 + ANN, lexical + coverage, ...): each list
    contributes ``1/(k_const + rank)`` per document and the fused
    order is by summed contribution. RRF needs only RANKS, so wildly
    different score scales (micro-nat BM25 vs cosine ppm) fuse
    without calibration — exactly why hybrid stacks use it.

    Contributions are integerized to parts-per-billion
    (``1e9 // (k_const + rank)`` — exact integer division, associative
    BIGINT sums) so the fused scores are bit-deterministic and
    oracle-replayable, the repo-wide fixed-point rule. Ties break by
    ascending key. Returns
    ``(query_id, rank, doc_id, rrf_ppb, n_lists)`` with ``n_lists``
    the number of input rankings that contained the pair.

    Input contract, ENFORCED in-plan (ADVICE r10 — both hazards were
    silent): every rank must be non-null and >= 1 (a NULL or
    non-positive rank — notably ``rank == -k_const``, a division by
    zero under non-ANSI confs — yielded a NULL contribution silently
    dropped from the sum), and each ranking must contain a
    (query, doc) pair at most once (a within-list duplicate
    double-counted the contribution and inflated ``n_lists``). Either
    violation raises at execution rather than mis-ranking.

    Scale shape: one union of rank-truncated inputs (each already
    top-n-sized per query), one partial-combined aggregation, top-n
    via WindowGroupLimit — no join between the rankings. The
    validation is a row-local ``when``/``raise_error`` plus one
    count-distinct inside the existing aggregation — no extra job,
    no extra shuffle.
    """
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    if k_const < 1 or top_n < 1:
        raise ValueError(
            f"rrf_fuse: k_const/top_n must be >= 1: {k_const}/{top_n}"
        )
    # rank handled as a Column (never interpolated into SQL text —
    # ADVICE r10: a name needing backticks failed to parse), validated
    # row-locally, then the exact bigint floor-div on the validated
    # value; k_const is a checked int literal
    checked_rank = (
        F.when(
            F.col(rank).isNull() | (F.col(rank) < 1),
            F.raise_error(
                F.lit(
                    "rrf_fuse: rank must be non-null and >= 1 "
                    f"(column {rank!r})"
                )
            ).cast("bigint"),
        )
        .otherwise(F.col(rank).cast("bigint"))
    )
    parts = [
        r.select(
            F.col(query).alias("query_id"),
            F.col(key).alias("doc_id"),
            F.lit(i).alias("__list"),
            checked_rank.alias("__rank"),
        ).select(
            "query_id",
            "doc_id",
            "__list",
            F.expr(f"(1000000000 div ({k_const} + __rank))")
            .cast("bigint")
            .alias("contrib_ppb"),
        )
        for i, r in enumerate(rankings)
    ]
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    # per-list (query, doc) uniqueness rides the existing aggregation:
    # if any list repeated a pair, rows-per-pair exceeds distinct
    # lists-per-pair — fail loudly instead of double-counting
    fused = unioned.groupBy("query_id", "doc_id").agg(
        F.sum("contrib_ppb").cast("bigint").alias("rrf_ppb"),
        F.count(F.lit(1)).cast("bigint").alias("__n_rows"),
        F.count_distinct("__list").cast("bigint").alias("__n_lists"),
    ).select(
        "query_id",
        "doc_id",
        "rrf_ppb",
        F.when(
            F.col("__n_rows") != F.col("__n_lists"),
            F.raise_error(
                F.lit(
                    "rrf_fuse: a ranking contains a (query, doc) pair "
                    "more than once — contributions would double-count"
                )
            ).cast("bigint"),
        )
        .otherwise(F.col("__n_lists"))
        .alias("n_lists"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_ppb").desc(), F.col("doc_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= top_n)
        .select("query_id", "rank", "doc_id", "rrf_ppb", "n_lists")
    )
