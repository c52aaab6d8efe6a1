"""Chunking + inverted-index invariants (operators/chunking.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_k_means_spark.functions.text import tokens
from clickhouse_k_means_spark.operators.chunking import (
    chunk_documents,
    inverted_index,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_chunk_covers_all_tokens_with_exact_overlap(spark):
    # 10 tokens, budget 4, overlap 1 -> stride 3 -> chunks start at
    # token 0, 3, 6; the start-6 chunk ends at token 9, covering the
    # doc exactly -> 3 full chunks, no short tail
    text = " ".join(f"t{i}" for i in range(10))
    out = (
        chunk_documents(_docs(spark, [(1, text)]), budget=4, overlap=1)
        .orderBy("chunk_id")
        .collect()
    )
    assert [r.chunk_id for r in out] == [0, 1, 2]
    assert [r.n_tok for r in out] == [4, 4, 4]


def test_chunk_short_and_exact_budget_docs_get_one_chunk(spark):
    out = chunk_documents(
        _docs(spark, [(1, "a b c"), (2, " ".join("x" * 1 for _ in range(8)))]),
        budget=8,
        overlap=2,
    ).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.doc_id, []).append(r)
    assert len(by_id[1]) == 1 and by_id[1][0].n_tok == 3
    assert len(by_id[2]) == 1 and by_id[2][0].n_tok == 8


def test_chunk_empty_doc_produces_no_rows(spark):
    assert (
        chunk_documents(_docs(spark, [(1, ""), (2, "   !!! ")]), 8, 2).count()
        == 0
    )


def test_chunk_boundary_one_past_budget(spark):
    # n = budget + 1 must yield exactly 2 chunks (regression guard on
    # the integral ceil arithmetic)
    text = " ".join(f"t{i}" for i in range(9))
    out = chunk_documents(_docs(spark, [(1, text)]), budget=8, overlap=4).collect()
    assert sorted(r.chunk_id for r in out) == [0, 1]
    # second chunk starts at stride=4: tokens t4..t8 -> 5 tokens
    assert sorted(r.n_tok for r in out) == [5, 8]


def test_chunk_validates_params(spark):
    d = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError):
        chunk_documents(d, budget=0, overlap=0)
    with pytest.raises(ValueError):
        chunk_documents(d, budget=8, overlap=8)
    with pytest.raises(ValueError):
        chunk_documents(d, budget=8, overlap=-1)


def test_chunk_plan_is_map_only(spark, sf_dir):
    """The chunking plan must contain no shuffle: scan -> generate ->
    project only (its 100 TB story is embarrassing parallelism)."""
    from clickhouse_k_means_spark.sources.dataset import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_inverted_index_counts_tiny_corpus(spark):
    df = _docs(
        spark,
        [(1, "apple banana apple"), (2, "banana cherry"), (4, "banana")],
    )
    rows = {r.term: r for r in inverted_index(df, min_df=1).collect()}
    assert rows["apple"].df == 1 and rows["apple"].total_tf == 2
    assert rows["banana"].df == 3 and rows["banana"].total_tf == 3
    assert rows["banana"].postings_sum == 7
    assert rows["cherry"].df == 1
    # min_df prunes rare terms
    kept = {r.term for r in inverted_index(df, min_df=2).collect()}
    assert kept == {"banana"}
    with pytest.raises(ValueError):
        inverted_index(df, min_df=0)


def test_chunks_reassemble_to_document(spark):
    """Non-overlapped prefixes of consecutive chunks re-concatenate to
    the tokenized document (chunk boundaries lose nothing)."""
    text = " ".join(f"w{i}" for i in range(23))
    df = _docs(spark, [(7, text)])
    budget, overlap = 6, 2
    stride = budget - overlap
    chunks = (
        df.select(tokens("text").alias("tk"))
        .select(
            F.expr(
                f"transform(sequence(0, int(ceil((size(tk) - {budget}) / {stride}))"
                f" * int(size(tk) > {budget})), "
                f"i -> slice(tk, i * {stride} + 1, {budget}))"
            ).alias("chs")
        )
        .collect()[0]
        .chs
    )
    rebuilt = list(chunks[0])
    for ch in chunks[1:]:
        rebuilt.extend(ch[overlap:])
    assert rebuilt == [f"w{i}" for i in range(23)]
    # and the operator's chunk count matches the closed form
    n_ops = chunk_documents(df, budget=budget, overlap=overlap).count()
    assert n_ops == len(chunks)


def test_bigram_lm_scores_word_salad_higher(spark):
    """Docs reusing the corpus's common bigrams score lower than a doc
    of the same tokens in unseen order (the fluency property that
    motivates a bigram LM over a unigram one)."""
    from clickhouse_k_means_spark.operators.textstats import bigram_lm_scores

    fluent = "the cat sat on the mat"
    rows = [(i, fluent) for i in range(1, 9)]
    rows.append((9, "mat the on sat cat the"))  # same tokens, shuffled
    rows.append((10, "x"))  # single token: no bigrams
    rows.append((11, ""))  # empty
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in bigram_lm_scores(df).collect()}
    assert out[1].n_big == 5 and out[9].n_big == 5
    # every doc-1 bigram occurs 8x in the corpus; doc-9's occur once
    assert out[9].nll_micro > out[1].nll_micro
    assert out[10].n_big == 0 and out[10].nll_micro == 0
    assert out[11].n_big == 0 and out[11].nll_micro == 0


def test_bigram_lm_partition_invariant(spark, sf_dir):
    """Micro-nat fixed-pointing before aggregation: repartitioning the
    input cannot move any per-doc score."""
    from clickhouse_k_means_spark.operators.textstats import bigram_lm_scores
    from clickhouse_k_means_spark.sources.dataset import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = {r.doc_id: (r.n_big, r.nll_micro) for r in bigram_lm_scores(docs).collect()}
    b = {
        r.doc_id: (r.n_big, r.nll_micro)
        for r in bigram_lm_scores(docs.repartition(13)).collect()
    }
    assert a == b
