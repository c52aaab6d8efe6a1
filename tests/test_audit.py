"""Plan-audit library (plans/audit.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_k_means_spark.plans.audit import assert_scales, audit_plan


def test_audit_counts_shuffles_and_broadcasts(spark, sf_dir):
    from clickhouse_k_means_spark.sources.dataset import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    agg = (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    r = audit_plan(agg)
    assert r["n_broadcasts"] >= 1
    assert r["n_shuffles"] >= 1  # the groupBy exchange
    assert not r["has_cartesian"]
    assert any("o_orderpriority" in k for k in r["shuffle_keys"])


def test_audit_flags_cartesian_and_single_partition(spark):
    a = spark.range(10)
    b = spark.range(10).withColumnRenamed("id", "id2")
    cart = a.crossJoin(b)
    assert audit_plan(cart)["has_cartesian"]
    with pytest.raises(AssertionError, match="cartesian"):
        assert_scales(cart)

    from pyspark.sql import Window

    w = Window.orderBy("id")  # global order -> SinglePartition
    funnel = a.withColumn("rn", F.row_number().over(w))
    assert audit_plan(funnel)["single_partition"]
    with pytest.raises(AssertionError, match="SinglePartition"):
        assert_scales(funnel)
    assert_scales(funnel, allow_single_partition=True)  # explicit opt-in


def test_audit_sees_pushdown_and_pruning(spark, sf_dir):
    from clickhouse_k_means_spark.sources.dataset import load_table

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") > 30
    ).select("l_orderkey")
    r = audit_plan(li)
    assert any("l_quantity" in p for p in r["pushed_filters"])
    assert r["read_schemas"] and all(
        "l_extendedprice" not in s for s in r["read_schemas"]
    )


def test_audit_clean_plans_pass(spark, sf_dir):
    """The engine's own flagship operators pass the scale audit."""
    import __spark_entry__ as entry

    for key in ("nearest_assign", "chunk_docs", "dedup_exact", "tpch_q1"):
        assert_scales(entry.queries()[key](spark, sf_dir))


def test_audit_scalar_aggregate_not_flagged_as_funnel(spark, sf_dir):
    """A global count/sum plans an Exchange SinglePartition feeding
    the final aggregate — one partial row per partition, benign. Only
    Sort/Window consumers are funnels."""
    from clickhouse_k_means_spark.operators.skew import skew_report
    from clickhouse_k_means_spark.sources.dataset import load_table

    li = load_table(spark, sf_dir, "lineitem")
    assert not audit_plan(li.agg(F.count(F.lit(1))))["single_partition"]
    # skew_report ends in a 1-row stats aggregate — must pass
    assert_scales(skew_report(li, "l_suppkey"))


def test_audit_detects_interpreted_filter_hof(spark):
    df = spark.range(5).select(
        F.expr("filter(sequence(1, id + 1), x -> x % 2 = 0)").alias("evens")
    )
    assert "filter" in audit_plan(df)["interpreted_hofs"]


def test_audit_funnel_detected_under_codegen_consumer():
    """A whole-stage-codegen consumer ('*(n) Sort') sits textually
    5 columns right of where the bare operator would, which the old
    first-letter depth heuristic read as deeper-than-the-exchange and
    skipped (ADVICE r5). Depth now comes from the tree-prefix width
    with the codegen marker stripped."""
    from clickhouse_k_means_spark.plans.audit import (
        _single_partition_funnel,
    )

    codegen_sort = (
        "*(2) Sort [a ASC NULLS FIRST], true, 0\n"
        "+- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=5]\n"
        "   +- *(1) Project [a]\n"
    )
    assert _single_partition_funnel(codegen_sort) is True
    nested = (
        "Project [a]\n"
        "+- *(3) Sort [a ASC NULLS FIRST], true, 0\n"
        "   +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=9]\n"
        "      +- Scan parquet [a]\n"
    )
    assert _single_partition_funnel(nested) is True
    benign_agg = (
        "*(2) HashAggregate(keys=[], functions=[sum(x)])\n"
        "+- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=3]\n"
        "   +- *(1) HashAggregate(keys=[], functions=[partial_sum(x)])\n"
    )
    assert _single_partition_funnel(benign_agg) is False


def test_new_r6_queries_scale_audit(spark, sf_dir):
    """The r6 additions pass the structural scale audit: no funnels,
    no accidental cartesians, pushdown where expected, and LTTB's
    shuffles all keyed by the series key."""
    import __spark_entry__ as entry

    qs = entry.queries()
    # fully-clean plans: full audit (cartesian + funnel)
    for key in (
        "tpch_q6", "tpch_q12a", "lttb", "map_agg",
        "audience_overlap", "array_funcs", "array_set_ops",
        "anomaly_zscore",
    ):
        assert_scales(qs[key](spark, sf_dir))
    # these join a ONE-ROW broadcast aggregate (scalar threshold /
    # as-of), which plans a BroadcastNestedLoopJoin by construction —
    # benign at any scale; still must not funnel
    for key in (
        "tpch_q15", "tpch_q17", "tpch_q22a", "topk_heavy", "ema_decay",
        "weighted_quantiles", "triangles",
    ):
        assert not audit_plan(qs[key](spark, sf_dir))["single_partition"]
    # Q6: predicates reach the scan, projection pruned to 3 columns
    r = audit_plan(qs["tpch_q6"](spark, sf_dir))
    assert any("l_shipdate" in p for p in r["pushed_filters"])
    assert all("l_orderkey" not in s for s in r["read_schemas"])
    # LTTB: every exchange keyed by the series key — embarrassingly
    # parallel over series at any corpus size
    r = audit_plan(qs["lttb"](spark, sf_dir))
    assert r["shuffle_keys"] and all(
        "user_id" in k for k in r["shuffle_keys"]
    )


# Builders that EXECUTE jobs at construction (stateful commits,
# streaming replays, iterative fits) — their plan shapes are guarded
# by their own dedicated tests; sweeping them here would re-run
# minutes of state machinery for no new signal.
_SWEEP_SKIP = (
    "incremental", "stream", "kmeans", "resume_fit", "scd2",
    "snapshot", "multimodal", "doc_clusters", "silhouette",
    "pq_ann", "ivf_ann", "srp_ann", "embed_neardup", "pagerank",
    "dedup", "near_dedup", "ssjoin", "bucketed", "formats",
    "orc", "histogram", "hll", "fit", "lloyd", "kmeanspp",
    "elbow", "nearest",
    # r13 lifecycle queries whose returned frame is a LITERAL result
    # row (the whole churn/probe sequence executes at construction) —
    # zero plan signal here, guarded by their dedicated tests
    "ann_compaction", "ann_recall",
)

# ONE-ROW (or literal-probe) broadcast joins: Spark plans a
# BroadcastNestedLoopJoin for a join with no equi-key; with a
# scalar/probe-sized build side that is benign at any scale. Every
# entry here must be exactly that pattern — a data-scale nested loop
# is a bug and must NOT be added to this list.
_SCALAR_BNLJ_OK = {
    "ann_topk", "bigram_lm", "chi_square", "domain_kl", "ema_decay",
    "fuzzy_match", "ngram_sim", "tfidf_top_terms", "topk_heavy",
    "topk_weighted", "tpch_q22a", "triangles", "unigram_lm",
    "weighted_quantiles",
    # knn_join's cross join is its RECALL GATE: the deterministic 1%
    # sample brute-forced against the corpus — sample-bounded by
    # construction, and the gated operator itself is bucket-joined
    "knn_join",
    # same recall-gate pattern (r9): the brute-force side is the
    # bounded query/sample set; the gated operators are cell+bucket
    # joined (knn_join_partitioned) / cell-probed (ivf_index_query)
    "knn_join_partitioned", "ivf_index_query",
    # same recall-gate pattern (r10): brute side is the 3-query drift
    # probe set; the gated path is the refit index's cell probe
    "ivf_maintenance",
    # same recall-gate pattern (r10): brute side is the 5-query set;
    # the gated path is the committed-code ADC scan + shortlist rerank
    "pq_index_query",
    # same recall-gate pattern (r11): brute side is the 3-query drift
    # probe set (pq_maintenance) / the 5-query set (ivfpq); the gated
    # paths are the refit ADC scan and the probe-masked IVFPQ scan
    "pq_maintenance", "ivfpq_index_query", "ivfpq_maintenance",
    # same recall-gate pattern (r13): brute side is the 5-query set
    # against the FILTERED corpus; the gated path is the
    # predicate-pushed adaptively-widened IVFPQ scan
    "ann_filtered_query",
}

# Documented SinglePartition funnels: cumulative_uniques runs its
# ordered cumsum over the BOUNDED first-seen-day table (≤ corpus
# day-count rows), the explicitly-allowed exception class.
_SP_FUNNEL_OK = {"cumulative_uniques"}


def test_registry_wide_plan_sweep(spark, sf_dir):
    """Blanket structural audit: EVERY plan-only registry query must
    be free of cartesian joins and SinglePartition funnels except the
    explicitly documented scalar-broadcast / bounded-table cases.
    A new query that accidentally plans a data-scale nested loop or
    a global-sort funnel fails here by default."""
    import __spark_entry__ as entry

    bad = []
    for name, fn in entry.queries().items():
        if any(x in name for x in _SWEEP_SKIP):
            continue
        r = audit_plan(fn(spark, sf_dir))
        if r["has_cartesian"] and name not in _SCALAR_BNLJ_OK:
            bad.append((name, "cartesian/nested-loop"))
        if r["single_partition"] and name not in _SP_FUNNEL_OK:
            bad.append((name, "SinglePartition funnel"))
    assert not bad, bad
