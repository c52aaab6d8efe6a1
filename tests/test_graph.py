"""PageRank invariants (operators/graph.py)."""

from __future__ import annotations

import pytest

from clickhouse_k_means_spark.operators.graph import (
    ONE,
    co_occurrence_edges,
    pagerank,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src bigint, dst bigint")


def test_pagerank_regular_graph_is_fixed_point(spark):
    # symmetric 2-cycle: every node has equal in/out degree -> uniform
    # rank ONE is a fixed point of the integer recurrence
    e = _edges(spark, [(1, 2), (2, 1)])
    out = {r.node: r.rank_micro for r in pagerank(e, iters=4).collect()}
    assert out == {1: ONE, 2: ONE}


def test_pagerank_star_hand_computed(spark):
    # star a=1 center, leaves 2,3 (symmetric edges): two exact
    # hand-derived iterations of the micro-unit recurrence
    e = _edges(spark, [(1, 2), (2, 1), (1, 3), (3, 1)])
    it1 = {r.node: r.rank_micro for r in pagerank(e, iters=1).collect()}
    assert it1 == {1: 1_850_000, 2: 575_000, 3: 575_000}
    it2 = {r.node: r.rank_micro for r in pagerank(e, iters=2).collect()}
    assert it2 == {1: 1_127_500, 2: 936_250, 3: 936_250}


def test_pagerank_hub_outranks_leaves(spark, sf_dir):
    from clickhouse_k_means_spark.sources.dataset import load_table

    li = load_table(spark, sf_dir, "lineitem")
    edges = co_occurrence_edges(li, group="l_orderkey", node="l_suppkey")
    ranks = pagerank(edges, iters=3)
    deg = edges.groupBy("src").count()
    joined = ranks.join(deg, ranks.node == deg.src).collect()
    top = max(joined, key=lambda r: r.rank_micro)
    bottom = min(joined, key=lambda r: r.rank_micro)
    assert top["count"] >= bottom["count"]


def test_pagerank_partition_invariant(spark):
    e = _edges(
        spark,
        [(a, b) for a in range(1, 7) for b in range(1, 7) if a != b and a % b != 0],
    )
    sym = e.union(e.selectExpr("dst as src", "src as dst")).distinct()
    one = sorted(map(tuple, pagerank(sym, iters=3).collect()))
    two = sorted(map(tuple, pagerank(sym.repartition(11), iters=3).collect()))
    assert one == two


def test_pagerank_validates_params(spark):
    e = _edges(spark, [(1, 2)])
    with pytest.raises(ValueError):
        pagerank(e, iters=0)
    with pytest.raises(ValueError):
        pagerank(e, damping_ppm=0)
    with pytest.raises(ValueError):
        pagerank(e, damping_ppm=1_000_000)


def test_co_occurrence_edges_symmetric_no_self_loops(spark):
    df = spark.createDataFrame(
        [(10, 1), (10, 2), (10, 2), (11, 2), (11, 3), (12, 9)],
        "g bigint, s bigint",
    )
    pairs = {(r.src, r.dst) for r in co_occurrence_edges(df, "g", "s").collect()}
    assert pairs == {(1, 2), (2, 1), (2, 3), (3, 2)}


def test_triangle_count_hand_computed(spark):
    from clickhouse_k_means_spark.operators.graph import triangle_count

    def run(pairs):
        df = spark.createDataFrame(pairs, "src bigint, dst bigint")
        return triangle_count(df).collect()[0]

    # one triangle, given with duplicate + reversed edges
    r = run([(1, 2), (2, 1), (2, 3), (1, 3), (1, 3)])
    assert (r["n_vertices"], r["n_edges"], r["n_triangles"]) == (3, 3, 1)
    # square: 4 edges, no triangle
    r = run([(1, 2), (2, 3), (3, 4), (4, 1)])
    assert r["n_triangles"] == 0
    # K4: every 3-subset closes → 4 triangles
    r = run([(a, b) for a in range(1, 5) for b in range(1, 5) if a < b])
    assert (r["n_edges"], r["n_triangles"]) == (6, 4)
    # star hub: many wedges, zero closures (the orientation stress)
    r = run([(0, i) for i in range(1, 20)])
    assert (r["n_vertices"], r["n_triangles"]) == (20, 0)
    # self-loops ignored
    r = run([(1, 1), (1, 2), (2, 3), (1, 3)])
    assert r["n_triangles"] == 1
