"""Connected-components hardening: deep graphs must either converge or
fail loudly (ADVICE r2: propagation silently returned split labels when
max_iter was exhausted), and the large-star/small-star scale path must
match propagation on every graph shape.
"""

from __future__ import annotations

import random

import pytest

from clickhouse_k_means_spark.operators.components import (
    connected_components,
    dedup_components,
    star_components,
)


def _labels(df):
    return {r["n"]: r["component"] for r in df.collect()}


def _path_edges(spark, n):
    return spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a long, b long"
    )


def test_star_on_deep_path(spark):
    # diameter 59 — propagation at default budget would need 30+ rounds;
    # star collapses it in O(log n)
    got = _labels(star_components(_path_edges(spark, 60)))
    assert got == {i: 0 for i in range(60)}


def test_propagation_raises_on_budget_exhaustion(spark):
    with pytest.raises(RuntimeError, match="not converged"):
        connected_components(
            _path_edges(spark, 40), max_iter=3, algorithm="propagation"
        )


def test_auto_falls_over_to_star(spark):
    # driver_max_edges=0 forces the distributed loop so the
    # budget-exhaustion fallover stays exercised (r14: small graphs
    # otherwise take the bounded driver union-find)
    got = _labels(
        connected_components(
            _path_edges(spark, 40), max_iter=3, driver_max_edges=0
        )
    )
    assert got == {i: 0 for i in range(40)}


def test_driver_fast_path_matches_distributed_loop(spark):
    # r14: the bounded-graph union-find must label exactly like the
    # propagation fixpoint — random clustered edges incl. a self-loop
    # and an isolated pair, both int and string keys
    rng = random.Random(13)
    edges = [(0, 0)]
    for c in range(4):
        ids = [c * 100 + i for i in range(50)]
        for i in range(1, 50):
            edges.append((ids[rng.randrange(0, i)], ids[i]))
    df = spark.createDataFrame(edges, "a long, b long")
    fast = _labels(connected_components(df))
    slow = _labels(connected_components(df, driver_max_edges=0))
    assert fast == slow
    sdf = spark.createDataFrame(
        [(f"k{a}", f"k{b}") for a, b in edges], "a string, b string"
    )
    assert _labels(connected_components(sdf)) == _labels(
        connected_components(sdf, driver_max_edges=0)
    )
    # over-gate graphs take the distributed loop (labels still exact)
    assert _labels(connected_components(df, driver_max_edges=3)) == slow


def test_star_matches_propagation_on_random_clusters(spark):
    # 5 planted duplicate clusters of 200 docs: sparse random intra-
    # cluster edges (the banded-LSH shape — each doc pairs with a few
    # others, not the full clique)
    rng = random.Random(7)
    edges = []
    for c in range(5):
        ids = [c * 1000 + i for i in range(200)]
        for i, n in enumerate(ids[1:], start=1):
            # chain guarantees connectivity; extra random chords mimic
            # multi-band collisions
            edges.append((ids[i - 1], n))
            if rng.random() < 0.3:
                edges.append((rng.choice(ids[:i]), n))
    df = spark.createDataFrame(edges, "a long, b long")
    prop = _labels(connected_components(df, max_iter=250, algorithm="propagation"))
    star = _labels(star_components(df))
    assert star == prop
    assert sorted(set(star.values())) == [0, 1000, 2000, 3000, 4000]


def test_star_converges_fast_on_planted_cluster(spark):
    # a 1000-doc duplicate cluster (VERDICT r2 item 9): must converge
    # within the tight round budget, not just eventually
    rng = random.Random(11)
    edges = [(rng.randrange(0, i), i) for i in range(1, 1000)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = _labels(star_components(df, max_iter=5))
    assert got == {i: 0 for i in range(1000)}


def test_dedup_components_canonical_flags(spark):
    df = spark.createDataFrame(
        [(10, 20), (20, 30), (50, 60)], "a long, b long"
    )
    rows = {r["n"]: r for r in dedup_components(df).collect()}
    assert rows[10]["is_canonical"] and rows[50]["is_canonical"]
    assert not rows[20]["is_canonical"] and rows[20]["component"] == 10
    assert rows[60]["component"] == 50


def test_isolated_self_loops_dropped(spark):
    df = spark.createDataFrame([(1, 1), (2, 3)], "a long, b long")
    got = _labels(star_components(df))
    # a node with only a self-loop is isolated — not emitted, per the
    # connected_components contract
    assert got == {2: 2, 3: 2}
