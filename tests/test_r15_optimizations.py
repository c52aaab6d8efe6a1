"""Focused tests for the r15 optimization-round internals changes.

Each test pins ONE behavior this round changed (or a gate VERDICT r14
asked to pin), so a later refactor fails here and not only in a bench
number:

- ``_elbow_batch`` unreachability (VERDICT r14 item 7): no registered
  query's elbow call crosses the k·dim Arrow gate, so the
  non-bit-exact partials path can never capture an oracle entry.
- ``elbow`` gate comparison now matches the Lloyd/assign ``>=``
  (ADVICE r14), and the batch path returns None on empty input like
  the JVM sum does.
- ``connected_components`` driver fast path requires same-typed
  src/dst columns (ADVICE r14: the LocalRelation typed both outputs
  from src; mixed types now keep the distributed loop whose union
  coerces).
- ``_dir_input_bytes`` sizes nested source layouts (VERDICT r14 nit).
- session.py only wires the driver-local worker daemon in local mode
  (ADVICE r14 medium).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def test_no_registered_query_reaches_elbow_batch(spark):
    """VERDICT r14 item 7: every registered elbow-bearing entry sits
    below the Arrow gate. The one registry path into
    plans.optimal_k.elbow() is fit_best (q_kmeans_fit_best, k=4 over
    dim-3 lineitem features; doc_clusters runs fit(), which never
    calls elbow). Pin both the arithmetic and the dispatch."""
    import inspect

    import __spark_entry__ as entry
    from clickhouse_k_means_spark.plans import optimal_k
    from clickhouse_k_means_spark.plans.kmeans import KMeansEngine

    src = inspect.getsource(entry)
    # the registry's only routes into elbow(): fit_best (k=4, dim=3).
    # optimal_k_scan is not registered; a future entry that adds one
    # must re-examine the gate (that is what this assert is for).
    assert "optimal_k_scan" not in src
    assert 4 * 3 < KMeansEngine._ARROW_ASSIGN_CELLS
    assert 4 * 8 < KMeansEngine._ARROW_ASSIGN_CELLS  # doc_clusters shape

    # dispatch pin: at the registered shapes the batch path is NOT
    # taken even if it were to blow up
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [3.0, 4.0, 0.0])], "i bigint, Y array<double>"
    )
    model = [(1, [0.0, 0.0, 0.0]), (2, [1.0, 1.0, 1.0]),
             (3, [2.0, 2.0, 2.0]), (4, [3.0, 3.0, 3.0])]
    orig = optimal_k._elbow_batch
    optimal_k._elbow_batch = lambda *a, **k: (_ for _ in ()).throw(
        AssertionError("oracle-shaped elbow took the Arrow path")
    )
    try:
        got = optimal_k.elbow(df, model)
    finally:
        optimal_k._elbow_batch = orig
    # nearest: (0,0,0)→c1 d=0; (3,4,0)→c3=(2,2,2) d=3
    assert got == pytest.approx(3.0)


def test_elbow_gate_matches_assign_comparison(spark):
    """ADVICE r14: the elbow gate uses the same >= as Lloyd/assign, so
    a k·dim == threshold model takes the SAME physical family on both
    paths (previously elbow alone stayed on the JVM expression)."""
    from clickhouse_k_means_spark.plans import optimal_k
    from clickhouse_k_means_spark.plans.kmeans import KMeansEngine

    cells = KMeansEngine._ARROW_ASSIGN_CELLS
    dim = 3
    k = cells // dim  # k*dim == threshold exactly
    assert k * dim == cells
    model = [(j + 1, [float(j), 0.0, 0.0]) for j in range(k)]
    df = spark.createDataFrame([(1, [0.0, 0.0, 0.0])], "i bigint, Y array<double>")
    hits = []
    orig = optimal_k._elbow_batch
    optimal_k._elbow_batch = lambda *a, **kw: hits.append(1) or orig(*a, **kw)
    try:
        got = optimal_k.elbow(df, model)
    finally:
        optimal_k._elbow_batch = orig
    assert hits, "k*dim == threshold must take the Arrow path, like assign()"
    assert got == pytest.approx(0.0)


def test_elbow_batch_empty_input_returns_none_like_jvm(spark):
    """ADVICE r14: SQL sum over zero rows is NULL; the Arrow partials
    path returned 0.0 for an empty frame. Both paths now agree."""
    from clickhouse_k_means_spark.plans import optimal_k

    empty = spark.createDataFrame([], "i bigint, Y array<double>")
    small_model = [(1, [0.0, 0.0, 0.0])]
    big_model = [(j + 1, [float(j)] * 3) for j in range(20)]  # k*dim=60 > gate
    assert optimal_k.elbow(empty, small_model) is None  # JVM path
    assert optimal_k.elbow(empty, big_model) is None  # Arrow path
    assert optimal_k._elbow_batch(empty, big_model, squared=False) is None


def test_components_mixed_key_types_keep_distributed_loop(spark):
    """ADVICE r14: the driver fast path types (n, component) from one
    column; mixed src/dst types take the distributed loop, whose union
    applies Spark's own coercion."""
    from clickhouse_k_means_spark.operators.components import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "a int, b bigint"
    )
    got = connected_components(edges, src="a", dst="b")
    # union(int, bigint) coerces to bigint on both output columns
    assert [f.dataType.simpleString() for f in got.schema.fields] == [
        "bigint",
        "bigint",
    ]
    rows = {(r["n"], r["component"]) for r in got.collect()}
    assert rows == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}
    # same-typed edges still take the driver LocalRelation fast path
    same = spark.createDataFrame([(1, 2), (2, 3)], "a bigint, b bigint")
    fast = connected_components(same, src="a", dst="b")
    assert "LocalRelation" in fast._jdf.queryExecution().analyzed().toString() or (
        "LocalTableScan" in fast._jdf.queryExecution().executedPlan().toString()
    )
    assert {(r["n"], r["component"]) for r in fast.collect()} == {
        (1, 1), (2, 1), (3, 1)
    }


def test_dir_input_bytes_recursive(tmp_path):
    """VERDICT r14 nit: nested stream-source layouts must size from
    every data file, not only the top level."""
    from clickhouse_k_means_spark.streaming.windows import _dir_input_bytes

    (tmp_path / "events.parquet").write_bytes(b"x" * 100)
    nested = tmp_path / "date=2031-01-01"
    nested.mkdir()
    (nested / "part-0.parquet").write_bytes(b"y" * 50)
    (tmp_path / "notdata.txt").write_bytes(b"z" * 1000)
    assert _dir_input_bytes(str(tmp_path)) == 150


def test_worker_daemon_wired_only_in_local_mode(spark):
    """ADVICE r14 (medium): the daemon module + driver-local
    executorEnv.PYTHONPATH must not reach a remote master whose
    executors lack the package at that path. The conf wiring lives
    inside the local-mode branch of get_spark — pin via source, since
    spinning a second master in-process would collide with the session
    fixture."""
    import inspect

    from clickhouse_k_means_spark import session as sess

    src = inspect.getsource(sess.get_spark)
    gate = src.index("SPARK_GRAFT_MASTER_SET")
    wiring = src.index("spark.python.daemon.module")
    assert wiring > gate, "daemon wiring must be gated on local mode"
    # and the local session in this suite does carry it
    if not os.environ.get("SPARK_GRAFT_MASTER_SET"):
        assert spark.conf.get("spark.python.daemon.module", None) == (
            "clickhouse_k_means_spark.workerdaemon"
        )
