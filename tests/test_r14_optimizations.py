"""Focused tests for the r14 optimization-round internals changes.

Each test pins ONE behavior an optimization changed, so a later
refactor that regresses it fails here and not only in a bench number:

- ``local_df`` (guide §2.2/§6): one-partition layout for bounded
  driver-built frames, content identical to ``createDataFrame``, and
  a state-store-style parquet commit producing ONE data file instead
  of ~defaultParallelism near-empty ones.
- ``ivf_query``'s driver-side probe-cell selection (guide §1.2): the
  NumPy argsort scoring must stay bit-equal to the
  ``nearest_cells_batch`` pandas_udf it replaced (same tie rule, same
  float64 arithmetic), or probe sets silently drift from the
  committed oracle results.
- sequential init first pick on DUPLICATE keys: the (hash, i) tie is
  broken on Y, so the pick is a pure function of the data, not of the
  partition layout / scan order.
- ``_aqe_off``: scoped — the session flag is restored on exit, on
  the exception path too.
"""

from __future__ import annotations

import glob
import os
import random

import pytest
from pyspark.sql import functions as F


def test_local_df_one_partition_content_and_files(spark, tmp_path):
    from clickhouse_k_means_spark.sources.dataset import local_df

    rows = [(1, [0.0, 1.0]), (2, [2.0, 3.0]), (3, [4.0, 5.0])]
    schema = "i bigint, Y array<double>"
    df = local_df(spark, rows, schema)
    assert df.rdd.getNumPartitions() == 1
    ref = spark.createDataFrame(rows, schema)
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, ref.collect()))
    assert df.schema == ref.schema
    out = str(tmp_path / "commit")
    df.write.mode("overwrite").parquet(out)
    # one bounded frame -> ONE data file (the r13 shape wrote
    # ~defaultParallelism near-empty files per store commit)
    assert len(glob.glob(os.path.join(out, "part-*"))) == 1


def test_driver_probe_cells_bitwise_match_pandas_udf(spark):
    """ivf_query's driver-side probe pick == nearest_cells_batch."""
    import numpy as np

    from clickhouse_k_means_spark.functions.vector import nearest_cells_batch
    from clickhouse_k_means_spark.sources.dataset import local_df

    rng = np.random.default_rng(42)
    centers = rng.normal(size=(6, 4))
    # include EXACT duplicate centers so the tie rule is exercised
    centers[3] = centers[1]
    centers_l = [[float(x) for x in c] for c in centers]
    queries = rng.normal(size=(9, 4))
    # one query exactly on a duplicated center: a hard tie
    queries[0] = centers[1]
    nprobe = 3

    # the ivf_query driver-side arithmetic, verbatim
    centers_np = np.asarray(centers_l, dtype=np.float64)
    q_mat = np.asarray(queries, dtype=np.float64)
    scores = -2.0 * (q_mat @ centers_np.T) + (centers_np * centers_np).sum(axis=1)
    driver_cells = np.argsort(scores, axis=1, kind="stable")[:, :nprobe]

    qdf = local_df(
        spark,
        [(i, [float(x) for x in q]) for i, q in enumerate(queries)],
        "q bigint, qv array<double>",
    )
    udf_rows = (
        qdf.select("q", nearest_cells_batch(centers_l, nprobe=nprobe)("qv").alias("c"))
        .orderBy("q")
        .collect()
    )
    assert [list(r["c"]) for r in udf_rows] == [
        [int(c) for c in row] for row in driver_cells
    ]


def test_init_first_pick_duplicate_keys_layout_independent(spark):
    """Duplicate-key fixture: same first pick (and model) regardless of
    partition layout — the r14 tie-break-on-Y fix."""
    from clickhouse_k_means_spark.plans.kmeans import KMeansEngine

    rows = []
    for i in range(40):
        rows.append((i % 10, [float(i % 10), float(i)]))  # duplicate keys
    base = spark.createDataFrame(rows, "i bigint, Y array<double>")
    eng = KMeansEngine(k=2, seed=42, max_iter=5)
    models = []
    for n_parts in (1, 7, 32):
        layout = base.repartition(n_parts)
        models.append(eng.init_centroids(layout, random.Random(42)))
    assert models[0] == models[1] == models[2]


def test_aqe_guard_restores_flag_on_exit_and_error(spark):
    from clickhouse_k_means_spark.plans.kmeans import _aqe_off

    key = "spark.sql.adaptive.enabled"
    old = spark.conf.get(key, "true")
    spark.conf.set(key, "true")
    try:
        with _aqe_off(spark):
            assert spark.conf.get(key) == "false"
        assert spark.conf.get(key) == "true"
        with pytest.raises(RuntimeError):
            with _aqe_off(spark):
                assert spark.conf.get(key) == "false"
                raise RuntimeError("boom")
        assert spark.conf.get(key) == "true"
    finally:
        spark.conf.set(key, old)


def test_hof_dot_cosine_bitwise_match_unrolled(spark):
    """The dim>=_HOF_DIM_CUTOFF HOF fold in dot_fixed/cosine_fixed must
    stay bit-identical to the unrolled expression it replaced (r14):
    same left-fold order, accumulator typed by the first product (a
    float32 column keeps float32 partial sums), inputs capped at dim,
    short inputs RAISE (the unrolled form's ANSI out-of-range error),
    NULL arrays propagate NULL. Checked on float32 AND float64 arrays,
    plus the _cosine_scored per-vector-norm form."""
    import random as _r

    from clickhouse_k_means_spark.functions.distance import (
        _HOF_DIM_CUTOFF,
        _dot_sql,
        _hof_dot,
        cosine_fixed,
        dot_fixed,
    )

    dim = 24
    assert dim >= _HOF_DIM_CUTOFF
    rng = _r.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)],
         [rng.uniform(-1, 1) for _ in range(dim)])
        for i in range(64)
    ]
    rows.append((64, None, [1.0] * dim))  # NULL array -> NULL, no error
    for elem in ("float", "double"):
        df = spark.createDataFrame(
            rows, f"i bigint, a array<{elem}>, b array<{elem}>"
        )
        unrolled_dot = F.expr(_dot_sql("a", "b", dim))
        unrolled_cos = F.expr(
            f"({_dot_sql('a', 'b', dim)}) / (sqrt({_dot_sql('a', 'a', dim)})"
            f" * sqrt({_dot_sql('b', 'b', dim)}))"
        )
        got = df.select(
            (dot_fixed("a", "b", dim) == unrolled_dot).alias("dot_eq"),
            (cosine_fixed("a", "b", dim) == unrolled_cos).alias("cos_eq"),
            # the _cosine_scored shape: dot / (per-vector sqrt norms)
            (
                (
                    _hof_dot("a", "b", dim)
                    / (
                        F.sqrt(_hof_dot("a", "a", dim))
                        * F.sqrt(_hof_dot("b", "b", dim))
                    )
                )
                == unrolled_cos
            ).alias("norm_eq"),
            dot_fixed("a", "b", dim).isNull().alias("dot_null"),
            unrolled_dot.isNull().alias("unrolled_null"),
        ).collect()
        for r in got:
            # equality holds row-by-row, and NULLs line up exactly
            assert r["dot_null"] == r["unrolled_null"]
            if not r["dot_null"]:
                assert r["dot_eq"] and r["cos_eq"] and r["norm_eq"], r
    # a vector SHORTER than dim fails loudly (as the unrolled ANSI
    # a[d] does), instead of zip_with's silent null-pad
    short = spark.createDataFrame(
        [(1, [1.0] * (dim - 3), [1.0] * dim)],
        "i bigint, a array<double>, b array<double>",
    )
    with pytest.raises(Exception, match="shorter than dim"):
        short.select(dot_fixed("a", "b", dim).alias("d")).collect()
    # below the cutoff the plan keeps the codegen'd unrolled form
    df3 = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0], [4.0, 5.0, 6.0])],
        "i bigint, a array<double>, b array<double>",
    )
    small_plan = df3.select(
        dot_fixed("a", "b", 3).alias("d")
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "aggregate(" not in small_plan and "zip_with(" not in small_plan


def test_streaming_batch_single_materialization_contract(spark, tmp_path):
    """The micro-batch body receives an eagerly-materialized frame:
    re-reading it must not re-execute the (side-effecting) source.
    Pinned via localCheckpoint semantics: the checkpointed frame's
    plan no longer references the source after the input is gone."""
    from clickhouse_k_means_spark.sources.dataset import local_df

    df = local_df(spark, [(1, "a"), (2, "b")], "k bigint, v string")
    eager = df.localCheckpoint(eager=True)
    # two consumers, one execution of the parent plan each -> same rows
    assert eager.count() == 2
    assert sorted(map(tuple, eager.collect())) == [(1, "a"), (2, "b")]
