"""Property-based invariants (SURVEY §5.4) — hypothesis over small
point sets, expression-level where possible so examples stay fast."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from clickhouse_k_means_spark.functions.centroids import nearest_centroid_struct

coords = st.integers(min_value=-50, max_value=50).map(float)
points = st.lists(st.tuples(coords, coords), min_size=4, max_size=10, unique=True)

SETTINGS = settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)


def _df(spark, pts):
    return spark.createDataFrame(
        [(i, [x, y]) for i, (x, y) in enumerate(pts)], "i long, Y array<double>"
    )


@given(pts=points)
@SETTINGS
def test_k1_centroid_is_per_dim_mean(spark, pts):
    from clickhouse_k_means_spark.plans.kmeans import KMeansEngine

    eng = KMeansEngine(k=1)
    model = eng.lloyd_step(_df(spark, pts), [(1, [0.0, 0.0])], dim=2)
    mean_x = sum(x for x, _ in pts) / len(pts)
    mean_y = sum(y for _, y in pts) / len(pts)
    assert model[0][0] == 1
    assert model[0][1][0] == pytest.approx(mean_x)
    assert model[0][1][1] == pytest.approx(mean_y)


@given(pts=points, dx=coords, dy=coords)
@SETTINGS
def test_assignment_translation_invariant(spark, pts, dx, dy):
    model = [(1, [-10.0, -10.0]), (2, [10.0, 10.0])]
    shifted_model = [(j, [c[0] + dx, c[1] + dy]) for j, c in model]
    df = _df(spark, pts)
    base = df.select("i", nearest_centroid_struct("Y", model)["j"].alias("j"))
    shifted = df.select(
        "i",
        nearest_centroid_struct(
            F.array(F.col("Y")[0] + dx, F.col("Y")[1] + dy), shifted_model
        )["j"].alias("j"),
    )
    assert {(r["i"], r["j"]) for r in base.collect()} == {
        (r["i"], r["j"]) for r in shifted.collect()
    }


@given(pts=points, scale=st.sampled_from([0.5, 2.0, 10.0]))
@SETTINGS
def test_assignment_scale_invariant(spark, pts, scale):
    model = [(1, [-10.0, 5.0]), (2, [10.0, -5.0])]
    scaled_model = [(j, [c[0] * scale, c[1] * scale]) for j, c in model]
    df = _df(spark, pts)
    base = df.select("i", nearest_centroid_struct("Y", model)["j"].alias("j"))
    scaled = df.select(
        "i",
        nearest_centroid_struct(
            F.array(F.col("Y")[0] * scale, F.col("Y")[1] * scale), scaled_model
        )["j"].alias("j"),
    )
    assert {(r["i"], r["j"]) for r in base.collect()} == {
        (r["i"], r["j"]) for r in scaled.collect()
    }


@given(pts=points)
@SETTINGS
def test_elbow_monotone_in_nested_models(spark, pts):
    from clickhouse_k_means_spark.plans.optimal_k import elbow

    df = _df(spark, pts)
    model = [(1, list(pts[0]))]
    prev = None
    for extra in range(1, min(4, len(pts))):
        e = elbow(df, model)
        if prev is not None:
            assert e <= prev + 1e-9  # adding a centroid can only shrink Σ min-dist
        prev = e
        model = model + [(extra + 1, list(pts[extra]))]


def test_k_equals_n_distinct_zero_inertia(spark):
    from clickhouse_k_means_spark.plans.kmeans import KMeansEngine
    from clickhouse_k_means_spark.plans.optimal_k import elbow

    pts = [(0.0, 0.0), (10.0, 0.0), (0.0, 10.0)]
    df = _df(spark, pts)
    res = KMeansEngine(k=3, seed=5).fit(df)
    assert res.converged
    assert elbow(df, res.model) == pytest.approx(0.0)


def test_fit_translation_shifts_centroids(spark):
    from clickhouse_k_means_spark.plans.kmeans import KMeansEngine

    pts = [(0.0, 0.0), (1.0, 1.0), (20.0, 20.0), (21.0, 19.0), (-5.0, 7.0), (22.0, 18.0)]
    df = _df(spark, pts)
    shifted = _df(spark, [(x + 100.0, y - 40.0) for x, y in pts])
    a = KMeansEngine(k=2, seed=3).fit(df)
    b = KMeansEngine(k=2, seed=3).fit(shifted)
    for (ja, ca), (jb, cb) in zip(a.model, b.model):
        assert ja == jb
        assert cb[0] - ca[0] == pytest.approx(100.0)
        assert cb[1] - ca[1] == pytest.approx(-40.0)
