"""IQR outlier invariants (operators/outliers.py)."""

from __future__ import annotations

from clickhouse_k_means_spark.operators.outliers import iqr_outliers


def _ev(spark, rows):
    return spark.createDataFrame(rows, "event_type string, value double")


def test_iqr_hand_computed_quartiles_and_fences(spark):
    # values 10,20,40,100 -> type-7 q25=17.5, q75=55 -> IQR=37.5
    # fences: [17.5-56.25, 55+56.25] = [-38.75, 111.25] -> none out
    rows = [("a", v) for v in (10.0, 20.0, 40.0, 100.0)]
    r = iqr_outliers(_ev(spark, rows)).collect()[0]
    assert (r.n, r.q25_4, r.q75_4) == (4, 7000, 22000)  # cents x4
    assert r.n_outliers == 0 and r.outlier_sum_c == 0


def test_iqr_flags_planted_outlier_strict_fence(spark):
    # 1..9 -> q25=3, q75=7, IQR=4 -> fences [-3, 13]; 13 is ON the
    # fence (kept, strict inequality), 13.01 is out
    base = [("a", float(v)) for v in range(1, 10)]
    on_fence = iqr_outliers(_ev(spark, base + [("a", 13.0)]))
    r = on_fence.collect()[0]
    assert r.n_outliers == 0
    # 11 values [-20,1..9,50]: q25 = 2.5, q75 = 7.5, IQR = 5 ->
    # fences [-5, 15] -> exactly the two planted extremes are out
    out = iqr_outliers(_ev(spark, base + [("a", 50.0), ("a", -20.0)]))
    r = out.collect()[0]
    assert (r.q25_4, r.q75_4) == (1000, 3000)  # 2.5 and 7.5 in cents x4
    assert r.n_outliers == 2
    assert r.outlier_sum_c == 5000 - 2000


def test_iqr_constant_group_and_negative_values(spark):
    rows = [("c", 5.0)] * 6 + [("c", -9999.0)] + [("d", -1.0), ("d", -2.0)]
    out = {r.event_type: r for r in iqr_outliers(_ev(spark, rows)).collect()}
    # constant group: IQR=0 -> anything != 5.0 is out
    assert out["c"].n_outliers == 1 and out["c"].outlier_sum_c == -999900
    assert out["d"].n_outliers == 0


def test_iqr_partition_invariant(spark, sf_dir):
    from clickhouse_k_means_spark.sources.dataset import load_table

    ev = load_table(spark, sf_dir, "events")
    a = sorted(map(tuple, iqr_outliers(ev).collect()))
    b = sorted(map(tuple, iqr_outliers(ev.repartition(17)).collect()))
    assert a == b


def test_iqr_plan_has_no_exact_percentile(spark, sf_dir):
    """The scalability claim: no memory-unbounded Percentile aggregate
    anywhere in the plan — quantiles come from the frequency table."""
    from clickhouse_k_means_spark.sources.dataset import load_table

    ev = load_table(spark, sf_dir, "events")
    plan = iqr_outliers(ev)._jdf.queryExecution().executedPlan().toString()
    assert "percentile" not in plan.lower(), plan


def test_winsorize_hand_computed(spark):
    from clickhouse_k_means_spark.operators.outliers import winsorize_stats

    # 1..10 (cents 100..1000): p05 pos = 9*0.05 = 0.45 -> 100+0.45*100
    # = 145c; p95 pos = 8.55 -> 900+0.55*100 = 955c
    rows = [("a", float(v)) for v in range(1, 11)]
    r = winsorize_stats(_ev(spark, rows)).collect()[0]
    assert r.q_lo_u == 145_000_000 and r.q_hi_u == 955_000_000
    assert r.n_clipped_lo == 1 and r.n_clipped_hi == 1  # 100c and 1000c
    inner = sum(v * 100_000_000 for v in range(2, 10))
    assert r.wsum_u == inner + 145_000_000 + 955_000_000


def test_winsorize_matches_numpy(spark):
    import numpy as np

    from clickhouse_k_means_spark.operators.outliers import winsorize_stats

    vals = [3.7, -1.2, 9.9, 0.0, 4.4, 4.4, 100.0, -50.0, 2.25, 8.8, 7.1]
    r = winsorize_stats(_ev(spark, [("g", v) for v in vals])).collect()[0]
    cents = [round(v * 100) for v in vals]
    lo, hi = np.percentile(cents, [5, 95])
    assert r.q_lo_u == round(lo * 1_000_000)
    assert r.q_hi_u == round(hi * 1_000_000)
    want = sum(
        max(round(lo * 1e6), min(round(hi * 1e6), c * 1_000_000))
        for c in cents
    )
    assert r.wsum_u == want


def test_winsorize_validates(spark):
    import pytest

    from clickhouse_k_means_spark.operators.outliers import winsorize_stats

    df = _ev(spark, [("a", 1.0)])
    with pytest.raises(ValueError):
        winsorize_stats(df, lo_ppm=500_000, hi_ppm=500_000)
    with pytest.raises(ValueError):
        winsorize_stats(df, lo_ppm=-1, hi_ppm=500_000)


def test_iqr_null_metrics_excluded_from_quantiles(spark):
    """NULL metric values must not form a nulls-first frequency group
    or inflate n — quantile positions must match DuckDB's
    quantile_cont, which ignores NULLs (ADVICE r5)."""
    base = [("a", float(v)) for v in (10.0, 20.0, 40.0, 100.0)]
    with_nulls = base + [("a", None), ("a", None), ("a", None)]
    got = iqr_outliers(_ev(spark, with_nulls)).collect()[0]
    want = iqr_outliers(_ev(spark, base)).collect()[0]
    assert (got.n, got.q25_4, got.q75_4) == (want.n, want.q25_4, want.q75_4)
    assert (got.n_outliers, got.outlier_sum_c) == (
        want.n_outliers,
        want.outlier_sum_c,
    )


def test_weighted_quantiles_hand_computed(spark):
    from clickhouse_k_means_spark.operators.outliers import weighted_quantiles

    # values 1..4 with weights 1, 2, 3, 4 (total 10):
    # cum: 1→1, 2→3, 3→6, 4→10. p=.30 → first cum≥3 = value 2;
    # p=.60 → value 3; p=.61 → value 4; p=1.0 → value 4
    rows = [("a", float(v), v) for v in (1, 2, 3, 4)]
    df = spark.createDataFrame(rows, "g string, value double, w int")
    got = {
        r["p_ppm"]: r["q_c"]
        for r in weighted_quantiles(
            df, "value", "w", "g",
            ps_ppm=[300_000, 600_000, 610_000, 1_000_000],
        ).collect()
    }
    assert got == {300_000: 200, 600_000: 300, 610_000: 400, 1_000_000: 400}


def test_weighted_quantiles_weight_one_matches_unweighted_step(spark):
    from clickhouse_k_means_spark.operators.outliers import weighted_quantiles

    import random

    rng = random.Random(3)
    vals = [rng.randint(0, 500) for _ in range(400)]
    df = spark.createDataFrame(
        [("g", float(v), 1) for v in vals], "g string, value double, w int"
    )
    got = {
        r["p_ppm"]: r["q_c"]
        for r in weighted_quantiles(
            df, "value", "w", "g", ps_ppm=[500_000]
        ).collect()
    }
    sv = sorted(v * 100 for v in vals)
    # step quantile: first value whose cum count reaches half
    import math

    want = sv[math.ceil(0.5 * len(sv)) - 1]
    assert got[500_000] == want


def test_weighted_quantiles_validation(spark):
    from clickhouse_k_means_spark.operators.outliers import weighted_quantiles

    df = spark.createDataFrame([("g", 1.0, 1)], "g string, value double, w int")
    import pytest

    with pytest.raises(ValueError, match="non-empty"):
        weighted_quantiles(df, "value", "w", "g", ps_ppm=[])
    with pytest.raises(ValueError, match="within"):
        weighted_quantiles(df, "value", "w", "g", ps_ppm=[2_000_000])
