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
