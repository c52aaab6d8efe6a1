"""Table-profiler invariants (operators/profile.py)."""

from __future__ import annotations

import pytest

from clickhouse_k_means_spark.operators.profile import profile_table


def test_profile_hand_computed(spark):
    df = spark.createDataFrame(
        [
            (1, "a", None),
            (2, "b", 5.0),
            (2, "b", 5.0),
            (3, None, 7.0),
        ],
        "k long, s string, v double",
    )
    rows = {r.col_name: r for r in profile_table(df).collect()}
    assert set(rows) == {"k", "s", "v"}
    k = rows["k"]
    assert (k.n_rows, k.n_null, k.n_distinct) == (4, 0, 3)
    assert (k.min_s, k.max_s) == ("1", "3")
    assert (k.top_value, k.top_count) == ("2", 2)
    s = rows["s"]
    assert (s.n_null, s.n_distinct, s.top_value, s.top_count) == (1, 2, "b", 2)
    v = rows["v"]
    assert (v.n_null, v.n_distinct, v.top_count) == (1, 2, 2)


def test_profile_all_null_column(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "k long, dead string")
    r = {x.col_name: x for x in profile_table(df, ["dead"]).collect()}["dead"]
    assert (r.n_rows, r.n_null, r.n_distinct, r.top_count) == (2, 2, 0, 0)
    assert r.min_s is None and r.max_s is None and r.top_value is None


def test_profile_top_value_tie_breaks_to_smallest(spark):
    df = spark.createDataFrame([("x",), ("y",), ("x",), ("y",)], "c string")
    r = profile_table(df, ["c"]).collect()[0]
    assert (r.top_value, r.top_count, r.n_distinct) == ("x", 2, 2)


def test_profile_validates_columns(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        profile_table(df, ["nope"])
    with pytest.raises(ValueError):
        profile_table(df, [])


def test_profile_min_max_numeric_not_lexicographic(spark):
    df = spark.createDataFrame([(9,), (10,), (100,)], "k long")
    r = profile_table(df, ["k"]).collect()[0]
    assert (r.min_s, r.max_s) == ("9", "100")  # native-type ordering
