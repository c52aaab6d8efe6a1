"""Bucketed-table co-location (sources/bucketed.py): the persisted
hash distribution must be visible to the planner — a same-bucket-count
join compiles to a SortMergeJoin with ZERO Exchange on either side —
and must never change results vs the plain logical join."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from clickhouse_k_means_spark.sources.bucketed import write_bucketed
from clickhouse_k_means_spark.sources.dataset import load_table


def _plan(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@pytest.fixture()
def bucketed_pair(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    bo = write_bucketed(
        orders, "t_bkt_orders", 8, "o_custkey", str(tmp_path / "o")
    )
    bc = write_bucketed(cust, "t_bkt_cust", 8, "c_custkey", str(tmp_path / "c"))
    yield bo, bc, orders, cust
    spark.sql("DROP TABLE IF EXISTS t_bkt_orders")
    spark.sql("DROP TABLE IF EXISTS t_bkt_cust")


def test_bucketed_join_has_zero_exchanges(spark, bucketed_pair):
    """Both scans report the bucket distribution, so the join needs no
    shuffle — the whole point of paying the bucketed write once."""
    bo, bc, _, _ = bucketed_pair
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(bo.join(bc, bo.o_custkey == bc.c_custkey))
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert len(re.findall(r"\(\d+\) SortMergeJoin", plan)) == 1, plan
    assert "hashpartitioning" not in plan, plan
    assert plan.count("Bucketed: true") == 2, plan


def test_bucketed_groupby_on_key_has_no_exchange(spark, bucketed_pair):
    """A bucket-key aggregation reuses the persisted distribution too."""
    bo, _, _, _ = bucketed_pair
    plan = _plan(bo.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n")))
    assert "hashpartitioning" not in plan, plan


def test_bucketed_join_matches_plain_join(spark, bucketed_pair):
    """Bucketing is physical only: row-identical to the logical join."""
    bo, bc, orders, cust = bucketed_pair
    got = (
        bo.join(bc, bo.o_custkey == bc.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("c_mktsegment")
        .collect()
    )
    want = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("c_mktsegment")
        .collect()
    )
    assert got == want and len(got) > 0


def test_write_bucketed_validation(spark, tmp_path):
    df = spark.range(4).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="n_buckets"):
        write_bucketed(df, "t_bad", 0, "k", str(tmp_path / "b"))
    with pytest.raises(ValueError, match="at least one column"):
        write_bucketed(df, "t_bad", 4, [], str(tmp_path / "b"))
