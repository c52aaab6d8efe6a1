"""Watermarked stream-stream interval joins.

The missing piece between stream-static enrichment (broadcast lookup,
no state) and ``applyInPandasWithState`` (arbitrary state): Spark's
native stream-stream join, where BOTH sides buffer in the state store
and the watermark + time-range condition bound how long. The classic
use is attribution — join each view event to the purchase events that
follow it within a window, continuously.

Scale contract: state per side is (watermark horizon + join window) of
data, keyed by the equi-join key — bounded by TIME, not corpus size,
so the same plan runs on an unbounded feed. Both the equality key and
the two-sided time-range predicate are REQUIRED for that bound: drop
either and Spark must buffer a side forever (it will warn and the
state store grows without limit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_k_means_spark.streaming.windows import stream_events


def stream_stream_pairs(
    spark: SparkSession,
    sf_dir: str,
    key: str = "user_id",
    left_type: str = "view",
    right_type: str = "purchase",
    within: str = "24 hours",
    watermark: str = "2 hours",
) -> DataFrame:
    """(left event, right event) pairs where the right event lands in
    ``[left_ts, left_ts + within]`` for the same ``key`` — the
    streaming form of the batch interval join.

    Two file-stream readers over the same fixture play both feeds;
    on a real pipeline these are two Kafka topics. The result is an
    append-mode stream of pairs: each pair emits exactly once, when
    the watermark proves no earlier match can still arrive.
    """
    left = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == left_type)
        .select(
            F.col("event_id").alias("left_id"),
            F.col(key).alias("k"),
            F.col("ts").alias("left_ts"),
        )
        .withWatermark("left_ts", watermark)
    )
    right = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == right_type)
        .select(
            F.col("event_id").alias("right_id"),
            F.col(key).alias("rk"),
            F.col("ts").alias("right_ts"),
            F.round(F.col("value") * 100).cast("bigint").alias("right_c"),
        )
        .withWatermark("right_ts", watermark)
    )
    return left.join(
        right,
        (F.col("k") == F.col("rk"))
        & (F.col("right_ts") >= F.col("left_ts"))
        & (F.col("right_ts") <= F.col("left_ts") + F.expr(f"interval {within}")),
    ).select(
        F.col("k").alias(key),
        "left_id",
        "right_id",
        (
            F.unix_timestamp("right_ts") - F.unix_timestamp("left_ts")
        ).alias("delta_s"),
        "right_c",
    )
