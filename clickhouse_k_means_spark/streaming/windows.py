"""Windowed streaming aggregation over the events table.

Design: ``readStream`` on the parquet fixture directory (schema fixed
up-front — required for file streams), watermark + tumbling/sliding
``F.window`` aggregation, and an ``availableNow`` memory-sink runner
for deterministic batch-replay testing. On a real cluster the same
plan runs continuously against an object-store drop zone or Kafka —
only the source/sink lines change.

Scale notes: windowed aggregation state is keyed by (window,
event_type) — bounded by the watermark horizon; the shuffle is the
same partial/final hash aggregation as the batch path. No Python in
the stream.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id bigint, ts bigint, user_id bigint, event_type string, "
    "value double, props string"
)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream source over the events fixture parquet.

    ``ts`` is stored as TIMESTAMP(NANOS) which Spark reads as raw
    bigint nanos (session.py nanosAsLong); converted here so the
    stream carries a real event-time column for watermarking.
    """
    # the file-stream source wants a directory; glob-filter the fixture
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def windowed_event_counts(
    events: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling (or sliding) per-type counts + integerized value sums.

    Late data beyond ``watermark`` is dropped; output one row per
    (window, event_type) with the window rendered as epoch seconds so
    results are engine-portable.
    """
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_c"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("bucket_s"),
            "event_type",
            "n",
            "value_c",
        )
    )


def run_available_now(spark: SparkSession, agg: DataFrame, name: str) -> DataFrame:
    """Replay the whole source as a finite stream (availableNow trigger),
    collect into a memory sink, return the result table."""
    with tempfile.TemporaryDirectory(prefix="ckms_stream_ckpt_") as ckpt:
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()
    return spark.table(name)


def streaming_assign(
    events: DataFrame,
    model: list[tuple[int, list[float]]],
    feature: str = "value",
) -> DataFrame:
    """Streaming nearest-centroid assignment (1-d feature → cluster).

    Stateless map — runs inside the stream with no state store; the
    model is folded into literals exactly like the batch path.
    """
    from clickhouse_k_means_spark.functions.centroids import nearest_centroid_struct

    y = F.array(F.col(feature).cast("double"))
    s = nearest_centroid_struct(y, model)
    return events.select(
        "event_id", "ts", s["j"].alias("j"), s["dist"].alias("dist")
    )
