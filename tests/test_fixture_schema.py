"""Fixture-schema smoke test (r3 verdict item 8).

Asserts the loaded dtypes of every fixture column the engine depends
on. When the driver regenerates a fixture with a different storage
type (as happened to ``events.ts`` in round 3: TIMESTAMP(NANOS) →
timestamp[us]), this turns a scattered multi-query regression into
one self-describing failure.

The event-time contract is deliberately permissive: ``ts`` may load
as bigint (raw nanos), TIMESTAMP, or TIMESTAMP_NTZ — those are the
three types ``event_epoch_seconds``/``event_time`` dispatch on. Any
OTHER type is a hard failure.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    TimestampNTZType,
    TimestampType,
)

from clickhouse_k_means_spark.sources.dataset import (
    event_epoch_seconds,
    event_time,
    load_table,
)

TS_TYPES = (LongType, TimestampType, TimestampNTZType)


def _types(spark, sf_dir, name):
    return {f.name: f.dataType for f in load_table(spark, sf_dir, name).schema.fields}


def test_events_schema(spark, sf_dir):
    t = _types(spark, sf_dir, "events")
    assert isinstance(t["event_id"], LongType)
    assert isinstance(t["ts"], TS_TYPES), (
        f"events.ts loaded as {t['ts']} — not one of the dispatchable "
        "event-time types (bigint nanos / TIMESTAMP / TIMESTAMP_NTZ). "
        "Extend sources.dataset.epoch_micros/epoch_seconds/event_time."
    )
    assert isinstance(t["user_id"], LongType)
    assert isinstance(t["event_type"], StringType)
    assert isinstance(t["value"], DoubleType)
    assert isinstance(t["props"], StringType)


def test_events_epoch_dispatch(spark, sf_dir):
    """The helper produces sane epoch seconds for the CURRENT fixture,
    independent of the session timezone (the ADVICE tz-shift hazard)."""
    ev = load_table(spark, sf_dir, "events")
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        utc = ev.select(event_epoch_seconds(ev).alias("s")).agg(
            F.min("s"), F.max("s")
        ).first()
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        shifted = ev.select(event_epoch_seconds(ev).alias("s")).agg(
            F.min("s"), F.max("s")
        ).first()
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert utc == shifted, "event_epoch_seconds depends on session timezone"
    # fixture events start 2024-01-01 (TESTDATA.md); sanity-bound them
    assert 1_600_000_000 < utc[0] <= utc[1] < 2_000_000_000
    # event_time yields a watermarkable type (tz-aware TIMESTAMP only —
    # streams reject NTZ event time)
    dt = ev.select(event_time(ev).alias("t")).schema["t"].dataType
    assert isinstance(dt, TimestampType)


def test_documents_schema(spark, sf_dir):
    t = _types(spark, sf_dir, "documents")
    assert isinstance(t["doc_id"], LongType)
    assert isinstance(t["text"], StringType)
    assert isinstance(t["lang"], StringType)
    assert isinstance(t["source"], StringType)


def test_embeddings_schema(spark, sf_dir):
    t = _types(spark, sf_dir, "embeddings")
    assert isinstance(t["vec_id"], LongType)
    assert isinstance(t["embedding"], ArrayType)
    assert isinstance(t["embedding"].elementType, (FloatType, DoubleType))
    assert isinstance(t["label"], (IntegerType, LongType))
    # fixed arity — the unrolled distance/projection codegen relies on it
    emb = load_table(spark, sf_dir, "embeddings")
    n_arities = emb.select(F.size("embedding").alias("d")).distinct().count()
    assert n_arities == 1


def test_lineitem_schema(spark, sf_dir):
    t = _types(spark, sf_dir, "lineitem")
    assert isinstance(t["l_orderkey"], LongType)
    assert isinstance(t["l_quantity"], DoubleType)
    assert isinstance(t["l_extendedprice"], DoubleType)
    assert isinstance(t["l_discount"], DoubleType)
    assert isinstance(t["l_returnflag"], StringType)
    assert isinstance(t["l_shipdate"], (TimestampType, TimestampNTZType))


def test_orders_schema(spark, sf_dir):
    t = _types(spark, sf_dir, "orders")
    assert isinstance(t["o_orderkey"], LongType)
    assert isinstance(t["o_custkey"], LongType)
    assert isinstance(t["o_totalprice"], DoubleType)


def test_epoch_dispatch_all_storage_types(spark):
    """All three dispatch branches agree on the same instant:
    raw bigint nanos (legacy fixture), TIMESTAMP_NTZ (current
    fixture), and tz-aware TIMESTAMP."""
    from clickhouse_k_means_spark.sources.dataset import (
        epoch_micros,
        epoch_seconds,
    )

    base_s = 1_704_067_207  # 2024-01-01T00:00:07Z
    df = spark.sql(
        f"select cast({base_s} as bigint) * 1000000000 + 179575000 as ts_nanos, "
        f"timestamp_ntz'2024-01-01 00:00:07.179575' as ts_ntz, "
        f"timestamp'2024-01-01 00:00:07.179575 UTC' as ts_tz"
    )
    row = df.select(
        epoch_seconds("ts_nanos", df.schema["ts_nanos"].dataType).alias("s1"),
        epoch_seconds("ts_ntz", df.schema["ts_ntz"].dataType).alias("s2"),
        epoch_seconds("ts_tz", df.schema["ts_tz"].dataType).alias("s3"),
        epoch_micros("ts_nanos", df.schema["ts_nanos"].dataType).alias("u1"),
        epoch_micros("ts_ntz", df.schema["ts_ntz"].dataType).alias("u2"),
        epoch_micros("ts_tz", df.schema["ts_tz"].dataType).alias("u3"),
    ).first()
    assert row["s1"] == row["s2"] == row["s3"] == base_s
    assert row["u1"] == row["u2"] == row["u3"] == base_s * 1_000_000 + 179575


def test_epoch_dispatch_rejects_unknown_type(spark):
    from clickhouse_k_means_spark.sources.dataset import epoch_seconds
    from pyspark.sql.types import StringType

    with pytest.raises(TypeError, match="unsupported event-time dtype"):
        epoch_seconds("x", StringType())
