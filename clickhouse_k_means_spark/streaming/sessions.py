"""Sessionization — gap-based sessions in batch and streaming form.

- ``sessionize`` (batch): the classic lag/cumsum window pair — a new
  session starts where the gap to the previous event of the same user
  exceeds the threshold; the session id is the running count of
  session starts. One shuffle on the user key; exact SQL twin for the
  DuckDB oracle.
- ``session_window_counts`` (streaming): Spark's native
  ``F.session_window`` — built-in beats custom state (the engine's
  UDF rule) whenever semantics allow.
- ``stateful_user_counts`` (streaming): the ``applyInPandasWithState``
  shape for operators built-ins can't express — per-key state carried
  across micro-batches with a processing-time timeout. Kept minimal
  (cumulative per-user counts/value) to demonstrate the full plumbing:
  state schema, timeout handling, Arrow-batched group iteration.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.window import Window

from clickhouse_k_means_spark.sources.dataset import event_epoch_seconds


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(user_id, session_id, n_events, start_s, end_s) per gap session.

    ``ts_col`` may be stored as raw bigint nanos, TIMESTAMP, or
    TIMESTAMP_NTZ — epoch math dispatches on the dtype
    (``event_epoch_seconds``). session_id numbers sessions per user
    from 1 in time order.
    """
    w = Window.partitionBy(user).orderBy(ts_col)
    gap = F.col("__s") - F.lag("__s").over(w)
    new_session = F.when(
        gap.isNull() | (gap > gap_seconds), F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy(user).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tagged = (
        events.select(
            F.col(user),
            event_epoch_seconds(events, ts_col).alias("__s"),
            F.col(ts_col),
        )
        .withColumn("session_id", F.sum(new_session).over(run))
    )
    return (
        tagged.groupBy(user, "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("__s").alias("start_s"),
            F.max("__s").alias("end_s"),
        )
    )


def session_window_counts(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming gap sessions via the native session_window aggregate.

    Window bounds inherit the input event-time dtype (TIMESTAMP or
    TIMESTAMP_NTZ) — epoch rendering dispatches on it, so the output
    is session-timezone independent either way.
    """
    from clickhouse_k_means_spark.sources.dataset import epoch_seconds

    ts_dt = stream.schema["ts"].dataType
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_c"),
        )
        .select(
            "user_id",
            epoch_seconds("w.start", ts_dt).alias("start_s"),
            epoch_seconds("w.end", ts_dt).alias("end_s"),
            "n_events",
            "value_c",
        )
    )


STATE_SCHEMA = "n bigint, value_c bigint"
OUTPUT_SCHEMA = "user_id bigint, n bigint, value_c bigint"


def _update_user_counts(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Cumulative per-user event count + integerized value sum.

    NoTimeout: state lives for the stream's lifetime. (A processing-
    time timeout would flush idle keys on a live stream, but it
    prevents availableNow replays from terminating — keep eviction on
    the watermark in event-time designs instead.)
    """
    n, value_c = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        value_c += int(pdf["value"].mul(100).round().astype("int64").sum())
    state.update((n, value_c))
    yield pd.DataFrame({"user_id": [key[0]], "n": [n], "value_c": [value_c]})


def stateful_user_counts(stream: DataFrame) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState.

    State (n, value_c) persists across micro-batches per user. The
    built-in windowed aggregates cover most needs — this is the escape
    hatch pattern for semantics they can't express.
    """
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_counts,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
