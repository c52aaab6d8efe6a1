"""transformWithStateInPandas — Spark 4's successor stateful API.

``applyInPandasWithState`` (streaming/sessions.py) passes one opaque
state tuple per key; the new ``StatefulProcessor`` API gives named,
typed state variables (value / list / map), an init/close lifecycle,
and timer support, with the same Arrow batching. This module ports
the engine's running-per-user-stats operator to the new API so both
generations of the escape hatch are covered — new pipelines should
start here.

RUNTIME DEPENDENCY: the transformWithState protocol serializes state
requests with protobuf; environments without ``google.protobuf``
(like this repo's hermetic test container) can import and plan this
module but not execute it — the test suite skips accordingly, and
``streaming/sessions.stateful_user_counts`` remains the
runtime-certified stateful operator there.

Semantics identical to ``stateful_user_counts`` plus a running max:
per user, cumulative event count, exact cents sum, and max cents
across every micro-batch ever seen (update mode — one refreshed row
per key per batch). An availableNow replay therefore ends exactly at
the batch groupBy answer, which is what the test asserts.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = "user_id bigint, n bigint, value_c bigint, max_c bigint"

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("value_c", LongType()),
        StructField("max_c", LongType()),
    ]
)


class RunningUserStats(StatefulProcessor):
    """Named ValueState holding (n, value_c, max_c) per user."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("stats", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, value_c, max_c = (
            self._state.get() if self._state.exists() else (0, 0, None)
        )
        for pdf in rows:
            cents = pdf["value"].mul(100).round().astype("int64")
            n += len(pdf)
            value_c += int(cents.sum())
            if len(cents):
                batch_max = int(cents.max())
                max_c = batch_max if max_c is None else max(max_c, batch_max)
        self._state.update((n, value_c, max_c))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n": [n],
                "value_c": [value_c],
                "max_c": [max_c],
            }
        )

    def close(self) -> None:
        pass


def running_user_stats(stream: DataFrame) -> DataFrame:
    """The transformWithStateInPandas form of the running-stats
    operator (update mode, processing-time timers unused)."""
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            RunningUserStats(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
