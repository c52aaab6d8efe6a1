"""Python Data Source API (Spark 4): the reference's ``numbers(N)``
generator as a first-class registered source.

The reference seeds its pipeline from ClickHouse's ``numbers(N)``
table function (k-means.sql:3 uses ``numbers(4)``/``numbers(500)`` to
synthesize the golden points). ``sources/generator.py`` re-expresses
that with ``spark.range``; this module goes one step further and
implements it as a REGISTERED data source —
``spark.read.format("synthseq")`` — exercising Spark 4's Python Data
Source API end-to-end:

* **partition planning**: the row space is split into
  ``numPartitions`` contiguous slices, each read independently by an
  executor (``InputPartition`` carries only the slice bounds — the
  generator is pure, nothing ships but two integers);
* **filter pushdown** (Spark 4.1 ``pushFilters``): range predicates
  on ``id`` tighten the slice bounds BEFORE partition planning, so a
  filtered read plans fewer/smaller partitions instead of generating
  and discarding rows — the same contract a parquet scan honors, now
  visible in a Python source;
* **deterministic synthesis**: every derived column is a pure
  function of ``id`` (md5-based, matching the engine's
  engine-portable-hash rule), so reads are replayable on any
  partitioning and the DuckDB oracle can regenerate the identical
  relation.

Streaming twin: ``SynthSeqStream`` replays the same row space as a
rate-limited micro-batch stream through ``SimpleDataSourceStreamReader``
— offsets are plain row indexes, so crash/replay semantics are exact.

Scale note: a generator source is embarrassingly parallel by
construction; the pushdown plumbing is the part that matters as a
template for REAL Python sources (internal feeds, bespoke formats),
where skipping a slice server-side is the difference between a scan
and a no-op.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

SCHEMA_DDL = "id bigint, bucket int, value_c bigint, tag string"


def _row(i: int) -> tuple:
    """Pure deterministic row for index ``i`` (md5-derived, matching
    the engine's portable-hash rule so DuckDB can replay it)."""
    h = hashlib.md5(f"synthseq#{i}".encode()).hexdigest()
    bucket = int(h[:2], 16) % 10
    value_c = int(h[2:10], 16) % 100_000
    return (i, bucket, value_c, f"t{bucket}")


class _Slice(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo = lo
        self.hi = hi


class SynthSeqReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.num_partitions = int(options.get("numpartitions", 8))
        self.lo = 0
        self.hi = self.n  # exclusive

    def pushFilters(self, filters):  # noqa: N802 (API name)
        """Fold supported ``id`` range predicates into the slice
        bounds; everything else is returned for Spark to evaluate."""
        for f in filters:
            col = f.attribute[-1] if f.attribute else None
            if col == "id" and isinstance(f, GreaterThanOrEqual):
                self.lo = max(self.lo, int(f.value))
            elif col == "id" and isinstance(f, GreaterThan):
                self.lo = max(self.lo, int(f.value) + 1)
            elif col == "id" and isinstance(f, LessThan):
                self.hi = min(self.hi, int(f.value))
            elif col == "id" and isinstance(f, LessThanOrEqual):
                self.hi = min(self.hi, int(f.value) + 1)
            else:
                yield f  # unsupported — Spark keeps it

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        n = hi - lo
        if n == 0:
            return [_Slice(lo, lo)]
        parts = min(self.num_partitions, n)
        step = -(-n // parts)
        return [
            _Slice(lo + p * step, min(lo + (p + 1) * step, hi))
            for p in range(parts)
            if lo + p * step < hi
        ]

    def read(self, partition: _Slice) -> Iterator[tuple]:
        for i in range(partition.lo, partition.hi):
            yield _row(i)


class SynthSeqStreamReader(SimpleDataSourceStreamReader):
    """Offset = next unread row index; each micro-batch emits up to
    ``rowsPerBatch`` rows. Pure function of the offset range, so a
    replayed batch is bit-identical (exactly-once downstream with any
    idempotent sink)."""

    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.rows_per_batch = int(options.get("rowsperbatch", 100))

    def initialOffset(self):  # noqa: N802
        return {"index": 0}

    def read(self, start: dict):
        lo = start["index"]
        hi = min(lo + self.rows_per_batch, self.n)
        return ([_row(i) for i in range(lo, hi)], {"index": hi})

    def readBetweenOffsets(self, start: dict, end: dict):
        return [_row(i) for i in range(start["index"], end["index"])]


class SynthSeq(DataSource):
    """``spark.read.format("synthseq").option("n", N)`` — and the
    streaming twin via ``spark.readStream.format("synthseq")``."""

    @classmethod
    def name(cls) -> str:
        return "synthseq"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> SynthSeqReader:
        return SynthSeqReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SynthSeqStreamReader:
        return SynthSeqStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the synthseq source.

    Also enables ``spark.sql.python.filterPushdown.enabled`` (a runtime
    SQL conf): Spark 4.1 hard-fails any Python data source whose reader
    implements ``pushFilters`` when that conf is false, so registration
    must carry the conf to stay portable across sessions that did not
    set it at build time (e.g. a vanilla default-conf session)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SynthSeq)
