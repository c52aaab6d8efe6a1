"""Exactly-once streaming ingestion into the versioned snapshot store.

Closes the streaming ↔ state-store loop: micro-batches from any
Structured Streaming source land in a ``SnapshotStateStore`` table
with EXACTLY-ONCE semantics, the property a raw
``foreachBatch → parquet append`` does not have (a batch replayed
after a crash appends twice).

Protocol (the Delta-Lake "txn version in the commit" idea on the
engine's own store): each micro-batch commits its data files AND its
``batch_id`` in ONE atomic manifest commit (``metadata={"batch_id"}``,
sources/state.py). Structured Streaming guarantees batch ids are
monotonically increasing per query and that post-crash replay
re-delivers the SAME id — so the sink skips any batch whose id is
≤ the last committed one. Crash windows:

- after staging data files, before commit → orphans (no manifest
  references them; ``vacuum`` sweeps them), replay commits cleanly;
- after commit, before Spark records the epoch → replay arrives with
  the same id and is skipped by the marker.

Either way each batch's rows appear in exactly one committed
snapshot. Single writer per (query, table) — same contract as the
incremental-dedup ingest; two different queries writing one table
would interleave ids and break the monotonic skip rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from clickhouse_k_means_spark.sources.state import SnapshotStateStore


class SnapshotStreamSink:
    """``foreachBatch`` sink writing a stream into one store table."""

    def __init__(self, store: SnapshotStateStore, table: str):
        self.store = store
        self.table = table
        self.n_committed = 0
        self.n_skipped = 0

    def last_batch_id(self) -> int | None:
        # Backward manifest scan, not latest-only: an interleaved
        # non-sink commit (upsert/truncate) must not erase the marker
        # and open a double-commit window on replay (ADVICE r5).
        b = self.store.latest_metadata_value(self.table, "batch_id")
        return int(b) if b is not None else None

    def process_batch(self, batch: DataFrame, batch_id: int) -> bool:
        """Commit one micro-batch idempotently. Returns True if the
        batch was committed, False if it was a replay (or empty)."""
        last = self.last_batch_id()
        if last is not None and batch_id <= last:
            self.n_skipped += 1
            return False
        if not batch.head(1):
            return False
        self.store.append(batch, self.table, metadata={"batch_id": batch_id})
        self.n_committed += 1
        return True

    def attach(
        self,
        stream: DataFrame,
        checkpoint: str,
        query_name: str = "snapshot_ingest",
        available_now: bool = True,
    ):
        """Start the stream into the store (caller awaits)."""
        w = (
            stream.writeStream.foreachBatch(self.process_batch)
            .queryName(query_name)
            .option("checkpointLocation", checkpoint)
        )
        if available_now:
            w = w.trigger(availableNow=True)
        return w.start()
