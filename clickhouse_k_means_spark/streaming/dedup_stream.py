"""Streaming ingest dedup: ``foreachBatch`` + the snapshot hash store.

The reference has no streaming surface; this composes two pieces the
engine already certifies — ``operators/dedup.incremental_exact_dedup``
(digest anti-join vs persisted hash history, one commit per batch) and
``sources/state.SnapshotStateStore`` (snapshot-isolated manifest
commits) — into the production corpus-ingest shape: a document stream
deduped against EVERYTHING ever committed, not just the current
micro-batch, with survivors appended to a parquet sink.

Scale shape (100 TB corpus, streaming arrivals):
- per micro-batch cost is the incremental-dedup shape: one skew-free
  join keyed on the md5 digest against the history table plus one tiny
  hash append — the corpus-sized history is never rewritten.
- ``foreachBatch`` keeps the dataflow stateless on the Spark side; the
  durable state is the store's manifest log, so a crashed query
  resumes from its checkpoint and re-runs the failed batch against the
  last COMMITTED snapshot (the hash append is the batch's commit
  point). Replays of a committed batch are harmless: every hash is
  already in history, so zero survivors re-emit — at-least-once
  execution converges to exactly-once OUTPUT for duplicates.
- single writer per hash table (the incremental-dedup contract);
  Structured Streaming guarantees serial micro-batches within a query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class StreamingDedup:
    """Driver-held counters + per-batch incremental dedup."""

    def __init__(
        self,
        store,
        table: str = "seen_hashes",
        text: str = "text",
        key: str = "doc_id",
    ):
        self.store = store
        self.table = table
        self.text = text
        self.key = key
        self.n_batches = 0
        self.n_seen = 0
        self.n_survived = 0

    def process_batch(self, batch: DataFrame) -> DataFrame:
        """Dedup one micro-batch against history; returns survivors."""
        from clickhouse_k_means_spark.operators.dedup import (
            incremental_exact_dedup,
        )

        survivors, _ = incremental_exact_dedup(
            batch, self.store, table=self.table, text=self.text, key=self.key
        )
        return survivors

    def attach(
        self,
        stream: DataFrame,
        sink_path: str,
        checkpoint: str,
        query_name: str = "streaming_dedup",
    ):
        """Dedup the stream into a parquet sink (caller awaits).

        Survivors of each micro-batch append to ``sink_path``; the
        hash history advances one snapshot per non-empty batch.
        """

        def _on_batch(batch: DataFrame, _batch_id: int) -> None:
            # one materialization per micro-batch (r14, guide §1.2):
            # head(1) + count() re-ran the stream-source scan twice
            # before the dedup pipeline's own pass
            batch = batch.localCheckpoint(eager=True)
            n_in = batch.count()
            if n_in == 0:
                return
            self.n_batches += 1
            self.n_seen += n_in
            survivors = self.process_batch(batch)
            n = survivors.count()
            self.n_survived += n
            if n:
                survivors.write.mode("append").parquet(sink_path)

        return (
            stream.writeStream.foreachBatch(_on_batch)
            .queryName(query_name)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )


def watermarked_dedup_stream(
    stream: DataFrame,
    keys: list[str],
    time_col: str = "event_time",
    delay: str = "30 minutes",
) -> DataFrame:
    """Native bounded-state streaming dedup:
    ``dropDuplicatesWithinWatermark`` over ``keys``.

    The complement to ``StreamingDedup``: that class keeps the FULL
    ingest history (external snapshot store, grows forever, survives
    restarts); this keeps dedup state only inside the watermark
    horizon — Spark garbage-collects key state as the watermark
    advances, so state size is bounded by arrival rate × ``delay``
    regardless of stream lifetime. Correct exactly when duplicates
    are known to arrive within ``delay`` of each other (retry storms,
    at-least-once upstreams), which is the common case the full-history
    store is overkill for. The first occurrence wins; later arrivals
    inside the horizon are dropped even if their event time differs.
    """
    return stream.withWatermark(time_col, delay).dropDuplicatesWithinWatermark(keys)
