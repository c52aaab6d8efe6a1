"""Streaming ingest into the persistent ANN indexes: ``foreachBatch``
+ ``operators/ann_index.ivf_append`` (``StreamingIvfIngest``),
``pq_append`` (``StreamingPqIngest``, r11), or ``ivfpq_append``
(``StreamingIvfPqIngest``, r12 — the composed production
architecture) — the vector-corpus companion to ``dedup_stream``
(documents) and ``sketch_stream`` (aggregates).

The reference has no streaming surface; this composes two certified
pieces — the committed-quantizer append (every batch buckets through
the version-1 fit, no re-fit, r9) and the snapshot store's manifest
commits — into the production shape: an embedding stream lands in the
queryable ANN index one atomic version per micro-batch, and the index
is queryable (and time-travelable) BETWEEN batches.

Exactly-once story: ``ivf_append`` is key-idempotent (ADVICE r9 — it
anti-joins the batch against committed assignment keys), so a crashed
query that replays a committed micro-batch appends ZERO fresh rows;
at-least-once execution converges to exactly-once index content with
no separate batch-marker table. The replay still pays the (broadcast-
semi, history-never-shuffled) probe — the price of marker-free
idempotence, fine at micro-batch size.

Bootstrap contract: the quantizer must exist before the stream starts
(run ``ivf_index`` on a seed corpus first); a stream attached to an
index with no committed quantizer fails loudly on its first non-empty
batch (``ivf_append`` raises — never silent wrong cells). Maintenance
(``ivf_stats`` / ``ivf_refit``) runs between batches under the same
single-writer-per-table contract the incremental operators carry;
Structured Streaming guarantees serial micro-batches within a query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class StreamingIvfIngest:
    """Driver-held counters + per-batch committed-quantizer appends."""

    def __init__(
        self,
        store,
        table: str = "ivf_index",
        key: str = "vec_id",
        vec: str = "embedding",
    ):
        self.store = store
        self.table = table
        self.key = key
        self.vec = vec
        self.n_batches = 0
        self.n_seen = 0
        self.versions: list[int] = []

    def process_batch(self, batch: DataFrame) -> int:
        """Append one micro-batch through the committed quantizer;
        returns the committed snapshot version."""
        from clickhouse_k_means_spark.operators.ann_index import ivf_append

        return ivf_append(
            batch, self.store, table=self.table, key=self.key, vec=self.vec
        )

    _DEFAULT_QUERY_NAME = "streaming_ivf_ingest"

    def attach(
        self,
        stream: DataFrame,
        checkpoint: str,
        query_name: str | None = None,
    ):
        """Ingest the stream into the index (caller awaits).

        One snapshot version per non-empty micro-batch; replayed
        batches commit empty appends (key-idempotent)."""

        def _on_batch(batch: DataFrame, _batch_id: int) -> None:
            if not batch.head(1):
                return
            self.n_batches += 1
            self.n_seen += batch.count()
            self.versions.append(self.process_batch(batch))

        return (
            stream.writeStream.foreachBatch(_on_batch)
            .queryName(query_name or self._DEFAULT_QUERY_NAME)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )


class StreamingIvfPqIngest(StreamingIvfIngest):
    """The composed-index twin (r12 — VERDICT r11 item 5): per-batch
    COMMITTED-GEOMETRY encodes via ``ivfpq_append`` — coarse cell plus
    residual PQ codes in one pass through the version-pinned quantizer
    AND codebooks. Same exactly-once story (``ivfpq_append`` shares
    the family's ``_fresh_rows`` key-idempotence probe, so a replayed
    micro-batch appends zero code rows) and the same bootstrap
    contract (run ``ivfpq_index`` on a seed corpus first; a stream
    attached to a table with no committed quantizer/codebooks fails
    loudly on its first non-empty batch). Maintenance
    (``ivfpq_stats`` / ``ivfpq_refit``) runs between batches under the
    single-writer contract; a refit mid-stream is safe because
    Structured Streaming serializes micro-batches and every batch
    re-reads the LATEST committed geometry."""

    _DEFAULT_QUERY_NAME = "streaming_ivfpq_ingest"

    def __init__(
        self,
        store,
        table: str = "ivfpq_index",
        key: str = "vec_id",
        vec: str = "embedding",
    ):
        super().__init__(store, table=table, key=key, vec=vec)

    def process_batch(self, batch: DataFrame) -> int:
        from clickhouse_k_means_spark.operators.ann_index import ivfpq_append

        return ivfpq_append(
            batch, self.store, table=self.table, key=self.key, vec=self.vec
        )


class StreamingPqIngest(StreamingIvfIngest):
    """The PQ twin (r11): per-batch COMMITTED-CODEBOOK encodes via
    ``pq_append`` — same exactly-once story (``pq_append`` shares
    ``ivf_append``'s key-idempotence probe, so a replayed micro-batch
    appends zero code rows) and the same bootstrap contract (run
    ``pq_index`` on a seed corpus first; a stream attached to a table
    with no committed codebooks fails loudly on its first non-empty
    batch). Maintenance (``pq_stats`` / ``pq_refit``) runs between
    batches under the single-writer contract; a refit mid-stream is
    safe because Structured Streaming serializes micro-batches and
    every batch re-reads the LATEST committed codebooks."""

    _DEFAULT_QUERY_NAME = "streaming_pq_ingest"

    def __init__(
        self,
        store,
        table: str = "pq_index",
        key: str = "vec_id",
        vec: str = "embedding",
    ):
        super().__init__(store, table=table, key=key, vec=vec)

    def process_batch(self, batch: DataFrame) -> int:
        from clickhouse_k_means_spark.operators.ann_index import pq_append

        return pq_append(
            batch, self.store, table=self.table, key=self.key, vec=self.vec
        )
