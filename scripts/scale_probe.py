"""One-shot sf1 scale probe (VERDICT r5 item 5).

Runs the flagship scale claims — kmeans_fit, near_dedup, ssjoin,
pagerank, pq_ann — on the 10x fixture from ``make_sf1.py`` and prints
wall time + total shuffle read/write bytes per query, so BASELINE.md
can carry a measured 10x datapoint instead of a plan-shape argument.

Usage: python scripts/scale_probe.py [sf_dir]  (default .scale/sf1)
Run SOLO (bench noise protocol): contended runs inflate ~30%.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

UI_PORT = 4057


def get_spark_with_ui():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("scale-probe")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "true")  # REST API = shuffle metrics
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=512m")
        .getOrCreate()
    )


def shuffle_totals(app_id: str) -> tuple[int, int]:
    url = f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=30) as r:
        stages = json.load(r)
    return (
        sum(s.get("shuffleReadBytes", 0) for s in stages),
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".scale", "sf1")
    spark = get_spark_with_ui()
    app_id = spark.sparkContext.applicationId

    import __spark_entry__ as entry
    from clickhouse_k_means_spark.plans.kmeans import KMeansEngine
    from clickhouse_k_means_spark.sources.dataset import load_table, load_yh

    def _noop(df):
        df.write.mode("overwrite").format("noop").save()

    def q_kmeans_fit():
        # bench contract: k=4 parallel-init fit on lineitem features
        yh = load_yh(spark, sf_dir, "lineitem")
        res = KMeansEngine(k=4, seed=42, init="parallel").fit(yh)
        assert res.converged or len(res.model) == 4

    def q_near_dedup():
        _noop(entry.q_near_dedup(spark, sf_dir))

    def q_ssjoin():
        # 10x the bench slice: first 1000 docs of EACH replica.
        # Logs candidate-pair and qualifying-result counts alongside
        # the timing (VERDICT r6 item 6: the 10.5x sf1 wall-time claim
        # is "output growth, not shuffle growth" — these counts make
        # that checkable, no silent caps).
        from clickhouse_k_means_spark.operators.ssjoin import (
            _candidate_pairs,
            _ordered_sets,
            similarity_self_join,
        )

        docs = (
            load_table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .filter("doc_id % 1000000 < 1000")
        )
        _noop(similarity_self_join(docs, threshold_ppm=800_000))

        # counts are reported AFTER the probe window closes (they
        # re-execute the join; measuring them inside sec/shuffle
        # deltas would triple the recorded datapoint)
        def _counts():
            ordered = _ordered_sets(docs, "doc_id", "text")
            counts = {
                "candidates": _candidate_pairs(ordered, 800_000).count(),
                "results": similarity_self_join(
                    docs, threshold_ppm=800_000
                ).count(),
            }
            print(json.dumps({"ssjoin_counts": counts}), flush=True)

        q_ssjoin.after_window = _counts

    def q_pagerank():
        _noop(entry.q_pagerank(spark, sf_dir))

    def q_pq_ann():
        _noop(entry.q_pq_ann(spark, sf_dir))

    def q_lttb():
        _noop(entry.q_lttb(spark, sf_dir))

    def q_topk_heavy():
        _noop(entry.q_topk_heavy(spark, sf_dir))

    def q_anomaly_zscore():
        _noop(entry.q_anomaly_zscore(spark, sf_dir))

    def q_rollup_incremental():
        _noop(entry.q_rollup_incremental(spark, sf_dir))

    def q_triangles():
        # 10x the bench slice: 300 suppliers of EACH key-offset replica
        # (replica order-key spaces are disjoint, so this is 10 disjoint
        # 300-vertex co-supply graphs — 10x the edges AND the output)
        from clickhouse_k_means_spark.operators.graph import (
            co_occurrence_edges,
            triangle_count,
        )

        li = load_table(spark, sf_dir, "lineitem").filter(
            "l_suppkey % 1000000 < 300"
        )
        _noop(
            triangle_count(
                co_occurrence_edges(li, group="l_orderkey", node="l_suppkey")
            )
        )

    def q_semdedup():
        # the SCALE path on purpose: k=32 × 64 dims exceeds the unroll
        # budget, so assignment runs the Arrow matmul tier; the only
        # quadratic term is the in-cluster pair join (~n²/k pairs)
        from pyspark.sql import functions as F

        from clickhouse_k_means_spark.operators.semdedup import semantic_dedup

        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        out = semantic_dedup(emb, k=32, threshold=0.8, seed=42, max_iter=5)
        _noop(out)

        def _counts():
            print(
                json.dumps(
                    {
                        "semdedup_counts": {
                            "rows": out.count(),
                            "kept": out.filter("keep = 1").count(),
                        }
                    }
                ),
                flush=True,
            )

        q_semdedup.after_window = _counts

    def q_knn_join():
        # raw operator, NOT the registry gate (whose sampled exact
        # recall check dominates its cost at fixture scale)
        from pyspark.sql import functions as F

        from clickhouse_k_means_spark.operators.similarity import knn_join

        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        _noop(knn_join(emb, k=5))

    def q_cdc_dedup():
        from clickhouse_k_means_spark.operators.dedup import cdc_dedup

        docs = load_table(spark, sf_dir, "documents")
        _noop(cdc_dedup(docs, divisor=8))

    def q_cdc_dedup_incremental():
        # two-batch ingest protocol over corpus halves (the r8
        # span/embed incremental probe shape)
        import tempfile

        from pyspark.sql import functions as F

        from clickhouse_k_means_spark.operators.dedup import (
            incremental_cdc_dedup,
        )
        from clickhouse_k_means_spark.sources.state import SnapshotStateStore

        docs = load_table(spark, sf_dir, "documents")
        store = SnapshotStateStore(tempfile.mkdtemp(prefix="cdcprobe_"))
        committed = []
        for batch in (
            docs.filter(F.pmod("doc_id", F.lit(2)) == 0),
            docs.filter(F.pmod("doc_id", F.lit(2)) == 1),
        ):
            out, n = incremental_cdc_dedup(batch, store, divisor=8)
            _noop(out)
            committed.append(n)
        q_cdc_dedup_incremental.counts = committed

    def q_ivf_index():
        # persistent index lifecycle: build on half, append half,
        # probe 5 queries from the committed snapshot
        import tempfile

        from pyspark.sql import functions as F

        from clickhouse_k_means_spark.operators.ann_index import (
            ivf_append,
            ivf_index,
            ivf_query,
        )
        from clickhouse_k_means_spark.sources.state import SnapshotStateStore

        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        store = SnapshotStateStore(tempfile.mkdtemp(prefix="ivfprobe_"))
        ivf_index(emb.filter("vec_id % 2 = 1"), store, nlist=64, seed=42)
        ivf_append(emb.filter("vec_id % 2 = 0"), store)
        _noop(ivf_query(emb.filter("vec_id < 5"), store, k=10, nprobe=8,
                        query_key="vec_id"))

    def q_knn_join_partitioned():
        # raw operator with adaptive depth (no recall-gate cross join)
        from pyspark.sql import functions as F

        from clickhouse_k_means_spark.operators.similarity import (
            knn_join_partitioned,
        )

        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        _noop(knn_join_partitioned(emb, k=5, n_cells=64, probe_cells=2))

    def q_ivf_maintenance():
        # r10: drift -> stats -> refit lifecycle (refit re-assigns the
        # WHOLE committed corpus — the probe's question is whether that
        # one Arrow pass + replace commit stays ~flat like ivf_index)
        import tempfile

        from pyspark.sql import functions as F

        from clickhouse_k_means_spark.operators.ann_index import (
            ivf_append,
            ivf_index,
            ivf_query,
            ivf_refit,
            ivf_stats,
        )
        from clickhouse_k_means_spark.sources.state import SnapshotStateStore

        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        store = SnapshotStateStore(tempfile.mkdtemp(prefix="ivfmaintprobe_"))
        drift = F.transform("embedding", lambda x: x * 0.05 + 3.0)
        ivf_index(emb.filter("vec_id % 2 = 1"), store, nlist=64, seed=42)
        ivf_append(
            emb.filter("vec_id % 2 = 0").select(
                (F.col("vec_id") + 10_000_000).alias("vec_id"),
                drift.alias("embedding"),
            ),
            store,
        )
        _noop(ivf_stats(spark, store))
        ivf_refit(spark, store, nlist=64, seed=42)
        _noop(ivf_stats(spark, store))
        _noop(ivf_query(emb.filter("vec_id < 5"), store, k=10, nprobe=8,
                        query_key="vec_id"))

    def q_hybrid_retrieval():
        # r10: BM25 + coverage + RRF — two vocabulary-filtered corpus
        # tokenize passes and rank-bounded fusion; expect ~linear-in-
        # docs wall dominated by the tokenize scans
        from clickhouse_k_means_spark.operators.retrieval import (
            bm25_topk,
            coverage_topk,
            rrf_fuse,
        )

        queries = {1: ["spark", "window", "agg"], 2: ["dup", "merge"],
                   3: ["vector", "hash", "join", "scan"]}
        docs = load_table(spark, sf_dir, "documents")
        bm = bm25_topk(docs, queries, top_n=10)
        cov = coverage_topk(docs, queries, top_n=10)
        _noop(rrf_fuse([bm, cov], k_const=60, top_n=10))

    def q_pq_maintenance():
        # r11: drift -> qerr -> refit lifecycle (refit re-ENCODES the
        # whole committed corpus through fresh codebooks — the probe's
        # question is whether that one Arrow pass + replace commit
        # stays ~flat like ivf_refit's re-assign; the qerr samples are
        # bounded driver reads and must not grow with the corpus)
        import tempfile

        from pyspark.sql import functions as F

        from clickhouse_k_means_spark.operators.ann_index import (
            pq_append,
            pq_index,
            pq_qerr,
            pq_query,
            pq_refit,
        )
        from clickhouse_k_means_spark.sources.state import SnapshotStateStore

        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        store = SnapshotStateStore(tempfile.mkdtemp(prefix="pqmaintprobe_"))
        drift = F.transform("embedding", lambda x: x * 0.05 + 3.0)
        pq_index(emb.filter("vec_id % 2 = 1"), store, m_sub=16,
                 n_codes=64, seed=42)
        pq_append(
            emb.filter("vec_id % 2 = 0").select(
                (F.col("vec_id") + 10_000_000).alias("vec_id"),
                drift.alias("embedding"),
            ),
            store,
        )
        pq_qerr(spark, store)
        pq_refit(spark, store, seed=42)
        pq_qerr(spark, store)
        _noop(pq_query(emb.filter("vec_id < 5"), store, k=10,
                       rerank=256, query_key="vec_id"))

    def q_hybrid_ann_retrieval():
        # r11: BM25 + persistent-IVF vector leg + RRF — expect the
        # wall split between the tokenize scan (linear) and the index
        # build's Arrow assign pass (linear); the fusion term is
        # rank-bounded like hybrid_retrieval's
        _noop(entry.q_hybrid_ann_retrieval(spark, sf_dir))

    def q_ivfpq_maintenance():
        # r11: the composed drift -> (skew AND qerr) -> two-layer
        # refit lifecycle — the probe's question is whether the
        # two-layer refit (sample fits + ONE re-encode pass + replace
        # commit) stays ~flat like ivf_refit/pq_refit
        import tempfile

        from pyspark.sql import functions as F

        from clickhouse_k_means_spark.operators.ann_index import (
            ivfpq_append,
            ivfpq_index,
            ivfpq_qerr,
            ivfpq_query,
            ivfpq_refit,
            ivfpq_skew_factor,
        )
        from clickhouse_k_means_spark.sources.state import SnapshotStateStore

        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        store = SnapshotStateStore(tempfile.mkdtemp(prefix="ivfpqmprobe_"))
        drift = F.transform("embedding", lambda x: x * 0.05 + 3.0)
        ivfpq_index(emb.filter("vec_id % 2 = 1"), store, nlist=64,
                    m_sub=16, n_codes=64, seed=42)
        ivfpq_append(
            emb.filter("vec_id % 2 = 0").select(
                (F.col("vec_id") + 10_000_000).alias("vec_id"),
                drift.alias("embedding"),
            ),
            store,
        )
        ivfpq_skew_factor(spark, store)
        ivfpq_qerr(spark, store)
        ivfpq_refit(spark, store, seed=42)
        ivfpq_skew_factor(spark, store)
        ivfpq_qerr(spark, store)
        _noop(ivfpq_query(emb.filter("vec_id < 5"), store, k=10,
                          nprobe=8, rerank=512, query_key="vec_id"))

    def q_ivfpq_index():
        # r11: composed index build (one-pass encode) + append +
        # masked-ADC probe — the scan term should track pq_ann's code
        # column economics, the probe term ivf_index's cell pruning
        import tempfile

        from pyspark.sql import functions as F

        from clickhouse_k_means_spark.operators.ann_index import (
            ivfpq_append,
            ivfpq_index,
            ivfpq_query,
        )
        from clickhouse_k_means_spark.sources.state import SnapshotStateStore

        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        store = SnapshotStateStore(tempfile.mkdtemp(prefix="ivfpqprobe_"))
        ivfpq_index(emb.filter("vec_id % 2 = 1"), store, nlist=64,
                    m_sub=16, n_codes=64, seed=42)
        ivfpq_append(emb.filter("vec_id % 2 = 0"), store)
        _noop(ivfpq_query(emb.filter("vec_id < 5"), store, k=10,
                          nprobe=8, rerank=512, query_key="vec_id"))

    def q_ann_delete():
        # r12: key-level delete — build + append, then one filtered
        # replace-commit dropping ~4% of keys, then a double-delete
        # (the no-churn probe). The probe's question is whether the
        # rewrite pass stays ~linear with NO extra shuffle beyond the
        # broadcast anti-join (the corpus side must never shuffle)
        import tempfile

        from pyspark.sql import functions as F

        from clickhouse_k_means_spark.operators.ann_index import (
            ann_delete,
            ivf_append,
            ivf_index,
            ivf_query,
        )
        from clickhouse_k_means_spark.sources.state import SnapshotStateStore

        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        store = SnapshotStateStore(tempfile.mkdtemp(prefix="anndelprobe_"))
        ivf_index(emb.filter("vec_id % 2 = 1"), store, nlist=64, seed=42)
        ivf_append(emb.filter("vec_id % 2 = 0"), store)
        doomed = emb.filter("vec_id % 25 = 7")
        v2 = ann_delete(spark, doomed, store)
        v3 = ann_delete(spark, doomed, store)
        assert v3 == v2, (v2, v3)
        _noop(ivf_query(emb.filter("vec_id < 5"), store, k=10, nprobe=8,
                        query_key="vec_id"))

    def q_stream_ivfpq_ingest():
        # r12: micro-batch ingest into the composed index + full
        # replay — expect the per-batch encode pass (linear) to
        # dominate, the idempotence probe to stay broadcast-semi
        _noop(entry.q_stream_ivfpq_ingest(spark, sf_dir))

    def q_ann_upsert():
        # r12: atomic update-or-insert — one batch-encode pass + one
        # broadcast anti-join rewrite; same no-corpus-shuffle question
        # as ann_delete with the encode term added
        import tempfile

        from pyspark.sql import functions as F

        from clickhouse_k_means_spark.operators.ann_index import (
            ann_upsert,
            ivf_append,
            ivf_index,
            ivf_query,
        )
        from clickhouse_k_means_spark.sources.state import SnapshotStateStore

        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        store = SnapshotStateStore(tempfile.mkdtemp(prefix="annupsprobe_"))
        ivf_index(emb.filter("vec_id % 2 = 1"), store, nlist=64, seed=42)
        ivf_append(emb.filter("vec_id % 2 = 0"), store)
        src = emb.filter("vec_id % 25 = 7")
        batch = src.select(
            "vec_id", F.transform("embedding", lambda x: -x).alias("embedding")
        ).unionAll(
            src.select((F.col("vec_id") + 10_000_000).alias("vec_id"),
                       "embedding")
        )
        ann_upsert(batch, store)
        _noop(ivf_query(emb.filter("vec_id < 5"), store, k=10, nprobe=8,
                        query_key="vec_id"))

    def q_ann_filtered_query():
        # r13: predicate-pushed filtered probe — the question is
        # whether the semi-join + per-cell count pass stay linear in
        # the SURVIVORS (never the corpus) and the widened isin scan
        # tracks the filter's selectivity
        _noop(entry.q_ann_filtered_query(spark, sf_dir))

    def q_stream_upsert_ingest():
        # r13: marker-gated streaming upsert + full replay — the
        # replay leg must cost two manifest reads (both batches
        # skipped), so the probe should track ann_upsert's encode +
        # rewrite economics for the FIRST run only
        _noop(entry.q_stream_upsert_ingest(spark, sf_dir))

    def q_ann_compaction():
        # r13: churn + advisor + optimize/vacuum — the advisor is one
        # manifest read + listing (no data IO); optimize is one
        # coalesced rewrite of the head snapshot
        _noop(entry.q_ann_compaction(spark, sf_dir))

    def q_ann_recall():
        # r13: bounded self-query sample + ONE corpus brute-force pass
        # — expect near-flat wall at 10x (the exact pass is 16 queries
        # x corpus, Arrow-fused) with linear scan bytes
        _noop(entry.q_ann_recall(spark, sf_dir))

    def q_hybrid_filtered_retrieval():
        # r13: both legs pre-filtered — BM25 postings stay vocabulary-
        # filtered, the vector leg is the predicate-pushed index scan;
        # fusion is a rank-bounded union+agg
        _noop(entry.q_hybrid_filtered_retrieval(spark, sf_dir))

    def q_ann_delta_churn():
        # r14: merge-on-read churn — the commit terms are O(batch)
        # staging writes; the scale-variant terms are the build and
        # the full-probe replay legs, so wall should track the
        # ivf_index_query class while churn WRITE bytes stay constant
        # (the dedicated churn-bytes probe in BASELINE.md)
        _noop(entry.q_ann_delta_churn(spark, sf_dir))

    def q_ann_predicate_delete():
        # r14: predicate takedown — matched-key resolution is one
        # columnar pass over the resolved rows (linear), the commit
        # O(matched)
        _noop(entry.q_ann_predicate_delete(spark, sf_dir))

    def q_ann_recall_filtered():
        # r14: three survivor-restricted probes, each ONE brute-force
        # pass over the predicate survivors (1/3 of the corpus here)
        # — expect the ann_recall shape scaled by selectivity
        _noop(entry.q_ann_recall_filtered(spark, sf_dir))

    def q_cdc_apply():
        # r14: one mixed delete+upsert batch as a single delta layer —
        # encode pass over the upserts + O(batch) staging; scale term
        # is the build + full-probe replay legs
        _noop(entry.q_cdc_apply(spark, sf_dir))

    sets = {
        "r14": [
            ("ann_delta_churn", q_ann_delta_churn),
            ("ann_predicate_delete", q_ann_predicate_delete),
            ("ann_recall_filtered", q_ann_recall_filtered),
            ("cdc_apply", q_cdc_apply),
        ],
        "r13": [
            ("ann_filtered_query", q_ann_filtered_query),
            ("stream_upsert_ingest", q_stream_upsert_ingest),
            ("ann_compaction", q_ann_compaction),
            ("ann_recall", q_ann_recall),
            ("hybrid_filtered_retrieval", q_hybrid_filtered_retrieval),
        ],
        "r12": [
            ("ann_delete", q_ann_delete),
            ("ann_upsert", q_ann_upsert),
            ("stream_ivfpq_ingest", q_stream_ivfpq_ingest),
        ],
        "r7": [
            ("semdedup", q_semdedup),
            ("knn_join", q_knn_join),
        ],
        "r10": [
            ("ivf_maintenance", q_ivf_maintenance),
            ("hybrid_retrieval", q_hybrid_retrieval),
        ],
        "r11": [
            ("pq_maintenance", q_pq_maintenance),
            ("hybrid_ann_retrieval", q_hybrid_ann_retrieval),
            ("ivfpq_index", q_ivfpq_index),
            ("ivfpq_maintenance", q_ivfpq_maintenance),
        ],
        "r9": [
            ("cdc_dedup", q_cdc_dedup),
            ("cdc_dedup_incremental", q_cdc_dedup_incremental),
            ("ivf_index", q_ivf_index),
            ("knn_join_partitioned", q_knn_join_partitioned),
        ],
        "r5": [
            ("kmeans_fit", q_kmeans_fit),
            ("near_dedup", q_near_dedup),
            ("ssjoin", q_ssjoin),
            ("pagerank", q_pagerank),
            ("pq_ann", q_pq_ann),
        ],
        "r6": [
            ("lttb", q_lttb),
            ("topk_heavy", q_topk_heavy),
            ("anomaly_zscore", q_anomaly_zscore),
            ("rollup_incremental", q_rollup_incremental),
            ("triangles", q_triangles),
        ],
    }
    which = os.environ.get("SPARK_GRAFT_PROBE_SET", "r5")

    results = {}
    for name, fn in sets[which]:
        r0, w0 = shuffle_totals(app_id)
        t0 = time.perf_counter()
        fn()
        sec = round(time.perf_counter() - t0, 2)
        r1, w1 = shuffle_totals(app_id)
        after = getattr(fn, "after_window", None)
        if after is not None:  # diagnostics that re-execute the query
            after()
        results[name] = {
            "sec": sec,
            "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
            "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
        }
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps({"metric": "scale_probe", "sf_dir": sf_dir, "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
