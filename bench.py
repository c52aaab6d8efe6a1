"""Headline benchmark — one JSON line of per-query wall times.

Runs the engine's flagship operations at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``:

- kmeans_fit      full k-means++ init + Lloyd loop on lineitem features
- lloyd_step      one assign + per-cluster recompute pass
- elbow           total nearest-centroid distance (model as literals)
- tpch_q1         pricing-summary aggregation
- tpch_q3/q5      3-way and 5-way join analytics
- minhash_lsh     MinHash signatures + LSH candidate pairs over documents
- simhash         packed 60-bit SimHash per document
- ann_topk        brute-force cosine top-10, 5 queries × corpus
- text_quality    tokenize/quality/language-ID scan of documents
- silhouette      sampled simplified silhouette (reference formula)
- asof_join       view→latest-purchase as-of join over events
- sessionize      gap-based sessionization of the events table
- kscale          (separate section, not in the headline total)
                  k=64 fit with k-means|| init + Arrow Lloyd
                  assignment, vs MLlib's k-means|| as the
                  comparable-inertia reference

Measurement protocol (stabilized in round 2 — VERDICT r1 item 5: the
round-1 numbers swung up to 3× between runs from JVM warm-up and run
order): FIXED query order (the list above), one UNTIMED warm-up
execution per query, then the MEDIAN of ``$SPARK_GRAFT_BENCH_REPS``
(default 3) timed executions; per-query ``detail`` records the raw
samples and their MIN so convergence-iteration noise stays visible in
the artifact (VERDICT r4 item 4 — the iterative queries, kmeans_fit
and dedup_components, run a full 3 reps for exactly that reason).
Refined in round 8: for 2-rep queries the reported statistic is the
MIN of the two samples, because a 2-sample "median" is really the
mean and a single GC/janino hiccup inflates it by half the outlier
(the r8 clean run measured bigram_lm samples [2.46, 12.02] — the
mean, 7.24 s, would gate-fail a 1.49 s anchor on pure noise).
Queries with ≥3 reps keep the median.

Materialization uses the noop sink (full execution, no driver
collection cost) unless the operation is inherently driver-side
(the fit loop). Prints ONE JSON line per the driver contract.
"""

from __future__ import annotations

import gc
import json
import os
import re
import statistics
import time

from pyspark.sql import DataFrame


def _materialize(df: DataFrame) -> None:
    df.write.mode("overwrite").format("noop").save()


def _ssjoin_bench(spark, sf_dir: str) -> DataFrame:
    """Bounded SSJoin bench slice (see the bench-list comment)."""
    from clickhouse_k_means_spark.operators.ssjoin import similarity_self_join
    from clickhouse_k_means_spark.sources.dataset import load_table

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter("doc_id < 1000")
    )
    return similarity_self_join(docs, threshold_ppm=800_000)


def _triangles_bench(spark, sf_dir: str):
    """Bounded triangle-census bench slice: the SYNTHETIC fixture's
    co-supplier graph is COMPLETE (every supplier pair shares an
    order at sf0.1), so the full census output is C(n,3) ≈ 1.7e8 —
    an output-size cost no algorithm avoids, same situation as the
    ssjoin slice. 300 vertices keep the measurement about the plan
    (distinct + orientation + wedge join), not the degenerate
    corpus."""
    from clickhouse_k_means_spark.operators.graph import (
        co_occurrence_edges,
        triangle_count,
    )
    from clickhouse_k_means_spark.sources.dataset import load_table

    li = load_table(spark, sf_dir, "lineitem").filter("l_suppkey < 300")
    return triangle_count(
        co_occurrence_edges(li, group="l_orderkey", node="l_suppkey")
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

    from clickhouse_k_means_spark.session import get_spark

    spark = get_spark("bench")

    import __spark_entry__ as entry

    from clickhouse_k_means_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from clickhouse_k_means_spark.plans.kmeans import KMeansEngine
    from clickhouse_k_means_spark.plans.optimal_k import silhouette_sampled
    from clickhouse_k_means_spark.sources.dataset import load_table, load_yh

    timings: dict[str, float] = {}
    detail: dict[str, dict] = {}

    def _code_cache_mb() -> float:
        """Occupied JVM code-cache MB (CodeHeap pools). When this
        saturates ReservedCodeCacheSize the JIT stops compiling and
        codegen'd queries run interpreted — the prime suspect for the
        r2 full-sequence outliers; recorded per query so a slow run is
        self-diagnosing from the artifact."""
        try:
            beans = spark.sparkContext._jvm.java.lang.management.ManagementFactory.getMemoryPoolMXBeans()
            used = 0
            for i in range(beans.size()):
                b = beans.get(i)
                if "CodeHeap" in b.getName() or "Code Cache" in b.getName():
                    used += b.getUsage().getUsed()
            return round(used / 1e6, 1)
        except Exception:
            return -1.0

    def _storage_rdds() -> int:
        """Count of RDDs holding storage blocks (localCheckpoints
        pinned by uncollected driver references) — recorded per query
        so storage-pressure degradation is self-diagnosing from the
        artifact, like the code-cache column."""
        try:
            return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
        except Exception:
            return -1

    def timed(
        name: str, fn, n_reps: int | None = None, into: dict | None = None
    ) -> None:
        t0 = time.perf_counter()
        fn()  # warm-up: JIT/codegen cache, shuffle file reuse, page cache
        cold = time.perf_counter() - t0
        samples = []
        for _ in range(n_reps or reps):
            t0 = time.perf_counter()
            fn()
            samples.append(time.perf_counter() - t0)
        # Reported statistic: median when >=3 samples (robust there);
        # with 2 samples the "median" degenerates to the MEAN, so one
        # GC/janino hiccup inflates it by half the outlier (r8 clean
        # run: bigram_lm samples [2.46, 12.02] -> 7.24 reported vs a
        # 1.49 anchor, pure noise). Min is the robust 2-sample choice;
        # cold + every sample stay visible in the detail line.
        stat = statistics.median(samples) if len(samples) >= 3 else min(samples)
        (timings if into is None else into)[name] = round(stat, 3)
        detail[name] = {
            "cold": round(cold, 3),
            "samples": [round(s, 3) for s in samples],
            "min": round(min(samples), 3),
            "code_cache_mb": _code_cache_mb(),
            "rdds": _storage_rdds(),
        }
        # Release this query's eager localCheckpoint blocks NOW: they
        # unpin only when the driver-side Python references are
        # collected (ContextCleaner), and across a ~126-query run the
        # accumulated blocks tax whichever query runs while eviction
        # catches up — the rotating in-sequence victim the r8 clean
        # runs kept producing (pipeline_e2e warm 21 s vs its own 3.5 s
        # cold in the same run, solo 4.2 s).
        gc.collect()

    # warm the JVM + parquet footers before any measured query
    load_table(spark, sf_dir, "lineitem").count()
    load_table(spark, sf_dir, "documents").count()
    load_table(spark, sf_dir, "events").count()

    yh = load_yh(spark, sf_dir, "lineitem")

    def bench_fit() -> None:
        res = KMeansEngine(k=4, seed=42, max_iter=15).fit(yh)
        assert len(res.model) == 4

    timed("kmeans_fit", bench_fit, n_reps=min(reps, 3))
    timed("lloyd_step", lambda: _materialize(entry.q_lloyd_recompute(spark, sf_dir)))
    timed("elbow", lambda: _materialize(entry.q_elbow_total(spark, sf_dir)))
    timed("tpch_q1", lambda: _materialize(entry.q_tpch_q1(spark, sf_dir)))
    timed("tpch_q3", lambda: _materialize(entry.q_tpch_q3(spark, sf_dir)))
    timed("tpch_q5", lambda: _materialize(entry.q_tpch_q5(spark, sf_dir)))

    def bench_minhash() -> None:
        docs = load_table(spark, sf_dir, "documents")
        sigs = minhash_signatures(docs, n_hashes=8, shingle_n=3)
        _materialize(lsh_candidate_pairs(sigs, n_hashes=8, n_bands=4))

    timed("minhash_lsh", bench_minhash)
    timed("simhash", lambda: _materialize(entry.q_simhash_docs(spark, sf_dir)))
    timed("ann_topk", lambda: _materialize(entry.q_ann_topk(spark, sf_dir)))

    def bench_text() -> None:
        _materialize(entry.q_quality_scores(spark, sf_dir))
        _materialize(entry.q_lang_id(spark, sf_dir))

    timed("text_quality", bench_text)

    def bench_silhouette() -> None:
        model = entry.MODEL
        silhouette_sampled(yh, model, max_rows=2000, seed=42)

    timed("silhouette", bench_silhouette)
    timed("asof_join", lambda: _materialize(entry.q_asof_join(spark, sf_dir)))
    timed("sessionize", lambda: _materialize(entry.q_sessionize(spark, sf_dir)))

    # ---- extended: LLM-pipeline + event-time ops ----------------------
    # Measured with the same warm-up+median protocol but kept OUT of
    # the headline total (the BASELINE.md 28.4 s protocol is the fixed
    # 13-query list above). Two reps each — these exist to catch
    # full-sequence regressions (codegen-cache pressure, shuffle
    # explosions) on the non-headline surface, not to micro-rank.
    extended: dict[str, float] = {}
    for name, q, n_reps in [
        ("time_buckets", entry.q_time_buckets, 2),
        ("range_join", entry.q_range_join, 2),
        ("hll_rollup", entry.q_hll_rollup, 2),
        ("tfidf_top_terms", entry.q_tfidf_top_terms, 2),
        # iterative star loop: convergence-count noise needs 3 reps
        # (r4 samples [2.16, 4.38] — VERDICT r4 item 4)
        ("dedup_components", entry.q_dedup_components, 3),
        ("embed_neardup_lsh", entry.q_embed_neardup_lsh, 2),
        # SemDeDup: fixed-centroid assignment + in-cluster pair edges
        # + CC grouping + keep rule over the 1000-vector slice
        ("semdedup", entry.q_semdedup, 2),
        ("srp_ann", entry.q_srp_ann, 2),
        ("ivf_ann", entry.q_ivf_ann, 2),
        ("decontaminate", entry.q_decontaminate, 2),
        ("hash_split", entry.q_hash_split, 2),
        ("pack_sequences", entry.q_pack_sequences, 2),
        ("mix_sources", entry.q_mix_sources, 2),
        # two-batch ingest replay incl. snapshot-store commits; a bit
        # heavier and stateful-ish (fresh temp store per run)
        ("dedup_incremental", entry.q_dedup_incremental, 2),
        # r5 additions: bucketed write+join (write cost dominates —
        # that's the point, it's paid once), unigram LM, ES sampling
        ("bucketed_join", entry.q_bucketed_join, 2),
        ("unigram_lm", entry.q_unigram_lm, 2),
        ("weighted_sample", entry.q_weighted_sample, 2),
        # full near-dup pipeline (sigs -> LSH -> jaccard verify -> CC
        # -> anti-join) incl. the planted-dup corpus union
        ("near_dedup", entry.q_near_dedup, 2),
        # three sketch commits to a temp snapshot store + union merge
        ("hll_incremental", entry.q_hll_incremental, 2),
        # orders -> JSONL -> CSV -> rollup (IO-bound by design)
        ("formats_roundtrip", entry.q_formats_roundtrip, 2),
        # correlated EXISTS (decorrelated semi join) / HAVING rollup
        ("tpch_q4", entry.q_tpch_q4, 2),
        ("tpch_q18", entry.q_tpch_q18, 2),
        # three binned-count commits + integer merge
        ("histogram_incremental", entry.q_histogram_incremental, 2),
        # one percentile aggregate + CASE projection
        ("curriculum", entry.q_curriculum, 2),
        # hashing-trick long form (no vocabulary join at all)
        ("hashed_features", entry.q_hashed_features, 2),
        # end-to-end: tokens -> hashed 8-dim -> engine k-means fit
        ("doc_clusters", entry.q_doc_clusters, 2),
        # r5 batch 2: PQ ANN (encode + ADC + re-rank), CUBE subtotals,
        # corpus-frequent shingle ratio, per-source unigram KL
        ("pq_ann", entry.q_pq_ann, 2),
        ("cube_revenue", entry.q_cube_revenue, 2),
        ("boilerplate", entry.q_boilerplate, 2),
        ("domain_kl", entry.q_domain_kl, 2),
        ("embed_covariance", entry.q_embed_covariance, 2),
        ("moving_avg", entry.q_moving_avg, 2),
        ("funnel", entry.q_funnel, 2),
        ("retention", entry.q_retention, 2),
        # two-batch ingest near-dedup replay incl. band-history commits
        ("near_dedup_incremental", entry.q_near_dedup_incremental, 2),
        # one-scan declarative constraint validation
        ("data_quality", entry.q_data_quality, 2),
        # map-only token-budget chunking (scan -> sequence-explode ->
        # slice, zero shuffles) / term-postings stats (two-level agg)
        ("chunk_docs", entry.q_chunk_docs, 2),
        ("inverted_index", entry.q_inverted_index, 2),
        # corpus bigram LM scoring (map-only bigram construction)
        ("bigram_lm", entry.q_bigram_lm, 2),
        # frequency-table exact quantiles + Tukey-fence flagging
        ("outliers", entry.q_outliers, 2),
        # 3-iteration integer PageRank over the co-supplier graph
        ("pagerank", entry.q_pagerank, 2),
        # ORC write (partitioned, bloom) + pruned read-back rollup
        ("orc_roundtrip", entry.q_orc_roundtrip, 2),
        # exactly-once stream -> snapshot-store ingest + read-back
        ("stream_ingest", entry.q_stream_ingest, 2),
        # outer-join histogram / anti-join distinct-count TPC-H shapes
        ("tpch_q13", entry.q_tpch_q13, 2),
        ("tpch_q16", entry.q_tpch_q16, 2),
        # broadcast-bloom probe-side prefilter + exact shuffle join
        ("bloom_join", entry.q_bloom_join, 2),
        # one-scan min/max/null fold + per-column ndv/top aggregates
        ("profile", entry.q_profile, 2),
        # two SCD-2 upsert commits + interval-history rollup
        ("scd2", entry.q_scd2, 2),
        # first-seen running uniques / stream-static enrich / skew scan
        ("cumulative_uniques", entry.q_cumulative_uniques, 2),
        ("stream_enrich", entry.q_stream_enrich, 2),
        ("skew_report", entry.q_skew_report, 2),
        # WindowGroupLimit per-domain hard cap
        ("domain_cap", entry.q_domain_cap, 2),
        # full fit + crash-cut + resumed fit (two fits by design)
        ("resume_fit", entry.q_resume_fit, 2),
        # exact-moment grouped Pearson correlation
        ("corr", entry.q_corr, 2),
        # exact-quantile p05/p95 winsorization stats
        ("winsorize", entry.q_winsorize, 2),
        # append + upsert + full-outer CDC classification
        ("snapshot_diff", entry.q_snapshot_diff, 2),
        # two SCD-2 upserts + broadcast point-in-time fact join
        ("scd2_lookup", entry.q_scd2_lookup, 2),
        # complete prefix-filtered similarity self-join (SSJoin) —
        # benched on a 1000-doc slice at t=0.8: the SYNTHETIC corpus
        # is template-generated and pathologically self-similar, so
        # the full-corpus qualifying-pair count grows quadratically
        # (~42 s at sf0.1 for ~7M true pairs — an output-size cost no
        # algorithm avoids, not a plan defect; real crawl corpora
        # don't have 60% of all pairs above threshold)
        ("ssjoin", _ssjoin_bench, 2),
        # r6 batch (first anchors from BENCH_r06)
        ("tpch_q7", entry.q_tpch_q7, 2),
        ("tpch_q10", entry.q_tpch_q10, 2),
        ("tpch_q14", entry.q_tpch_q14, 2),
        ("tpch_q19", entry.q_tpch_q19, 2),
        ("tpch_q2a", entry.q_tpch_q2a, 2),
        ("running_diff", entry.q_running_diff, 2),
        ("sequence_match", entry.q_sequence_match, 2),
        ("window_funnel", entry.q_window_funnel, 2),
        ("entropy", entry.q_entropy, 2),
        ("chi_square", entry.q_chi_square, 2),
        # r6 batch 2: pushdown scalar agg, MG heavy hitters (Arrow
        # partials + exact recount), time decay, per-series LTTB,
        # array HOFs, map-agg rendering, membership self-join,
        # 3-commit rollup maintenance + compaction
        ("tpch_q6", entry.q_tpch_q6, 2),
        ("tpch_q8a", entry.q_tpch_q8a, 2),
        ("tpch_q12a", entry.q_tpch_q12a, 2),
        ("tpch_q15", entry.q_tpch_q15, 2),
        ("tpch_q17", entry.q_tpch_q17, 2),
        ("tpch_q22a", entry.q_tpch_q22a, 2),
        ("topk_heavy", entry.q_topk_heavy, 2),
        ("topk_weighted", entry.q_topk_weighted, 2),
        ("ema_decay", entry.q_ema_decay, 2),
        ("lttb", entry.q_lttb, 2),
        ("array_funcs", entry.q_array_funcs, 2),
        ("map_agg", entry.q_map_agg, 2),
        ("audience_overlap", entry.q_audience_overlap, 2),
        ("rollup_incremental", entry.q_rollup_incremental, 2),
        # two watermarked file-stream sides + interval-state join
        ("stream_join", entry.q_stream_join, 2),
        ("weighted_quantiles", entry.q_weighted_quantiles, 2),
        ("interval_union", entry.q_interval_union, 2),
        ("locf_fill", entry.q_locf_fill, 2),
        ("pyds_read", entry.q_pyds_read, 2),
        ("variant_json", entry.q_variant_json, 2),
        ("recursive_cte", entry.q_recursive_cte, 2),
        ("lateral_topn", entry.q_lateral_topn, 2),
        # 3 recursive k=2 engine fits over shrinking subsets
        ("bisect_kmeans", entry.q_bisect_kmeans, 2),
        # cell-quantize -> dense-cell components -> border attach
        ("grid_dbscan", entry.q_grid_dbscan, 2),
        # all-points SRP kNN graph + in-query sampled recall gate
        ("knn_join", entry.q_knn_join, 2),
        # the composed 4-stage corpus build, one lineage
        ("pipeline_e2e", entry.q_pipeline_e2e, 2),
        ("stateful_stats", entry.q_stateful_stats, 2),
        ("regex_extract", entry.q_regex_extract, 2),
        ("session_window", entry.q_session_window, 2),
        ("histogram_numeric", entry.q_histogram_numeric, 2),
        ("geo_distance", entry.q_geo_distance, 2),
        ("salted_join", entry.q_salted_join, 2),
        # z-clustered write + 2-D selective read-back
        ("zorder_roundtrip", entry.q_zorder_roundtrip, 2),
        ("grouping_sets", entry.q_grouping_sets, 2),
        ("sequence_count", entry.q_sequence_count, 2),
        ("rolling_median", entry.q_rolling_median, 2),
        ("ngram_sim", entry.q_ngram_sim, 2),
        ("anomaly_zscore", entry.q_anomaly_zscore, 2),
        # degree-ordered triangle census (bounded 300-vertex slice —
        # the synthetic co-supplier graph is complete; see helper)
        ("triangles", _triangles_bench, 2),
        ("array_set_ops", entry.q_array_set_ops, 2),
        # r7 addition: real PNG/WAV encode+decode through mapInPandas
        ("multimodal_codec_stats", entry.q_multimodal_codec_stats, 2),
        # r8 addition: integer-exact Okapi BM25 top-5, 3 term queries
        ("bm25_topk", entry.q_bm25_topk, 2),
        # r8 addition: C4-style span dedup + per-doc reassembly
        ("span_dedup", entry.q_span_dedup, 2),
        # r8 addition: two-batch rolling-ingest span dedup protocol
        ("span_dedup_incremental", entry.q_span_dedup_incremental, 2),
        # r8 addition: two-batch rolling-ingest embedding dedup
        ("embed_dedup_incremental", entry.q_embed_dedup_incremental, 2),
        # r9 addition: any-alignment CDC substring dedup
        ("cdc_dedup", entry.q_cdc_dedup, 2),
        # r9 addition: hierarchical IVF->SRP kNN incl. in-query recall gate
        ("knn_join_partitioned", entry.q_knn_join_partitioned, 2),
        # r9 addition: persistent IVF index build+append+probe replay
        ("ivf_index_query", entry.q_ivf_index_query, 2),
        # r9 addition: two-batch rolling-ingest CDC dedup protocol
        ("cdc_dedup_incremental", entry.q_cdc_dedup_incremental, 2),
        # r9 addition: double-correlated EXISTS/NOT-EXISTS (Q21 shape)
        ("tpch_q21a", entry.q_tpch_q21a, 2),
        # r9 addition: two-phase distributed global shuffle + sharding
        ("training_order", entry.q_training_order, 2),
        # r10 additions: Q9/Q11/Q20 star/scalar-HAVING/nested-IN
        # shapes (adapted, no partsupp in the fixture)
        ("tpch_q9a", entry.q_tpch_q9a, 2),
        ("tpch_q11a", entry.q_tpch_q11a, 2),
        ("tpch_q20a", entry.q_tpch_q20a, 2),
        # r10 addition: IVF drift -> stats -> refit lifecycle incl.
        # in-query recall gate (fresh temp snapshot store per run)
        ("ivf_maintenance", entry.q_ivf_maintenance, 2),
        # r10 addition: streamed index ingest + full at-least-once
        # replay (two availableNow streaming queries per run)
        ("stream_ann_ingest", entry.q_stream_ann_ingest, 2),
        # r10 addition: BM25 + coverage fused by integer RRF
        ("hybrid_retrieval", entry.q_hybrid_retrieval, 2),
        # r10 addition: persistent PQ index build+append+ADC probe
        ("pq_index_query", entry.q_pq_index_query, 2),
        # r11 addition: PQ drift -> qerr stats -> refit lifecycle incl.
        # in-query recall gate (fresh temp snapshot store per run)
        ("pq_maintenance", entry.q_pq_maintenance, 2),
        # r11 addition: BM25 + persistent-IVF vector leg fused by
        # integer RRF (the lexical+vector hybrid stack)
        ("hybrid_ann_retrieval", entry.q_hybrid_ann_retrieval, 2),
        # r11 addition: composed IVF-PQ index (cells x residual codes)
        # build+append+masked-ADC probe + in-query recall gate
        ("ivfpq_index_query", entry.q_ivfpq_index_query, 2),
        # r11 addition: IVFPQ drift -> (skew AND qerr) -> two-layer
        # refit lifecycle incl. in-query recall gate
        ("ivfpq_maintenance", entry.q_ivfpq_maintenance, 2),
        # r12 addition: streaming ingest into the composed IVF-PQ
        # index + full at-least-once replay (exactly-once gate)
        ("stream_ivfpq_ingest", entry.q_stream_ivfpq_ingest, 2),
        # r12 addition: key-level delete lifecycle (build/append,
        # takedown delete, idempotent double-delete, time travel)
        ("ann_delete_replay", entry.q_ann_delete_replay, 2),
        # r12 addition: atomic update-or-insert lifecycle (in-place
        # re-encode + clone inserts, exact two-version replay)
        ("ann_upsert_replay", entry.q_ann_upsert_replay, 2),
        # r13 addition: filtered ANN search (predicate-pushed candidate
        # scan + adaptive probe widening + in-query recall gate)
        ("ann_filtered_query", entry.q_ann_filtered_query, 2),
        # r13 addition: streaming CDC upsert with the batch-id marker
        # (replay adds zero versions) + exact two-version replay legs
        ("stream_upsert_ingest", entry.q_stream_upsert_ingest, 2),
        # r13 addition: storage churn -> compaction advisor ->
        # optimize/vacuum lifecycle with time-travel gates
        ("ann_compaction", entry.q_ann_compaction, 2),
        # r13 addition: direct-metric recall advisor (full-probe exact
        # leg + production-budget floor + advisor-quiet gate)
        ("ann_recall", entry.q_ann_recall, 2),
        # r13 addition: filtered hybrid — predicate pre-filters BOTH
        # legs (BM25 stats over survivors + predicate-pushed vector
        # leg), integer RRF fusion, full-value oracle replay
        ("hybrid_filtered_retrieval", entry.q_hybrid_filtered_retrieval, 2),
        # r14 addition: merge-on-read churn (O(batch) delta commits,
        # idempotent re-delete, exact fold, two-version replay legs)
        ("ann_delta_churn", entry.q_ann_delta_churn, 2),
        # r14 addition: predicate takedown (meta + direct forms, both
        # idempotent, two-version replay legs)
        ("ann_predicate_delete", entry.q_ann_predicate_delete, 2),
        # r14 addition: filtered recall advisor (survivor-restricted
        # sample + filtered query path + survivor brute force)
        ("ann_recall_filtered", entry.q_ann_recall_filtered, 2),
        # r14 addition: mixed upsert+delete CDC batch as ONE atomic
        # delta commit, two-version replay legs
        ("cdc_apply", entry.q_cdc_apply, 2),
    ]:
        timed(name, lambda q=q: _materialize(q(spark, sf_dir)),
              n_reps=n_reps, into=extended)

    # candidate-pair count for the ssjoin slice, with and without the
    # PPJoin positional filter — the candidate distinct() is the
    # operator's dominant shuffle, so rows pruned here are the scale
    # story (VERDICT r5 item 7)
    from clickhouse_k_means_spark.operators.ssjoin import (
        _candidate_pairs,
        _ordered_sets,
    )
    from clickhouse_k_means_spark.sources.dataset import load_table as _lt

    _sj_docs = (
        _lt(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter("doc_id < 1000")
    )
    _sj_ordered = _ordered_sets(_sj_docs, "doc_id", "text")
    detail.setdefault("ssjoin", {})["candidates"] = {
        "with_position_filter": _candidate_pairs(
            _sj_ordered, 800_000, position_filter=True
        ).count(),
        "prefix_only": _candidate_pairs(
            _sj_ordered, 800_000, position_filter=False
        ).count(),
    }

    # ---- kscale: large-k fit (VERDICT r3 item 5) ----------------------
    # k=64 with k-means|| init + Arrow matmul Lloyd assignment, vs the
    # r2-recorded 187.7 s sequential-++ fit at the same (k, sf,
    # max_iter). MLlib's k-means|| fit is the comparable-inertia
    # reference (same init family, battle-tested): the gate is
    # engine-inertia within ~5% of MLlib's. r5: BOTH engines report a
    # cold first fit AND a warm second fit — the cold number carries
    # one-time JIT/codegen/Arrow-worker setup (~8 s measured, r5
    # profile), and the warm number is the steady-state cost a
    # many-fit session (elbow scans, restarts, production retrains)
    # actually pays. NOT part of the headline total.
    from clickhouse_k_means_spark.plans.kmeans import mllib_kmeans
    from clickhouse_k_means_spark.plans.optimal_k import elbow

    def _engine_fit() -> float:
        t0 = time.perf_counter()
        kres = KMeansEngine(k=64, seed=42, max_iter=15, init="parallel").fit(yh)
        sec = round(time.perf_counter() - t0, 3)
        assert len(kres.model) == 64
        _engine_fit.model = kres.model
        return sec

    def _mllib_fit() -> float:
        t0 = time.perf_counter()
        _, centers = mllib_kmeans(yh, k=64, seed=42, max_iter=15)
        sec = round(time.perf_counter() - t0, 3)
        _mllib_fit.centers = centers
        return sec

    kfit_sec = _engine_fit()
    kfit_warm_sec = _engine_fit()
    kfit_inertia = elbow(yh, _engine_fit.model, squared=True)
    kml_sec = _mllib_fit()
    kml_warm_sec = _mllib_fit()
    kml_inertia = elbow(yh, _mllib_fit.centers, squared=True)
    kscale = {
        "k": 64,
        "fit_parallel_sec": kfit_sec,
        "fit_parallel_warm_sec": kfit_warm_sec,
        "inertia_parallel": round(kfit_inertia),
        "mllib_sec": kml_sec,
        "mllib_warm_sec": kml_warm_sec,
        "inertia_mllib": round(kml_inertia),
        "inertia_ratio": round(kfit_inertia / kml_inertia, 4),
        "r2_sequential_sec": 187.7,
    }

    total = round(sum(timings.values()), 3)
    # Three lines, detail FIRST and the summary LAST: the driver
    # captures a bounded 2000-char stdout TAIL, so anything the
    # artifact must keep has to fit inside that window counted from
    # the end (VERDICT r5 item 3 / r6 item 1 — BENCH_r04..r06 all
    # recorded parsed=null because the per-query dicts were embedded
    # in the final line and the truncation cut its head off).
    #   line 1: full per-query detail (samples/min/code-cache)
    #   line 2: full per-query stats (median-of-3 or min-of-2) + kscale (regex-recoverable
    #           from a truncated tail by scripts/bench_diff.py)
    #   line 3: compact headline summary, guaranteed < ~700 bytes so
    #           the ENTIRE line survives inside any 2000-char tail
    # compact separators: ~4 bytes/entry on a 120-query line means
    # ~15 more per-query pairs inside the driver's 2000-char tail for
    # scripts/bench_diff.py to mine
    print(
        json.dumps(
            {"metric": "bench_detail", "sf": sf, "detail": detail},
            separators=(",", ":"),
        )
    )
    # the 13 headline medians live on the SUMMARY line only — dumping
    # them here too cost ~330 tail bytes that displace ~11 extended
    # per-query pairs from the driver's window. kscale goes FIRST for
    # the same reason: its 9 floats are already summarized on the last
    # line, so when the 2000-char tail truncates this line the bytes
    # nearest the end are all anchored per-query pairs.
    print(
        json.dumps(
            {
                "metric": "bench_queries",
                "sf": sf,
                "kscale": kscale,
                "extended": extended,
            },
            separators=(",", ":"),
        )
    )
    # compact pairs line (~8 bytes/query): the ONLY per-query record
    # guaranteed to fit the driver's 2000-char tail in full, so
    # bench_diff's anchor join covers the whole measured set
    # (VERDICT r7 item 6). Emitted immediately before the summary.
    from scripts.bench_codes import encode_pairs

    print(encode_pairs({**timings, **extended}))
    print(summary_line(total, timings, extended, kscale, sf))


# Recorded BASELINE.md headline subset total (r2 reference protocol,
# the 13-query fixed list above) — the denominator of the ratio the
# judge grades. Keep in sync with BASELINE.md's anchor section.
BASELINE_HEADLINE_TOTAL = 28.6

# The 13 fixed headline queries, in measured order — the single
# source the tests import instead of re-hardcoding the list
# (review finding, r8: three drifting copies).
HEADLINE_NAMES = [
    "kmeans_fit", "lloyd_step", "elbow", "tpch_q1", "tpch_q3",
    "tpch_q5", "minhash_lsh", "simhash", "ann_topk", "text_quality",
    "silhouette", "asof_join", "sessionize",
]

# The summary line's slimmed ``queries`` dict (VERDICT r8 item 6):
# three flagships only — the other 10 headline medians stay
# recoverable from the BP pairs line, freeing ~250 tail bytes for
# ~28 more anchored per-query pairs as the registry grows.
FLAGSHIP_NAMES = ["kmeans_fit", "tpch_q1", "minhash_lsh"]


def contention_stats(
    measured: dict[str, float],
    anchors: dict[str, float],
    frac_exclude: frozenset[str] | set[str] = frozenset(),
) -> tuple[float | None, bool]:
    """Detect the documented shared-host contention signature
    (VERDICT r7 item 7): a run-wide ~uniform inflation vs the
    BASELINE.md anchors — BENCH_r06/r07 both showed nearly every
    query 1.2-1.5x its anchor with no plan changes. Returns
    (median anchor ratio, contended flag); contended when the median
    ratio exceeds 1.2 AND >80% of anchored queries are above 1.0
    (uniformity — a genuine single-query regression moves the tail,
    not the median). A flagged run downgrades gate failures to
    'solo re-measure required' per BASELINE.md's protocol.

    ``frac_exclude`` (VERDICT r10 item 2): queries whose anchors were
    RE-BASED in the current host era sit at/below anchor by
    construction, so counting them in the uniformity fraction dilutes
    it — the official BENCH_r10 was uniformly 1.26x the r9 artifact
    yet shipped ``contended: false`` because the r9/r10-re-anchored
    rows pulled frac_inflated to 0.727 < 0.8 while the median (1.233)
    was already over the bar. Excluded names still count toward the
    MEDIAN (it is robust to them); they are only removed from the
    uniformity fraction. If exclusion leaves too few pairs to judge
    uniformity, the full set is used (never a vacuous fraction)."""
    pairs = {
        q: measured[q] / anchors[q]
        for q in measured
        if q in anchors and anchors[q] > 0
    }
    if len(pairs) < 20:  # too few pairs to call a run-wide signature
        return None, False
    # true median (even-length lists average the middle pair — the
    # upper-middle element alone biased boundary runs toward a
    # contended flag, which downgrades real gate failures)
    median = statistics.median(sorted(pairs.values()))
    frac_pool = [r for q, r in pairs.items() if q not in frac_exclude]
    if len(frac_pool) < 20:
        frac_pool = list(pairs.values())
    frac_inflated = sum(1 for r in frac_pool if r > 1.0) / len(frac_pool)
    return round(median, 3), bool(median > 1.2 and frac_inflated > 0.8)


def recently_rebased_anchors(repo_dir: str, lookback: int = 3) -> set[str]:
    """Anchor names whose BASELINE.md source era (``R{N}``/``R{N}s``
    in the authoritative table's source column) falls within
    ``lookback`` rounds of the CURRENT round (latest BENCH_r{N}
    artifact + 1) — the rows whose anchors were re-based in the
    current host era and therefore sit at/below anchor even inside a
    contended window. ``summary_line`` excludes them from the
    uniformity fraction (VERDICT r10 item 2). Lookback 3 because the
    host-IO era's re-anchors span r8–r10 (hll_rollup R8s through the
    r10 asof_join/sessionize/minhash_lsh requalification): on the
    actual r10 vector, excluding eras >= 8 flips the diluted 0.727
    fraction over the 0.8 bar while eras >= 9 alone does not (the
    R8s rows sit at/below anchor too)."""
    import glob

    rounds = []
    for p in glob.glob(os.path.join(repo_dir, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m:
            rounds.append(int(m.group(1)))
    if not rounds:
        return set()
    now = max(rounds) + 1
    try:
        text = open(os.path.join(repo_dir, "BASELINE.md")).read()
    except OSError:
        return set()
    m = re.search(r"## AUTHORITATIVE.*?\n(.*?)\nkscale \(k=64", text, re.S)
    if not m:
        return set()
    return {
        row.group(1)
        for row in re.finditer(
            r"^\| (\w+) \| [^|]*\| R(\d+)s? \|$", m.group(1), re.M
        )
        if int(row.group(2)) >= now - lookback
    }


def previous_artifact_pairs(repo_dir: str) -> dict[str, float]:
    """Per-query seconds decoded from the LATEST driver BENCH_r*.json
    artifact's BP pairs line — the era-immune reference for the
    cross-round contention signal (VERDICT r10 item 2: the official
    r10 artifact was uniformly 1.26x the r9 run, 92% of 132 common
    queries inflated, yet shipped ``contended: false`` because rows
    RE-ANCHORED in the same host era diluted ``frac_inflated`` below
    0.8 in the anchor-based test). The previous artifact was itself a
    real measured run, so re-anchoring cannot dilute this comparison;
    its BP line decodes with its own era's positional code table
    (``bench_codes.decode_pairs(any_era=True)``)."""
    import glob

    from scripts.bench_codes import decode_pairs

    paths = []
    for p in glob.glob(os.path.join(repo_dir, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m:
            paths.append((int(m.group(1)), p))
    if not paths:
        return {}
    _, latest = max(paths)
    try:
        doc = json.loads(open(latest).read())
    except (OSError, json.JSONDecodeError):
        return {}
    tail = doc.get("tail") or "" if isinstance(doc, dict) else ""
    for line in str(tail).splitlines():
        if "BP|" in line or "|v=" in line:
            pairs = decode_pairs(line, any_era=True)
            if pairs:
                return pairs
    return {}


def cross_round_stats(
    measured: dict[str, float], repo_dir: str
) -> tuple[float | None, bool]:
    """The era-immune second contention signal: this run's per-query
    seconds vs the PREVIOUS round's official artifact (both real
    measured runs — a re-based anchor cannot dilute the comparison).
    Same signature thresholds as ``contention_stats``: flagged when
    the cross-round median exceeds 1.2 AND >80% of common queries are
    inflated (uniformity — a genuine regression moves the tail, not
    the median). Returns (median ratio, flag); (None, False) when no
    previous artifact decodes or too few queries overlap."""
    return contention_stats(measured, previous_artifact_pairs(repo_dir))


def summary_line(
    total: float,
    timings: dict[str, float],
    extended: dict[str, float],
    kscale: dict,
    sf: float,
) -> str:
    """The final stdout line. MUST stay well under the driver's
    2000-char tail (tests/test_cli.py pins < 600 bytes) so
    ``headline_total`` is always parseable from the official
    BENCH_r{N}.json artifact. The ``queries`` key (driver contract)
    carries only THREE flagship medians (VERDICT r8 item 6: the full
    13-query dict duplicated ~330 bytes of data bench_diff already
    reads from the BP line, and the registry grows ~4 anchored
    queries per round — the slimmed summary keeps the whole anchored
    set recoverable to ≥180 queries, pinned by
    test_pairs_line_fits_tail_with_summary). All 13 headline medians
    plus the extended set remain on the ``BP|`` pairs line.
    ``contended`` mechanizes the solo-re-measure protocol for
    gate failures in inflated runs (VERDICT r7 item 7)."""
    try:
        # anchors are sf0.1 numbers — the ratio signature is only
        # meaningful for a run at the anchor scale
        if abs(sf - 0.1) < 1e-9:
            from scripts.bench_diff import load_anchors

            repo_dir = os.path.dirname(os.path.abspath(__file__))
            anchors = load_anchors(os.path.join(repo_dir, "BASELINE.md"))
            merged = {**timings, **extended}
            # same-era re-anchored rows sit at/below anchor even in a
            # contended window — exclude them from the uniformity
            # fraction they diluted in r10 (VERDICT r10 item 2)
            cmed, contended = contention_stats(
                merged, anchors,
                frac_exclude=recently_rebased_anchors(repo_dir),
            )
            # era-immune second signal (VERDICT r10 item 2): vs the
            # previous round's official artifact — catches a fresh
            # contended window after a clean round even if anchor
            # dilution returns in some future form
            xmed, xflag = cross_round_stats(merged, repo_dir)
            contended = bool(contended or xflag)
        else:
            cmed, contended, xmed = None, False, None
    except (Exception, SystemExit):
        # SystemExit included deliberately: load_anchors exits when
        # BASELINE.md's table markers move (an ordinary doc edit) —
        # contention detection is best-effort and must NEVER kill the
        # final summary print after a full ~15-minute measured run
        # (review finding, r8). KeyboardInterrupt is NOT caught: an
        # operator abort must still abort (ADVICE r8).
        cmed, contended, xmed = None, False, None
    return json.dumps(
        {
            "metric": "headline_total",
            "value": total,
            "unit": "sec",
            "sf": sf,
            "queries": {
                q: timings[q] for q in FLAGSHIP_NAMES if q in timings
            },
            "baseline_total": BASELINE_HEADLINE_TOTAL,
            "ratio": round(total / BASELINE_HEADLINE_TOTAL, 3),
            "n_queries": len(timings) + len(extended),
            "kscale_warm": kscale.get("fit_parallel_warm_sec"),
            "mllib_warm": kscale.get("mllib_warm_sec"),
            "inertia_ratio": kscale.get("inertia_ratio"),
            "contended": contended,
            "contention_median": cmed,
            "xround_median": xmed,
        },
        separators=(",", ":"),
    )


if __name__ == "__main__":
    main()
