"""Stable short codes for bench query names.

The driver's BENCH_r{N}.json keeps only the LAST 2000 characters of
bench.py stdout. At ~25 bytes per '"query_name":12.34' JSON pair, the
~135-query measured set cannot fit, so bench.py additionally emits one
compact pairs line ("BP|<code>=<sec>;...") at ~8 bytes/pair that DOES
fit entirely inside the tail together with the summary line.
scripts/bench_diff.py decodes it with this same table (VERDICT r7
item 6: the "anchored but not measured" list must be empty).

Codes are the base36 index into the SORTED literal list below — they
are POSITIONAL, so any edit to NAMES re-codes every later name. The
BP line therefore carries a crc16 of the table at its END
(``|v=xxxx`` — the driver tail keeps line ends, so the marker
survives the head truncation the format tolerates); decode_pairs
REFUSES a line whose marker does not match this table, making
bench_diff fall back to regex name mining instead of silently
attributing timings to the wrong queries. Markerless (pre-r8) lines
decode best-effort under the caller's anchor filter. bench/bench_diff
agreement within a commit is pinned by tests/test_bench_codes.py.
"""

from __future__ import annotations

NAMES = [
    "ann_compaction",
    "ann_delete_replay",
    "ann_delta_churn",
    "ann_filtered_query",
    "ann_predicate_delete",
    "ann_recall",
    "ann_recall_filtered",
    "ann_topk",
    "ann_upsert_replay",
    "anomaly_zscore",
    "array_funcs",
    "array_set_ops",
    "asof_join",
    "audience_overlap",
    "bigram_lm",
    "bisect_kmeans",
    "bloom_join",
    "bm25_topk",
    "boilerplate",
    "bucketed_join",
    "cdc_apply",
    "cdc_dedup",
    "cdc_dedup_incremental",
    "chi_square",
    "chunk_docs",
    "corr",
    "cube_revenue",
    "cumulative_uniques",
    "curriculum",
    "data_quality",
    "decontaminate",
    "dedup_components",
    "dedup_incremental",
    "doc_clusters",
    "domain_cap",
    "domain_kl",
    "elbow",
    "ema_decay",
    "embed_covariance",
    "embed_dedup_incremental",
    "embed_neardup_lsh",
    "entropy",
    "formats_roundtrip",
    "funnel",
    "geo_distance",
    "grid_dbscan",
    "grouping_sets",
    "hash_split",
    "hashed_features",
    "histogram_incremental",
    "histogram_numeric",
    "hll_incremental",
    "hll_rollup",
    "hybrid_ann_retrieval",
    "hybrid_filtered_retrieval",
    "hybrid_retrieval",
    "interval_union",
    "inverted_index",
    "ivf_ann",
    "ivf_index_query",
    "ivf_maintenance",
    "ivfpq_index_query",
    "ivfpq_maintenance",
    "kmeans_fit",
    "knn_join",
    "knn_join_partitioned",
    "lateral_topn",
    "lloyd_step",
    "locf_fill",
    "lttb",
    "map_agg",
    "minhash_lsh",
    "mix_sources",
    "moving_avg",
    "multimodal_codec_stats",
    "near_dedup",
    "near_dedup_incremental",
    "ngram_sim",
    "orc_roundtrip",
    "outliers",
    "pack_sequences",
    "pagerank",
    "pipeline_e2e",
    "pq_ann",
    "pq_index_query",
    "pq_maintenance",
    "profile",
    "pyds_read",
    "range_join",
    "recursive_cte",
    "regex_extract",
    "resume_fit",
    "retention",
    "rolling_median",
    "rollup_incremental",
    "running_diff",
    "salted_join",
    "scd2",
    "scd2_lookup",
    "semdedup",
    "sequence_count",
    "sequence_match",
    "session_window",
    "sessionize",
    "silhouette",
    "simhash",
    "skew_report",
    "snapshot_diff",
    "span_dedup",
    "span_dedup_incremental",
    "srp_ann",
    "ssjoin",
    "stateful_stats",
    "stream_ann_ingest",
    "stream_enrich",
    "stream_ingest",
    "stream_ivfpq_ingest",
    "stream_join",
    "stream_upsert_ingest",
    "text_quality",
    "tfidf_top_terms",
    "time_buckets",
    "topk_heavy",
    "topk_weighted",
    "tpch_q1",
    "tpch_q10",
    "tpch_q11a",
    "tpch_q12a",
    "tpch_q13",
    "tpch_q14",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q18",
    "tpch_q19",
    "tpch_q20a",
    "tpch_q21a",
    "tpch_q22a",
    "tpch_q2a",
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
    "tpch_q6",
    "tpch_q7",
    "tpch_q8a",
    "tpch_q9a",
    "training_order",
    "triangles",
    "unigram_lm",
    "variant_json",
    "weighted_quantiles",
    "weighted_sample",
    "window_funnel",
    "winsorize",
    "zorder_roundtrip"
]

import zlib

_B36 = "0123456789abcdefghijklmnopqrstuvwxyz"


def table_version() -> str:
    """4-hex checksum of the code table. Codes are positional, so
    editing NAMES re-codes every later name — decoding an artifact
    with a DIFFERENT table silently attributes timings to the wrong
    queries (review finding, r8). The version rides at the END of the
    BP line (the driver tail keeps line ends, so it survives the head
    truncation the format exists to tolerate)."""
    return f"{zlib.crc32(','.join(NAMES).encode()) & 0xffff:04x}"


def _b36(i: int) -> str:
    return _B36[i // 36] + _B36[i % 36]


NAME_TO_CODE = {n: _b36(i) for i, n in enumerate(NAMES)}
CODE_TO_NAME = {c: n for n, c in NAME_TO_CODE.items()}


def encode_pairs(timings: dict[str, float]) -> str:
    """One compact line: BP|<code>=<2-decimal seconds>;... Unknown
    names (not yet in NAMES) degrade to their full name so the pair
    still round-trips; tests keep NAMES complete so this stays
    theoretical."""
    parts = [
        f"{NAME_TO_CODE.get(name, name)}={sec:.2f}"
        for name, sec in timings.items()
    ]
    return "BP|" + ";".join(parts) + f"|v={table_version()}"


# Names ADDED to NAMES each round, NEWEST FIRST — the cross-round
# contention signal (VERDICT r10 item 2) must decode LAST round's
# artifact, whose BP line was encoded before this round's additions
# re-coded the positional table. Each entry reconstructs one more
# previous era by removal; table_version() over the reconstructed
# list must match that artifact's |v= marker or decoding refuses.
# APPEND-DISCIPLINE: when new queries land in NAMES, prepend their
# list here in the same commit (pinned by tests/test_bench_codes.py).
ROUND_ADDITIONS: list[list[str]] = [
    # r14 additions (decoding BENCH_r13 needs the pre-r14 table)
    [
        "ann_delta_churn", "ann_predicate_delete", "ann_recall_filtered",
        "cdc_apply",
    ],
    # r13 additions (decoding BENCH_r12 needs the pre-r13 table)
    [
        "ann_compaction", "ann_filtered_query", "ann_recall",
        "hybrid_filtered_retrieval", "stream_upsert_ingest",
    ],
    # r12 additions (decoding BENCH_r11 needs the pre-r12 table)
    [
        "ann_delete_replay", "ann_upsert_replay", "stream_ivfpq_ingest",
    ],
    # r11 additions (decoding BENCH_r10 needs the pre-r11 table)
    [
        "hybrid_ann_retrieval", "ivfpq_index_query", "ivfpq_maintenance",
        "pq_maintenance",
    ],
    # r10 additions (BENCH_r10 marker 9156 -> r9-era marker 872f)
    [
        "hybrid_retrieval", "ivf_maintenance", "pq_index_query",
        "stream_ann_ingest", "tpch_q11a", "tpch_q20a", "tpch_q9a",
    ],
]


def era_code_tables() -> list[tuple[str, dict[str, str]]]:
    """(version, code->name) for the CURRENT table and each
    reconstructable previous era (one per ROUND_ADDITIONS entry,
    newest first)."""
    import zlib as _z

    out = [(table_version(), CODE_TO_NAME)]
    names = list(NAMES)
    for added in ROUND_ADDITIONS:
        names = [n for n in names if n not in set(added)]
        ver = f"{_z.crc32(','.join(names).encode()) & 0xffff:04x}"
        out.append((ver, {_b36(i): n for i, n in enumerate(names)}))
    return out


def decode_pairs(line: str, any_era: bool = False) -> dict[str, float]:
    """Inverse of encode_pairs; tolerates a truncated HEAD (the tail
    window may cut the first pairs off) by skipping fragments that do
    not split cleanly. ``any_era=True`` additionally accepts lines
    whose version marker matches a RECONSTRUCTED previous-era table
    (``era_code_tables``) — the cross-round contention signal decodes
    last round's artifact with last round's positional codes."""
    out: dict[str, float] = {}
    body = line.split("BP|", 1)[-1].strip()
    table = CODE_TO_NAME
    if "|v=" in body:
        body, _, ver = body.rpartition("|v=")
        if ver != table_version():
            table = None
            if any_era:
                for ever, etable in era_code_tables():
                    if ver == ever:
                        table = etable
                        break
            if table is None:
                # foreign code table: positional codes would
                # mis-attribute timings to the wrong queries — refuse;
                # bench_diff falls back to regex-mining names from the
                # bench_queries line
                return {}
    # no version marker: a pre-r8 artifact (or a line whose end was
    # lost, which the driver tail never does) — decoded best-effort
    # under the caller's anchor filter, the pre-marker behavior
    for frag in body.split(";"):
        if "=" not in frag:
            continue
        key, _, val = frag.partition("=")
        try:
            sec = float(val)
        except ValueError:
            continue
        out[table.get(key, key)] = sec
    return out
