"""Generate the OPTIMIZATION_r14.md checklist table: every bench entry
with its BEFORE (the clean BENCH_r13 driver artifact, decoded from the
BP pairs line) and AFTER (this round's final full bench log) seconds,
plus a status/notes column maintained here.

Usage: python scripts/r14_checklist.py plans/r14/bench_after_raw.log
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from scripts.bench_codes import decode_pairs  # noqa: E402

REPO = Path(__file__).resolve().parents[1]

# status: optimized | improved-shared | left-alone | new-r14
# (improved-shared = no entry-specific edit, but inherits a shared-path
# change: batch 1/2 — local_df one-partition frames, store commits, ivf
# probe-cell selection, streaming single-materialization, parallel init
# cache; batch 4 — the per-task zipimport fix that cuts ~0.13 s off
# EVERY Python-boundary task and the LocalRelation driver frames;
# batch 5 — the bounded-graph components fast path.)
NOTES: dict[str, tuple[str, str]] = {}

# entry-specific work this round (see OPTIMIZATION_r14.md batches)
NOTES.update({
    "kmeans_fit": ("optimized", "b2/b3 init cache+revert, b4 zipimport: step 0.35→0.19s, fit ~9.6→~5.3s solo"),
    "lloyd_step": ("improved-shared", "reproducible-mode JVM agg; gains only the per-action floor"),
    "elbow": ("left-alone", "k=4 JVM expression is the oracle-replayed bit-exact form"),
    "bisect_kmeans": ("optimized", "b7 prepared-fit path + fused leaf stats (116→87 jobs) on top of b1/b4; 31.2→~13.4s solo"),
    "resume_fit": ("improved-shared", "two fits × per-step cost; b4: 15.8→~6.9s solo"),
    "doc_clusters": ("improved-shared", "engine fit over hashed docs; b4: 6.8→~3.9s solo"),
    "knn_join": ("optimized", "b9 pair-explosion spread + eed8e95 HOF verify; 14.1→~5.7s solo"),
    "knn_join_partitioned": ("optimized", "same; 19.2→~5.1s solo"),
    "near_dedup": ("optimized", "b5 components fast path; plan 8→4 Exchange; 3.2→1.8s solo"),
    "near_dedup_incremental": ("optimized", "b5; 84→50 jobs, 8.5→6.8s solo"),
    "dedup_components": ("optimized", "b5; 2.1→1.1s solo"),
    "semdedup": ("optimized", "b5; 3.9→2.1s solo"),
    "embed_neardup_lsh": ("optimized", "b5 components; verify-core spread tried and REVERTED (negative result, b9)"),
    "grid_dbscan": ("optimized", "b5 components fast path; ~0.9s solo"),
    "stream_join": ("optimized", "b6 input-sized state partitions; 20.4→~2.4s solo"),
    "stream_enrich": ("optimized", "b6; ~0.9s solo vs 1.58 R14s anchor"),
    "stateful_stats": ("optimized", "b6; ~1.7s solo"),
    "simhash": ("left-alone", "compute-bound md5-per-token; already the codegen explode form (operator docstring)"),
    "text_quality": ("improved-shared", "pure-JVM scans at the per-action floor"),
    "minhash_lsh": ("improved-shared", "sig pass is Arrow; gains b4 task tax only"),
    "silhouette": ("left-alone", "bounded sample + unrolled k=4 distance, oracle-shared shape"),
    "ssjoin": ("left-alone", "output-size-bound on the synthetic corpus (bench slice comment); plan already prefix+position-filtered"),
    "triangles": ("left-alone", "complete-graph census slice; output-size cost by design"),
    "pipeline_e2e": ("improved-shared", "composition of optimized stages"),
    "ivf_index_query": ("improved-shared", "VERDICT r13 item 1 row: 7.46→~3.0s solo = 0.87x its 3.42 R9s anchor"),
    "ann_recall": ("optimized", "b1 third-probe fold + b4; 11.2→~5.4s solo"),
    "ann_recall_filtered": ("improved-shared", "three survivor probes BY DESIGN; 18.1 anchor → ~7.4s solo"),
    "ann_delta_churn": ("improved-shared", "13.6 anchor → ~8.5s solo; lifecycle legs dominate"),
    "ann_predicate_delete": ("improved-shared", "6.5 anchor → ~4.3s solo"),
    "cdc_apply": ("improved-shared", "5.5 anchor → ~3.6s solo"),
    "ivf_maintenance": ("improved-shared", "9.1→~3.6s solo"),
    "pq_maintenance": ("improved-shared", "9.9→~6.2s solo"),
    "ivfpq_maintenance": ("improved-shared", "11.7→~7.8s solo"),
    "stream_ivfpq_ingest": ("improved-shared", "9.6→~6.2s solo"),
    "cdc_dedup_incremental": ("improved-shared", "8.2→~4.2s solo"),
    "embed_dedup_incremental": ("improved-shared", "7.7→~2.8s solo"),
    "ann_filtered_query": ("improved-shared", "6.5→~4.0s solo"),
})


def r13_pairs() -> dict[str, float]:
    doc = json.loads((REPO / "BENCH_r13.json").read_text())
    for line in str(doc.get("tail", "")).splitlines():
        if "BP|" in line or "|v=" in line:
            pairs = decode_pairs(line, any_era=True)
            if pairs:
                return pairs
    return {}


def log_pairs(path: str) -> tuple[dict[str, float], dict[str, float]]:
    txt = Path(path).read_text()
    i = txt.find('{"metric":"bench_queries"')
    d = json.loads(txt[i : txt.find("\n", i)])
    ext = d["extended"]
    j = txt.find('{"metric":"bench_detail"')
    det = json.loads(txt[j : txt.find("\n", j)])["detail"]
    i = txt.find('{"metric":"headline_total"')
    head = json.loads(txt[i : txt.find("\n", i)])
    timings = {
        name: det[name]
        for name in det
        if name not in ext
    }
    # headline stats are recomputed the same way bench.py reports them
    stat = {}
    for name, dd in det.items():
        s = dd["samples"]
        stat[name] = round(
            sorted(s)[len(s) // 2] if len(s) >= 3 else min(s), 3
        )
    return stat, {"headline_total": head["value"]}


def main() -> int:
    after_path = sys.argv[1]
    before = r13_pairs()
    after, head = log_pairs(after_path)
    names = sorted(set(before) | set(after))
    print("| entry | r13 (s) | r14 (s) | ratio | status |")
    print("|---|---|---|---|---|")
    for n in names:
        b = before.get(n)
        a = after.get(n)
        ratio = f"{a / b:.2f}x" if (a and b) else "—"
        status, note = NOTES.get(n, ("examined", "shared-path gains only"))
        cell = f"{status} — {note}".strip()
        print(
            f"| {n} | {b if b is not None else '—'} |"
            f" {a if a is not None else '—'} | {ratio} | {cell} |"
        )
    print(f"\nheadline_total after: {head['headline_total']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
