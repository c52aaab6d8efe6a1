"""Pins for the compact bench pairs format (scripts/bench_codes) —
the tail-survivability fix for VERDICT r7 item 6."""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parents[1])
sys.path.insert(0, REPO_ROOT)

from scripts.bench_codes import (  # noqa: E402
    CODE_TO_NAME,
    NAME_TO_CODE,
    NAMES,
    decode_pairs,
    encode_pairs,
)


def test_codes_unique_and_short():
    assert len(NAMES) == len(set(NAMES))
    assert NAMES == sorted(NAMES)
    assert len(set(NAME_TO_CODE.values())) == len(NAMES)
    assert all(len(c) == 2 for c in NAME_TO_CODE.values())
    assert all(CODE_TO_NAME[c] == n for n, c in NAME_TO_CODE.items())


def test_every_bench_query_has_a_code():
    """bench.py's measured set (headline + extended, incl. the helper
    slices) must be covered by NAMES, or encode degrades to full names
    and the tail budget blows."""
    import bench

    src = open(Path(REPO_ROOT) / "bench.py").read()
    extended = re.findall(
        r'\("(\w+)", (?:entry\.q_\w+|_\w+_bench), \d+\)', src
    )
    # the guard must bind to the EXTENDED list itself — `measured`
    # is never empty (the headline constant pads it), so a regex
    # drifting away from bench.py's list format would silently
    # disable this gate (review finding, r8)
    assert len(extended) > 50, (
        f"extended-list regex matched only {len(extended)} entries — "
        "bench.py's list format changed; update the regex"
    )
    measured = set(bench.HEADLINE_NAMES) | set(extended)
    missing = sorted(measured - set(NAMES))
    assert not missing, f"add to scripts/bench_codes.NAMES: {missing}"


def test_roundtrip_and_truncated_head():
    timings = {n: 0.01 + i * 0.37 for i, n in enumerate(NAMES)}
    line = encode_pairs(timings)
    back = decode_pairs(line)
    assert back == {n: round(v, 2) for n, v in timings.items()}
    # head-truncated (driver tail cut "BP|xx=1.23;" off mid-pair):
    # remaining pairs still decode, the partial leading pair drops to
    # an unknown code the anchor filter discards downstream
    cut = line[len("BP|") + 9:]
    back2 = decode_pairs(cut)
    recovered = {k: v for k, v in back2.items() if k in NAME_TO_CODE}
    assert len(recovered) >= len(NAMES) - 2


def test_pairs_line_fits_tail_with_summary():
    """The whole measured set at realistic magnitudes + the summary
    line must fit a 2000-char tail together — this is the actual
    driver-artifact contract."""
    import bench

    timings = {n: 123.45 for n in NAMES}  # worst realistic width
    pairs = encode_pairs(timings)
    headline = {n: 9.999 for n in list(NAMES)[:13]}
    extended = {n: 9.999 for n in list(NAMES)[13:]}
    kscale = {"fit_parallel_warm_sec": 11.6, "mllib_warm_sec": 6.3,
              "inertia_ratio": 0.9445}
    summary = bench.summary_line(22.99, headline, extended, kscale, 0.1)
    assert len(pairs) + len(summary) + 2 <= 2000, (len(pairs), len(summary))


def test_pairs_line_headroom_at_180_queries():
    """Growth headroom (VERDICT r8 item 6): the registry gains ~4
    anchored queries per round, so pin FULL tail recovery — every
    pair + the whole summary inside the 2000-char window — at ≥180
    anchored queries at worst realistic width. Byte-exact simulation
    of encode_pairs under a future 180-name table (codes stay 2 chars
    up to 36^2 = 1296 names)."""
    import bench
    from scripts import bench_codes

    n_future = 180
    # width model: every query under 100 s ("xx=12.34;" = 10 bytes
    # with the separator). That is the realistic regime — the current
    # anchor max is ~20 s and a 100 s+ query would fail the 2× gate
    # on its own long before tail bytes matter.
    sim_pairs = (
        "BP|"
        + ";".join(
            f"{bench_codes._b36(i)}=12.34" for i in range(n_future)
        )
        + "|v=abcd"
    )
    headline = {n: 9.999 for n in bench.HEADLINE_NAMES}
    extended = {f"q{i}": 9.999 for i in range(n_future - 13)}
    kscale = {"fit_parallel_warm_sec": 11.6, "mllib_warm_sec": 6.3,
              "inertia_ratio": 0.9445}
    summary = bench.summary_line(22.99, headline, extended, kscale, 0.1)
    assert len(sim_pairs) + len(summary) + 2 <= 2000, (
        len(sim_pairs), len(summary),
    )


def test_contention_stats_signature():
    """bench.contention_stats flags the uniform-inflation signature and
    stays quiet for a single-query regression (VERDICT r7 item 7)."""
    import bench

    anchors = {f"q{i}": 1.0 for i in range(100)}
    inflated = {q: 1.35 for q in anchors}
    med, flag = bench.contention_stats(inflated, anchors)
    assert flag and med == 1.35
    clean = {q: 1.0 for q in anchors}
    clean["q7"] = 5.0  # one genuine regression: NOT contention
    med, flag = bench.contention_stats(clean, anchors)
    assert not flag and med == 1.0
    few = {f"q{i}": 2.0 for i in range(5)}
    med, flag = bench.contention_stats(few, {f"q{i}": 1.0 for i in range(5)})
    assert med is None and not flag


def test_bp_version_marker_guards_against_table_drift():
    """Codes are positional: editing NAMES re-codes later names, so a
    BP line from a different commit's table must be REFUSED (decoded
    as empty -> bench_diff regex fallback), never mis-attributed. The
    marker rides at the line END, surviving the head truncation the
    format tolerates."""
    from scripts.bench_codes import (
        decode_pairs,
        encode_pairs,
        table_version,
    )

    line = encode_pairs({"kmeans_fit": 6.84, "bm25_topk": 2.06})
    assert line.endswith(f"|v={table_version()}")
    assert decode_pairs(line) == {"kmeans_fit": 6.84, "bm25_topk": 2.06}
    foreign = line.rsplit("|v=", 1)[0] + "|v=dead"
    assert decode_pairs(foreign) == {}
    # head-truncated (the "BP|" marker and first pairs cut off by the
    # 2000-char tail) still verifies and decodes via the trailing v=
    cut = line.split(";", 1)[1]
    assert decode_pairs(cut) == {"bm25_topk": 2.06}


def test_era_tables_decode_previous_round_artifact():
    """VERDICT r10 item 2 prerequisite: the BP line of the PREVIOUS
    round's artifact (encoded under that round's positional table)
    must decode with any_era=True — era tables are reconstructed from
    ROUND_ADDITIONS. Uses the real committed artifacts."""
    import json

    from scripts.bench_codes import decode_pairs, era_code_tables

    tables = era_code_tables()
    assert len(tables) >= 2  # current + at least one previous era
    # the r9-era artifact carries marker 872f; its BP line refuses the
    # strict decode but opens under any_era
    tail = json.load(open(Path(REPO_ROOT) / "BENCH_r09.json"))["tail"]
    bp = [ln for ln in tail.splitlines() if "BP|" in ln or "|v=" in ln]
    assert bp
    assert decode_pairs(bp[-1]) == {}
    pairs = decode_pairs(bp[-1], any_era=True)
    assert len(pairs) > 100
    assert "kmeans_fit" in pairs
    # a marker matching NO era still refuses, even under any_era
    foreign = bp[-1].rsplit("|v=", 1)[0] + "|v=dead"
    assert decode_pairs(foreign, any_era=True) == {}
    # the r10 artifact must stay decodable too — when NAMES gains new
    # queries, the same commit must prepend them to ROUND_ADDITIONS
    # (the append-discipline comment) or this line goes dark
    tail10 = json.load(open(Path(REPO_ROOT) / "BENCH_r10.json"))["tail"]
    bp10 = [ln for ln in tail10.splitlines() if "BP|" in ln or "|v=" in ln]
    pairs10 = decode_pairs(bp10[-1], any_era=True)
    assert len(pairs10) > 100 and "kmeans_fit" in pairs10


def test_cross_round_signal_trips_on_actual_r10_artifact():
    """VERDICT r10 item 2 'Done =' probe, on the REAL data: the
    official BENCH_r10 was uniformly ~1.26x the r9 artifact (92% of
    common queries inflated) yet the anchor-based signal shipped
    contended:false because same-era re-anchored rows diluted
    frac_inflated. The new era-immune cross-round signal must trip on
    exactly that ratio vector."""
    import json
    import shutil

    import bench
    from scripts.bench_codes import decode_pairs

    def artifact_pairs(name):
        tail = json.load(open(Path(REPO_ROOT) / name))["tail"]
        for ln in tail.splitlines():
            if "BP|" in ln or "|v=" in ln:
                got = decode_pairs(ln, any_era=True)
                if got:
                    return got
        raise AssertionError(f"no BP line decoded from {name}")

    r10 = artifact_pairs("BENCH_r10.json")
    r09 = artifact_pairs("BENCH_r09.json")
    med, flag = bench.contention_stats(r10, r09)
    assert flag, (med, "the r10-vs-r9 uniform inflation must trip")
    assert med and med > 1.2
    # end-to-end through the artifact loader: a dir holding only the
    # r9 artifact as "previous round" + the r10 pairs as "this run"
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        shutil.copy(Path(REPO_ROOT) / "BENCH_r09.json", f"{d}/BENCH_r09.json")
        prev = bench.previous_artifact_pairs(d)
        assert len(prev) > 100
        xmed, xflag = bench.cross_round_stats(r10, d)
        assert xflag and xmed and xmed > 1.2
        # empty dir -> no signal, never a crash
        with tempfile.TemporaryDirectory() as e:
            assert bench.cross_round_stats(r10, e) == (None, False)


def test_anchor_dilution_fixed_on_actual_r10_vector():
    """VERDICT r10 item 2 'Done =' probe #2: the anchor-based signal
    itself, fed the ACTUAL r10-vs-anchors ratio vector, must now trip
    once same-host-era re-anchored rows are excluded from the
    uniformity fraction — the exact dilution that shipped the
    uniformly inflated official BENCH_r10 as contended:false."""
    import json

    import bench
    from scripts.bench_codes import decode_pairs
    from scripts.bench_diff import load_anchors

    tail = json.load(open(Path(REPO_ROOT) / "BENCH_r10.json"))["tail"]
    bp = [ln for ln in tail.splitlines() if "BP|" in ln][-1]
    r10 = decode_pairs(bp, any_era=True)
    anchors = load_anchors(str(Path(REPO_ROOT) / "BASELINE.md"))
    # this probe replays the HISTORICAL r10 moment, so it needs the
    # r10-era anchor table: restore the values for the rows the r11
    # drift-class sweep re-based (VERDICT r10 item 3) — the live
    # BASELINE.md moved them and would shift the historical median
    anchors.update({
        "tpch_q4": 0.68, "tpch_q18": 0.47, "tpch_q13": 0.30,
        "dedup_components": 1.36, "hll_incremental": 0.70,
        "winsorize": 0.63, "domain_kl": 0.52, "embed_covariance": 1.24,
        "bucketed_join": 0.78, "funnel": 0.39, "unigram_lm": 1.05,
        "near_dedup": 2.08, "outliers": 0.64, "profile": 0.81,
        "skew_report": 0.23, "domain_cap": 0.16, "topk_heavy": 0.58,
        "array_set_ops": 0.21,
        # r12 re-anchors (VERDICT r11 item 3 + the proactive sweep) —
        # r10-era values
        "embed_neardup_lsh": 1.33, "weighted_sample": 0.52,
        "corr": 0.38, "sequence_match": 0.26, "scd2": 0.81,
        "histogram_incremental": 0.67, "chi_square": 0.27,
        # r13 re-anchors (VERDICT r12 item 1 quiet solos + the
        # self-check's pipeline_e2e finding) — r10-era values
        "stateful_stats": 2.03, "bisect_kmeans": 16.81,
        "pipeline_e2e": 2.74,
        # r14 re-anchors (VERDICT r13 item 1 settled quiet solos) —
        # r10-era values
        "array_funcs": 0.22, "map_agg": 0.24, "stream_enrich": 1.09,
    })
    # undiluted (the r10 behavior): median over the bar, flag FALSE
    med0, flag0 = bench.contention_stats(r10, anchors)
    assert med0 and med0 > 1.2 and not flag0, (med0, flag0)
    # with the era exclusion the r11+ summary actually computes —
    # ROUND-CONTEXT PINNED (VERDICT r11 item 2): the live repo gains a
    # new BENCH_r{N}.json every round, which would shift the lookback
    # window (11→12 dropped the 8 R8s-era rows the flip needs and made
    # this probe red for the whole judging window). Replay the r10
    # moment from a temp dir holding artifacts only through r10, the
    # same pattern test_cross_round_signal uses.
    import shutil
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        shutil.copy(Path(REPO_ROOT) / "BENCH_r10.json", f"{d}/BENCH_r10.json")
        shutil.copy(Path(REPO_ROOT) / "BASELINE.md", f"{d}/BASELINE.md")
        excl = bench.recently_rebased_anchors(d)
    assert "asof_join" in excl and "kmeans_fit" in excl
    # minus the rows re-based AFTER the r10 moment (the r11 drift-class
    # sweep, the four r11 additions, and any later re-anchors): the
    # live BASELINE.md tags them R11s+/R12s+ so the pinned-window
    # derivation includes them, but they were NOT re-based at the
    # historical r10 moment this probe replays. CONVENTION: any round
    # that re-bases an anchor extends BOTH this subtraction and the
    # anchors.update above with the old value.
    excl = excl - {
        "tpch_q4", "tpch_q18", "tpch_q13", "dedup_components",
        "hll_incremental", "winsorize", "domain_kl", "embed_covariance",
        "bucketed_join", "funnel", "unigram_lm", "near_dedup",
        "outliers", "profile", "skew_report", "domain_cap",
        "topk_heavy", "array_set_ops",
        "pq_maintenance", "hybrid_ann_retrieval", "ivfpq_index_query",
        "ivfpq_maintenance",
        # re-based or added in r12 — not re-based at the r10 moment
        "embed_neardup_lsh", "weighted_sample",
        "stream_ivfpq_ingest", "ann_delete_replay", "ann_upsert_replay",
        "corr", "sequence_match", "scd2",
        "histogram_incremental", "chi_square",
        # re-based or added in r13 — not re-based at the r10 moment
        "stateful_stats", "bisect_kmeans", "pipeline_e2e",
        "ann_filtered_query", "stream_upsert_ingest", "ann_compaction",
        "ann_recall", "hybrid_filtered_retrieval",
        # re-based or added in r14 — not re-based at the r10 moment
        "array_funcs", "map_agg", "stream_enrich",
        "ann_delta_churn", "ann_predicate_delete", "ann_recall_filtered",
        "cdc_apply",
    }
    med1, flag1 = bench.contention_stats(r10, anchors, frac_exclude=excl)
    assert flag1 and med1 == med0, (med1, flag1)
    # exclusion never goes vacuous: excluding everything falls back to
    # the full pool rather than judging uniformity over nothing
    med2, flag2 = bench.contention_stats(
        r10, anchors, frac_exclude=set(r10)
    )
    assert (med2, flag2) == (med0, flag0)
