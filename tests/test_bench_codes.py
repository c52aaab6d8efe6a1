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
