"""Mechanical bench-vs-anchor gate (closes the VERDICT r5 ambiguity
about WHICH number each query is compared against).

Reads the AUTHORITATIVE ANCHOR TABLE from BASELINE.md and a bench
artifact (bench.py's own stdout, or a driver BENCH_r{N}.json whose
``tail`` carries the last 2000 chars of it), joins them per query,
and prints one ratio row per query plus a gate summary:

    python scripts/bench_diff.py BENCH_r07.json [--gate 2.0]

Exit status 1 if any query exceeds the gate ratio OR if ZERO queries
could be joined (a gate that compares nothing must fail loudly, not
pass vacuously — VERDICT r6 item 1). Queries present in only one side
are listed, never silently dropped (the no-silent-caps rule). Because
the driver tail may truncate the ``bench_queries`` line mid-JSON,
per-query pairs are additionally recovered by regex from unparseable
fragments; regex-recovered names are accepted only when they match an
anchor (so kscale/detail floats don't pollute the join).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_anchors(baseline_path: str) -> dict[str, float]:
    """Anchor seconds per query from the authoritative table rows
    (``| name | 1.23 s ... | SRC |``), bounded to the section between
    the AUTHORITATIVE header and the kscale paragraph."""
    text = open(baseline_path).read()
    m = re.search(
        r"## AUTHORITATIVE.*?\n(.*?)\nkscale \(k=64", text, re.S
    )
    if not m:
        raise SystemExit("BASELINE.md: authoritative table not found")
    anchors: dict[str, float] = {}
    for row in re.finditer(
        r"^\| (\w+) \| (\d+(?:\.\d+)?) s[^|]* \| [^|]+ \|$",
        m.group(1),
        re.M,
    ):
        anchors[row.group(1)] = float(row.group(2))
    return anchors


def load_bench(
    path: str, anchors: dict[str, float] | None = None
) -> dict[str, float]:
    """Per-query seconds from a bench artifact: bench.py's own JSON
    line(s) or a driver BENCH_r{N}.json wrapper (whose ``tail`` key —
    the name the driver actually writes, VERDICT r6 item 1 — holds the
    last 2000 chars of stdout and may start mid-JSON). Fragments that
    fail to parse are regex-mined for ``"name": float`` pairs,
    filtered to anchor names so kscale/detail floats don't join."""
    timings: dict[str, float] = {}

    def absorb(obj) -> None:
        # the tail is an arbitrary stdout slice: a stripped line can
        # parse as a JSON scalar/array (bare number, null, interleaved
        # log fragment) — never an artifact, but must not crash the gate
        if not isinstance(obj, dict):
            return
        if obj.get("metric") in ("headline_total", "bench_queries"):
            timings.update(obj.get("queries", {}))
            timings.update(obj.get("extended", {}))
        elif "queries" in obj and isinstance(obj["queries"], dict):
            timings.update(obj["queries"])

    def absorb_pairs_line(line: str) -> None:
        """The compact ``BP|code=sec;...`` line (scripts/bench_codes)
        — the one per-query record sized to ALWAYS fit the driver
        tail in full, decoded with the same table bench.py encoded
        with."""
        try:
            from scripts.bench_codes import decode_pairs
        except ImportError:  # running from inside scripts/
            from bench_codes import decode_pairs
        for name, val in decode_pairs(line).items():
            # accept every table-decoded / plausible full name — an
            # unanchored measured query must surface in the "measured
            # but not anchored" list, never vanish (the no-silent-drop
            # rule); only 1-3 char dirt from a mid-pair head cut is
            # filtered (real codes decode to full names; unknown-code
            # fallback keys shorter than any query name are garbage)
            if len(name) > 3 or (anchors is not None and name in anchors):
                timings.setdefault(name, val)

    def absorb_fragment(fragment: str) -> None:
        # a pairs line whose "BP|" marker was truncated away still
        # decodes, WHEREVER the cut landed: a mid-value/mid-code cut
        # leaves a dirty FIRST fragment (decode_pairs skips it) but
        # every later pair is intact, so the detection must be a
        # SEARCH for consecutive clean pairs, not a fullmatch of the
        # whole fragment (review finding, r8: a fullmatch dropped the
        # entire line for ~8 of every 10 possible cut positions)
        if (
            "BP|" in fragment
            or "|v=" in fragment
            or re.search(
                r"[0-9a-z]{2}=[0-9.]+;[0-9a-z]{2}=[0-9.]+", fragment
            )
        ):
            absorb_pairs_line(fragment)
            return
        if anchors is None:
            return
        for m in re.finditer(
            r'"([A-Za-z_]\w*)":\s*([0-9]+(?:\.[0-9]+)?)\b', fragment
        ):
            name, val = m.group(1), float(m.group(2))
            if name in anchors and name not in timings:
                timings[name] = val

    raw = open(path).read()
    try:
        doc = json.loads(raw)
        if isinstance(doc, dict):
            if "parsed" in doc and isinstance(doc["parsed"], dict):
                absorb(doc["parsed"])
            absorb(doc)
            tail = (
                doc.get("tail")
                or doc.get("raw_tail")
                or doc.get("stdout_tail")
                or ""
            )
        else:
            tail = ""
    except json.JSONDecodeError:
        tail = raw
    for line in str(tail).splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            absorb(json.loads(line))
        except json.JSONDecodeError:
            absorb_fragment(line)
    return timings


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("bench", help="bench output / BENCH_r{N}.json path")
    ap.add_argument("--gate", type=float, default=2.0)
    ap.add_argument(
        "--baseline", default=os.path.join(REPO, "BASELINE.md")
    )
    args = ap.parse_args()

    anchors = load_anchors(args.baseline)
    bench = load_bench(args.bench, anchors=anchors)
    shared = sorted(set(anchors) & set(bench))
    rows = []
    for q in shared:
        ratio = bench[q] / anchors[q] if anchors[q] > 0 else float("inf")
        rows.append((ratio, q))
    rows.sort(reverse=True)
    fails = [(r, q) for r, q in rows if r > args.gate]
    for ratio, q in rows:
        flag = " FAIL" if ratio > args.gate else ""
        print(f"{q:28s} {bench[q]:8.3f}s  anchor {anchors[q]:8.3f}s  "
              f"x{ratio:5.2f}{flag}")
    only_anchor = sorted(set(anchors) - set(bench))
    only_bench = sorted(set(bench) - set(anchors))
    if only_anchor:
        print(f"anchored but not measured: {only_anchor}")
    if only_bench:
        print(f"measured but not anchored: {only_bench}")
    print(
        json.dumps(
            {
                "metric": "bench_diff",
                "gate": args.gate,
                "n_compared": len(shared),
                "n_fail": len(fails),
                "worst": rows[0][1] if rows else None,
                "worst_ratio": round(rows[0][0], 3) if rows else None,
                "unanchored": only_bench,
            }
        )
    )
    if not shared:
        # A gate that compares nothing and passes is worse than no
        # gate (VERDICT r6 item 1: the r6 run compared 0 queries and
        # exited 0 against the official artifact).
        print("bench_diff: FAIL — zero queries joined", file=sys.stderr)
        sys.exit(1)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
