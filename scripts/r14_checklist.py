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
# change from batch 1/2: local_df one-partition frames, store commits,
# ivf probe-cell selection, streaming single-materialization, parallel
# init cache.)
NOTES: dict[str, tuple[str, str]] = {}


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
        status, note = NOTES.get(n, ("", ""))
        cell = f"{status} {note}".strip()
        print(
            f"| {n} | {b if b is not None else '—'} |"
            f" {a if a is not None else '—'} | {ratio} | {cell} |"
        )
    print(f"\nheadline_total after: {head['headline_total']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
