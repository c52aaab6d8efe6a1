"""Capture ``explain("formatted")`` for named registry entries into
``plans/r14/<key>_<tag>.txt`` — the judge-checkable plan evidence the
optimization rounds commit alongside before/after bench numbers.

Usage: python scripts/capture_plans.py TAG KEY [KEY ...]
       (TAG is e.g. ``before`` or ``after``)

The capture builds each entry's DataFrame exactly as the driver's
correctness gate does (``queries()[key](spark, sf_dir)``) and prints
the FORMATTED physical plan without executing it, so the files show
plan shape (Exchange count, join strategy, PushedFilters/ReadSchema),
not data. Entries whose value is dominated by driver-side lifecycle
work (index build commits, streaming replays) still show the final
read-back plan — the part explain can see.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    if len(sys.argv) < 3:
        print("usage: capture_plans.py TAG KEY [KEY ...]", file=sys.stderr)
        return 2
    tag, names = sys.argv[1], sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = Path(__file__).resolve().parents[1] / "plans" / "r15"
    out_dir.mkdir(parents=True, exist_ok=True)

    from clickhouse_k_means_spark.session import get_spark

    spark = get_spark("capture-plans")
    import __spark_entry__ as entry

    reg = entry.queries()
    rc = 0
    for name in names:
        if name not in reg:
            print(f"SKIP {name}: not in registry", file=sys.stderr)
            rc = 1
            continue
        df = reg[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = out_dir / f"{name}_{tag}.txt"
        path.write_text(buf.getvalue())
        print(f"wrote {path}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
