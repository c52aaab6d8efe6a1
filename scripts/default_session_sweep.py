"""Portability sweep: run EVERY registry query under a builder-default
SparkSession (VERDICT r7 item 3).

The verification driver builds its own SparkSession without
``session.py``'s customizations; r7's ``pyds_read`` red row proved a
query can depend on a build-time conf (``spark.sql.python.
filterPushdown.enabled``) that pytest's tuned session masks. Builder
configs land in the shared SparkConf, so an in-process ``newSession()``
still inherits them — the only honest probe is a fresh process whose
session sets NOTHING but ``master`` (and driver memory, a JVM sizing
knob, not a SQL conf).

Each query is plan-built and executed through a ``limit(1)`` action.
Prints one JSON object ``{key: null | "error..."}`` and exits non-zero
if any query fails.

Usage: python scripts/default_session_sweep.py [sf_dir] [key ...]
"""

from __future__ import annotations

import json
import sys
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    # deliberately bare: no AQE/Arrow/timezone/pushdown/shuffle confs —
    # any registry query needing one must set it at runtime itself
    spark = (
        SparkSession.builder.appName("default-conf-sweep")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .master("local[8]")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, str | None] = {}
    for key, fn in entry_mod.queries().items():
        if only and key not in only:
            continue
        try:
            fn(spark, sf_dir).limit(1).collect()
            results[key] = None
        except Exception:
            results[key] = traceback.format_exc()[-2000:]
    spark.stop()

    print(json.dumps(results))
    failures = {k: v for k, v in results.items() if v is not None}
    if failures:
        for k, v in failures.items():
            print(f"FAIL {k}: {v.splitlines()[-1]}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
