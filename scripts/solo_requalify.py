"""Solo re-measure of bench-gate failures (VERDICT r7 item 5).

Re-runs named bench queries in ISOLATION — fresh session, nothing else
on the box — with the exact configuration the bench list uses (same
query callables, same noop-sink materialization, warm-up + N timed
reps), so a gate failure from a contended driver run can be confirmed
or cleared with a recorded number.

    python scripts/solo_requalify.py stateful_stats knn_join

Prints one JSON line per query: {"query": ..., "samples": [...],
"median": ..., "anchor": ..., "ratio": ...}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: solo_requalify.py QUERY [QUERY ...]", file=sys.stderr)
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

    from clickhouse_k_means_spark.session import get_spark

    spark = get_spark("solo-requalify")

    import __spark_entry__ as entry
    from scripts.bench_diff import load_anchors

    anchors = load_anchors(
        str(Path(__file__).resolve().parents[1] / "BASELINE.md")
    )

    def materialize(df):
        df.write.mode("overwrite").format("noop").save()

    from clickhouse_k_means_spark.sources.dataset import load_table

    # same pre-warm as bench.py so the first (untimed) rep carries the
    # same one-time costs
    load_table(spark, sf_dir, "lineitem").count()
    load_table(spark, sf_dir, "documents").count()
    load_table(spark, sf_dir, "events").count()

    rc = 0
    for name in names:
        fn = entry.queries().get(name)
        if fn is None:
            # bench-local names (minhash_lsh, text_quality, kmeans_fit,
            # ...) are closures inside bench.main — not re-runnable
            # here; skip LOUDLY instead of dying mid-list (r9: a
            # KeyError after query 1 silently dropped the rest)
            print(
                f"solo_requalify: {name!r} is not a registry query "
                "(bench-local headline closure?) — skipped",
                file=sys.stderr,
            )
            rc = max(rc, 1)
            continue
        materialize(fn(spark, sf_dir))  # warm-up
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            samples.append(round(time.perf_counter() - t0, 3))
        # mirror bench.timed's statistic (ADVICE r8): a 2-sample
        # median is the mean, which re-inherits the GC-hiccup
        # inflation the r8 min-rule removed — min below 3 reps
        med = round(
            min(samples) if len(samples) < 3 else statistics.median(samples),
            3,
        )
        anchor = anchors.get(name)
        ratio = round(med / anchor, 3) if anchor else None
        print(
            json.dumps(
                {
                    "query": name,
                    "sf_dir": sf_dir,
                    "samples": samples,
                    "median": med,
                    "anchor": anchor,
                    "ratio": ratio,
                }
            )
        )
        if ratio is not None and ratio > 2.0:
            rc = 1
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
