"""Phase-level attribution for the kscale k=64 warm fit (VERDICT r11
item 4: kscale_warm read 14.51 s clean / 23.9 s in-artifact against the
9.8-10.9 s band for the second consecutive round, with inertia_ratio
bit-identical — wall-only drift that needs attribution, not guessing).

Replays bench.py's exact kscale protocol (sf0.1 lineitem ``yh``,
k=64, seed=42, max_iter=15, init='parallel') but decomposes the WARM
fit into its phases:

  * ``init``        — ``init_centroids_parallel`` (k-means||: the
                      oversample rounds + weighted recluster)
  * ``lloyd[i]``    — each fused Arrow ``lloyd_step`` (assign pass +
                      per-centroid aggregation in ONE stage; the r9
                      fused-default form)
  * ``driver``      — movement computation + bookkeeping (the
                      remainder)

One cold fit runs first (JIT/codegen/Arrow-worker warmup, exactly like
bench.py's cold/warm pair), then ``reps`` warm fits are phase-timed.
Output: one JSON line per warm rep + a summary with the per-phase
medians — evidence for either fixing a regression or re-banding
kscale_warm in BASELINE.md with the phase that moved named.

Run on a QUIET box (the bench-contention protocol):
    python scripts/kscale_profile.py [reps]
"""

from __future__ import annotations

import json
import os
import random
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from clickhouse_k_means_spark.plans.kmeans import KMeansEngine
    from clickhouse_k_means_spark.session import get_spark
    from clickhouse_k_means_spark.sources.dataset import load_yh

    spark = get_spark("kscale-profile")
    yh_src = load_yh(spark, sf_dir, "lineitem")

    # cold fit first: bench.py's warm number is the SECOND fit in the
    # same session, so the profiled reps must sit behind the same
    # one-time JIT/codegen/Arrow setup
    eng = KMeansEngine(k=64, seed=42, max_iter=15, init="parallel")
    t0 = time.perf_counter()
    cold = eng.fit(yh_src)
    cold_sec = round(time.perf_counter() - t0, 3)
    assert len(cold.model) == 64
    print(json.dumps({"phase_profile": "cold", "sec": cold_sec}))

    runs = []
    for rep in range(reps):
        # fit()'s OWN working-set setup (ADVICE r12: this used to be
        # an inline re-implementation that any fit() change silently
        # invalidated — now the engine helper IS the setup, so the
        # phase times decompose the real fit by construction)
        cached, yh, dim, n_parts = eng.prepare_working_set(yh_src)
        try:
            rng = random.Random(eng.seed)
            t0 = time.perf_counter()
            model = eng.init_centroids_parallel(yh, rng)
            init_sec = round(time.perf_counter() - t0, 3)
            lloyd_secs = []
            driver_sec = 0.0
            prev_model = model
            converged = False
            for step in range(1, eng.max_iter + 1):
                t0 = time.perf_counter()
                new_model = eng.lloyd_step(
                    yh, prev_model, dim, n_parts=n_parts
                )
                lloyd_secs.append(round(time.perf_counter() - t0, 3))
                t0 = time.perf_counter()
                prev = dict(prev_model)
                from clickhouse_k_means_spark.plans.kmeans import _euclid

                moved = sum(
                    _euclid(prev[j], c) for j, c in new_model if j in prev
                )
                prev_model = new_model
                driver_sec += time.perf_counter() - t0
                if eng.has_converged(moved):
                    converged = True
                    break
            run = {
                "phase_profile": "warm",
                "rep": rep,
                "init_sec": init_sec,
                "lloyd_secs": lloyd_secs,
                "lloyd_total_sec": round(sum(lloyd_secs), 3),
                "lloyd_per_iter_sec": round(
                    sum(lloyd_secs) / len(lloyd_secs), 3
                ),
                "n_iters": len(lloyd_secs),
                "driver_sec": round(driver_sec, 3),
                "total_sec": round(
                    init_sec + sum(lloyd_secs) + driver_sec, 3
                ),
                "converged": converged,
            }
            runs.append(run)
            print(json.dumps(run))
        finally:
            cached.unpersist()

    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    print(
        json.dumps(
            {
                "phase_profile": "summary",
                "sf_dir": sf_dir,
                "reps": reps,
                "cold_sec": cold_sec,
                "init_med": med([r["init_sec"] for r in runs]),
                "lloyd_total_med": med([r["lloyd_total_sec"] for r in runs]),
                "lloyd_per_iter_med": med(
                    [r["lloyd_per_iter_sec"] for r in runs]
                ),
                "driver_med": med([r["driver_sec"] for r in runs]),
                "total_med": med([r["total_sec"] for r in runs]),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
