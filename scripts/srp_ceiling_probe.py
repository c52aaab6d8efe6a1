"""SRP ceiling probe (VERDICT r8 item 4 'Done =' evidence).

Measures CANDIDATE PAIR COUNTS (directed bucket collisions,
sum over buckets of c*(c-1)) for flat SRP vs hierarchical
IVF-cell -> SRP at corpus sizes crossing flat SRP's ~2M-point clamp
(per_bucket 32 x 2^16 buckets). The collision count is computed from
bucket occupancy histograms — one aggregation per config — so the
probe never materializes the quadratic pair list it exists to
demonstrate.

Expected shape: flat pairs/n stays ~flat while auto-depth can still
grow, then turns LINEAR IN n past the 16-bit clamp (pairs/n doubling
with n); partitioned pairs/n stays ~constant through and past the
clamp because the bucket space is n_cells x 2^bits.

Usage: python scripts/srp_ceiling_probe.py [sizes ...]
(defaults: 500_000 1_000_000 2_000_000 4_000_000; dim 16)
Prints one JSON line per (n, variant). Record results in BASELINE.md.
"""

from __future__ import annotations

import json
import sys
import time


def synth_vectors(spark, n: int, dim: int, parts: int = 32):
    """Deterministic random unit-ish vectors: seeded per partition."""
    import numpy as np
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            out = []
            for i in ids:
                rng = np.random.RandomState((int(i) * 2654435761) % (2**31))
                v = rng.standard_normal(dim)
                out.append((v / np.linalg.norm(v)).tolist())
            yield pd.DataFrame({"vec_id": ids, "embedding": out})

    return (
        spark.range(n, numPartitions=parts)
        .mapInPandas(gen, "vec_id long, embedding array<double>")
    )


def collision_count(banded, keys: list[str]) -> int:
    """Directed candidate pairs = sum over buckets of c*(c-1)."""
    from pyspark.sql import functions as F

    row = (
        banded.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * (F.col("c") - 1)).alias("pairs"))
        .collect()[0]
    )
    return int(row["pairs"] or 0)


def main() -> int:
    sizes = [int(s) for s in sys.argv[1:]] or [
        500_000, 1_000_000, 2_000_000, 4_000_000,
    ]
    dim, n_tables, seed = 16, 4, 42

    from clickhouse_k_means_spark.operators.similarity import (
        _auto_n_bits,
        _srp_banded,
        srp_hyperplanes,
    )
    from clickhouse_k_means_spark.functions.vector import (
        nearest_cells_batch,
        numpy_kmeans,
        srp_buckets_batch,
    )
    from clickhouse_k_means_spark.session import get_spark
    from pyspark.sql import functions as F

    import numpy as np

    spark = get_spark("srp_ceiling_probe")
    for n in sizes:
        df = synth_vectors(spark, n, dim).localCheckpoint(eager=True)

        # flat: auto depth, clamped at 16 bits
        bits_flat = _auto_n_bits(n)
        t0 = time.perf_counter()
        banded = _srp_banded(
            df, "vec_id", "embedding", dim, bits_flat, n_tables, seed
        )
        pairs_flat = collision_count(banded, ["t", "bucket"])
        t_flat = round(time.perf_counter() - t0, 1)

        # partitioned: IVF cells x occupancy-adaptive SRP-within-cell
        # (the exact banding knn_join_partitioned builds — max-depth
        # codes masked per cell to ceil(log2(size/32)) bits)
        import math

        from clickhouse_k_means_spark.operators.similarity import (
            _auto_n_cells,
        )

        probe, per_bucket = 2, 32
        # r10 (VERDICT r9 item 5): the cell count is SELF-SETTING now —
        # the same derivation knn_join_partitioned(n_cells=None) runs.
        # (r9 rows were recorded at the fixed n_cells=256.)
        n_cells = _auto_n_cells(n, probe, per_bucket)
        t0 = time.perf_counter()
        sample = (
            df.orderBy(F.xxhash64(F.lit(seed), F.col("vec_id")))
            .limit(2048)
            .collect()
        )
        x = np.asarray([r["embedding"] for r in sample])
        centers = numpy_kmeans(x, k=n_cells, seed=seed, n_iter=10)
        cellp = nearest_cells_batch(
            [list(map(float, c)) for c in centers], nprobe=probe
        )
        tables = [
            srp_hyperplanes(dim, n_bits=16, seed=seed + 1000 * t)
            for t in range(n_tables)
        ]
        buckets = srp_buckets_batch(tables)
        coded = (
            df.select(
                F.col("vec_id").alias("kk"),
                cellp(F.col("embedding")).alias("cells"),
                buckets(F.col("embedding")).alias("bks"),
            )
            .select("kk", F.explode("cells").alias("cell"), "bks")
            .localCheckpoint(eager=True)
        )
        cell_counts = coded.groupBy("cell").count().collect()
        masks = [
            (
                int(r["cell"]),
                (1 << min(16, max(4, math.ceil(
                    math.log2(max(int(r["count"]), 2) / per_bucket)
                )))) - 1,
            )
            for r in cell_counts
        ]
        mask_df = spark.createDataFrame(masks, "cell int, mask bigint")
        banded_p = (
            coded.join(F.broadcast(mask_df), "cell")
            .select("kk", "cell", F.posexplode("bks").alias("t", "code"),
                    "mask")
            .select("kk", "cell", "t",
                    F.col("code").bitwiseAND(F.col("mask")).alias("bucket"))
        )
        pairs_part = collision_count(banded_p, ["cell", "t", "bucket"])
        bits_part = round(
            sum(m.bit_length() for _, m in masks) / len(masks), 1
        )
        t_part = round(time.perf_counter() - t0, 1)

        for variant, bits, pairs, sec in (
            ("flat", bits_flat, pairs_flat, t_flat),
            ("partitioned", bits_part, pairs_part, t_part),
        ):
            print(
                json.dumps(
                    {
                        "n": n,
                        "variant": variant,
                        "n_bits": bits,
                        "n_tables": n_tables,
                        "n_cells": (
                            n_cells if variant == "partitioned" else None
                        ),
                        "pairs": pairs,
                        "pairs_per_point": round(pairs / n, 2),
                        "sec": sec,
                    }
                ),
                flush=True,
            )
        # release BOTH eager checkpoints before the next (bigger) size:
        # localCheckpoint blocks unpin only when the driver reference
        # is collected (the bench.py pinned-RDD lesson)
        df.unpersist()
        del df, coded, banded, banded_p
        import gc

        gc.collect()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
