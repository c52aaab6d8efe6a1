"""Seeded golden dataset — the reference's own synthetic 4-cluster data.

Reference (k-means.sql:1-4): 4 anchor points with integer coords
uniform in [0,100) (``rand32()%100``), each amplified ×500 with jitter
``x + rand64()%3000/100`` (≈ U[0,30)) and ``y + rand()%5000/100``
(≈ U[0,50)), plus the anchors themselves ⇒ 2,004 rows.

We reproduce the SHAPE deterministically (seeded) and carry a
``true_cluster`` label for scoring (FIXTURES.md F1). Generation is
distributed (``spark.range``, no driver-side data) and PARTITION-
INDEPENDENT: all randomness derives from ``xxhash64(seed, row key)``,
never ``F.rand`` (whose stream depends on partition layout, so the
"same seed" would yield different data across core counts / file
splits).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from clickhouse_k_means_spark.sources.dataset import local_df


def _seeded_uniform_int(seed: int, key: Column, n: int) -> Column:
    """Deterministic uniform int in [0, n) from (seed, key) — the same
    partition-independent pattern as KMeansEngine.init_centroids."""
    return F.pmod(F.xxhash64(F.lit(seed), key), F.lit(n))


def golden_points(
    spark: SparkSession,
    n_clusters: int = 4,
    points_per_cluster: int = 500,
    seed: int = 42,
    anchors: list[tuple[float, float]] | None = None,
) -> DataFrame:
    """(i long, x double, y double, true_cluster int) — 4 jittered blobs.

    Anchors: seeded uniform ints in [0,100) (k-means.sql:3) by default —
    NOTE that, exactly like the reference, random anchors may produce
    OVERLAPPING blobs (jitter spans 30×50); pass explicit ``anchors``
    for guaranteed-separable fixtures. Jitter: U[0,30) in x, U[0,50) in
    y (k-means.sql:4). Includes the anchor row itself per cluster (the
    reference's sourceData keeps the originals).
    """
    if anchors is not None:
        n_clusters = len(anchors)
        anchors_df = local_df(spark,
            [(idx, float(ax), float(ay)) for idx, (ax, ay) in enumerate(anchors)],
            "true_cluster int, ax double, ay double",
        )
    else:
        anchors_df = spark.range(n_clusters).select(
            F.col("id").cast("int").alias("true_cluster"),
            _seeded_uniform_int(seed, F.col("id"), 100).cast("double").alias("ax"),
            _seeded_uniform_int(seed + 1, F.col("id"), 100).cast("double").alias("ay"),
        )
    # one row per (cluster, copy); copy 0 is the anchor itself
    grid = spark.range(n_clusters * (points_per_cluster + 1)).select(
        F.col("id").alias("i"),
        (F.col("id") % n_clusters).cast("int").alias("true_cluster"),
        (F.col("id") / n_clusters).cast("long").alias("copy"),
    )
    jittered = (
        grid.join(F.broadcast(anchors_df), "true_cluster")
        .select(
            "i",
            F.when(F.col("copy") == 0, F.col("ax"))
            .otherwise(
                F.col("ax") + _seeded_uniform_int(seed + 2, F.col("i"), 3000) / 100.0
            )
            .alias("x"),
            F.when(F.col("copy") == 0, F.col("ay"))
            .otherwise(
                F.col("ay") + _seeded_uniform_int(seed + 3, F.col("i"), 5000) / 100.0
            )
            .alias("y"),
            "true_cluster",
        )
    )
    return jittered
