"""Density-based clustering: grid DBSCAN.

The third clustering family beside the engine's k-means (centroid)
and bisecting (hierarchical) fits. Classic DBSCAN needs an
eps-neighborhood query per point — quadratic done naively. The
standard scalable form is CELL/GRID DBSCAN: quantize space into
eps-sided cells, call a cell dense when it holds ≥ min_pts points,
merge ADJACENT dense cells into clusters (connected components on the
tiny cell graph), and attach border points from sparse cells to a
neighboring dense cluster. This is the well-known grid approximation
(points within eps can land in adjacent cells and always merge; cells
are eps-sided so any two points in one cell are within eps·√d):
density reachability is evaluated at cell resolution, which is
exactly the trade that makes the algorithm one groupBy + one
bounded-fanout join at any corpus size.

Plan shape: one groupBy(cell) count (map-side combined), a 3^d-fanout
literal-offset explode over the DENSE cells only (cell count ≪ point
count), connected components on the resulting cell graph (cells, not
points — driver-bounded label propagation via components.py), and one
broadcast join back to points. Every per-point step is a narrow
projection; the only data-scale shuffle is the cell count.

Determinism: cells come from ``floor(x / eps)`` on IEEE doubles
(identical in both engines), labels are MIN cell-key strings, border
attachment takes the lexicographically smallest neighboring cluster —
the DuckDB oracle replays everything, components included (recursive
reachability closure over the same dense-cell graph).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from clickhouse_k_means_spark.operators.components import (
    connected_components,
)

NOISE = ""  # label for noise points (no dense cell within reach)


def _cell_cols(features: list[str], eps: float) -> list[Column]:
    return [
        F.floor(F.col(c) / eps).cast("long").alias(f"__c{d}")
        for d, c in enumerate(features)
    ]


def _cell_key(dims: int, prefix: str = "__c") -> Column:
    return F.concat_ws(
        ":", *[F.col(f"{prefix}{d}").cast("string") for d in range(dims)]
    )


def grid_dbscan(
    df: DataFrame,
    key: str,
    features: list[str],
    eps: float,
    min_pts: int,
) -> DataFrame:
    """``(key, label)`` for every input row: cluster label = the MIN
    cell key of the merged dense-cell component, ``""`` = noise.
    Points in dense cells are core members; points in sparse cells
    adjacent (Chebyshev-1) to a dense cell join its cluster as border
    points; everything else is noise."""
    if eps <= 0 or min_pts < 1:
        raise ValueError(f"eps > 0 and min_pts >= 1 required: {eps}/{min_pts}")
    if not features:
        raise ValueError("features must be non-empty")
    d = len(features)
    pts = df.select(F.col(key).alias("__k"), *_cell_cols(features, eps))
    pts = pts.withColumn("__cell", _cell_key(d))
    counts = (
        pts.groupBy(*[f"__c{i}" for i in range(d)], "__cell")
        .agg(F.count(F.lit(1)).alias("__n"))
        .localCheckpoint(eager=True)  # feeds dense set + both joins
    )
    dense = counts.filter(F.col("__n") >= min_pts)
    # 3^d Chebyshev-1 neighbor offsets as one literal explode
    offsets = [
        tuple((i // (3**j)) % 3 - 1 for j in range(d))
        for i in range(3**d)
    ]
    off = F.explode(
        F.array(
            *[
                F.struct(
                    *[F.lit(o[j]).alias(f"o{j}") for j in range(d)]
                )
                for o in offsets
            ]
        )
    ).alias("__o")
    nb = dense.select("__cell", *[f"__c{i}" for i in range(d)], off).select(
        "__cell",
        *[
            (F.col(f"__c{i}") + F.col(f"__o.o{i}")).alias(f"__n{i}")
            for i in range(d)
        ],
    )
    nb = nb.withColumn("__nb", _cell_key(d, "__n"))
    # edges between dense cells (includes the self-offset → every
    # dense cell appears in the graph, so singletons keep themselves)
    dcells = dense.select(F.col("__cell").alias("__nb")).distinct()
    edges = nb.join(dcells, "__nb").select(
        F.col("__cell").alias("a"), F.col("__nb").alias("b")
    )
    comp = connected_components(edges).select(
        F.col("n").alias("__cell"), F.col("component").alias("__lbl")
    )
    # core points: in a dense cell
    core = pts.join(F.broadcast(comp), "__cell").select(
        "__k", F.col("__lbl").alias("label")
    )
    # border points: sparse-cell points adjacent to >= 1 dense cell →
    # the lexicographically smallest neighboring cluster label
    sparse = pts.join(F.broadcast(comp.select("__cell")), "__cell", "left_anti")
    spo = sparse.select("__k", *[f"__c{i}" for i in range(d)], off).select(
        "__k",
        *[
            (F.col(f"__c{i}") + F.col(f"__o.o{i}")).alias(f"__n{i}")
            for i in range(d)
        ],
    )
    spo = spo.withColumn("__cell", _cell_key(d, "__n"))
    border = (
        spo.join(F.broadcast(comp), "__cell")
        .groupBy("__k")
        .agg(F.min("__lbl").alias("label"))
    )
    noise = (
        sparse.select("__k")
        .join(border.select("__k"), "__k", "left_anti")
        .select("__k", F.lit(NOISE).alias("label"))
    )
    return (
        core.unionByName(border)
        .unionByName(noise)
        .select(F.col("__k").alias(key), "label")
    )
