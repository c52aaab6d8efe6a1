"""Connected components over candidate-pair edges — dedup grouping.

The dedup family (operators/dedup.py) emits *pairs* (a, b). A real
pipeline needs *groups*: every document labeled with its duplicate
cluster so one canonical copy survives. That is connected components
on the pair graph — an iterative computation the reference engine
cannot express (its SQL has no recursion; extension operator).

Algorithm: hash-min label propagation. Every node starts labeled with
its own id; each round every node takes the min label over itself and
its neighbors; converged when no label changes. Rounds needed = graph
diameter — for near-dup clusters that is tiny (a dup cluster is almost
a clique; 2-4 rounds in practice), so the driver loop runs a handful
of Spark jobs regardless of corpus size.

Scale design per round: one join of the (node, label) table with the
symmetrized edge list (shuffle keyed by node — skew-bounded because
candidate generation is banded, so no node has pathological degree) +
one min-aggregation. Lineage is cut per round with localCheckpoint
(the kmeans lesson: chained plans grow superlinearly). The classic
large-star/small-star variant (alternating rounds that rewire edges
toward the minimum) drops the round count to O(log log n) for deep
graphs; not needed for dedup-shaped (shallow) graphs, noted here for
the 100 TB playbook.

Oracle: DuckDB replays the same grouping as a recursive transitive
closure (WITH RECURSIVE min-label) at fixture scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node of the undirected pair graph with the MINIMUM
    node id reachable from it. Returns ``(n, component)``.

    ``edges`` rows are (src, dst) pairs; direction is ignored. Isolated
    nodes (absent from edges) are by definition their own component and
    are not emitted — union the node table in if needed.
    """
    sym = (
        edges.select(F.col(src).alias("n"), F.col(dst).alias("m"))
        .union(edges.select(F.col(dst).alias("n"), F.col(src).alias("m")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.groupBy("n")
        .agg(F.least(F.min("m"), F.first("n")).alias("component"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # candidate label per node: min over own label and neighbors'
        neigh = (
            sym.join(
                labels.withColumnRenamed("n", "m").withColumnRenamed(
                    "component", "m_comp"
                ),
                "m",
            )
            .groupBy("n")
            .agg(F.min("m_comp").alias("neigh_comp"))
        )
        new_labels = (
            labels.join(neigh, "n", "left")
            .select(
                "n",
                F.least(
                    F.col("component"), F.coalesce("neigh_comp", F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("nw")
            .join(labels.alias("old"), "n")
            .filter(F.col("nw.component") != F.col("old.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_components(
    pairs: DataFrame, src: str = "a", dst: str = "b"
) -> DataFrame:
    """Duplicate groups from candidate pairs: ``(n, component,
    is_canonical)`` — component = min doc id of the group, canonical =
    the survivor a dedup pipeline keeps."""
    comp = connected_components(pairs, src=src, dst=dst)
    return comp.select(
        "n",
        "component",
        (F.col("n") == F.col("component")).alias("is_canonical"),
    )
