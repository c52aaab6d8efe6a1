"""Iterative graph analytics: fixed-point PageRank.

Extension beyond the reference (its only iterative surface is the
k-means convergence loop, k-means.sh:16-33 — the same driver-side
loop-over-declarative-steps idiom is applied here). Connected
components live in ``operators/components.py``; this module adds the
other canonical iterative-join workload, with the engine's exactness
rule: ALL rank arithmetic is BIGINT micro-units (integer division for
the per-edge split, integer damping), so results replay bit-for-bit
against the unrolled-CTE DuckDB oracle and cannot drift with
partitioning or iteration scheduling.

Semantics: the simplified (no dangling-mass redistribution) PageRank
``r'(v) = (1-d) + d · Σ_{u→v} r(u)/deg(u)`` — on a symmetric edge set
(e.g. the co-occurrence graphs built below) every node has out-edges,
so the dangling term is structurally zero anyway.

Scale design: per iteration, one shuffle-join of edges⋈ranks on src
(both sides partitioned by the join key; AQE handles skewed hubs) and
one groupBy(dst) with map-side partial sums; ranks are eagerly
localCheckpoint-ed each iteration so lineage stays O(1) and the next
iteration re-reads a materialized relation instead of replaying the
whole chain (the components.py large-star/small-star lesson).
Fan-out of the co-supply edge builder is bounded by per-order line
counts (TPC-H ≤ 7), not corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ONE = 1_000_000  # rank fixed-point unit (micro-ranks)


def co_occurrence_edges(
    df: DataFrame, group: str, node: str
) -> DataFrame:
    """Symmetric directed edge set ``(src, dst)``: two distinct nodes
    are connected iff they share a ``group`` value (e.g. suppliers
    co-supplying an order). Deduplicated across groups."""
    a = df.select(F.col(group).alias("g"), F.col(node).alias("src")).distinct()
    b = df.select(F.col(group).alias("g"), F.col(node).alias("dst")).distinct()
    return (
        a.join(b, "g")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping_ppm: int = 850_000,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank in exact BIGINT micro-units.

    Returns ``(node, rank_micro)`` for every node with out-edges.
    Per iteration: ``contrib(u) = r(u) div deg(u)`` (integer split),
    ``r'(v) = (ONE - d) + (d · Σ contrib) div ONE`` with ``d`` in ppm
    — deterministic across engines and partitionings.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if not (0 < damping_ppm < ONE):
        raise ValueError(f"damping_ppm must be in (0, {ONE}), got {damping_ppm}")
    # checkpoint the edge set ONCE: it feeds every iteration's join,
    # and without this the (possibly expensive) edge-building lineage
    # — e.g. co_occurrence_edges' self-join — re-executes per
    # iteration (measured 3x cost on the co-supplier bench query)
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=True)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = e.select(F.col("src").alias("node")).distinct().localCheckpoint(
        eager=True
    )
    ranks = nodes.withColumn("r", F.lit(ONE).cast("bigint"))
    base = ONE - damping_ppm
    for _ in range(iters):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select("dst", F.expr("r div deg").alias("c"))
        )
        inbound = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(inbound.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(f"({damping_ppm} * coalesce(s, 0L)) div {ONE}")
                ).cast("bigint").alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.col("r").alias("rank_micro"))


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Exact global triangle count (one row: n_vertices / n_edges /
    n_triangles) — the canonical graph-locality metric.

    Algorithm: degree-ordered edge orientation (the MapReduce
    triangle-counting scheme of Suri & Vassilvitskii, WWW'11). Every
    undirected edge is directed from its (degree, node)-smaller
    endpoint to the larger; each triangle then has exactly ONE apex
    with two out-edges, so counting wedge-closures counts each
    triangle once. The orientation is what makes this scale: a
    vertex's out-degree is bounded by ~sqrt(2m) regardless of how hot
    a hub is, so the wedge join (the quadratic step) is
    sum-of-out-deg² — dramatically smaller than the raw deg² a hub
    would generate, and the reason this plan survives power-law
    graphs at corpus scale.

    Plan: one distinct (canonical edges), one degree aggregate
    (broadcast back — degree table is |V|, state-sized for
    co-occurrence graphs; swap to a shuffle join for web-scale |V|),
    one self-join on the apex, one left-semi closure probe.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("db"))
    wd = und.join(F.broadcast(da), "a").join(F.broadcast(db), "b")
    # orient: lo = (deg, id)-smaller endpoint
    lo_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = wd.select(
        F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
        F.when(lo_first, F.col("db")).otherwise(F.col("da")).alias("d_hi"),
    ).localCheckpoint(eager=True)  # wedge join + closure probe reuse it
    x = oriented.select(
        F.col("lo"), F.col("hi").alias("h1"), F.col("d_hi").alias("dh1")
    )
    y = oriented.select(
        F.col("lo"), F.col("hi").alias("h2"), F.col("d_hi").alias("dh2")
    )
    wedges = x.join(y, "lo").filter(
        F.struct(F.col("dh1"), F.col("h1")) < F.struct(F.col("dh2"), F.col("h2"))
    )
    closed = wedges.join(
        oriented.select(F.col("lo").alias("h1"), F.col("hi").alias("h2")),
        ["h1", "h2"],
        "left_semi",
    )
    tri = closed.agg(F.count(F.lit(1)).alias("n_triangles"))
    stats = und.agg(
        F.count(F.lit(1)).alias("n_edges"),
    ).join(F.broadcast(deg.agg(F.count(F.lit(1)).alias("n_vertices"))))
    return stats.join(F.broadcast(tri)).select(
        "n_vertices", "n_edges", "n_triangles"
    )
