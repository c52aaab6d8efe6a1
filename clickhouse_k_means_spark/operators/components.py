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
(the kmeans lesson: chained plans grow superlinearly). For deep
graphs, ``star_components`` implements the classic alternating
large-star/small-star rewiring (Kiveris et al., "Connected Components
in MapReduce and Beyond"): round count O(log² n) worst case instead
of O(diameter), each round two groupBy+join shuffles over the edge
set. ``connected_components(algorithm="auto")`` starts with
propagation (optimal for dedup-shaped shallow graphs) and falls over
to the star variant instead of returning wrong labels when the
diameter exceeds the propagation round budget.

Oracle: DuckDB replays the same grouping as a recursive transitive
closure (WITH RECURSIVE min-label) at fixture scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# The pair graph fits the driver below this many edge rows (≈3 MB of
# ids at 200k) — the same size-gated reasoning as a broadcast join
# (guide §3.1): when the whole graph is broadcast-sized, iterating a
# distributed fixpoint over it is pure overhead.
_DRIVER_MAX_EDGES = 200_000


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 25,
    algorithm: str = "auto",
    driver_max_edges: int = _DRIVER_MAX_EDGES,
) -> DataFrame:
    """Label every node of the undirected pair graph with the MINIMUM
    node id reachable from it. Returns ``(n, component)``.

    ``edges`` rows are (src, dst) pairs; direction is ignored. Isolated
    nodes (absent from edges) are by definition their own component and
    are not emitted — union the node table in if needed.

    ``algorithm``: ``"propagation"`` (hash-min rounds, O(diameter)),
    ``"star"`` (large-star/small-star rewiring, O(log² n) — deep
    graphs), or ``"auto"`` (propagation; on round-budget exhaustion
    falls over to star instead of returning split components — a
    max_iter=25 exhaustion used to return silently-wrong labels).

    Bounded-graph fast path (r14, guide §1.2/§3.1): the pair set of a
    banded dedup batch is usually tiny (hundreds of edges at bench
    scale), yet the fixpoint loop pays 2 jobs per round plus two
    checkpoints regardless. When the edge list is proven ≤
    ``driver_max_edges`` rows by a bounded ``limit(n+1)`` probe, a
    driver union-find computes the IDENTICAL min-id labels in that one
    bounded job and returns them as a LocalRelation — the same
    size-gate-then-collect decision a broadcast join makes, so it
    holds at any scale (a 100 TB corpus whose candidate-pair graph
    exceeds the gate takes the distributed loop unchanged). Null
    endpoints (impossible from the dedup emitters) fall back to the
    distributed loop rather than guessing a null semantics.
    Set ``driver_max_edges=0`` to force the distributed loop.
    """
    if algorithm == "star":
        return star_components(edges, src=src, dst=dst)
    if algorithm not in ("auto", "propagation"):
        raise ValueError(f"unknown algorithm {algorithm!r}")
    # the size gate applies only to "auto" — an explicit algorithm
    # choice is a request for that distributed loop (tests pin its
    # budget-exhaustion behavior through exactly that door)
    # the driver path types its (n, component) output from ONE column;
    # mixed src/dst types would need the union's coercion rules
    # replayed driver-side to match the distributed loop's schema
    # (ADVICE r14) — every in-repo emitter is same-typed, so mixed
    # types simply keep the distributed loop, whose union coerces
    if algorithm == "auto" and driver_max_edges and driver_max_edges > 0 and (
        edges.schema[src].dataType == edges.schema[dst].dataType
    ):
        head = (
            edges.select(F.col(src).alias("n"), F.col(dst).alias("m"))
            .limit(driver_max_edges + 1)
            .collect()
        )
        if len(head) <= driver_max_edges and all(
            r["n"] is not None and r["m"] is not None for r in head
        ):
            return _driver_components(
                edges.sparkSession, head, edges.schema[src].dataType
            )
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
    changed = 0
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
    if changed != 0:
        if algorithm == "auto":
            return star_components(edges, src=src, dst=dst)
        raise RuntimeError(
            f"connected_components: not converged after {max_iter} rounds "
            "(graph diameter exceeds the budget) — labels would be split; "
            "use algorithm='star' or raise max_iter"
        )
    return labels


def _driver_components(spark, edge_rows, key_type) -> DataFrame:
    """Union-find over a collected bounded edge list → ``(n,
    component)`` LocalRelation with component = min reachable id —
    bit-equal to the propagation fixpoint (both are exactly "min id
    in the connected component"; no floats involved)."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in edge_rows:
        a, b = r["n"], r["m"]
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_min: dict = {}
    for node in parent:
        root = find(node)
        cur = comp_min.get(root)
        if cur is None or node < cur:
            comp_min[root] = node
    from clickhouse_k_means_spark.sources.dataset import local_df

    t = key_type.simpleString()
    return local_df(
        spark,
        sorted((node, comp_min[find(node)]) for node in parent),
        f"n {t}, component {t}",
    )


def star_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 50,
) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.):
    alternately rewire every edge toward the minimum of its
    neighborhood until the graph is a forest of stars centered at each
    component's minimum id. Returns ``(n, component)``.

    Round count is O(log² n) independent of diameter — a 10⁶-node path
    graph converges in ~20 rounds where propagation needs 10⁶. Per
    round: one groupBy(n).min + one join keyed on n over the edge set
    (both AQE-skew-splittable; the min-star center of a huge component
    is a hot key only AFTER convergence, when its edges stop moving).
    """

    def _large_star(e: DataFrame) -> DataFrame:
        # symmetrize, then per node u with m = min(Γ(u) ∪ {u}) link
        # every strictly-greater neighbor to m
        s = e.union(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).distinct()
        mins = s.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("mu")
        )
        return (
            s.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("mu").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def _small_star(e: DataFrame) -> DataFrame:
        # direct every edge larger→smaller, then per node u link all
        # (≤ u) neighbors and u itself to m = min(Γ(u) ∪ {u})
        d = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
        mins = d.groupBy("u").agg(F.min("v").alias("mu"))  # all v < u
        return (
            d.join(mins, "u")
            .select(F.col("v").alias("u"), F.col("mu").alias("v"))
            .union(mins.select(F.col("u"), F.col("mu").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # every node must survive rewiring even if its component collapses
    # early; track the node set once up front
    nodes = (
        e.select("u").union(e.select("v")).distinct().localCheckpoint(eager=True)
    )
    prev_sig = None
    for _ in range(max_iter):
        e = _large_star(e)
        e = _small_star(e).localCheckpoint(eager=True)
        # converged when the (directed) edge multiset is stable: cheap
        # order-free signature instead of a full anti-join
        sig = e.agg(
            F.count(F.lit(1)).alias("c"),
            # XOR fold: order-free and overflow-free (a bigint SUM of
            # hashes trips ANSI overflow on large edge sets)
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).collect()[0]
        sig = (sig["c"], sig["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"star_components: not converged after {max_iter} rounds"
        )
    # stars point u -> center; centers have no outgoing edge
    labels = e.groupBy("u").agg(F.min("v").alias("component"))
    return (
        nodes.join(labels, "u", "left")
        .select(
            F.col("u").alias("n"),
            F.coalesce("component", F.col("u")).alias("component"),
        )
    )


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
