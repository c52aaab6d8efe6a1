"""SemDeDup — semantic (embedding-space) deduplication by clustering.

The clustering companion to the SRP near-dup family
(operators/similarity.py): SRP buckets by RANDOM hyperplanes (recall
is probabilistic), SemDeDup buckets by LEARNED k-means centroids
(Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication", arXiv:2303.09540). Pairwise cosine is
computed ONLY within a cluster, pairs at/above the threshold form
duplicate groups (connected components), and ONE representative
survives per group — the member LEAST similar to its cluster centroid,
the paper's best-performing keep rule (keeps the "edge" example,
drops the redundant interior), tie-broken on the key for determinism.

Scale anatomy (the 100-TB contract):
  1. assignment — model-as-literals broadcast (k rows never shuffle;
     the Arrow matmul path takes over when k·dim is codegen-hostile),
     one narrow scan of the corpus;
  2. pair edges — a self EQUI-join on the cluster id: the ONLY
     quadratic term, Σ|cluster|², bounded BY DESIGN through k
     (the paper runs k = 50k on LAION; choose k ≈ n / target cluster
     size and the join stays shuffle-keyed by cluster, never global);
  3. grouping — connected_components hash-min propagation (dup groups
     are near-cliques: 2-4 rounds);
  4. keep rule — one row_number per group (WindowGroupLimit-shaped).

Reference parity: the reference engine (k-means.sql) stops at cluster
assignment; dedup-by-cluster is the extension a training-data pipeline
actually runs on top of it, so this operator is the reference's
k-means surface put to its published downstream use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from clickhouse_k_means_spark.functions.distance import (
    _lit_f,
    dot_fixed,
    l2_fixed,
)
from clickhouse_k_means_spark.operators.components import connected_components
from clickhouse_k_means_spark.sources.dataset import local_df


def _l2_hof_expr(col: str, c: list[float]):
    """L2 distance to a literal centroid as ONE JVM-parsed HOF fold:
    ``sqrt(aggregate(zip_with(col, array(...), (x,y)->(x-y)²), 0D, +))``.
    Interpreted per element (CodegenFallback), which is exactly the
    point — see the dispatch-tier comment. Fold order matches the
    unrolled form term-for-term (0 + d0 == d0 in IEEE)."""
    arr = ", ".join(_lit_f(float(v)) for v in c)
    return F.expr(
        f"sqrt(aggregate(zip_with({col}, array({arr}), "
        "(x, y) -> (x - y) * (x - y)), 0D, (acc, t) -> acc + t))"
    )

# assignment dispatch tiers by k·dim (the kmeans engine's own lesson,
# re-measured here): up to _CODEGEN_SAFE_CELLS the unrolled distance
# columns whole-stage-codegen cleanly; between that and _UNROLL_BUDGET
# a single codegen unit holding every per-centroid expression exceeds
# janino's method limit and — because FAILED compiles are not cached —
# re-pays a multi-second compile attempt on EVERY execution (measured
# 6-16 s/run at 8×64 on a 1006-row slice), so the distances switch to
# the interpreted HOF fold (same IEEE fold order: 0+d0 == d0 — the
# documented distance.py equivalence, so DuckDB oracles stay valid);
# above the budget assignment is rank-only and the Arrow matmul wins
_CODEGEN_SAFE_CELLS = 256
_UNROLL_BUDGET = 1024


def semantic_dedup(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]] | None = None,
    k: int = 8,
    threshold: float = 0.8,
    key: str = "vec_id",
    vec: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
) -> DataFrame:
    """Label every row with its cluster, duplicate group, and survival.

    Returns ``(key, j int, grp, keep int)``: ``j`` the assigned
    centroid, ``grp`` the duplicate-group label (min member key;
    rows with no in-cluster neighbor at/above ``threshold`` are their
    own group), ``keep`` 1 for the group representative (minimum
    rounded cosine-to-centroid, tie → lowest key) else 0.

    ``centroids``: ``[(j, vector), ...]`` to dedup against a fixed
    model (deterministic, oracle-replayable); ``None`` fits the engine
    k-means on ``df`` itself (k-means‖ init at k ≥ 16), the paper's
    actual procedure.

    Cosines are rounded to 4 decimals BEFORE the threshold and keep
    comparisons — the cross-engine determinism rule every other
    cosine gate in this repo follows.
    """
    # validate the model BEFORE the empty-input early return: an
    # invalid centroid list must fail loudly regardless of whether
    # data happens to arrive (review finding, r8)
    if centroids is not None:
        ids = [int(j) for j, _ in centroids]
        if len(set(ids)) != len(ids):
            dupes = sorted(j for j in set(ids) if ids.count(j) > 1)
            raise ValueError(
                f"semantic_dedup: duplicate centroid id(s) {dupes} — a "
                "repeated j would silently duplicate membership rows "
                "through the cdf join on j"
            )
    head = df.select(vec).first()
    if head is None:
        kt = df.schema[key].dataType.simpleString()
        return local_df(df.sparkSession,
            [], f"{key} {kt}, j int, grp {kt}, keep int"
        )
    dim = len(head[0])
    if centroids is None:
        from clickhouse_k_means_spark.plans.kmeans import KMeansEngine

        yh = df.select(
            F.col(key).alias("i"), F.col(vec).cast("array<double>").alias("Y")
        )
        init = "parallel" if k >= 16 else "plusplus"
        model = KMeansEngine(k=k, seed=seed, max_iter=max_iter, init=init).fit(
            yh
        ).model
    else:
        # sorted so the Arrow tier's argmin (first occurrence = lowest
        # INDEX) resolves equidistant ties to the lowest j — the same
        # rule the struct-min tiers and the DuckDB oracle apply
        # (duplicate ids already rejected above, before the empty
        # early return)
        model = sorted((int(j), [float(x) for x in c]) for j, c in centroids)

    base = df.select(
        F.col(key).alias("n"), F.col(vec).cast("array<double>").alias("v")
    )
    cells = len(model) * dim
    if cells <= _UNROLL_BUDGET:
        # per-centroid distances as SEPARATE columns, then a tiny
        # argmin over them; each column is either unrolled (codegens)
        # or the HOF fold (interpreted, NO doomed whole-stage compile
        # attempt) — identical values and fold order either way
        if cells <= _CODEGEN_SAFE_CELLS:
            dists = [
                l2_fixed("v", c, dim).alias(f"_d{i}")
                for i, (_, c) in enumerate(model)
            ]
        else:
            dists = [
                _l2_hof_expr("v", c).alias(f"_d{i}")
                for i, (_, c) in enumerate(model)
            ]
        staged = base.select("n", "v", *dists)
        jcol = F.array_min(
            F.array(
                *[
                    F.struct(
                        F.col(f"_d{i}").alias("dist"),
                        F.lit(int(j)).alias("j"),
                    )
                    for i, (j, _) in enumerate(model)
                ]
            )
        )["j"]
        assigned = staged.select("n", "v", jcol.alias("j"))
    else:
        from clickhouse_k_means_spark.functions.vector import nearest_cells_batch

        nearest = nearest_cells_batch([c for _, c in model], nprobe=1)
        js = F.array(*[F.lit(int(j)) for j, _ in model])
        assigned = base.select(
            "n", "v",
            F.element_at(js, nearest(F.col("v"))[0] + F.lit(1)).alias("j"),
        )

    spark = df.sparkSession
    cdf = local_df(
        spark,
        [(int(j), [float(x) for x in c]) for j, c in model],
        "j int, cv array<double>",
    )
    # barrier: materialize (n, j, c2c, |v|²) once. Without the cut the
    # assignment tree re-derives in every downstream stage (a-side,
    # b-side, AND the final label join). At cluster scale this is the
    # natural pipeline break anyway: every consumer below needs the
    # full assignment pass. The row norm rides along so the pair stage
    # pays ONE dot product per candidate instead of three.
    memb = (
        assigned.join(F.broadcast(cdf), "j")
        .select(
            "n", "j", "v",
            dot_fixed("v", "cv", dim).alias("_ab"),
            dot_fixed("v", "v", dim).alias("_aa"),
            dot_fixed("cv", "cv", dim).alias("_bb"),
        )
        .select(
            "n", "j", "v",
            # try_divide: a zero-norm vector's cosine is UNDEFINED —
            # NULL, not an ANSI DIVIDE_BY_ZERO crash (zero vectors are
            # routine padding rows in real embedding dumps). Identical
            # to plain division whenever the norm is nonzero, so the
            # full-value oracle (whose slice has no zero norms) is
            # unaffected.
            F.round(
                F.try_divide(F.col("_ab"), F.sqrt("_aa") * F.sqrt("_bb")), 4
            ).alias("c2c"),
            F.col("_aa").alias("nv"),
        )
        .localCheckpoint(eager=True)
    )

    a = memb.select(
        F.col("n").alias("a"), "j", F.col("v").alias("va"),
        F.col("nv").alias("nva"),
    )
    b = memb.select(
        F.col("n").alias("b"), "j", F.col("v").alias("vb"),
        F.col("nv").alias("nvb"),
    )
    edges = (
        a.join(b, "j")
        .filter(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            F.round(
                F.try_divide(
                    dot_fixed("va", "vb", dim),
                    F.sqrt("nva") * F.sqrt("nvb"),
                ),
                4,
            ).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
        .select("a", "b")
    )
    comps = connected_components(edges, "a", "b")
    labeled = (
        memb.join(comps, memb["n"] == comps["n"], "left")
        .select(memb["n"], "j", "c2c", F.coalesce("component", memb["n"]).alias("grp"))
    )
    # asc_NULLS_LAST: a zero-norm vector's cosine is NULL (undefined),
    # and NULL must not outrank every real "least similar" member —
    # zero vectors form no edges (NULL sim fails the threshold) and
    # only keep their own singleton group
    w = Window.partitionBy("grp").orderBy(
        F.col("c2c").asc_nulls_last(), F.col("n").asc()
    )
    return labeled.select(
        F.col("n").alias(key),
        "j",
        "grp",
        (F.row_number().over(w) == 1).cast("int").alias("keep"),
    )
