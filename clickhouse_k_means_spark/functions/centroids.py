"""Nearest-centroid assignment as a pure Column expression.

The reference's core assignment operator is
``arraySort((j, C) -> L2Distance(C, Y), jC.1, jC.2)[1]``
(k-means.sql:38, OptimalK.sql:12-13): argmin over the k current
centroids, per row, with the model injected as two parallel arrays
from a scalar subquery (k-means.sql:36).

Spark mapping: the model is a driver-held list of (j, C) pairs folded
into array literals — Catalyst constant-folds them into the generated
code, so assignment is a single ``array_min`` over a k-element struct
array: O(k) per row (the reference's arraySort is O(k log k)), zero
joins, zero shuffles, stays in whole-stage codegen.

Tie-break: struct comparison falls through distance → j, so equidistant
centroids resolve to the LOWEST j (documented deviation Q3 — the
reference's tie order is groupArray order, nondeterministic in
principle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from clickhouse_k_means_spark.functions.distance import _as_vec, sq_l2_distance


def centroid_arrays(model: Sequence[tuple[int, Sequence[float]]]) -> tuple[Column, Column]:
    """Fold a driver-held model [(j, C), ...] into (js, Cs) array literals.

    Mirrors the reference's ``(groupArray(j), groupArray(C))`` scalar
    subquery (k-means.sql:36) — but evaluated once in the driver, which
    is strictly cheaper than once per query.
    """
    js = F.array(*[F.lit(int(j)) for j, _ in model])
    cs = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for _, c in model])
    return js, cs


def nearest_centroid_struct(y, model: Sequence[tuple[int, Sequence[float]]]) -> Column:
    """struct(dist double, j int) of the nearest centroid for vector ``y``.

    ``array_min`` over struct(dist, j) — struct ordering gives argmin by
    distance with ties → lowest j (quirk Q3).

    Distances are UNROLLED arithmetic (the model is a literal, so the
    arity is known): higher-order functions would run interpreted and
    kill whole-stage codegen for every assignment/elbow/Lloyd scan.
    The fold order matches the HOF form bit-for-bit.

    When ``y`` is a plain column name the whole expression is built as
    ONE SQL string parsed JVM-side: the Column-by-Column form costs
    ~3 Py4J round trips per (centroid, dim) cell, which at k·dim in
    the hundreds (SemDeDup's 8×64 model) turned plan CONSTRUCTION into
    tens of seconds of driver time. Identical AST either way — the
    literals print via repr, which round-trips float64 exactly.
    """
    if isinstance(y, str) and y.isidentifier():
        from clickhouse_k_means_spark.functions.distance import _sq_l2_sql

        parts = []
        for j, c in model:
            # the canonical fold/literal renderer (distance.py) — one
            # source of truth for the SQL shape the oracles replay
            sq = _sq_l2_sql(y, [float(v) for v in c], len(c))
            parts.append(f"struct(sqrt({sq}) as dist, {int(j)} as j)")
        return F.expr(f"array_min(array({', '.join(parts)}))")
    y = _as_vec(y)
    candidates = []
    for j, c in model:
        sq: Column | None = None
        for d, v in enumerate(c):
            t = y[d] - F.lit(float(v))
            term = t * t
            sq = term if sq is None else sq + term
        candidates.append(
            F.struct(F.sqrt(sq).alias("dist"), F.lit(int(j)).alias("j"))
        )
    return F.array_min(F.array(*candidates))


def nearest_centroid(y, model: Sequence[tuple[int, Sequence[float]]]) -> Column:
    """Assigned centroid id j (int) — reference k-means.sql:38."""
    return nearest_centroid_struct(y, model)["j"]
