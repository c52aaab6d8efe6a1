"""Vector distance expressions over ``array<double>`` columns.

Pure Column functions — JVM-side higher-order functions, no Python
UDFs, so they stay inside whole-stage codegen (the reference makes the
same argument for in-engine SQL distance at README.md:16; its workhorse
is ``L2Distance`` at k-means.sql:24,38,53 and OptimalK.sql:5,12-14).

All functions accept either a Column or a column name, and the "other"
side may be a plain Python list (folded into an array literal — this is
how the k-row centroid model is injected without a join, mirroring the
reference's scalar-subquery model arrays at k-means.sql:36).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = "Column | str"


def _as_vec(v: Column | str | Sequence[float]) -> Column:
    if isinstance(v, Column):
        return v
    if isinstance(v, str):
        return F.col(v)
    return F.array(*[F.lit(float(x)) for x in v])


def sq_l2_distance(a, b) -> Column:
    """Squared Euclidean distance between two double-array vectors.

    ``aggregate(zip_with(a, b, (x,y) -> (x-y)^2), 0.0, +)`` — one fused
    pass, arity-generic (reference is dimension-generic too, SURVEY
    §1.3), no shuffle, no UDF.
    """
    a, b = _as_vec(a), _as_vec(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_distance(a, b) -> Column:
    """Euclidean distance (reference ``L2Distance``, k-means.sql:24)."""
    return F.sqrt(sq_l2_distance(a, b))


def dot(a, b) -> Column:
    """Dot product of two double-array vectors."""
    a, b = _as_vec(a), _as_vec(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a) -> Column:
    """Euclidean norm of a double-array vector."""
    a = _as_vec(a)
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )


def cosine_similarity(a, b) -> Column:
    """Cosine similarity; NULL-safe-ish (0-norm vectors yield NULL)."""
    a, b = _as_vec(a), _as_vec(b)
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
