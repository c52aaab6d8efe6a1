"""PCA over an embedding column — dimensionality reduction for the
similarity/clustering surface (whitening before ANN, 2-D map plots,
variance-based feature pruning).

Two layers, following the engine's oracle discipline:

- ``covariance_long`` (the GATE): the upper-triangular covariance of
  the first ``dim`` embedding dimensions in EXACT fixed-point — each
  coordinate is integerized once (round(x·1e5) as bigint) and every
  sum/product after that is exact BIGINT, so the result is identical
  under any partitioning and any engine; one final double division
  per entry. SQL-expressible → full DuckDB oracle twin.
- ``fit_pca`` / ``project_pca`` (the production path): full-dimension
  covariance via ONE narrow Arrow pass (mapInPandas partition
  partials: (count, Σx, Σxxᵀ) — d² doubles per partition row, tiny),
  driver-side ``numpy.linalg.eigh`` on the d×d matrix (d is model
  arity, never data-scale), then an Arrow-batched matmul projection.
  Float sums here are double-precision per partition; PCA consumers
  need variance structure, not bit-replay, and every test asserts
  scale-invariant facts (orthonormality, variance ordering,
  reconstruction error) rather than raw floats.

At 100 TB: the covariance pass is a single scan with a ~(d²)-sized
partial per partition — no shuffle of data rows at all (the partials
collapse driver-side); the projection pass is narrow and stateless.
The eigendecomposition cost is O(d³) on the driver — independent of
row count.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = 100_000  # fixed-point: 1e-5 embedding resolution, exact in int64


def covariance_long(df: DataFrame, vec: str = "embedding", dim: int = 8) -> DataFrame:
    """Upper-triangular population covariance entries ``(i, j, cov)``
    of the first ``dim`` coordinates, exact-fixed-point (see module
    docstring). cov = (n·Σxy − Σx·Σy) / (n²·SCALE²), rounded to 8 dp
    after the single final division.

    int64 headroom: |e| ≤ SCALE (coords are O(1)), so Σe·e ≤ n·SCALE²
    and n·Σxy ≤ n²·SCALE² ≈ 4e16 at n=2e3 — overflow needs n ≳ 3e4 at
    this SCALE; larger corpora gate on a sampled slice or drop SCALE.
    """
    if dim < 1:
        raise ValueError("dim must be >= 1")
    base = df.select(
        *[
            F.round(F.col(vec)[i].cast("double") * _SCALE)
            .cast("bigint")
            .alias(f"e{i}")
            for i in range(dim)
        ]
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    aggs += [F.sum(f"e{i}").alias(f"s{i}") for i in range(dim)]
    aggs += [
        F.sum(F.col(f"e{i}") * F.col(f"e{j}")).alias(f"s{i}_{j}")
        for i in range(dim)
        for j in range(i, dim)
    ]
    one = base.agg(*aggs)
    entries = [
        F.struct(
            F.lit(i).alias("i"),
            F.lit(j).alias("j"),
            F.round(
                (
                    F.col("n") * F.col(f"s{i}_{j}") - F.col(f"s{i}") * F.col(f"s{j}")
                ).cast("double")
                / (F.col("n") * F.col("n") * F.lit(float(_SCALE * _SCALE))),
                8,
            ).alias("cov"),
        )
        for i in range(dim)
        for j in range(i, dim)
    ]
    return one.select(F.explode(F.array(*entries)).alias("e")).select(
        F.col("e.i").alias("i"), F.col("e.j").alias("j"), F.col("e.cov").alias("cov")
    )


@dataclass
class PCAModel:
    mean: np.ndarray  # (d,)
    components: np.ndarray  # (k, d) rows = principal axes, orthonormal
    explained_variance: np.ndarray  # (k,) eigenvalues, descending


def _cov_full(df: DataFrame, vec: str, dim: int) -> tuple[int, np.ndarray, np.ndarray]:
    """(n, mean, population covariance) of the full ``dim``-arity
    column via one mapInPandas pass of per-partition (count, Σx, Σxxᵀ)
    partials."""
    out_schema = f"cnt bigint, s array<double>, ss array<double>"

    def _partials(batches):
        cnt = 0
        s = np.zeros(dim, dtype=np.float64)
        ss = np.zeros((dim, dim), dtype=np.float64)
        for pdf in batches:
            m = np.array(pdf[vec].tolist(), dtype=np.float64)
            if len(m):
                cnt += len(m)
                s += m.sum(axis=0)
                ss += m.T @ m
        if cnt:
            yield pd.DataFrame(
                {"cnt": [cnt], "s": [list(s)], "ss": [list(ss.ravel())]}
            )

    rows = df.select(vec).mapInPandas(_partials, out_schema).collect()
    if not rows:
        raise ValueError("empty input")
    n = sum(r["cnt"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    ss = np.sum([np.asarray(r["ss"]).reshape(dim, dim) for r in rows], axis=0)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    return n, mean, cov


def fit_pca(
    df: DataFrame, vec: str = "embedding", n_components: int = 2, dim: int | None = None
) -> PCAModel:
    """Fit PCA: one distributed covariance pass + driver ``eigh``.

    Sign convention: each component is flipped so its
    largest-magnitude coordinate is positive — eigenvectors are only
    defined up to sign, and pinning it makes fits reproducible across
    LAPACK builds.
    """
    if dim is None:
        head = df.select(vec).first()
        if head is None:
            raise ValueError("empty input")
        dim = len(head[0])
    if not 1 <= n_components <= dim:
        raise ValueError(f"n_components must be in [1, {dim}]")
    _, mean, cov = _cov_full(df, vec, dim)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:n_components]
    comps = vecs[:, order].T  # (k, d)
    for r in range(comps.shape[0]):
        pivot = np.abs(comps[r]).argmax()
        if comps[r, pivot] < 0:
            comps[r] = -comps[r]
    return PCAModel(
        mean=mean,
        components=comps,
        explained_variance=np.maximum(vals[order], 0.0),
    )


def project_pca(
    df: DataFrame, model: PCAModel, vec: str = "embedding", out: str = "pc"
) -> DataFrame:
    """Append ``out`` = the centered projection (array<double>, one
    value per component) via an Arrow-batched matmul — narrow, no
    shuffle, model rides in the closure."""
    from pyspark.sql.functions import pandas_udf

    mean = model.mean
    ct = np.ascontiguousarray(model.components.T)  # (d, k)

    @pandas_udf("array<double>")
    def _proj(v: pd.Series) -> pd.Series:
        m = np.array(v.tolist(), dtype=np.float64) - mean
        return pd.Series(list(m @ ct))

    return df.withColumn(out, _proj(F.col(vec).cast("array<double>")))
