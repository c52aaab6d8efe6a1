"""Z-order (Morton) clustered parquet writes — multi-column data
skipping for the 100 TB scan path.

A range-partitioned write sorted by ONE column gives tight per-file
min/max stats on that column and useless full-range stats on every
other; filters on the second column then prune nothing. Interleaving
the bits of k normalized columns into one Morton key and
range-partitioning + sorting by IT spreads locality across ALL k
columns: each file covers a small hyper-rectangle, so parquet
row-group/file min-max stats prune scans filtered on ANY of the
z-ordered columns (the Delta Lake / Databricks OPTIMIZE ZORDER
technique, public since Morton 1966).

Everything is JVM-side integer bit arithmetic (shift/and/or
expressions — no UDFs); the only extra passes are one min/max agg to
learn normalization ranges and the range-exchange the sorted write
needs anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column], ranges: list[tuple[float, float]], bits: int = 16) -> Column:
    """Morton-interleave ``cols`` (numeric) into one BIGINT key.

    Each column is affinely mapped from its ``(lo, hi)`` range onto
    ``[0, 2^bits)`` and the quantized values' bits interleave
    round-robin (bit b of column c lands at position b·k + c). Total
    bits × columns must fit a signed 64-bit int. Degenerate ranges
    (hi == lo) quantize to 0 — the column then contributes nothing to
    the ordering, which is correct (it has one value).
    """
    k = len(cols)
    if k == 0:
        raise ValueError("need at least one column")
    if bits * k > 62:
        raise ValueError(f"bits ({bits}) * columns ({k}) must be <= 62")
    scale_max = (1 << bits) - 1
    quantized = []
    for c, (lo, hi) in zip(cols, ranges):
        span = float(hi) - float(lo)
        if span <= 0:
            quantized.append(F.lit(0).cast("bigint"))
            continue
        q = F.floor(
            (c.cast("double") - F.lit(float(lo))) / F.lit(span) * scale_max
        ).cast("bigint")
        quantized.append(F.greatest(F.lit(0), F.least(F.lit(scale_max), q)))
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for ci, q in enumerate(quantized):
            bit = F.shiftright(q, b).bitwiseAND(F.lit(1).cast("bigint"))
            z = z + F.shiftleft(bit, b * k + ci)
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    n_files: int = 8,
) -> None:
    """Write ``df`` as parquet clustered by the Morton key of ``cols``.

    One agg learns per-column min/max (the normalization ranges), then
    a range repartition + in-partition sort on the z-key and a plain
    parquet write. ``n_files`` is the target file count — at cluster
    scale pick it from data volume / desired file size, exactly like
    any compaction target.
    """
    stats = df.agg(
        *[F.min(c).alias(f"lo{i}") for i, c in enumerate(cols)],
        *[F.max(c).alias(f"hi{i}") for i, c in enumerate(cols)],
    ).first()
    ranges = [
        (float(stats[f"lo{i}"]), float(stats[f"hi{i}"])) for i in range(len(cols))
    ]
    z = zorder_key([F.col(c) for c in cols], ranges, bits=bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
