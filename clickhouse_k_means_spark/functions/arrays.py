"""ClickHouse array-function parity as Spark higher-order functions.

The reference engine's array toolkit (``arrayCumSum``,
``arrayDifference``, ``arrayCompact``, ``arrayReverse``, ``arraySlice``,
``arraySort``/``arrayDistinct`` — k-means.sql leans on ``arraySort``
and ``arrayMap`` at :35-39) re-expressed with ``pyspark.sql.functions``
HOFs. Everything here compiles to JVM-side expressions inside
whole-stage codegen — no Python in the data path, so these run at
column-scan speed on any corpus.

Index convention: Spark lambda indexes are 0-based (DuckDB's are
1-based — the oracle twins account for the offset). Cumulative/
difference forms assume integer element types; integerize floats
per-row first, as everywhere else in the engine.

``array_cumsum`` is O(d²) in the array arity because it re-aggregates
each prefix — the right trade for the short, bounded arrays these
functions target (embeddings, signatures). For million-element arrays
explode + window is the scalable form (see q_window_running).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def array_cumsum(a: Column) -> Column:
    """``arrayCumSum`` — running sum per position."""
    return F.transform(
        a,
        lambda x, i: F.aggregate(
            F.slice(a, F.lit(1), i + 1),
            F.lit(0).cast("long"),
            lambda acc, y: acc + y,
        ),
    )


def array_difference(a: Column) -> Column:
    """``arrayDifference`` — x[i] - x[i-1], 0 for the first element."""
    return F.transform(
        a,
        lambda x, i: F.when(i == 0, F.lit(0).cast("long")).otherwise(
            x - F.get(a, i - 1)
        ),
    )


def array_compact(a: Column) -> Column:
    """``arrayCompact`` — drop consecutive duplicates, keep order."""
    return F.filter(a, lambda x, i: (i == 0) | (x != F.get(a, i - 1)))


def array_distinct_sorted(a: Column) -> Column:
    """``arraySort(arrayDistinct(...))`` — canonical set form."""
    return F.sort_array(F.array_distinct(a))
