"""Declarative data-quality constraint checks — the Deequ-style
validation pass a production table runs before anything trains on it.

``check_constraints`` folds every check into ONE aggregation over ONE
scan (violation counters are `sum(when(...))` columns, uniqueness is a
`count - count(distinct)` pair in the same agg), then explodes the
single result row to one row per constraint — so a 100 TB validation
costs exactly one pass regardless of how many constraints it carries,
and the output is a tiny, SQL-checkable relation
``(constraint, n_rows, n_violations, ok)``.

NULL semantics: every row-level check counts NULL as a violation
EXCEPT where the check itself is about nullness — if NULLs are
acceptable, compose with ``not_null`` explicitly. This is the strict
reading a training-data gate wants (a NULL price is not "in range").
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Constraint:
    name: str
    kind: str  # 'row' (violation predicate) or 'unique'
    expr: Column | None = None  # row kinds: TRUE == violation
    cols: tuple[str, ...] = ()


def not_null(col: str) -> Constraint:
    return Constraint(f"not_null({col})", "row", F.col(col).isNull())


def in_range(col: str, lo, hi) -> Constraint:
    c = F.col(col)
    return Constraint(
        f"in_range({col},{lo},{hi})",
        "row",
        c.isNull() | (c < F.lit(lo)) | (c > F.lit(hi)),
    )


def in_set(col: str, values: list) -> Constraint:
    c = F.col(col)
    return Constraint(
        f"in_set({col})", "row", c.isNull() | ~c.isin(list(values))
    )


def matches(col: str, pattern: str) -> Constraint:
    c = F.col(col)
    return Constraint(
        f"matches({col})", "row", c.isNull() | ~c.rlike(pattern)
    )


def unique(*cols: str) -> Constraint:
    return Constraint(f"unique({','.join(cols)})", "unique", None, tuple(cols))


def check_constraints(df: DataFrame, constraints: list[Constraint]) -> DataFrame:
    """(constraint, n_rows, n_violations, ok) — one row per constraint,
    ONE scan total. For ``unique``, n_violations = n_rows − distinct
    key count (exact; the distinct runs map-side-partial inside the
    same aggregate). ``ok`` is an INT (1/0) for oracle portability."""
    if not constraints:
        raise ValueError("need at least one constraint")
    names = [c.name for c in constraints]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate constraint names: {names}")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(constraints):
        if c.kind == "row":
            aggs.append(
                F.sum(F.when(c.expr, 1).otherwise(0)).cast("bigint").alias(f"__v{i}")
            )
        elif c.kind == "unique":
            aggs.append(
                F.count_distinct(*[F.col(x) for x in c.cols])
                .cast("bigint")
                .alias(f"__d{i}")
            )
        else:
            raise ValueError(f"unknown constraint kind {c.kind!r}")
    one = df.agg(*aggs)
    entries = []
    for i, c in enumerate(constraints):
        viol = (
            F.col(f"__v{i}")
            if c.kind == "row"
            else (F.col("__n") - F.col(f"__d{i}"))
        )
        entries.append(
            F.struct(
                F.lit(c.name).alias("constraint"),
                F.col("__n").alias("n_rows"),
                viol.cast("bigint").alias("n_violations"),
                F.when(viol == 0, 1).otherwise(0).cast("int").alias("ok"),
            )
        )
    return one.select(F.explode(F.array(*entries)).alias("e")).select(
        "e.constraint", "e.n_rows", "e.n_violations", "e.ok"
    )
