"""Plan auditing — the engine's anti-pattern checks as a library.

The test suite guards plan shapes ad hoc (no SinglePartition windows,
broadcasts where expected, pushdown reaching the scan); this module
makes those checks a public, reusable surface so PIPELINE code can
assert its own plans before a 100 TB run — the "explain and iterate
until it's the plan you'd want" rule as an executable contract:

    report = audit_plan(df)
    assert not report["single_partition"], report

Everything reads the EXECUTED plan string — the same source of truth
``df.explain`` prints — so audits see post-AQE physical reality, not
the logical intent.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame) -> str:
    """The executed physical plan as text (what ``explain`` prints).

    ``spark.sql.maxMetadataStringLength`` (default 100) truncates long
    PushedFilters/ReadSchema lists mid-bracket, which silently blinds
    the regex extraction below — a 4-predicate pushdown read as "no
    pushdown". Widen it for the duration of the render.
    """
    conf = df.sparkSession.conf
    key = "spark.sql.maxMetadataStringLength"
    old = conf.get(key, "100")
    try:
        conf.set(key, "10000")
        return df._jdf.queryExecution().executedPlan().toString()
    finally:
        conf.set(key, old)


def audit_plan(df: DataFrame) -> dict:
    """Structural facts about a DataFrame's physical plan.

    Returns a dict of:
    - ``n_shuffles``: count of hash/range repartition exchanges
    - ``shuffle_keys``: the partitioning expressions of each shuffle
    - ``n_broadcasts``: broadcast exchanges (small-side ships, no
      repartition of the big side)
    - ``has_cartesian``: a CartesianProduct / BroadcastNestedLoopJoin
      is in the plan — almost always an accident at scale
    - ``single_partition``: a SinglePartition exchange whose CONSUMER
      is a Sort/Window operator — ALL ROWS funnel through one task
      (the unbounded-data scale killer). A SinglePartition exchange
      feeding a final aggregate is NOT flagged: that is the benign
      second phase of a two-phase scalar aggregate, carrying one
      partial row per upstream partition, and virtually every query
      with a global count/sum has one.
    - ``pushed_filters``: predicates that reached the file scan
    - ``read_schemas``: per-scan column projections (prune check)
    - ``interpreted_hofs``: higher-order-function expressions that
      evaluate interpreted per element (transform/aggregate/filter
      lambdas) — fine on bounded arrays, a hot-path smell otherwise
    """
    plan = plan_string(df)
    shuffles = re.findall(r"Exchange (hashpartitioning\([^\n]*?)(?:, \[plan_id)", plan)
    shuffles += re.findall(r"Exchange (rangepartitioning\([^\n]*?)(?:, \[plan_id)", plan)
    return {
        "n_shuffles": len(shuffles),
        "shuffle_keys": shuffles,
        "n_broadcasts": plan.count("BroadcastExchange"),
        "has_cartesian": (
            "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan
        ),
        "single_partition": _single_partition_funnel(plan),
        "pushed_filters": re.findall(r"PushedFilters: \[([^\]]*)\]", plan),
        "read_schemas": re.findall(r"ReadSchema: ([^\n,]+)", plan),
        "interpreted_hofs": sorted(
            set(
                re.findall(
                    r"\b(transform|aggregate|zip_with|exists|filter)\(", plan
                )
            )
        ),
    }


# Tree prefix = the drawing characters (spaces, ':', '+', '-') before
# the operator; an optional '*(n) ' whole-stage-codegen marker follows
# it. Depth must be the PREFIX width, not the first-letter column:
# '*(2) Sort' puts its first letter 5 columns right of where the bare
# 'Sort' would sit, which made a codegen'd consumer directly above an
# exchange look deeper-or-equal and be skipped (ADVICE r5).
_TREE_LINE = re.compile(r"^([ :+\-]*)(?:\*\(\d+\) )?(\S.*)$")


def _depth_and_op(ln: str) -> tuple[int, str] | None:
    m = _TREE_LINE.match(ln)
    if m is None:
        return None
    return len(m.group(1)), m.group(2)


def _single_partition_funnel(plan: str) -> bool:
    """True if a SinglePartition exchange feeds a Sort/Window consumer
    (a genuine all-rows funnel). The consumer of an exchange is the
    nearest PRECEDING tree line with a shallower tree prefix; a
    *Aggregate consumer is the benign scalar-agg final phase."""
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        here = _depth_and_op(ln)
        if here is None:
            continue
        for prev in reversed(lines[:i]):
            p = _depth_and_op(prev)
            if p is None or p[0] >= here[0]:
                continue
            consumer = p[1]
            if "Aggregate" in consumer:
                break  # benign two-phase scalar aggregate
            if "Sort" in consumer or "Window" in consumer:
                return True
            break  # some other consumer (e.g. Limit) — not a funnel
    return False


def assert_scales(df: DataFrame, allow_single_partition: bool = False) -> dict:
    """Raise if the plan has a structural scale killer (cartesian
    product, or a SinglePartition funnel unless explicitly allowed —
    e.g. a bounded day-table cumsum). Returns the audit for further
    checks."""
    report = audit_plan(df)
    problems = []
    if report["has_cartesian"]:
        problems.append("cartesian/nested-loop join")
    if report["single_partition"] and not allow_single_partition:
        problems.append("SinglePartition funnel")
    if problems:
        raise AssertionError(f"plan fails scale audit: {problems}\n{plan_string(df)}")
    return report
