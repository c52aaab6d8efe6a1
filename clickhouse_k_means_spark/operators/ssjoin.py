"""Exact set-similarity self-join via prefix filtering (SSJoin).

The DETERMINISTIC complement to the MinHash-LSH pipeline in
``operators/dedup.py``: LSH finds near-dup candidates
probabilistically (tunable recall), while prefix filtering (SSJoin,
Chaudhuri et al., ICDE 2006; PPJoin, Xiao et al., WWW 2008) is
COMPLETE — every pair with Jaccard ≥ t over token sets is guaranteed
to surface, because two sets meeting the threshold must share at
least one token among their first ``|x| − ⌈t·|x|⌉ + 1`` tokens under
any global token order. Ordering tokens by ascending corpus frequency
makes those prefix tokens the RAREST ones, so the candidate join
touches the small end of the posting-list distribution.

Scale design:
- the global order needs no global rank table: sorting each doc's
  (df, token) struct array with ``sort_array`` is a consistent total
  order, entirely JVM-side — no SinglePartition window over the
  vocabulary;
- candidates come from exploding only PREFIX tokens (rare by
  construction) and self-joining on them — the shuffle is keyed on
  rare tokens, the frequent-token posting lists never join;
- the classic length filter (``t·|x| ≤ |y| ≤ |x|/t``) prunes inside
  the join condition as exact integer cross-multiplication;
- verification is exact Jaccard on candidates only, with the ≥ t cut
  as ``inter · 10⁶ ≥ t_ppm · union`` — BIGINT cross-multiplication,
  no division, no float, bit-identical to the brute-force oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clickhouse_k_means_spark.functions.text import tokens

PPM = 1_000_000


def _ordered_sets(docs: DataFrame, key: str, text: str) -> DataFrame:
    """``(k, ts, n)`` — each doc's distinct tokens sorted by the global
    ascending-(df, token) order. ``sort_array`` over the (df, token)
    struct array gives a consistent total order entirely JVM-side, no
    global rank table and no SinglePartition window. Checkpointed: it
    feeds the prefix explode AND both verify sides."""
    sets = (
        docs.select(F.col(key).alias("k"), tokens(text).alias("tk"))
        .select("k", F.array_distinct("tk").alias("ts"))
        .filter(F.size("ts") > 0)  # empty docs never reach positive t
    )
    df_tbl = (
        sets.select("k", F.explode("ts").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    return (
        sets.select("k", F.explode("ts").alias("t"))
        .join(df_tbl, "t")
        .groupBy("k")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("df"), F.col("t")))
            ).alias("st")
        )
        .select(
            "k",
            F.col("st.t").alias("ts"),
            F.size("st").cast("bigint").alias("n"),
        )
        .localCheckpoint(eager=True)
    )


def _candidate_pairs(
    ordered: DataFrame, threshold_ppm: int, position_filter: bool = True
) -> DataFrame:
    """Prefix-filtered candidate pairs ``(ka, kb)`` over the ordered
    token relation ``(k, ts, n)``.

    Three exact pruning conditions inside ONE join (all BIGINT
    cross-multiplications, no division):
    - prefix filter: both sides explode only their first
      ``n − ⌈t·n⌉ + 1`` tokens (rarest-first order), so the shuffle is
      keyed on rare tokens;
    - length filter: ``t·|a| ≤ |b| ∧ t·|b| ≤ |a|``;
    - POSITIONAL filter (PPJoin, Xiao et al. WWW'08 §3.2): a match on
      the token at 0-based positions ``(pa, pb)`` bounds the overlap
      by ``min(|a|−pa, |b|−pb)``, and Jaccard ≥ t needs overlap
      ≥ t·(|a|+|b|)/(1+t) — prune when the bound can't reach it.
      Complete because for a qualifying pair the FIRST shared prefix
      token admits no common token before it on either side (the
      global order is total), so its bound ≥ the true overlap; later
      shared tokens may pass spuriously, which only costs dedup work.
      At corpus scale the candidate ``distinct()`` is this operator's
      dominant shuffle — rows pruned here are shuffle bytes saved.
    """
    plen = (
        F.col("n")
        - F.expr(f"(n * {threshold_ppm} + {PPM - 1}) div {PPM}")
        + F.lit(1)
    )
    prefixes = ordered.select(
        "k",
        "n",
        F.posexplode(F.slice("ts", 1, plen)).alias("p", "pt"),
    )
    a, b = prefixes.alias("a"), prefixes.alias("b")
    cond = (
        (F.col("a.pt") == F.col("b.pt"))
        & (F.col("a.k") < F.col("b.k"))
        # length filter: t·|a| ≤ |b| (symmetric side implied by
        # a < b ordering only when sizes are equal, so keep both)
        & (F.col("b.n") * threshold_ppm <= F.col("a.n") * PPM)
        & (F.col("a.n") * threshold_ppm <= F.col("b.n") * PPM)
    )
    if position_filter:
        ubound = F.least(
            F.col("a.n") - F.col("a.p"), F.col("b.n") - F.col("b.p")
        )
        cond = cond & (
            ubound * (PPM + threshold_ppm)
            >= F.lit(threshold_ppm) * (F.col("a.n") + F.col("b.n"))
        )
    return (
        a.join(b, cond)
        .select(F.col("a.k").alias("ka"), F.col("b.k").alias("kb"))
        .distinct()
    )


def similarity_self_join(
    docs: DataFrame,
    threshold_ppm: int,
    key: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """All pairs ``(a, b, jacc_ppm)`` with ``a < b`` and token-SET
    Jaccard ≥ ``threshold_ppm/10⁶`` — exact and complete."""
    if not (0 < threshold_ppm <= PPM):
        raise ValueError(f"threshold_ppm must be in (0, {PPM}], got {threshold_ppm}")
    ordered = _ordered_sets(docs, key, text)
    cand = _candidate_pairs(ordered, threshold_ppm)
    va = ordered.select(F.col("k").alias("ka"), F.col("ts").alias("ta"))
    vb = ordered.select(F.col("k").alias("kb"), F.col("ts").alias("tb"))
    scored = (
        cand.join(va, "ka")
        .join(vb, "kb")
        .select(
            "ka",
            "kb",
            F.size(F.array_intersect("ta", "tb")).cast("bigint").alias("i"),
            (
                F.size("ta").cast("bigint")
                + F.size("tb").cast("bigint")
            ).alias("ab"),
        )
        .withColumn("u", F.col("ab") - F.col("i"))
    )
    return (
        scored.filter(F.col("i") * PPM >= F.lit(threshold_ppm) * F.col("u"))
        .select(
            F.col("ka").alias("a"),
            F.col("kb").alias("b"),
            F.expr(f"(i * {PPM}) div u").cast("bigint").alias("jacc_ppm"),
        )
    )
