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
    # distinct token sets; empty docs can never reach a positive t
    sets = (
        docs.select(F.col(key).alias("k"), tokens(text).alias("tk"))
        .select("k", F.array_distinct("tk").alias("ts"))
        .filter(F.size("ts") > 0)
    )
    df_tbl = (
        sets.select("k", F.explode("ts").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    # canonical order = ascending (df, token); sort_array on the
    # struct array gives it without any global rank assignment
    ordered = (
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
        .localCheckpoint(eager=True)  # feeds prefixes AND both verify sides
    )
    # prefix length: n - ceil(t*n) + 1, integral arithmetic
    plen = (
        F.col("n")
        - F.expr(f"(n * {threshold_ppm} + {PPM - 1}) div {PPM}")
        + F.lit(1)
    )
    prefixes = ordered.select(
        "k", "n", F.explode(F.slice("ts", 1, plen)).alias("pt")
    )
    a, b = prefixes.alias("a"), prefixes.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.pt") == F.col("b.pt"))
            & (F.col("a.k") < F.col("b.k"))
            # length filter: t·|a| ≤ |b| (symmetric side implied by
            # a < b ordering only when sizes are equal, so keep both)
            & (F.col("b.n") * threshold_ppm <= F.col("a.n") * PPM)
            & (F.col("a.n") * threshold_ppm <= F.col("b.n") * PPM),
        )
        .select(F.col("a.k").alias("ka"), F.col("b.k").alias("kb"))
        .distinct()
    )
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
