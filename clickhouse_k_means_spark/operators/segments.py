"""Audience / segment set algebra (ClickHouse bitmap-function parity).

ClickHouse models "users who did A and B" with roaring bitmaps
(``groupBitmapState`` + ``bitmapAndCardinality``). The relational
re-expression is exact set intersection over the entity key — which
Spark executes as one distinct-pair shuffle plus a bounded self-join:

1. ``distinct (entity, category)`` — map-side combined, the shuffle
   carries one row per membership, not per raw event;
2. self-join on ``entity`` with ``cat_a <= cat_b`` — fan-out per
   entity is C² for that entity's C categories, bounded by the
   category domain (event types, cohorts), never by data volume;
3. count per pair.

At 100 TB this is the plan you want: both sides of the self-join are
the SAME deduplicated relation co-partitioned by entity (one exchange,
reused), and the result is |categories|² rows. The diagonal
(``cat_a = cat_b``) is each segment's own cardinality, so the output
doubles as the input to Jaccard / lift / overlap-coefficient scoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def audience_overlap(
    df: DataFrame, entity: str, category: str
) -> DataFrame:
    """Pairwise segment intersection cardinalities.

    Returns ``(cat_a, cat_b, entities_both)`` for every unordered
    category pair (``cat_a <= cat_b``) present in the data; the
    diagonal rows carry each segment's cardinality.
    """
    mem = df.select(
        F.col(entity).alias("__e"), F.col(category).alias("__c")
    ).distinct()
    a = mem.select("__e", F.col("__c").alias("cat_a"))
    b = mem.select("__e", F.col("__c").alias("cat_b"))
    return (
        a.join(b, "__e")
        .filter(F.col("cat_a") <= F.col("cat_b"))
        .groupBy("cat_a", "cat_b")
        .agg(F.count(F.lit(1)).alias("entities_both"))
    )
