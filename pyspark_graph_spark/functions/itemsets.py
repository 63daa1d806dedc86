"""Frequent itemset mining (Apriori, pair/triple levels).

Market-basket analysis over (basket, item) rows: frequent pairs from the
basket self-join, then candidate triples generated ONLY from frequent
pairs (the Apriori downward-closure prune — all three sub-pairs must be
frequent) before a single support-count join verifies them. At corpus
scale the prune is the whole game: the triple candidate space collapses
from O(items³) to the join of the (small) frequent-pair relation with
itself, and every support count is a map-side-combinable aggregation
keyed on the basket.

The same ladder extends to k+1-itemsets by joining frequent k-sets
sharing a (k-1)-prefix; pairs and triples cover the standard
co-occurrence analyses (and the gate query exercises both levels).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_pairs(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int,
) -> DataFrame:
    """(i1, i2, support) with i1 < i2 and support >= min_support."""
    b = baskets.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
    ).distinct()
    x, y = b.alias("x"), b.alias("y")
    return (
        x.join(
            y,
            on=[
                F.col("x.__b") == F.col("y.__b"),
                F.col("x.__i") < F.col("y.__i"),
            ],
        )
        .groupBy(
            F.col("x.__i").alias("i1"), F.col("y.__i").alias("i2")
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )


def frequent_triples(
    baskets: DataFrame,
    pairs: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int,
) -> DataFrame:
    """(i1, i2, i3, support) Apriori triples: candidates require all three
    sub-pairs frequent, then one 3-way basket join counts true support."""
    p = pairs.select("i1", "i2")
    p1, p2, p3 = p.alias("p1"), p.alias("p2"), p.alias("p3")
    cand = (
        p1.join(
            p2,
            on=[
                F.col("p1.i1") == F.col("p2.i1"),
                F.col("p1.i2") < F.col("p2.i2"),
            ],
        )
        .join(
            p3,
            on=[
                F.col("p3.i1") == F.col("p1.i2"),
                F.col("p3.i2") == F.col("p2.i2"),
            ],
        )
        .select(
            F.col("p1.i1").alias("i1"),
            F.col("p1.i2").alias("i2"),
            F.col("p2.i2").alias("i3"),
        )
    )
    b = baskets.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
    ).distinct()
    x, y, z = b.alias("x"), b.alias("y"), b.alias("z")
    sup = (
        cand.join(x, on=F.col("x.__i") == F.col("i1"))
        .join(
            y,
            on=[
                F.col("y.__b") == F.col("x.__b"),
                F.col("y.__i") == F.col("i2"),
            ],
        )
        .join(
            z,
            on=[
                F.col("z.__b") == F.col("x.__b"),
                F.col("z.__i") == F.col("i3"),
            ],
        )
        .groupBy("i1", "i2", "i3")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )
    return sup
