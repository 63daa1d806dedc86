"""KMV (k-minimum-values) distinct-count sketch — deterministic, mergeable.

The cardinality sketch for corpus statistics at 100 TB ("distinct n-grams
per source", "vocabulary growth per crawl"): keep the k smallest 60-bit
hashes of the values; the k-th smallest estimates the cardinality as
(k-1) * SPACE / h_k (Bar-Yossef et al. 2002). Unlike HyperLogLog's
register randomness, KMV over a content hash is FULLY deterministic — the
same data yields the same sketch and the same estimate on any engine, so
the estimate itself is exactly oracle-checkable.

Mergeability (the scale property): the union sketch of two corpora is the
k smallest of the concatenated hash sets — an associative combine, so
sketches roll up over shards/days without touching raw data.

Plan: distinct (group, hash) pairs (one shuffle, map-side combined), then
a per-group top-k window — identical shape to any grouped top-k; k rows
of state per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyspark_graph_spark.functions.hashing import md5_hash60

_SPACE = float(1 << 60)


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """(group, n_exact_kept, kth_hash, estimate) per group.

    ``estimate`` is the KMV cardinality estimate from the k-th smallest
    distinct hash; groups with fewer than k distinct values report their
    exact count (the sketch is exact below its capacity, estimate = count).
    Rounded to 3 decimals for stable cross-engine comparison.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    hashed = df.select(
        F.col(group_col).alias("grp"),
        md5_hash60(F.col(value_col).cast("string")).alias("h"),
    ).distinct()
    win = Window.partitionBy("grp").orderBy("h")
    topk = (
        hashed.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= k)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.max("h").alias("kth_hash"),
        )
    )
    return topk.select(
        F.col("grp").alias(group_col),
        "n_kept",
        "kth_hash",
        F.round(
            F.when(
                F.col("n_kept") < k, F.col("n_kept").cast("double")
            ).otherwise(
                F.lit(k - 1) * F.lit(_SPACE) / F.col("kth_hash")
            ),
            3,
        ).alias("estimate"),
    )
