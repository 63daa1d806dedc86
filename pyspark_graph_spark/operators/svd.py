"""Rank-1 truncated SVD of a sparse interaction matrix by alternating
power iteration — the factorization core of SVD++-class recommenders.

The reference's README comparison matrix lists SVDPlusPlus as unsupported
everywhere (reference README.md:32 — ❌ for GraphX, GraphFrames, and the
reference itself); this operator supplies the DataFrame-API factorization
primitive that family is built on. Full SVD++ (Koren 2008) adds user/item
biases and an implicit-feedback term trained by SGD — sequential by
construction and not exactly replayable by an external oracle; the
dominant singular triple below IS exactly replayable (katz-style unrolled
linear algebra), which is what makes it gate-able cross-engine.

Algorithm: classic alternating power iteration on A (rows x cols, sparse
COO DataFrame). Starting from v_0 = 1:

    u_k = A v_{k-1} / ||A v_{k-1}||
    v_k = A^T u_k  / ||A^T u_k||

converges to the dominant left/right singular vectors (u_1, v_1) at rate
(sigma_2/sigma_1)^k, and sigma_1 = ||A^T u_k|| at the fixpoint.

Physical shape per half-iteration: one hash join of the COO table with
the current vector keyed on the shared dimension, one groupBy-sum on the
other dimension, and one singleton L2-norm aggregate joined back as a
broadcast — two vertex-keyed shuffles, no densification, no driver-side
vectors. The COO side is pre-partitioned once and checkpointed; at 100 TB
the vector frames are |rows| / |cols| keyed tables and every join keeps
the matrix sharded. Same budget class as one PageRank iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def power_iteration_svd(
    interactions: DataFrame,
    row_col: str,
    col_col: str,
    val_col: str,
    iterations: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Dominant singular pair of the sparse matrix given as COO rows.

    Returns ``(u, v)``: ``u = (row_col, u)`` the left singular vector and
    ``v = (col_col, v, sigma)`` the right singular vector with the
    singular-value estimate ``sigma = ||A^T u||`` replicated per row.
    Entries absent from the COO table get no vector row (they are exact
    zeros). Signs follow the all-ones start vector (v_0 = 1), so the
    output is deterministic — no random init to pin down.
    """
    a = interactions.select(
        F.col(row_col).alias("__r"),
        F.col(col_col).alias("__c"),
        F.col(val_col).cast("double").alias("__a"),
    ).localCheckpoint()
    v = a.select("__c").distinct().withColumn("__x", F.lit(1.0))
    u = None
    v_full = None
    for _ in range(iterations):
        # u = A v, normalized
        u_raw = (
            a.join(v, on="__c")
            .groupBy("__r")
            .agg(F.sum(F.col("__a") * F.col("__x")).alias("__y"))
        )
        u_norm = u_raw.agg(
            F.sqrt(F.sum(F.col("__y") * F.col("__y"))).alias("__n")
        )
        u = (
            u_raw.crossJoin(F.broadcast(u_norm))
            .select("__r", (F.col("__y") / F.col("__n")).alias("__x"))
            .localCheckpoint()
        )
        # v = A^T u, normalized; ||A^T u|| estimates sigma_1
        v_raw = (
            a.join(u, on="__r")
            .groupBy("__c")
            .agg(F.sum(F.col("__a") * F.col("__x")).alias("__y"))
        )
        v_norm = v_raw.agg(
            F.sqrt(F.sum(F.col("__y") * F.col("__y"))).alias("__n")
        )
        v_full = (
            v_raw.crossJoin(F.broadcast(v_norm))
            .select(
                "__c",
                (F.col("__y") / F.col("__n")).alias("__x"),
                F.col("__n").alias("__sigma"),
            )
            .localCheckpoint()
        )
        v = v_full.select("__c", "__x")
    u_out = u.select(F.col("__r").alias(row_col), F.col("__x").alias("u"))
    v_out = v_full.select(
        F.col("__c").alias(col_col),
        F.col("__x").alias("v"),
        F.col("__sigma").alias("sigma"),
    )
    return u_out, v_out
