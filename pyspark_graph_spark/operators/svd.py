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
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
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


def deflated_power_iteration_svd(
    interactions: DataFrame,
    row_col: str,
    col_col: str,
    val_col: str,
    k: int = 2,
    iterations: int = 3,
    rank_tolerance: float = 1e-9,
) -> tuple[DataFrame, DataFrame]:
    """Rank-k truncated SVD by power iteration with IMPLICIT deflation.

    Factor j is the dominant singular pair of the deflated operator

        A_j = A - sum_{p<j} sigma_p u_p v_p^T

    but A_j is NEVER materialized (it is dense — the whole point of the
    sparse COO representation would be lost). Instead every matvec
    applies the correction through the identity

        A_j x = A x - sum_{p<j} sigma_p (v_p . x) u_p

    i.e. one sparse matvec plus, per prior factor, one broadcast scalar
    inner product and one scaled copy of the stored factor vector folded
    into the same groupBy-sum — so the per-iteration physical shape stays
    exactly the rank-1 operator's (two vertex-keyed shuffles), with k-1
    extra singleton aggregates. The all-ones start and nonnegative input
    fix factor 0's sign; later factors inherit determinism from the
    deflation (no random init anywhere), which is what lets an external
    SQL oracle replay the whole unrolled algebra term by term.

    Returns ``(u, v)``:
    ``u = (row_col, factor, u)``, ``v = (col_col, factor, v, sigma)``
    with ``factor`` in 0..k-1 ordered by decreasing sigma.

    Raises ``ValueError`` when ``k`` exceeds the effective rank of the
    matrix (r10 ADVICE #2): once the deflated operator is ~zero the
    power iteration divides by a vanishing norm and would silently emit
    NaN factor vectors — instead the sigma estimate of each factor is
    probed (a 1-row driver action per factor, same bounded-probe class
    as the CC truncation guard) and the run fails LOUDLY when
    ``sigma_j < rank_tolerance * sigma_0`` or sigma_j is not finite.
    """
    import math

    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if k < 1:
        raise ValueError("k must be >= 1")
    a = interactions.select(
        F.col(row_col).alias("__r"),
        F.col(col_col).alias("__c"),
        F.col(val_col).cast("double").alias("__a"),
    ).localCheckpoint()
    all_cols = a.select("__c").distinct().localCheckpoint()
    # (u_df(__r,__x), v_df(__c,__x), sigma_scalar_df(__s)) per factor
    factors: list[tuple[DataFrame, DataFrame, DataFrame, float]] = []
    for _ in range(k):
        v = all_cols.withColumn("__x", F.lit(1.0))
        u = None
        v_full = None
        for _i in range(iterations):
            # y = A v - sum_p sigma_p (v_p . v) u_p
            terms = (
                a.join(v, on="__c")
                .groupBy("__r")
                .agg(F.sum(F.col("__a") * F.col("__x")).alias("__y"))
            )
            for (u_p, v_p, s_p, _sv) in factors:
                dot = (
                    v_p.withColumnRenamed("__x", "__xp")
                    .join(v, on="__c")
                    .agg(F.sum(F.col("__xp") * F.col("__x")).alias("__d"))
                )
                corr = (
                    u_p.crossJoin(F.broadcast(dot))
                    .crossJoin(F.broadcast(s_p))
                    .select(
                        "__r",
                        (-F.col("__s") * F.col("__d") * F.col("__x")).alias(
                            "__y"
                        ),
                    )
                )
                terms = terms.unionByName(corr)
            u_raw = terms.groupBy("__r").agg(F.sum("__y").alias("__y"))
            u_norm = u_raw.agg(
                F.sqrt(F.sum(F.col("__y") * F.col("__y"))).alias("__n")
            )
            # null (not divide-by-zero) on an exactly-exhausted operator:
            # the per-factor sigma probe below turns it into a loud
            # ValueError; under ANSI the bare division would abort here
            # with an uninformative DIVIDE_BY_ZERO instead
            u = (
                u_raw.crossJoin(F.broadcast(u_norm))
                .select(
                    "__r",
                    F.when(
                        F.col("__n") != 0, F.col("__y") / F.col("__n")
                    ).alias("__x"),
                )
                .localCheckpoint()
            )
            # z = A^T u - sum_p sigma_p (u_p . u) v_p
            terms_t = (
                a.join(u, on="__r")
                .groupBy("__c")
                .agg(F.sum(F.col("__a") * F.col("__x")).alias("__y"))
            )
            for (u_p, v_p, s_p, _sv) in factors:
                dot = (
                    u_p.withColumnRenamed("__x", "__xp")
                    .join(u, on="__r")
                    .agg(F.sum(F.col("__xp") * F.col("__x")).alias("__d"))
                )
                corr = (
                    v_p.crossJoin(F.broadcast(dot))
                    .crossJoin(F.broadcast(s_p))
                    .select(
                        "__c",
                        (-F.col("__s") * F.col("__d") * F.col("__x")).alias(
                            "__y"
                        ),
                    )
                )
                terms_t = terms_t.unionByName(corr)
            v_raw = terms_t.groupBy("__c").agg(F.sum("__y").alias("__y"))
            v_norm = v_raw.agg(
                F.sqrt(F.sum(F.col("__y") * F.col("__y"))).alias("__n")
            )
            # one checkpoint carries both the normalized vector and the
            # norm (the sigma estimate) — same shape as the rank-1
            # operator's v_full; a separate singleton checkpoint per
            # half-iteration measured ~30% of the whole query's wall
            v_full = (
                v_raw.crossJoin(F.broadcast(v_norm))
                .select(
                    "__c",
                    F.when(
                        F.col("__n") != 0, F.col("__y") / F.col("__n")
                    ).alias("__x"),
                    F.col("__n").alias("__sigma"),
                )
                .localCheckpoint()
            )
            v = v_full.select("__c", "__x")
        sigma = (
            v_full.select(F.col("__sigma").alias("__s")).limit(1)
        )
        # rank-exhaustion guard (r10 ADVICE #2): v_full is already
        # checkpointed, so this 1-row probe re-executes nothing
        probe = sigma.collect()
        s_val = probe[0]["__s"] if probe else None
        j = len(factors)
        if s_val is None or not math.isfinite(s_val):
            raise ValueError(
                f"rank-{k} SVD failed at factor {j}: sigma is "
                f"{s_val!r} — the deflated operator is numerically "
                "zero, so k exceeds the effective rank of the matrix"
            )
        if factors and s_val < rank_tolerance * factors[0][3]:
            raise ValueError(
                f"rank-{k} SVD failed at factor {j}: sigma_{j} = "
                f"{s_val:.3e} < rank_tolerance * sigma_0 = "
                f"{rank_tolerance * factors[0][3]:.3e} — k exceeds the "
                "effective rank of the matrix"
            )
        factors.append((u, v, sigma, s_val))
    u_parts = [
        u_p.crossJoin(F.broadcast(s_p)).select(
            F.col("__r").alias(row_col),
            F.lit(j).alias("factor"),
            F.col("__x").alias("u"),
            F.col("__s").alias("__sigma"),
        )
        for j, (u_p, v_p, s_p, _sv) in enumerate(factors)
    ]
    v_parts = [
        v_p.crossJoin(F.broadcast(s_p)).select(
            F.col("__c").alias(col_col),
            F.lit(j).alias("factor"),
            F.col("__x").alias("v"),
            F.col("__s").alias("sigma"),
        )
        for j, (u_p, v_p, s_p, _sv) in enumerate(factors)
    ]
    u_out = u_parts[0]
    for p in u_parts[1:]:
        u_out = u_out.unionByName(p)
    v_out = v_parts[0]
    for p in v_parts[1:]:
        v_out = v_out.unionByName(p)
    return u_out.drop("__sigma"), v_out
