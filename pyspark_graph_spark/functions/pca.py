"""Embedding PCA — distributed covariance + deterministic power iteration.

The standard embedding-pipeline diagnostic/whitening step: compute the
d×d covariance of an embedding corpus (d is small — 64/768/1536 — while n
is the corpus), then extract the top principal component by power
iteration.

Scale shape: the ONLY corpus-sized work is the (i, j, x_i·x_j) partial-sum
aggregate — map-side combined, shuffle volume O(partitions · d²), corpus
never shuffles.  Everything after runs on d²-row frames (4096 rows at
d=64): the power iterations are tiny joins the driver never touches.  At
100 TB you fuse the d² products into ``mapInPandas`` partial Gram matrices
per partition (one BLAS ``XᵀX`` each) and keep the identical d²-row
aggregate — the pipeline position and output contract stay exactly this.

Deterministic end-to-end (fixed v₀ = 1/√d, covariance is PSD so the
iteration cannot flip sign), which makes the whole trajectory replayable
by an external SQL oracle — same pattern as the eigenvector-centrality
gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def covariance_long(
    df: DataFrame,
    dim: int,
    vec_col: str = "embedding",
) -> DataFrame:
    """(i, j, c): centered covariance in long form, 1-based indices.

    Uses the computational formula C = E[xxᵀ] − μμᵀ: one n·d² explode
    feeding a map-side-combined sum, plus a d-row mean aggregate —
    no second pass over the corpus.
    """
    v = F.col(vec_col).cast("array<double>")
    # (vec_id-free) long form: one row per (corpus row, i) — n*d rows
    xi = df.select(F.posexplode(v).alias("pos", "x"), v.alias("__v"))
    prods = xi.select(
        (F.col("pos") + 1).alias("i"),
        F.posexplode("__v").alias("jpos", "y"),
        F.col("x"),
    ).select(
        "i",
        (F.col("jpos") + 1).alias("j"),
        (F.col("x") * F.col("y")).alias("p"),
    )
    sxx = prods.groupBy("i", "j").agg(
        F.sum("p").alias("s"), F.count(F.lit(1)).alias("n")
    )
    mu = (
        df.select(F.posexplode(v).alias("pos", "x"))
        .groupBy((F.col("pos") + 1).alias("i"))
        .agg(F.avg("x").alias("mu"))
    )
    ma = F.broadcast(mu.select(F.col("i"), F.col("mu").alias("__ma")))
    mb = F.broadcast(
        mu.select(F.col("i").alias("j"), F.col("mu").alias("__mb"))
    )
    return (
        sxx.join(ma, on="i")
        .join(mb, on="j")
        .select(
            "i",
            "j",
            (F.col("s") / F.col("n") - F.col("__ma") * F.col("__mb")).alias(
                "c"
            ),
        )
    )


def top_eigenvector(
    cov: DataFrame, dim: int, n_iter: int = 3
) -> DataFrame:
    """(i, loading, eigenvalue): top principal direction of the (i, j, c)
    covariance frame via ``n_iter`` power iterations from v₀ = 1/√d.
    ``eigenvalue`` is the final pre-normalization norm ‖Cv‖ — the Rayleigh
    estimate for a PSD matrix.  Values rounded to 6 only at the end."""
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    spark = cov.sparkSession
    # the covariance lineage contains the corpus-sized shuffle; each
    # iteration references it once — materialize so it runs once
    cov = cov.localCheckpoint()
    vcur = spark.range(1, dim + 1).select(
        F.col("id").alias("i"), F.lit(1.0 / dim**0.5).alias("x")
    )
    norm = None
    for _ in range(n_iter):
        w = (
            cov.join(
                F.broadcast(
                    vcur.select(F.col("i").alias("j"), F.col("x"))
                ),
                on="j",
            )
            .groupBy("i")
            .agg(F.sum(F.col("c") * F.col("x")).alias("w"))
        )
        norm = w.agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("__nm"))
        vcur = w.crossJoin(F.broadcast(norm)).select(
            "i", (F.col("w") / F.col("__nm")).alias("x")
        )
    return vcur.crossJoin(F.broadcast(norm)).select(
        "i",
        F.round("x", 6).alias("loading"),
        F.round("__nm", 6).alias("eigenvalue"),
    )


def embedding_pca(
    df: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    n_iter: int = 3,
) -> DataFrame:
    """Top principal component of an embedding corpus: (i, loading,
    eigenvalue) with 1-based component indices."""
    return top_eigenvector(
        covariance_long(df, dim=dim, vec_col=vec_col), dim=dim, n_iter=n_iter
    )
