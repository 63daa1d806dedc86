"""Deterministic synthetic graph generation (R-MAT).

Benchmarking an engine at 100 TB needs graphs you can conjure at any
scale without storing them: R-MAT (Chakrabarti et al. 2004) recursively
drops each edge into one of four adjacency-matrix quadrants with
probabilities (a, b, c, d), producing the power-law degree structure of
real web/social graphs.

This implementation replaces the usual RNG with a content hash: edge
``i``'s quadrant choice at recursion level ``l`` is decided by
``md5(seed, i, l)`` mapped to [0, 1). Fully deterministic — the same
(scale, n_edges, seed) yields the same graph on any cluster, any
partitioning, any engine (the SQL oracle regenerates it bit-for-bit) —
and embarrassingly parallel: ``spark.range(n_edges)`` then a fixed
expression tree of ``2 * scale`` hash terms per row. Zero shuffles to
generate; the graph never needs to exist on disk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_graph_spark.functions.hashing import md5_hash60, md5_hash60_sql

_SPACE = float(1 << 60)


def rmat_edges(
    spark: SparkSession,
    scale: int = 8,
    n_edges: int = 4096,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: str = "rmat",
) -> DataFrame:
    """(src, dst) R-MAT edge list over 2**scale vertices.

    Quadrant probabilities are (a, b, c, 1-a-b-c); per level the src bit
    is 1 when the uniform draw falls past a+b, the dst bit is 1 when it
    falls in (a, a+b) or past a+b+c.
    """
    if not 1 <= scale <= 30:
        raise ValueError("scale must be in [1, 30]")
    d = 1.0 - a - b - c
    if min(a, b, c, d) < 0:
        raise ValueError("quadrant probabilities must be non-negative")
    base = spark.range(int(n_edges)).select(F.col("id").alias("i"))
    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    for level in range(scale):
        u = md5_hash60(
            F.concat_ws(",", F.lit(seed), F.col("i"), F.lit(level))
        ) / F.lit(_SPACE)
        src_bit = (u >= F.lit(a + b)).cast("long")
        dst_bit = (
            ((u >= F.lit(a)) & (u < F.lit(a + b)))
            | (u >= F.lit(a + b + c))
        ).cast("long")
        src = src + F.shiftleft(src_bit, level)
        dst = dst + F.shiftleft(dst_bit, level)
    return base.select(src.alias("src"), dst.alias("dst"))


def rmat_edges_sql(
    scale: int = 8,
    n_edges: int = 4096,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: str = "rmat",
) -> str:
    """DuckDB SQL regenerating the identical edge list."""
    src_terms = []
    dst_terms = []
    for level in range(scale):
        h = md5_hash60_sql(
            f"'{seed}' || ',' || CAST(ei AS VARCHAR) || ',' || '{level}'"
        )
        u = f"({h} / {_SPACE!r})"
        src_terms.append(
            f"(CAST({u} >= {a + b!r} AS BIGINT) << {level})"
        )
        dst_terms.append(
            f"(CAST((({u} >= {a!r} AND {u} < {a + b!r}) OR {u} >= {a + b + c!r}) AS BIGINT) << {level})"
        )
    return (
        f"SELECT ({' + '.join(src_terms)}) AS src, "
        f"({' + '.join(dst_terms)}) AS dst "
        f"FROM (SELECT unnest(range(0, {n_edges})) AS ei)"
    )
