"""Deterministic global shuffle and shard assignment for training data.

The last step of a training-data pipeline: lay the corpus out as N shard
files in a reproducible pseudo-random order, re-drawable per epoch. Like
functions/sampling.py, the permutation is content-keyed (60-bit md5 of
key + seed), NOT ``rand()``: Spark's ``rand`` is seeded per-partition, so
its order changes with partitioning, retries, and cluster size, while a
content hash is a pure function of the data — the same shard layout on
any cluster, any day, and an external engine can recompute it (the DuckDB
oracle does exactly that).

Scale (100 TB): shard assignment is a row-local expression (zero shuffle);
the within-shard position is ONE shuffle on the shard id + a per-shard
sort — Spark's sort-based shuffle machinery doing exactly what a
"global shuffle" needs, with parallelism = number of shards. Pick
``n_shards`` so a shard fits an executor's spill budget (e.g. 100 TB /
10k shards = 10 GB/shard); skew is impossible because the hash is uniform.
Writing with ``partitionBy(shard)`` + per-shard sort gives ready-to-stream
training files without any further pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pyspark_graph_spark.functions.hashing import md5_hash60

SHARD = "shard"
POS = "pos"


def shuffle_hash(key: Column, seed: str = "") -> Column:
    """Uniform 60-bit permutation hash of a key (+ epoch/seed salt)."""
    return md5_hash60(F.concat(key.cast("string"), F.lit("|"), F.lit(seed)))


def assign_shards(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    seed: str = "",
) -> DataFrame:
    """Add ``shard`` (uniform in [0, n_shards)) and ``pos`` (0-based
    deterministic pseudo-random position within the shard).

    Rows are totally ordered by (hash, key) inside each shard, so the
    layout is reproducible bit-for-bit; change ``seed`` to redraw the
    permutation for a new epoch.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    h = shuffle_hash(F.col(key_col), seed)
    win = Window.partitionBy(SHARD).orderBy("__h", key_col)
    return (
        df.withColumn("__h", h)
        .withColumn(SHARD, F.pmod(F.col("__h"), F.lit(n_shards)).cast("int"))
        .withColumn(POS, F.row_number().over(win) - 1)
        .drop("__h")
    )


def epoch_shuffles(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    epochs: int,
    seed_prefix: str = "epoch",
) -> dict[str, DataFrame]:
    """One independently-permuted shard layout per epoch (lazy plans)."""
    return {
        f"{seed_prefix}{e}": assign_shards(
            df, key_col, n_shards, seed=f"{seed_prefix}{e}"
        )
        for e in range(epochs)
    }


def write_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    seed: str = "",
) -> None:
    """Materialize the shuffled layout as ``path/shard=K/`` parquet,
    each shard internally sorted by position (streamable in order)."""
    out = assign_shards(df, key_col, n_shards, seed)
    (
        out.repartition(n_shards, F.col(SHARD))
        .sortWithinPartitions(SHARD, POS)
        .write.partitionBy(SHARD)
        .mode("overwrite")
        .parquet(path)
    )
