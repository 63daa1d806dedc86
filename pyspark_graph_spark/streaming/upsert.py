"""Streaming keyed upsert into partitioned parquet via ``foreachBatch``.

Plain parquet has no MERGE; the standard pattern for "stream of updates →
queryable warehouse table" without a table format is merge-by-rewrite of
AFFECTED PARTITIONS ONLY:

  1. restrict the micro-batch to its distinct partition values,
  2. read just those partitions of the existing dataset (partition
     pruning makes this cheap),
  3. anti-join old rows whose key reappears in the batch, union the new
     rows, dedup the batch on the key (last-writer-wins within a batch),
  4. write back with dynamic partition overwrite — untouched partitions
     are never rewritten.

At 100 TB the partition column choice IS the performance contract: a
batch touching k date-partitions rewrites k partitions, never the table.
Exactly-once caveat documented: dynamic overwrite of a partition is
atomic per partition on HDFS-like stores, but a retryed batch re-runs
the rewrite — the merge is idempotent (same inputs → same output), which
is what foreachBatch requires of its body.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert_batch(
    batch: DataFrame,
    path: str,
    key_cols: list[str],
    partition_col: str,
    order_col: str | None = None,
) -> None:
    """Merge one (micro-)batch into the parquet dataset at ``path``.

    ``order_col``: within-batch tiebreak — the row with the max value per
    key wins (e.g. an event timestamp). Without it, an arbitrary-but-
    deterministic max over the remaining columns is used.
    """
    spark = batch.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    # last-writer-wins within the batch, deterministically
    order = F.col(order_col) if order_col else F.lit(1)
    w_cols = [F.col(c) for c in key_cols]
    dedup = (
        batch.withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy(*w_cols).orderBy(
                    order.desc(), *[F.col(c) for c in batch.columns]
                )
            ),
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    if os.path.exists(path):
        parts = [r[0] for r in dedup.select(partition_col).distinct().collect()]
        existing = spark.read.parquet(path).filter(
            F.col(partition_col).isin(parts)  # partition-pruned scan
        )
        survivors = existing.join(
            dedup.select(*key_cols).distinct(), on=key_cols, how="left_anti"
        )
        out = survivors.unionByName(dedup)
    else:
        out = dedup

    (
        out.write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(path)
    )


def streaming_upsert(
    stream: DataFrame,
    path: str,
    key_cols: list[str],
    partition_col: str,
    checkpoint: str,
    order_col: str | None = None,
):
    """Attach the merge as a ``foreachBatch`` sink; returns the started
    query. The merge body is idempotent, satisfying foreachBatch's
    retry contract."""

    def _sink(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        merge_upsert_batch(batch, path, key_cols, partition_col, order_col)

    return (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .start()
    )
