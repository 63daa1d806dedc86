"""File sinks for the Structured Streaming operators.

Closes the memory/console-only sink gap: a production stream lands in
files (or a table), not a debug sink. ``stream_to_parquet`` wires any
streaming DataFrame to Spark's transactional file sink —

- **exactly-once**: the sink maintains a commit log under
  ``<out_dir>/_spark_metadata``; a batch's files become visible only
  when its manifest commits, and readers (Spark) list files THROUGH the
  manifest, so a crashed mid-write run leaves orphans that are never
  read, and a restart from the same ``checkpoint_dir`` replays only
  uncommitted source offsets — no duplicates, no losses.
- **partitioned layout**: ``partition_by`` writes hive-style
  ``col=value/`` directories so downstream batch readers get partition
  pruning on the landed data for free.
- **bounded catch-up**: ``available_now`` processes everything present
  then stops (the batch-parity mode the tests pin); leave it False for
  a continuously running query.

At 100 TB/day the knobs that matter are upstream of this sink: watermark
tightness (state size) and trigger interval x file size (small-files
pressure on the object store). The sink itself is already transactional
and append-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def stream_to_parquet(
    df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    partition_by: list[str] | None = None,
    available_now: bool = True,
    query_name: str = "stream_to_parquet",
) -> StreamingQuery:
    """Start (and return) a streaming write of ``df`` to a transactional
    parquet file sink. Caller awaits termination / manages lifecycle.

    The file sink requires append output mode, so aggregations must be
    watermarked with emission on window close (append-supported); the
    watermarked operators in ``structured.py`` qualify.
    """
    writer = (
        df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .queryName(query_name)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_to_csv(
    df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    query_name: str = "stream_to_csv",
) -> StreamingQuery:
    """CSV flavor of the transactional file sink (same commit-log
    semantics; header written per file)."""
    writer = (
        df.writeStream.format("csv")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .option("header", "true")
        .outputMode("append")
        .queryName(query_name)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
