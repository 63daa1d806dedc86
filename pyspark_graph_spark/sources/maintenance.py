"""Dataset maintenance: small-file compaction and size-targeted writes.

At 100 TB the silent killer is not a slow operator but a dataset shredded
into millions of KB-sized files (streaming sinks, over-parallel writers,
per-trigger parquet dumps): every reader then pays file-open + footer
overhead per file and the driver pays listing time. These helpers are the
ops-side counterpart of the query engine:

- :func:`plan_file_counts` — cheap audit: files/bytes per partition dir.
- :func:`write_sized` — write with a file count derived from actual data
  size (bytes-per-file target), not from whatever parallelism the
  upstream plan happened to have.
- :func:`compact` — rewrite a (possibly partitioned) parquet dataset to
  target-sized files, per partition directory, preserving partition
  columns. Atomicity note: local/dev semantics write to a temp dir and
  swap; object-store deployments should compact into a NEW prefix and
  flip readers (manifest/symlink), since rename is not atomic on S3-like
  stores — documented here rather than hidden.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


def _dataset_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def plan_file_counts(path: str) -> dict[str, tuple[int, int]]:
    """{partition_dir: (n_files, n_bytes)} for a parquet dataset on a
    local-ish filesystem (audit/test helper; at scale this is your object
    store's inventory listing)."""
    out: dict[str, tuple[int, int]] = {}
    for root, _dirs, files in os.walk(path):
        data = [
            f for f in files if not f.startswith(("_", ".")) and
            f.endswith(".parquet")
        ]
        if data:
            rel = os.path.relpath(root, path)
            out[rel] = (
                len(data),
                sum(os.path.getsize(os.path.join(root, f)) for f in data),
            )
    return out


def write_sized(
    df: DataFrame,
    path: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Write parquet with file count sized from the DATA, not the plan.

    Estimates output size from the logical plan's stats when available
    (post-AQE sizeInBytes; inputs are usually a fine proxy for projected
    parquet bytes) and coalesces/repartitions to
    ``ceil(estimate / target)`` files. The repartition is a round-robin
    Exchange — the price of predictable file sizes; skip it by passing
    ``target_file_bytes=None``.
    """
    if target_file_bytes:
        try:
            est = int(
                df._jdf.queryExecution()
                .optimizedPlan()
                .stats()
                .sizeInBytes()
            )
        except Exception:
            # Spark Connect: no _jdf plan access. Documented degraded
            # mode — skip the size-targeted repartition and let the
            # plan's own partitioning decide file count (same result as
            # target_file_bytes=None); `compact` still reports actual
            # file sizes afterwards, so oversized outputs are visible.
            est = None
        if est is None:
            writer = df.write.mode(mode)
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(path)
            return
        n_files = max(1, -(-est // target_file_bytes))
        if partition_by:
            # hash on the partition columns so each writer task holds whole
            # hive partitions: one file per partition value, not
            # n_files × n_values (round-robin's failure mode). A single
            # over-target partition value stays one file — split it by
            # adding a salt column to partition_by upstream if that hurts.
            df = df.repartition(n_files, *partition_by)
        else:
            df = df.repartition(n_files)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> dict[str, int]:
    """Rewrite a parquet dataset into target-sized files (local swap
    semantics — see module docstring for object-store guidance).

    Partition-column values survive because the read re-derives them from
    directory names and the rewrite re-partitions by the same columns.
    Returns {'files_before': n, 'files_after': m}.
    """
    before = sum(n for n, _ in plan_file_counts(path).values())
    df = spark.read.parquet(path)
    # partition columns = dirs like key=value on the first level walk
    part_cols: list[str] = []
    probe = path
    while True:
        subdirs = [
            d for d in os.listdir(probe)
            if os.path.isdir(os.path.join(probe, d)) and "=" in d
        ]
        if not subdirs:
            break
        part_cols.append(subdirs[0].split("=", 1)[0])
        probe = os.path.join(probe, subdirs[0])

    tmp = tempfile.mkdtemp(prefix="compact-", dir=os.path.dirname(path))
    try:
        write_sized(
            df,
            tmp,
            target_file_bytes=target_file_bytes,
            partition_by=part_cols or None,
        )
        old = path + ".old"
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    after = sum(n for n, _ in plan_file_counts(path).values())
    return {"files_before": before, "files_after": after}
