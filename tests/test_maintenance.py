"""Small-file compaction and size-targeted writes."""

import os

from pyspark.sql import functions as F

from pyspark_graph_spark.sources.maintenance import (
    compact,
    plan_file_counts,
    write_sized,
)


def _shredded(spark, path, n_rows=5000, n_files=40):
    (
        spark.range(n_rows)
        .withColumn("k", F.pmod("id", F.lit(4)))
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(path)
    )


def test_plan_file_counts_sees_shredding(spark, tmp_path):
    p = str(tmp_path / "ds")
    _shredded(spark, p)
    counts = plan_file_counts(p)
    assert sum(n for n, _ in counts.values()) == 40


def test_compact_reduces_files_and_preserves_data(spark, tmp_path):
    p = str(tmp_path / "ds")
    _shredded(spark, p)
    before = spark.read.parquet(p)
    sum_before = before.agg(F.sum("id")).first()[0]
    stats = compact(spark, p, target_file_bytes=64 * 1024 * 1024)
    assert stats["files_before"] == 40
    assert stats["files_after"] < 40
    after = spark.read.parquet(p)
    assert after.count() == 5000
    assert after.agg(F.sum("id")).first()[0] == sum_before


def test_compact_partitioned_dataset(spark, tmp_path):
    p = str(tmp_path / "part_ds")
    (
        spark.range(2000)
        .withColumn("k", F.pmod("id", F.lit(3)))
        .repartition(20)
        .write.mode("overwrite")
        .partitionBy("k")
        .parquet(p)
    )
    n_before = sum(n for n, _ in plan_file_counts(p).values())
    assert n_before > 10
    stats = compact(spark, p)
    after = spark.read.parquet(p)
    # data intact, partition column re-derived, exactly one file per value
    assert after.count() == 2000
    assert {r.k for r in after.select("k").distinct().collect()} == {0, 1, 2}
    counts = plan_file_counts(p)
    assert set(d.split("=")[0] for d in counts) == {"k"}
    assert all(n == 1 for n, _ in counts.values())
    assert stats["files_after"] == 3


def test_write_sized_single_file_for_small_data(spark, tmp_path):
    p = str(tmp_path / "sized")
    write_sized(spark.range(100), p)
    files = [f for f in os.listdir(p) if f.endswith(".parquet")]
    assert len(files) == 1  # tiny data -> one target-sized file
