"""Deterministic training shuffle / shard assignment (functions/shuffle.py)."""

import pytest
from pyspark.sql import functions as F

from pyspark_graph_spark.functions.shuffle import (
    assign_shards,
    epoch_shuffles,
    write_shards,
)


def docs(spark, n=200):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_partition_is_total_and_positions_dense(spark):
    out = assign_shards(docs(spark), "doc_id", 4).collect()
    assert len(out) == 200
    by_shard = {}
    for r in out:
        assert 0 <= r.shard < 4
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, poses in by_shard.items():
        assert sorted(poses) == list(range(len(poses)))


def test_deterministic_across_partitionings(spark):
    d = docs(spark)
    a = sorted(tuple(r) for r in assign_shards(d, "doc_id", 4).collect())
    b = sorted(
        tuple(r)
        for r in assign_shards(d.repartition(13), "doc_id", 4).collect()
    )
    assert a == b


def test_epochs_draw_different_permutations(spark):
    d = docs(spark)
    layouts = epoch_shuffles(d, "doc_id", 4, epochs=3)
    assert set(layouts) == {"epoch0", "epoch1", "epoch2"}
    orders = []
    for name, df in sorted(layouts.items()):
        orders.append(tuple(
            (r.shard, r.pos) for r in df.orderBy("doc_id").collect()
        ))
    assert orders[0] != orders[1] and orders[1] != orders[2]


def test_shards_roughly_balanced(spark):
    out = assign_shards(docs(spark, 1000), "doc_id", 4).groupBy("shard").count()
    counts = [r["count"] for r in out.collect()]
    assert len(counts) == 4
    assert min(counts) > 150  # uniform-hash balance, wide tolerance


def test_invalid_shards_raise(spark):
    with pytest.raises(ValueError):
        assign_shards(docs(spark), "doc_id", 0)


def test_write_shards_layout_streamable(spark, tmp_path):
    path = str(tmp_path / "shards")
    write_shards(docs(spark, 100), path, "doc_id", 4, seed="e0")
    back = spark.read.parquet(path)
    assert back.count() == 100
    assert {r.shard for r in back.select("shard").distinct().collect()} == {0, 1, 2, 3}
    # matches the lazy assignment exactly
    expect = {
        (r.doc_id, r.shard, r.pos)
        for r in assign_shards(docs(spark, 100), "doc_id", 4, seed="e0").collect()
    }
    got = {(r.doc_id, r.shard, r.pos) for r in back.collect()}
    assert got == expect
