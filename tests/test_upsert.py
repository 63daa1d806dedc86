"""foreachBatch keyed-upsert sink: merge semantics, partition preservation,
last-writer-wins, idempotent retries, and a real streaming run."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyspark_graph_spark.streaming import merge_upsert_batch, streaming_upsert


def _df(spark, rows):
    return spark.createDataFrame(rows, ["k", "part", "v", "seq"])


def _read(spark, path):
    return {
        (r.k, r.part): (r.v, r.seq)
        for r in spark.read.parquet(path).collect()
    }


def test_merge_inserts_then_updates(spark, tmp_path):
    p = str(tmp_path / "tbl")
    merge_upsert_batch(
        _df(spark, [(1, "a", "x", 1), (2, "a", "y", 1), (3, "b", "z", 1)]),
        p, ["k"], "part", "seq",
    )
    assert _read(spark, p) == {
        (1, "a"): ("x", 1), (2, "a"): ("y", 1), (3, "b"): ("z", 1)
    }
    # update key 1, insert key 4; key 2 (same partition) must survive,
    # partition b must be untouched
    merge_upsert_batch(
        _df(spark, [(1, "a", "x2", 2), (4, "a", "w", 2)]),
        p, ["k"], "part", "seq",
    )
    assert _read(spark, p) == {
        (1, "a"): ("x2", 2), (2, "a"): ("y", 1),
        (3, "b"): ("z", 1), (4, "a"): ("w", 2),
    }


def test_merge_last_writer_wins_within_batch(spark, tmp_path):
    p = str(tmp_path / "tbl")
    merge_upsert_batch(
        _df(spark, [(1, "a", "old", 1), (1, "a", "new", 2)]),
        p, ["k"], "part", "seq",
    )
    assert _read(spark, p) == {(1, "a"): ("new", 2)}


def test_merge_is_idempotent_on_retry(spark, tmp_path):
    p = str(tmp_path / "tbl")
    merge_upsert_batch(_df(spark, [(1, "a", "x", 1)]), p, ["k"], "part", "seq")
    batch = _df(spark, [(1, "a", "x2", 2), (2, "b", "y", 2)])
    merge_upsert_batch(batch, p, ["k"], "part", "seq")
    once = _read(spark, p)
    merge_upsert_batch(batch, p, ["k"], "part", "seq")  # simulated retry
    assert _read(spark, p) == once


def test_untouched_partition_files_not_rewritten(spark, tmp_path):
    p = str(tmp_path / "tbl")
    merge_upsert_batch(
        _df(spark, [(1, "a", "x", 1), (3, "b", "z", 1)]),
        p, ["k"], "part", "seq",
    )
    b_dir = os.path.join(p, "part=b")
    mtimes = {
        f: os.path.getmtime(os.path.join(b_dir, f))
        for f in os.listdir(b_dir) if f.endswith(".parquet")
    }
    merge_upsert_batch(  # touches only partition a
        _df(spark, [(1, "a", "x2", 2)]), p, ["k"], "part", "seq"
    )
    after = {
        f: os.path.getmtime(os.path.join(b_dir, f))
        for f in os.listdir(b_dir) if f.endswith(".parquet")
    }
    assert after == mtimes  # dynamic overwrite left partition b alone


def test_streaming_upsert_end_to_end(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    tbl = str(tmp_path / "tbl")

    def wb(name, rows):
        df = pd.DataFrame(rows, columns=["k", "part", "v", "seq"])
        df.to_parquet(src / name, index=False)

    wb("b1.parquet", [(1, "a", "x", 1), (2, "b", "y", 1)])
    stream = (
        spark.readStream.schema("k long, part string, v string, seq long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = streaming_upsert(
        stream, tbl, ["k"], "part",
        checkpoint=str(tmp_path / "ckpt"), order_col="seq",
    )
    try:
        q.processAllAvailable()
        wb("b2.parquet", [(1, "a", "x2", 2)])  # update across triggers
        q.processAllAvailable()
    finally:
        q.stop()
    assert _read(spark, tbl) == {(1, "a"): ("x2", 2), (2, "b"): ("y", 1)}
