"""Transactional file sinks (streaming/sinks.py): batch parity,
exactly-once restart from the checkpoint, partitioned layout, CSV."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark_graph_spark.streaming.sinks import stream_to_csv, stream_to_parquet
from pyspark_graph_spark.streaming.structured import read_events_stream

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _staged_source(spark, tmp_path):
    """The streaming file source needs a DIRECTORY: restage the single-file
    events parquet into tmp (same pattern as test_streaming_semantics)."""
    spark.read.parquet(f"{SF_DIR}/events.parquet").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _events_projection(stream):
    return stream.select(
        "event_id",
        "user_id",
        "event_type",
        F.round(F.col("value"), 6).alias("value"),
    )


def test_parquet_sink_matches_batch(spark, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src_dir = _staged_source(spark, tmp_path)
    q = stream_to_parquet(
        _events_projection(read_events_stream(spark, src_dir)), out, ckpt
    )
    q.awaitTermination(120)
    landed = spark.read.parquet(out)
    batch = _events_projection(
        spark.read.parquet(f"{SF_DIR}/events.parquet")
    )
    assert landed.count() == batch.count()
    assert (
        landed.select(F.sum(F.hash("event_id", "user_id", "event_type")))
        .first()[0]
        == batch.select(
            F.sum(F.hash("event_id", "user_id", "event_type"))
        ).first()[0]
    )
    # the transactional commit log exists
    assert os.path.isdir(os.path.join(out, "_spark_metadata"))


def test_parquet_sink_restart_is_exactly_once(spark, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src_dir = _staged_source(spark, tmp_path)
    q = stream_to_parquet(
        _events_projection(read_events_stream(spark, src_dir)), out, ckpt
    )
    q.awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    # restart from the same checkpoint: every source offset is already
    # committed, so the second run must land ZERO additional rows
    q2 = stream_to_parquet(
        _events_projection(read_events_stream(spark, src_dir)), out, ckpt
    )
    q2.awaitTermination(120)
    n2 = spark.read.parquet(out).count()
    assert n1 == n2 > 0


def test_parquet_sink_partitioned_layout(spark, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src_dir = _staged_source(spark, tmp_path)
    q = stream_to_parquet(
        _events_projection(read_events_stream(spark, src_dir)),
        out,
        ckpt,
        partition_by=["event_type"],
    )
    q.awaitTermination(120)
    # hive-style partition dirs downstream readers can prune on
    parts = [p for p in os.listdir(out) if p.startswith("event_type=")]
    assert len(parts) >= 2
    landed = spark.read.parquet(out)
    batch = spark.read.parquet(f"{SF_DIR}/events.parquet")
    got = {
        (r.event_type, r.n)
        for r in landed.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    want = {
        (r.event_type, r.n)
        for r in batch.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_csv_sink_matches_batch(spark, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src_dir = _staged_source(spark, tmp_path)
    q = stream_to_csv(
        read_events_stream(spark, src_dir).select(
            "event_id", "user_id", "event_type"
        ),
        out,
        ckpt,
    )
    q.awaitTermination(120)
    landed = spark.read.option("header", "true").csv(out)
    batch = spark.read.parquet(f"{SF_DIR}/events.parquet")
    assert landed.count() == batch.count()
