"""applyInPandasWithState running-EMA operator: streaming/batch twin
equivalence, cross-trigger state carry, and timeout-based eviction."""

from __future__ import annotations

import math

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyspark_graph_spark.streaming import running_ema_batch, running_ema_stream


def _write_batch(path, rows):
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "value"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    df.to_parquet(path, index=False)


def _py_ema(values, alpha=0.1):
    ema = None
    for v in values:
        ema = v if ema is None else alpha * v + (1 - alpha) * ema
    return ema


EVENTS_SCHEMA = "event_id long, ts timestamp, user_id long, value double"


def test_batch_twin_matches_python_fold(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1, 10, 0), 1, 10.0),
        (2, dt.datetime(2024, 1, 1, 10, 1), 1, 20.0),
        (3, dt.datetime(2024, 1, 1, 10, 2), 1, 0.0),
        (4, dt.datetime(2024, 1, 1, 10, 0), 2, 5.0),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "value"])
    got = {r.user_id: (r.n_events, r.ema) for r in running_ema_batch(df).collect()}
    assert got[1][0] == 3
    assert math.isclose(got[1][1], _py_ema([10.0, 20.0, 0.0]), rel_tol=1e-12)
    assert got[2] == (1, 5.0)


def test_batch_twin_sorts_within_group(spark):
    # rows delivered in reverse event order must fold in event-time order
    rows = [
        (2, dt.datetime(2024, 1, 1, 11, 0), 1, 100.0),
        (1, dt.datetime(2024, 1, 1, 10, 0), 1, 0.0),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "value"])
    ema = running_ema_batch(df).collect()[0].ema
    assert math.isclose(ema, 0.1 * 100.0 + 0.9 * 0.0, rel_tol=1e-12)  # 0 first


def test_stream_carries_state_across_triggers(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_batch(
        src / "b1.parquet",
        [(1, pd.Timestamp("2024-01-01 10:00:00").to_datetime64(), 1, 10.0)],
    )

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        running_ema_stream(stream)
        .writeStream.format("memory")
        .queryName("ema_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write_batch(
            src / "b2.parquet",
            [(2, pd.Timestamp("2024-01-01 10:05:00").to_datetime64(), 1, 50.0)],
        )
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM ema_state ORDER BY n_events"
        ).collect()
    finally:
        q.stop()

    # trigger 1 emitted (1, 10.0); trigger 2 folded onto HELD state
    assert [(r.n_events, r.ema) for r in rows] == [
        (1, 10.0),
        (2, pytest.approx(0.1 * 50.0 + 0.9 * 10.0, rel=1e-12)),
    ]


def test_stream_equals_batch_twin_on_full_replay(spark, sf_dir, tmp_path):
    from pyspark_graph_spark.sources.tables import load_table
    from pyspark_graph_spark.streaming import read_events_stream

    # re-write through Spark: the streaming parquet source rejects the
    # TIMESTAMP(NANOS) type the pandas-generated testdata carries
    # single file -> single trigger: cross-trigger arrival order is not
    # event-time order, and the replay-equivalence claim is per-trigger
    events = load_table(spark, sf_dir, "events")
    events.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )

    q = (
        running_ema_stream(read_events_stream(spark, str(tmp_path)))
        .writeStream.format("memory")
        .queryName("ema_replay")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()

    # one trigger replays the whole table -> last update per user must
    # equal the batch twin exactly
    streamed = {
        r.user_id: (r.n_events, r.ema)
        for r in spark.sql("SELECT * FROM ema_replay").collect()
    }
    batch = {
        r.user_id: (r.n_events, r.ema)
        for r in running_ema_batch(load_table(spark, sf_dir, "events")).collect()
    }
    assert streamed == batch


def test_stream_event_time_timeout_evicts_idle_state(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_batch(
        src / "b1.parquet",
        [(1, pd.Timestamp("2024-01-01 10:00:00").to_datetime64(), 7, 4.0)],
    )

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    # user 7's eviction deadline: last-seen 10:00 + 5 min gap = 10:05
    # (event time); watermark = max_ts - 10 min
    q = (
        running_ema_stream(stream, idle_gap="5 minutes", watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("ema_timeout")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # unrelated user's events advance the watermark past 10:05 (event
        # at 10:30 -> watermark 10:20); timeouts fire on the batch AFTER
        # the watermark update, so drive two batches
        _write_batch(
            src / "b2.parquet",
            [(2, pd.Timestamp("2024-01-01 10:30:00").to_datetime64(), 8, 1.0)],
        )
        q.processAllAvailable()
        _write_batch(
            src / "b3.parquet",
            [(3, pd.Timestamp("2024-01-01 10:31:00").to_datetime64(), 8, 2.0)],
        )
        q.processAllAvailable()
        # user 7's state was evicted: a fresh event restarts from scratch
        _write_batch(
            src / "b4.parquet",
            [(4, pd.Timestamp("2024-01-01 10:32:00").to_datetime64(), 7, 90.0)],
        )
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM ema_timeout WHERE user_id = 7"
        ).collect()
    finally:
        q.stop()

    emas = sorted((r.n_events, r.ema) for r in rows)
    # first trigger emit, the timeout emit (same state), then a RESTARTED
    # fold — (1, 90.0) is only possible if user 7's state was evicted
    assert (1, 4.0) in emas
    assert (1, 90.0) in emas


# --------------------------------------------------------------------------
# CUSUM drift detector
# --------------------------------------------------------------------------


def test_cusum_batch_matches_python_fold(spark):
    from pyspark_graph_spark.streaming.stateful import running_cusum_batch

    rows = [
        (1, "2024-01-01 00:00:00", 7, 100.0),
        (2, "2024-01-01 00:01:00", 7, 100.0),
        (3, "2024-01-01 00:02:00", 7, 10.0),
        (4, "2024-01-01 00:00:00", 8, 5.0),
    ]
    from datetime import datetime

    df = spark.createDataFrame(
        [(a, datetime.fromisoformat(b), c, d) for a, b, c, d in rows],
        EVENTS_SCHEMA,
    )
    out = {r.user_id: r for r in running_cusum_batch(df).collect()}
    # user 7: s = max(0,0+40)=40 -> 80 -> max(0, 80-50)=30
    assert out[7].cusum == 30.0 and out[7].drift is False
    assert out[8].cusum == 0.0 and out[8].n_events == 1


def test_cusum_stream_equals_batch_twin(spark, sf_dir, tmp_path):
    from pyspark_graph_spark.sources.tables import load_table
    from pyspark_graph_spark.streaming import read_events_stream
    from pyspark_graph_spark.streaming.stateful import (
        running_cusum_batch,
        running_cusum_stream,
    )

    events = load_table(spark, sf_dir, "events")
    events.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    q = (
        running_cusum_stream(read_events_stream(spark, str(tmp_path)))
        .writeStream.format("memory")
        .queryName("cusum_replay")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    streamed = {
        r.user_id: (r.n_events, round(r.cusum, 9), r.drift)
        for r in spark.sql("SELECT * FROM cusum_replay").collect()
    }
    batch = {
        r.user_id: (r.n_events, round(r.cusum, 9), r.drift)
        for r in running_cusum_batch(events).collect()
    }
    assert streamed == batch
