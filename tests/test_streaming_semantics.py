"""Watermark SEMANTICS tests — not just batch/stream equivalence.

These drive real micro-batch boundaries (one parquet file per batch,
``processAllAvailable`` between drops) and assert the two behaviors that
make streaming state bounded on an unbounded stream:

1. ``dropDuplicatesWithinWatermark`` evicts a key once the watermark
   passes last-seen + delay — a duplicate arriving after eviction is
   re-emitted (bounded state), while one inside the horizon is dropped.
2. Watermarked windowed aggregation drops events older than the
   watermark and finalizes (append-emits) only closed windows.
"""

from __future__ import annotations

import pandas as pd
import pytest


def _write_batch(path, rows, columns):
    df = pd.DataFrame(rows, columns=columns)
    # microsecond precision: Spark's vectorized reader rejects the
    # TIMESTAMP(NANOS) parquet type pandas writes by default
    df["ts"] = df["ts"].astype("datetime64[us]")
    df.to_parquet(path, index=False)


def _ts(s: str):
    return pd.Timestamp(s).to_datetime64()


def test_streaming_dedup_watermark_evicts_state(spark, tmp_path):
    from pyspark_graph_spark.streaming import streaming_exact_dedup

    src = tmp_path / "src"
    src.mkdir()
    cols = ["ts", "text"]

    schema = "ts timestamp, text string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        streaming_exact_dedup(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_wm")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        # batch 1: original + in-horizon duplicate -> duplicate dropped
        _write_batch(
            src / "b1.parquet",
            [(_ts("2024-01-01 10:00:00"), "same doc"),
             (_ts("2024-01-01 10:05:00"), "same doc")],
            cols,
        )
        q.processAllAvailable()
        # batch 2: unrelated doc far in the future -> advances the
        # watermark to 12:00, past the key's 11:05 expiry -> state evicted
        _write_batch(
            src / "b2.parquet",
            [(_ts("2024-01-01 13:00:00"), "other doc")],
            cols,
        )
        q.processAllAvailable()
        # batch 3: the same text again, AFTER eviction -> re-emitted
        _write_batch(
            src / "b3.parquet",
            [(_ts("2024-01-01 13:30:00"), "same doc")],
            cols,
        )
        q.processAllAvailable()
    finally:
        q.stop()

    out = spark.sql("SELECT text FROM dedup_wm").collect()
    texts = sorted(r["text"] for r in out)
    # "same doc" appears TWICE: batch-1 original plus the post-eviction
    # re-emit; the in-horizon duplicate was dropped
    assert texts == ["other doc", "same doc", "same doc"]


def test_streaming_tumbling_drops_late_events(spark, tmp_path):
    from pyspark_graph_spark.streaming.structured import (
        streaming_tumbling_counts,
    )

    src = tmp_path / "src"
    src.mkdir()
    cols = ["ts", "event_type", "value"]

    schema = "ts timestamp, event_type string, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        streaming_tumbling_counts(stream, 300, watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("tumbling_wm")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        # batch 1: one event in [10:00,10:05), one at 10:20
        # -> watermark after the batch: 10:10
        _write_batch(
            src / "b1.parquet",
            [(_ts("2024-01-01 10:00:30"), "click", 1.0),
             (_ts("2024-01-01 10:20:00"), "click", 1.0)],
            cols,
        )
        q.processAllAvailable()
        # batch 2: a LATE event for the closed [10:00,10:05) window
        # (event time < watermark) must be dropped, and 10:40 advances
        # the watermark to 10:30, closing [10:20,10:25)
        _write_batch(
            src / "b2.parquet",
            [(_ts("2024-01-01 10:01:00"), "click", 1.0),
             (_ts("2024-01-01 10:40:00"), "click", 1.0)],
            cols,
        )
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql(
        "SELECT start_us, n_events FROM tumbling_wm ORDER BY start_us"
    ).collect()
    emitted = {r["start_us"]: r["n_events"] for r in rows}
    base = int(pd.Timestamp("2024-01-01 10:00:00").value // 1000)
    # [10:00,10:05): exactly 1 event — the late arrival did NOT count;
    # emitted exactly once (no duplicate finalization)
    assert emitted[base] == 1
    assert len(rows) == len(emitted)
    # [10:20,10:25) closed by the batch-2 watermark advance
    assert emitted[base + 20 * 60 * 1_000_000] == 1
    # [10:40,...) never closed -> not emitted in append mode
    assert base + 40 * 60 * 1_000_000 not in emitted


def test_stream_stream_join_equals_batch(spark, sf_dir, tmp_path):
    """availableNow stream-stream interval join == the batch twin."""
    from pyspark_graph_spark.sources.tables import load_table
    from pyspark_graph_spark.streaming import (
        read_events_stream,
        streaming_click_purchase_join,
    )

    ev = load_table(spark, sf_dir, "events")
    batch = {
        tuple(r)
        for r in streaming_click_purchase_join(ev).collect()
    }

    # the streaming parquet source needs a directory; stage one
    ev.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    stream = read_events_stream(spark, str(tmp_path))
    q = (
        streaming_click_purchase_join(stream)
        .writeStream.format("memory")
        .queryName("t_ssj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {tuple(r) for r in spark.sql("SELECT * FROM t_ssj").collect()}
    assert got == batch
    assert len(got) > 0


def test_stream_stream_join_state_is_bounded(spark, tmp_path):
    """A click older than watermark + tolerance is evicted: a purchase
    arriving in a later micro-batch no longer joins it, even though the
    batch twin would."""
    from pyspark_graph_spark.streaming import streaming_click_purchase_join

    src = tmp_path / "src"
    src.mkdir()
    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = (
        streaming_click_purchase_join(
            stream, tolerance_minutes=60, watermark="10 minutes"
        )
        .writeStream.format("memory")
        .queryName("t_ssj_bound")
        .outputMode("append")
        .start()
    )
    try:
        # batch 1: the click that will be evicted
        _write_batch(
            src / "b1.parquet",
            [(1, _ts("2024-01-01 00:00:00"), 7, "click", 1.0)],
            cols,
        )
        out.processAllAvailable()
        # batch 2: far-future events on BOTH sides (the global watermark is
        # the min across the two watermarked inputs — a side that has seen
        # no data pins it at zero) advance the watermark to 08:50, far
        # beyond click 1's survival horizon (00:00 + 60m tolerance)
        _write_batch(
            src / "b2.parquet",
            [
                (2, _ts("2024-01-01 09:00:00"), 8, "click", 1.0),
                (5, _ts("2024-01-01 09:00:00"), 9, "purchase", 1.0),
            ],
            cols,
        )
        out.processAllAvailable()
        # batch 3: watermark 08:50 is now in effect -> click 1 evicted at
        # this batch's state cleanup (eviction lags the advance by one
        # batch: a watermark computed at batch N's end applies from N+1)
        _write_batch(
            src / "b3.parquet",
            [(4, _ts("2024-01-01 09:01:00"), 8, "click", 1.0)],
            cols,
        )
        out.processAllAvailable()
        # batch 4: purchase within tolerance of click 1 by event time,
        # but click 1's state no longer exists
        _write_batch(
            src / "b4.parquet",
            [(3, _ts("2024-01-01 00:30:00"), 7, "purchase", 5.0)],
            cols,
        )
        out.processAllAvailable()
        joined = spark.sql(
            "SELECT * FROM t_ssj_bound WHERE event_id = 3"
        ).collect()
        assert joined == []
    finally:
        out.stop()
