"""Structured Streaming variants of the event operators.

Same logical semantics as ``streaming/events.py`` executed incrementally:
``readStream`` over a parquet directory, watermarked event-time windows,
``session_window`` for gap-based sessions. These are the operators you point
at a real stream (Kafka/files) in production; tests drive them with
``trigger(availableNow=True)`` into a memory sink, which replays the same
parquet the batch path reads.

Watermarks bound state: late events beyond the watermark are dropped and
closed windows/sessions are emitted and evicted — this is what makes the
operators runnable on an unbounded 100 TB/day stream with finite executor
state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Stream the events table as if its parquet files were arriving."""
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(f"{sf_dir}/events.parquet")
    )
    from pyspark.sql.types import TimestampNTZType

    if isinstance(stream.schema["ts"].dataType, TimestampNTZType):
        # same timezone-independent NTZ -> epoch TIMESTAMP rebuild as
        # sources/tables.py load_table (readers that wrote ts as epoch-based
        # TIMESTAMP, e.g. the batch-written test fixtures, pass through)
        stream = stream.withColumn(
            "ts",
            F.timestamp_micros(
                F.expr(
                    "timestampdiff(MICROSECOND, "
                    "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
                )
            ),
        )
    return stream


def streaming_tumbling_counts(
    events: DataFrame,
    width_seconds: int = 300,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts per event type (streaming DF in,
    streaming DF out; also valid on batch frames)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", f"{width_seconds} seconds").alias("win"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.unix_micros(F.col("win.start")).alias("start_us"),
            F.unix_micros(F.col("win.end")).alias("end_us"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def streaming_session_stats(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "60 minutes",
) -> DataFrame:
    """Gap-based sessions via ``session_window`` with bounded state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.session_window("ts", f"{gap_minutes} minutes").alias("win"),
            "user_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("win.start")).alias("start_us"),
            "n_events",
            "total_value",
        )
    )


def streaming_click_purchase_join(
    events: DataFrame,
    tolerance_minutes: int = 120,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: each purchase picks up every click by the
    same user in the preceding ``tolerance_minutes`` window.

    Both sides are watermarked and the join condition bounds event time in
    BOTH directions, which is what lets Structured Streaming evict state:
    a buffered click older than (watermark + tolerance) can never match a
    future purchase and is dropped, so state is O(rate x window), not
    O(stream). Without the time bound the join would buffer both streams
    forever — the canonical unbounded-state mistake.

    Works identically on batch frames (the same plan without state), which
    is how the equivalence test pins the semantics.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
            F.col("value").alias("click_value"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "event_id", "value")
        .withWatermark("ts", watermark)
    )
    cond = (
        (purchases["user_id"] == clicks["c_user"])
        & (clicks["click_ts"] <= purchases["ts"])
        & (
            clicks["click_ts"]
            >= purchases["ts"] - F.expr(f"INTERVAL {tolerance_minutes} MINUTES")
        )
    )
    return purchases.join(clicks, on=cond, how="inner").select(
        "event_id",
        "user_id",
        "value",
        "click_id",
        "click_value",
        F.unix_micros("ts").alias("purchase_us"),
        F.unix_micros("click_ts").alias("click_us"),
    )
