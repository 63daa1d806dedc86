"""Event-stream operators, batch-first (SQL-oracle-checkable).

The graph reference has no streaming/event surface at all (SURVEY.md §2,
"Streaming: absent entirely"); these are the engine extensions for the
``events(event_id, ts, user_id, event_type, value, props)`` table. Each
batch operator has an exact ANSI-SQL equivalent; the true Structured
Streaming variants (same semantics, incremental execution) live in
``streaming/structured.py``.

Scale notes: sessionization partitions by user — one shuffle, no skew
beyond per-user event counts; window buckets are pure arithmetic on the
timestamp (no shuffle until the aggregate). Timestamps are exposed as epoch
microseconds (BIGINT) at the boundaries to keep cross-engine comparison
free of timezone/format ambiguity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SESSION_ID = "session_id"


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Append a per-user ``session_id``: a new session starts when the gap
    to the previous event exceeds ``gap_minutes``.

    Classic lag-gap + running-sum formulation: both window functions share
    the same (partition, order) spec, so Spark evaluates them in a single
    window exchange.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    prev = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    is_new = F.when(
        prev.isNull()
        | ((F.unix_micros(F.col(ts_col)) - prev) > gap_us),
        1,
    ).otherwise(0)
    return events.withColumn(
        SESSION_ID, F.sum(is_new).over(w).cast("long")
    )


def session_stats(
    events: DataFrame, gap_minutes: int = 30
) -> DataFrame:
    """(user_id, session_id, n_events, start_us, end_us, total_value)."""
    s = sessionize(events, gap_minutes)
    return s.groupBy("user_id", SESSION_ID).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(F.unix_micros(F.col("ts"))).alias("start_us"),
        F.max(F.unix_micros(F.col("ts"))).alias("end_us"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


def tumbling_window_agg(
    events: DataFrame, width_seconds: int = 300
) -> DataFrame:
    """(bucket_start_s, event_type, n_events, total_value) over fixed
    tumbling windows. Bucket arithmetic (floor of epoch) instead of
    ``window()`` so the oracle states the identical expression."""
    bucket = (
        F.floor(F.unix_micros(F.col("ts")) / (width_seconds * 1_000_000))
        * width_seconds
    ).alias("bucket_start_s")
    return events.groupBy(bucket, "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


def extract_props(
    events: DataFrame, fields: dict[str, str] | None = None
) -> DataFrame:
    """Project JSON ``props`` keys to typed columns.

    ``fields`` maps output column -> JSON path suffix (default: ``{"k":
    "k"}``). Uses ``get_json_object`` — JVM-side JSON parsing, no UDF.
    """
    fields = fields or {"k": "k"}
    cols = [events["*"]] + [
        F.get_json_object(F.col("props"), f"$.{path}").alias(name)
        for name, path in fields.items()
    ]
    return events.select(*cols)
