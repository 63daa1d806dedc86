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


def sliding_window_agg(
    events: DataFrame,
    width_seconds: int = 600,
    slide_seconds: int = 300,
) -> DataFrame:
    """(window_start_s, event_type, n_events, total_value) over
    overlapping sliding windows (width/slide).

    Each event lands in ``width/slide`` windows — expressed as an explode
    of the enumerated window starts (``sequence``), then the same hash
    aggregate as the tumbling case: the fan-out factor is the small
    constant width/slide, not a join. ``window(ts, w, s)`` plans the same
    way; the explicit arithmetic keeps the oracle expression identical.
    """
    if width_seconds % slide_seconds != 0:
        raise ValueError("width must be a multiple of slide")
    us = F.unix_micros(F.col("ts"))
    first = (
        F.floor(us / (slide_seconds * 1_000_000)) * slide_seconds
        - (width_seconds - slide_seconds)
    )
    last = F.floor(us / (slide_seconds * 1_000_000)) * slide_seconds
    starts = F.sequence(first, last, F.lit(slide_seconds))
    return (
        events.select(
            F.explode(starts).alias("window_start_s"), "event_type", "value"
        )
        .groupBy("window_start_s", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel conversion: one row per funnel step with the number
    of users who reached it IN ORDER (step k's earliest qualifying time
    must follow step k-1's).

    Classic event analytics via iterated min-over-threshold: per user,
    the earliest step-1 time; then the earliest step-2 time after that;
    and so on — k-1 self-aggregations of the (user, type, ts) projection,
    each a hash aggregate on the user key (one shuffle, reused exchange).
    No window functions over whole sessions, no cross joins.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    base = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("t"),
        F.col(ts_col).alias("ts"),
    )
    reached = (
        base.filter(F.col("t") == steps[0])
        .groupBy("u")
        .agg(F.min("ts").alias("ts0"))
        .localCheckpoint()
    )
    levels = [reached]
    prev = reached
    for i, step in enumerate(steps[1:], start=1):
        prev = (
            base.filter(F.col("t") == step)
            .join(prev, on="u")
            .filter(F.col("ts") > F.col(f"ts{i - 1}"))
            .groupBy("u")
            .agg(F.min("ts").alias(f"ts{i}"))
            .localCheckpoint()
        )
        levels.append(prev)
    # fully lazy readout: one 1-row aggregate per level, unioned
    out = None
    for i, (step, lvl) in enumerate(zip(steps, levels), start=1):
        row = lvl.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i).alias("step"),
            F.lit(step).alias("event_type"),
            "n_users",
        )
        out = row if out is None else out.unionByName(row)
    return out


def retention_cohorts(
    events: DataFrame,
    bucket_seconds: int = 7 * 24 * 3600,
    max_offset: int = 8,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort_s, offset, n_users): users grouped by their first-activity
    bucket (cohort), counted in each later bucket they returned in.

    Two hash aggregates ((user) for the cohort, (user, bucket) for
    activity) and one join on the user key — the standard retention
    matrix with no row explosion beyond distinct (user, bucket) pairs.
    """
    b = lambda c: (
        F.floor(F.unix_micros(c) / (bucket_seconds * 1_000_000))
        * bucket_seconds
    )
    activity = events.select(
        F.col(user_col).alias("u"), b(F.col(ts_col)).alias("bucket_s")
    ).distinct()
    cohort = activity.groupBy("u").agg(F.min("bucket_s").alias("cohort_s"))
    return (
        activity.join(cohort, on="u")
        .withColumn(
            "offset",
            ((F.col("bucket_s") - F.col("cohort_s")) / bucket_seconds).cast(
                "int"
            ),
        )
        .filter(F.col("offset") <= max_offset)
        .groupBy("cohort_s", "offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
