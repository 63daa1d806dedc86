"""Custom stateful streaming operator: per-user running EMA via
``applyInPandasWithState``.

An exponential moving average is the canonical aggregate Spark's built-in
windowed aggs CANNOT express incrementally — it is order-dependent and
recursive (``ema_k = α·v_k + (1-α)·ema_{k-1}``), so it needs genuine
user-managed state, which is exactly what ``applyInPandasWithState``
provides (Arrow-batched, grouped state with optional timeouts).

Spark refuses ``applyInPandasWithState`` on batch frames, so the operator
ships as a twin pair (the repo's standard streaming pattern, cf.
``events.py`` vs ``structured.py``):

- :func:`running_ema_batch` — ``applyInPandas`` with the identical
  per-group fold; deterministic, exact-SQL-oracle-able (DuckDB
  ``list_reduce`` replays the same IEEE fold), the driver-gate entry.
- :func:`running_ema_stream` — the real streaming operator holding
  ``(n_events, ema)`` state per user across triggers, with an optional
  processing-time timeout that emits-and-evicts idle users (bounded state
  on unbounded key spaces).

100 TB notes: state is two scalars per user — millions of users fit one
executor's state store; the shuffle is the single groupBy(user) exchange
Spark requires for grouped state, and Arrow batches amortize the Python
hop. Within-trigger ordering is restored by an explicit (ts, event_id)
sort inside the function — grouped data arrives unordered, and relying on
accidental order is a correctness bug at any scale.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

EMA_ALPHA = 0.1

_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("ema", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("ema", DoubleType()),
    ]
)


def _fold_ema(
    pdf: pd.DataFrame, alpha: float, n0: int, ema0: float | None
) -> tuple[int, float | None]:
    """Sequential EMA fold over one group's rows in (ts, event_id) order.

    The loop is per-EVENT but runs driver-free inside the Arrow hop over
    a single user's rows; the recursive dependence means no vectorized
    form exists (this is why the operator needs custom state at all).
    """
    pdf = pdf.sort_values(["ts", "event_id"])
    n, ema = n0, ema0
    for v in pdf["value"].astype(float):
        ema = v if ema is None else alpha * v + (1.0 - alpha) * ema
        n += 1
    return n, ema


def running_ema_batch(
    events: DataFrame, alpha: float = EMA_ALPHA
) -> DataFrame:
    """Batch twin: (user_id, n_events, ema) after folding every event in
    event-time order — bit-identical to what the streaming operator's
    state converges to once all data has arrived."""

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        n, ema = _fold_ema(pdf, alpha, 0, None)
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [n],
                "ema": [ema],
            }
        )

    return events.select("user_id", "ts", "event_id", "value").groupBy(
        "user_id"
    ).applyInPandas(fold, _OUT_SCHEMA)


def running_ema_stream(
    events: DataFrame,
    alpha: float = EMA_ALPHA,
    idle_gap: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming operator: per-trigger state update emitting the current
    (user_id, n_events, ema) row for every user seen in the trigger.

    With ``idle_gap`` set (e.g. ``"5 minutes"``), a user idle past that
    gap in EVENT time gets one final emission and their state evicted —
    the bounded-state story for key spaces that grow forever. Event-time
    timeouts (watermark-driven) rather than processing-time: they are
    deterministic under replay, and a wall-clock timeout would force the
    engine into continuous empty micro-batches just to poll the clock.
    """
    idle_gap_ms = None
    if idle_gap is not None:
        qty, unit = idle_gap.split()
        idle_gap_ms = int(qty) * {
            "second": 1_000,
            "seconds": 1_000,
            "minute": 60_000,
            "minutes": 60_000,
            "hour": 3_600_000,
            "hours": 3_600_000,
        }[unit]

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, ema = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "ema": [ema]}
            )
            return
        n, ema = state.get if state.exists else (0, None)
        # concat the trigger's Arrow chunks, restore event-time order once
        batch = pd.concat(list(pdfs), ignore_index=True)
        n, ema = _fold_ema(batch, alpha, n, ema)
        state.update((n, ema))
        if idle_gap_ms is not None:
            # evict when the WATERMARK passes last-seen + gap
            last_ms = int(batch["ts"].max().value // 1_000_000)
            state.setTimeoutTimestamp(last_ms + idle_gap_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "ema": [ema]}
        )

    timeout = (
        GroupStateTimeout.EventTimeTimeout
        if idle_gap is not None
        else GroupStateTimeout.NoTimeout
    )
    stream = events.select("user_id", "ts", "event_id", "value")
    if idle_gap is not None:
        stream = stream.withWatermark("ts", watermark)
    return stream.groupBy("user_id").applyInPandasWithState(
        update, _OUT_SCHEMA, _STATE_SCHEMA, "update", timeout
    )


# ---------------------------------------------------------------------------
# CUSUM drift detection — the second custom-state operator
# ---------------------------------------------------------------------------

CUSUM_TARGET = 50.0
CUSUM_SLACK = 10.0
CUSUM_THRESHOLD = 200.0

_CUSUM_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("cusum", DoubleType()),
        StructField("drift", BooleanType()),
    ]
)

_CUSUM_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("s", DoubleType()),
    ]
)


def _fold_cusum(
    pdf: pd.DataFrame, target: float, slack: float, n0: int, s0: float
) -> tuple[int, float]:
    """One-sided CUSUM fold s = max(0, s + v - target - slack) in
    (ts, event_id) order — recursive, hence custom state."""
    pdf = pdf.sort_values(["ts", "event_id"])
    n, s = n0, s0
    for v in pdf["value"].astype(float):
        s = max(0.0, s + (v - target - slack))
        n += 1
    return n, s


def running_cusum_batch(
    events: DataFrame,
    target: float = CUSUM_TARGET,
    slack: float = CUSUM_SLACK,
    threshold: float = CUSUM_THRESHOLD,
) -> DataFrame:
    """Batch twin of the streaming CUSUM drift detector: per user, the
    one-sided cumulative-sum statistic after folding every event in
    event-time order, and whether it crossed the drift threshold —
    the classic change-point alarm for 'this key's metric has shifted
    upward'. Same IEEE left fold the streaming state converges to."""

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        n, s = _fold_cusum(pdf, target, slack, 0, 0.0)
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [n],
                "cusum": [s],
                "drift": [s > threshold],
            }
        )

    return events.select("user_id", "ts", "event_id", "value").groupBy(
        "user_id"
    ).applyInPandas(fold, _CUSUM_OUT_SCHEMA)


def running_cusum_stream(
    events: DataFrame,
    target: float = CUSUM_TARGET,
    slack: float = CUSUM_SLACK,
    threshold: float = CUSUM_THRESHOLD,
) -> DataFrame:
    """Streaming CUSUM via ``applyInPandasWithState``: per trigger, fold
    the new rows into (n, s) state and emit the updated statistic for
    every key seen — state is two scalars per key, the minimal
    change-detection memory."""

    def update(key, pdfs, state):
        n, s = (0, 0.0) if not state.exists else state.get
        for pdf in pdfs:
            n, s = _fold_cusum(pdf, target, slack, n, s)
        state.update((n, s))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "cusum": [s],
                "drift": [s > threshold],
            }
        )

    return events.select("user_id", "ts", "event_id", "value").groupBy(
        "user_id"
    ).applyInPandasWithState(
        update,
        _CUSUM_OUT_SCHEMA,
        _CUSUM_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
