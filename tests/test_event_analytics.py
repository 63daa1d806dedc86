"""Sliding windows, funnels, retention cohorts (streaming/events.py)."""

from datetime import datetime

import pytest

from pyspark_graph_spark.streaming.events import (
    funnel,
    retention_cohorts,
    sliding_window_agg,
)


def ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, value double"
    )


def test_sliding_window_fanout(spark):
    df = ev(spark, [(1, "click", datetime(2024, 1, 1, 0, 7, 0), 1.0)])
    out = sliding_window_agg(df, width_seconds=600, slide_seconds=300).collect()
    # event at 00:07 lands in windows starting 00:00 and 00:05
    starts = sorted(r.window_start_s for r in out)
    base = int(datetime(2024, 1, 1).timestamp())
    assert starts == [base, base + 300]
    assert all(r.n_events == 1 for r in out)


def test_sliding_window_requires_divisible(spark):
    df = ev(spark, [(1, "click", datetime(2024, 1, 1), 1.0)])
    with pytest.raises(ValueError):
        sliding_window_agg(df, width_seconds=500, slide_seconds=300)


def test_funnel_requires_order(spark):
    rows = [
        # user 1: full ordered funnel
        (1, "signup", datetime(2024, 1, 1, 0, 0), 0.0),
        (1, "click", datetime(2024, 1, 1, 0, 5), 0.0),
        (1, "purchase", datetime(2024, 1, 1, 0, 9), 0.0),
        # user 2: purchase BEFORE click -> drops at step 3
        (2, "signup", datetime(2024, 1, 1, 0, 0), 0.0),
        (2, "purchase", datetime(2024, 1, 1, 0, 1), 0.0),
        (2, "click", datetime(2024, 1, 1, 0, 2), 0.0),
        # user 3: never signed up -> not even step 1
        (3, "click", datetime(2024, 1, 1, 0, 0), 0.0),
        (3, "purchase", datetime(2024, 1, 1, 0, 1), 0.0),
    ]
    out = {
        r.step: r.n_users
        for r in funnel(ev(spark, rows), ["signup", "click", "purchase"]).collect()
    }
    assert out == {1: 2, 2: 2, 3: 1}


def test_funnel_needs_two_steps(spark):
    with pytest.raises(ValueError):
        funnel(ev(spark, []), ["only"])


def test_retention_cohorts_matrix(spark):
    week = 7 * 24 * 3600
    t0 = datetime(2024, 1, 1)
    rows = [
        # user 1: weeks 0, 1, 2
        (1, "click", t0, 0.0),
        (1, "click", datetime(2024, 1, 8), 0.0),
        (1, "click", datetime(2024, 1, 15), 0.0),
        # user 2: weeks 0 and 2 only
        (2, "click", t0, 0.0),
        (2, "click", datetime(2024, 1, 16), 0.0),
        # user 3: starts in week 1
        (3, "click", datetime(2024, 1, 9), 0.0),
    ]
    out = {
        (r.cohort_s, r.offset): r.n_users
        for r in retention_cohorts(ev(spark, rows), bucket_seconds=week).collect()
    }
    c0 = max(k[0] for k in out if k[1] == 0 and out[k] == 2)
    assert out[(c0, 0)] == 2  # users 1, 2
    assert out[(c0, 1)] == 1  # user 1 only
    assert out[(c0, 2)] == 2  # users 1, 2
    # user 3's cohort is one week later
    assert sum(v for (c, o), v in out.items() if c != c0 and o == 0) == 1
