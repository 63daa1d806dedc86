"""Sessionization, funnels, time series, temporal graph analytics."""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark_graph_spark.constants import DST, ID, SRC
from pyspark_graph_spark.graph import Graph

from pyspark_graph_spark.queries._registry import query
from pyspark_graph_spark.queries._shared import (
    NATION_EDGES_CTE,
)


_SESSION_CTE = """
sess AS (
    SELECT user_id, event_id, ts, value,
           CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                 OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                THEN 1 ELSE 0 END AS brk
    FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess2 AS (
    SELECT user_id, ts, value,
           SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
    FROM sess
)
"""

# ---------------------------------------------------------------------------
# Round 4 — time-series diagnostics over the event stream
# ---------------------------------------------------------------------------
_DAILY_CTE = """
daily AS (
    SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY 1
)
"""

_MARKOV_P_CTE = """
seq AS (
    SELECT user_id, event_type,
           lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS next_type
    FROM events
),
c AS (
    SELECT event_type, next_type, COUNT(*) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY 1, 2
),
tot AS (SELECT event_type, SUM(n) AS t FROM c GROUP BY event_type),
P AS (
    SELECT c.event_type AS s, c.next_type AS d,
           CAST(c.n AS DOUBLE) / tot.t AS p
    FROM c JOIN tot ON c.event_type = tot.event_type
)
"""

_MARKOV_ITER = """
pi{n} AS (
    SELECT P.d AS st, SUM(pi.v * P.p) AS v
    FROM pi{p} pi JOIN P ON P.s = pi.st
    GROUP BY P.d
)"""

@query(
    "session_stats",
    oracle=f"""
WITH {_SESSION_CTE.strip()}
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       COUNT(*) AS n_events,
       MIN(epoch_us(ts)) AS start_us, MAX(epoch_us(ts)) AS end_us,
       ROUND(SUM(value), 6) AS total_value
FROM sess2 GROUP BY user_id, session_id
""",
)
def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) + per-session aggregates."""
    from pyspark_graph_spark.sources.tables import load_table
    from pyspark_graph_spark.streaming import session_stats

    return session_stats(load_table(spark, sf_dir, "events"), gap_minutes=30)

@query(
    "session_window_stats",
    oracle=f"""
WITH {_SESSION_CTE.strip()}
SELECT user_id, MIN(epoch_us(ts)) AS start_us,
       COUNT(*) AS n_events, ROUND(SUM(value), 6) AS total_value
FROM sess2 GROUP BY user_id, session_id
""",
)
def q_session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same sessions via Spark's session_window (the Structured-Streaming
    operator, run here on a batch frame) — checked against the lag-gap
    oracle, proving the two formulations agree."""
    from pyspark_graph_spark.sources.tables import load_table
    from pyspark_graph_spark.streaming import streaming_session_stats

    return streaming_session_stats(load_table(spark, sf_dir, "events"))

@query(
    "tumbling_windows",
    oracle="""
SELECT CAST(floor(epoch_us(ts) / 300000000) * 300 AS BIGINT) AS bucket_start_s,
       event_type, COUNT(*) AS n_events, ROUND(SUM(value), 6) AS total_value
FROM events GROUP BY 1, 2
""",
)
def q_tumbling_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling-window aggregates per event type."""
    from pyspark_graph_spark.sources.tables import load_table
    from pyspark_graph_spark.streaming import tumbling_window_agg

    return tumbling_window_agg(load_table(spark, sf_dir, "events"), 300)

@query(
    "events_json",
    oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       COUNT(*) AS n_events, ROUND(SUM(value), 6) AS total_value
FROM events GROUP BY 1
""",
)
def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction (JVM-side get_json_object) + aggregate."""
    from pyspark_graph_spark.sources.tables import load_table
    from pyspark_graph_spark.streaming import extract_props

    ev = extract_props(load_table(spark, sf_dir, "events"), {"k": "k"})
    return ev.groupBy(F.col("k").cast("long").alias("k")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )

@query(
    "running_ema",
    oracle="""
WITH ordered AS (
    SELECT user_id,
           list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vs
    FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(len(vs) AS BIGINT) AS n_events,
       ROUND(list_reduce(vs,
             (acc, x) -> CAST(0.1 AS DOUBLE) * x
                       + CAST(0.9 AS DOUBLE) * acc), 6) AS ema
FROM ordered
""",
)
def q_running_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running EMA (alpha=0.1) over events in (ts, event_id)
    order — the order-dependent recursive aggregate that needs custom
    state. Gate runs the applyInPandas batch twin of the
    applyInPandasWithState streaming operator (Spark forbids grouped
    state on batch frames); the oracle replays the identical IEEE fold
    with DuckDB list_reduce, so a wrong sort key, fold order, or alpha
    placement mismatches values."""
    from pyspark_graph_spark.sources.tables import load_table
    from pyspark_graph_spark.streaming import running_ema_batch

    events = load_table(spark, sf_dir, "events")
    return running_ema_batch(events).select(
        "user_id", "n_events", F.round("ema", 6).alias("ema")
    )

@query(
    "sequence_pack",
    oracle=r"""
WITH toks AS (
    SELECT doc_id, source,
           CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                                t -> t <> '')) AS BIGINT) AS n_tokens
    FROM documents
),
cum AS (
    SELECT doc_id, source, n_tokens,
           CAST(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS end_off
    FROM toks
)
SELECT doc_id, source, n_tokens,
       end_off - n_tokens AS start_off,
       CASE WHEN n_tokens > 0
            THEN CAST(floor((end_off - n_tokens) / 256.0) AS BIGINT) END
         AS first_chunk,
       CASE WHEN n_tokens > 0
            THEN CAST(floor((end_off - 1) / 256.0) AS BIGINT) END
         AS last_chunk,
       CASE WHEN n_tokens > 0
            THEN CAST(floor((end_off - 1) / 256.0)
                    - floor((end_off - n_tokens) / 256.0) + 1 AS BIGINT)
            ELSE 0 END AS n_chunks
FROM cum
""",
)
def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing (ctx=256 tokens) per source: each
    doc reports its token span and the training-sequence ids it occupies.
    The prefix sum is windowed per source — no global sort, no single-task
    window."""
    from pyspark_graph_spark.functions.packing import concat_chunk_pack
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return concat_chunk_pack(docs, ctx=256, group_col="source")

# ---------------------------------------------------------------------------
# Click->purchase attribution join (streaming/structured.py stream-stream)
# ---------------------------------------------------------------------------
@query(
    "click_attribution",
    oracle="""
SELECT p.event_id, p.user_id, p.value,
       c.event_id AS click_id, c.value AS click_value,
       CAST(epoch_us(p.ts) AS BIGINT) AS purchase_us,
       CAST(epoch_us(c.ts) AS BIGINT) AS click_us
FROM events p
JOIN events c
  ON p.event_type = 'purchase' AND c.event_type = 'click'
 AND p.user_id = c.user_id
 AND c.ts <= p.ts
 AND c.ts >= p.ts - INTERVAL 120 MINUTES
""",
)
def q_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every (purchase, click-by-same-user-within-2h) pair — the batch twin
    of the watermarked stream-stream join (identical plan minus state; the
    streaming test pins batch/stream equivalence). The two-sided time bound
    is what makes the streaming form's state finite."""
    from pyspark_graph_spark.sources.tables import load_table
    from pyspark_graph_spark.streaming.structured import (
        streaming_click_purchase_join,
    )

    ev = load_table(spark, sf_dir, "events")
    return streaming_click_purchase_join(ev)

# ---------------------------------------------------------------------------
# Temporal graph evolution (operators/temporal.py)
# ---------------------------------------------------------------------------
@query(
    "graph_evolution",
    oracle="""
WITH ts_edges AS (
    SELECT DISTINCT date_trunc('year', o.o_orderdate) AS bucket,
           LEAST(a.l_suppkey, b.l_suppkey) AS a,
           GREATEST(a.l_suppkey, b.l_suppkey) AS b
    FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) a
    JOIN (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) b
      ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
    JOIN orders o ON a.l_orderkey = o.o_orderkey
),
e AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_edges
      FROM ts_edges GROUP BY bucket),
v AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_vertices FROM (
        SELECT DISTINCT bucket, a AS v FROM ts_edges
        UNION SELECT DISTINCT bucket, b FROM ts_edges
      ) GROUP BY bucket)
SELECT CAST(strftime(e.bucket, '%Y') AS INT) AS year, e.n_edges, v.n_vertices,
       CASE WHEN v.n_vertices > 1 THEN
            2.0 * e.n_edges / (v.n_vertices * (v.n_vertices - 1))
       ELSE 0.0 END AS density
FROM e JOIN v USING (bucket)
""",
)
def q_graph_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-by-year evolution of the supplier co-occurrence graph: each
    edge carries its order date; per year, distinct edges, active
    suppliers, and density. Snapshot filtering is a pure scan-level
    predicate (date-partition-prunable at scale); the metrics are two
    map-side-combined aggregates and one exact integer division."""
    from pyspark_graph_spark.operators.temporal import windowed_graph_metrics
    from pyspark_graph_spark.sources.tables import load_table

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    a = li.alias("a")
    b = li.alias("b")
    ts_edges = (
        a.join(
            b,
            on=[
                F.col("a.l_orderkey") == F.col("b.l_orderkey"),
                F.col("a.l_suppkey") < F.col("b.l_suppkey"),
            ],
        )
        .join(orders, F.col("a.l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("a.l_suppkey").alias("src"),
            F.col("b.l_suppkey").alias("dst"),
            F.col("o_orderdate").alias("ts"),
        )
    )
    out = windowed_graph_metrics(ts_edges, bucket="year")
    return out.select(
        F.year("bucket").alias("year"),
        "n_edges",
        "n_vertices",
        "density",
    )

# ---------------------------------------------------------------------------
# Event analytics: sliding windows, funnels, retention (streaming/events.py)
# ---------------------------------------------------------------------------
@query(
    "sliding_windows",
    oracle="""
WITH ev AS (
    SELECT epoch_us(ts) AS us, event_type, value FROM events
),
win AS (
    SELECT unnest(range(
               CAST(floor(us / 300000000) * 300 - 300 AS BIGINT),
               CAST(floor(us / 300000000) * 300 + 1 AS BIGINT),
               300)) AS window_start_s,
           event_type, value
    FROM ev
)
SELECT window_start_s, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 6) AS total_value
FROM win GROUP BY 1, 2
""",
)
def q_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 10-minute windows sliding every 5: each event fans out
    to exactly width/slide = 2 window starts (an explode of enumerated
    starts, not a join), then one hash aggregate."""
    from pyspark_graph_spark.sources.tables import load_table
    from pyspark_graph_spark.streaming.events import sliding_window_agg

    ev = load_table(spark, sf_dir, "events")
    return sliding_window_agg(ev, width_seconds=600, slide_seconds=300)

@query(
    "funnel",
    oracle="""
WITH base AS (SELECT user_id AS u, event_type AS t, ts FROM events),
l1 AS (SELECT u, MIN(ts) AS ts0 FROM base WHERE t = 'signup' GROUP BY u),
l2 AS (
    SELECT b.u, MIN(b.ts) AS ts1 FROM base b JOIN l1 ON b.u = l1.u
    WHERE b.t = 'click' AND b.ts > l1.ts0 GROUP BY b.u
),
l3 AS (
    SELECT b.u, MIN(b.ts) AS ts2 FROM base b JOIN l2 ON b.u = l2.u
    WHERE b.t = 'purchase' AND b.ts > l2.ts1 GROUP BY b.u
)
SELECT 1 AS step, 'signup' AS event_type,
       CAST((SELECT COUNT(*) FROM l1) AS BIGINT) AS n_users
UNION ALL
SELECT 2, 'click', CAST((SELECT COUNT(*) FROM l2) AS BIGINT)
UNION ALL
SELECT 3, 'purchase', CAST((SELECT COUNT(*) FROM l3) AS BIGINT)
""",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered signup -> click -> purchase funnel: per step, users whose
    earliest qualifying event follows their previous step's. k-1 hash
    aggregates on the user key plus a lazy 1-row readout per level —
    no window-over-session, no cross join, no driver-side counting."""
    from pyspark_graph_spark.sources.tables import load_table
    from pyspark_graph_spark.streaming.events import funnel

    ev = load_table(spark, sf_dir, "events")
    return funnel(ev, ["signup", "click", "purchase"])

@query(
    "retention_cohorts",
    oracle="""
WITH activity AS (
    SELECT DISTINCT user_id AS u,
           CAST(floor(epoch_us(ts) / 604800000000) * 604800 AS BIGINT)
               AS bucket_s
    FROM events
),
cohort AS (SELECT u, MIN(bucket_s) AS cohort_s FROM activity GROUP BY u)
SELECT c.cohort_s,
       CAST((a.bucket_s - c.cohort_s) / 604800 AS INT) AS "offset",
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM activity a JOIN cohort c ON a.u = c.u
WHERE (a.bucket_s - c.cohort_s) / 604800 <= 8
GROUP BY 1, 2
""",
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention matrix: users bucketed by first-activity week,
    counted in each later week they return (offsets 0-8). Two hash
    aggregates and one user-key join — no row explosion beyond distinct
    (user, week) pairs."""
    from pyspark_graph_spark.sources.tables import load_table
    from pyspark_graph_spark.streaming.events import retention_cohorts

    ev = load_table(spark, sf_dir, "events")
    return retention_cohorts(ev)

@query(
    "trending_topk",
    oracle="""
WITH w AS (
    SELECT CAST(floor(epoch_us(ts) / 3600000000) * 3600 AS BIGINT)
               AS bucket_start_s,
           event_type, COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
)
SELECT bucket_start_s, event_type, n, CAST(rnk AS INT) AS rnk
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY bucket_start_s ORDER BY n DESC, event_type
    ) AS rnk
    FROM w
)
WHERE rnk <= 3
""",
)
def q_trending_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 trending event types per 1-hour tumbling window — the
    windowed-leaderboard shape (count per (window, key), then a
    per-window rank). The count is a map-side-combinable aggregation;
    the rank window partitions by bucket so its state is the per-window
    distinct-key set, never the event stream. Deterministic (count DESC,
    key) ordering."""
    from pyspark_graph_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    w = (
        ev.groupBy(
            (
                F.floor(F.unix_micros("ts") / 3_600_000_000) * 3600
            )
            .cast("long")
            .alias("bucket_start_s"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rnk = F.row_number().over(
        Window.partitionBy("bucket_start_s").orderBy(
            F.desc("n"), F.asc("event_type")
        )
    )
    return (
        w.select("bucket_start_s", "event_type", "n", rnk.alias("rnk"))
        .filter(F.col("rnk") <= 3)
    )

@query(
    "anomaly_zscore",
    oracle="""
WITH stats AS (
    SELECT event_type, AVG(value) AS mu, stddev_pop(value) AS sigma
    FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type,
       ROUND(e.value, 6) AS value,
       ROUND((e.value - s.mu) / s.sigma, 4) AS z
FROM events e JOIN stats s ON e.event_type = s.event_type
WHERE s.sigma > 0 AND abs(ROUND((e.value - s.mu) / s.sigma, 4)) > 3
""",
)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outliers (|z| > 3) over the event value stream —
    the baseline anomaly detector. The stats table is |event types| rows
    and broadcasts onto the stream; the filter compares the ROUNDED
    z on both engines so IEEE summation-order noise in mean/stddev can
    never flip a boundary row."""
    from pyspark_graph_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"),
        F.stddev_pop("value").alias("sigma"),
    )
    z = F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 4)
    return (
        ev.join(F.broadcast(stats), on="event_type")
        .filter((F.col("sigma") > 0) & (F.abs(z) > 3))
        .select(
            "event_id",
            "event_type",
            F.round("value", 6).alias("value"),
            z.alias("z"),
        )
    )

@query(
    "concurrent_sessions",
    oracle=f"""
WITH {_SESSION_CTE.strip()},
iv AS (
    SELECT user_id, session_id,
           MIN(epoch_us(ts)) AS s, MAX(epoch_us(ts)) + 1 AS e
    FROM sess2 GROUP BY user_id, session_id
)
SELECT a.user_id, CAST(a.session_id AS BIGINT) AS session_id,
       a.s AS start_us, COUNT(*) AS n_concurrent
FROM iv a JOIN iv b
  ON a.s < b.e AND b.s < a.e AND a.user_id <> b.user_id
GROUP BY 1, 2, 3
""",
)
def q_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval overlap join: for every 30-min-gap session, how
    many OTHER users' sessions were active at the same time. The operator
    bin-explodes both interval sides onto a day grid and equi-joins on
    the bin (each pair meets exactly once, in the bin of the later
    start) — the scale-safe replacement for the theta join the oracle
    runs directly; matching outputs prove the binning emits each
    overlapping pair exactly once."""
    from pyspark_graph_spark.operators.temporal import interval_overlap_join
    from pyspark_graph_spark.sources.tables import load_table
    from pyspark_graph_spark.streaming import session_stats

    sess = session_stats(
        load_table(spark, sf_dir, "events"), gap_minutes=30
    ).select(
        "user_id",
        "session_id",
        "start_us",
        (F.col("end_us") + 1).alias("end_us_x"),
    )
    other = sess.select(
        F.col("user_id").alias("b_user"),
        F.col("start_us").alias("b_start"),
        F.col("end_us_x").alias("b_end"),
    )
    day_us = 86_400_000_000
    joined = interval_overlap_join(
        sess, other, "start_us", "end_us_x", "b_start", "b_end", day_us
    ).filter(F.col("user_id") != F.col("b_user"))
    return joined.groupBy("user_id", "session_id", "start_us").agg(
        F.count(F.lit(1)).alias("n_concurrent")
    )

@query(
    "trend_detection",
    oracle="""
WITH pts AS (
    SELECT event_type,
           CAST(epoch_us(ts) / 86400000000.0 AS DOUBLE) AS x,
           value AS y
    FROM events
)
SELECT event_type, COUNT(*) AS n,
       ROUND((COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))
             / (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)), 4) AS slope,
       ROUND((SUM(y) - ((COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))
                        / (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)))
                       * SUM(x)) / COUNT(*), 4) AS intercept
FROM pts GROUP BY event_type
""",
)
def q_trend_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key OLS trend over the event value stream (closed-form slope +
    intercept on day-scaled time) — the is-this-metric-drifting primitive.
    One map-side-combinable aggregation per key; no window, no sort.
    Coefficients rounded to 4 decimals so cross-engine summation-order
    noise in the Σxy/Σx² terms cannot flip hashes."""
    from pyspark_graph_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.unix_micros("ts") / 86_400_000_000.0).alias("x"),
        F.col("value").alias("y"),
    )
    n = F.count(F.lit(1))
    slope = (n * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y")) / (
        n * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x")
    )
    intercept = (F.sum("y") - slope * F.sum("x")) / n
    return ev.groupBy("event_type").agg(
        n.alias("n"),
        F.round(slope, 4).alias("slope"),
        F.round(intercept, 4).alias("intercept"),
    )

@query(
    "abandoned_events",
    oracle="""
SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us
FROM events p
WHERE p.event_type = 'view'
  AND NOT EXISTS (
      SELECT 1 FROM events c
      WHERE c.user_id = p.user_id
        AND c.event_type = 'purchase'
        AND c.ts > p.ts
        AND epoch_us(c.ts) - epoch_us(p.ts) <= 3600000000
  )
""",
)
def q_abandoned_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative sequence pattern — views NOT followed by a purchase from
    the same user within an hour (the abandoned-cart shape). A LEFT ANTI
    join on the user key with the time bound evaluated inside the join:
    one shuffle, no row inflation, and the anti side prunes to purchases
    before shuffling."""
    from pyspark_graph_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.unix_micros("ts").alias("p_ts_us"),
    )
    return views.join(
        purchases,
        on=[
            views.user_id == purchases.p_user,
            purchases.p_ts_us > views.ts_us,
            purchases.p_ts_us - views.ts_us <= 3_600_000_000,
        ],
        how="anti",
    )

@query(
    "critical_path",
    oracle=f"""
WITH RECURSIVE {NATION_EDGES_CTE.strip()},
d(id, dist) AS (
    SELECT CAST(n_nationkey AS BIGINT), CAST(0 AS BIGINT) FROM nation
    UNION
    SELECT e.dst, d.dist + e.src + e.dst
    FROM d JOIN nation_edges e ON e.src = d.id
)
SELECT id, MAX(dist) AS critical_path FROM d GROUP BY id
""",
)
def q_critical_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted critical path (longest path ending at each vertex, max-
    plus DP) over the canonical nation DAG with integer edge weights
    src+dst — the scheduling-graph metric. One edge join + per-vertex max
    per round, rounds = DAG depth, early-stopped. Oracle: recursive-CTE
    enumeration of every path."""
    from pyspark_graph_spark.operators.dag import CriticalPath
    from pyspark_graph_spark.sources.tables import load_table

    nation = load_table(spark, sf_dir, "nation")
    a, b = nation.alias("a"), nation.alias("b")
    edges = a.join(
        b,
        on=[
            F.col("a.n_regionkey") == F.col("b.n_regionkey"),
            F.col("a.n_nationkey") < F.col("b.n_nationkey"),
        ],
    ).select(
        F.col("a.n_nationkey").cast("long").alias(SRC),
        F.col("b.n_nationkey").cast("long").alias(DST),
        (
            F.col("a.n_nationkey").cast("long")
            + F.col("b.n_nationkey").cast("long")
        ).alias("weight"),
    )
    vertices = nation.select(F.col("n_nationkey").cast("long").alias(ID))
    g = Graph(vertices, edges, directed=True, indexed=True)
    # operator computes in double (general weighted DP); weights here are
    # integral by construction, so cast back for the BIGINT oracle
    return CriticalPath(weight_col="weight", max_iterations=30).run(g).select(
        "id", F.col("critical_path").cast("long").alias("critical_path")
    )

@query(
    "burst_windows",
    oracle="""
WITH w AS (
    SELECT event_type,
           CAST(floor(epoch_us(ts) / 86400000000) * 86400 AS BIGINT)
               AS bucket_start_s,
           COUNT(*) AS n
    FROM events GROUP BY 1, 2
),
stats AS (
    SELECT event_type, AVG(n) AS mu, stddev_pop(n) AS sigma
    FROM w GROUP BY event_type
)
SELECT w.event_type, w.bucket_start_s, w.n,
       ROUND((w.n - s.mu) / s.sigma, 4) AS z
FROM w JOIN stats s ON w.event_type = s.event_type
WHERE s.sigma > 0 AND ROUND((w.n - s.mu) / s.sigma, 4) > 2
""",
)
def q_burst_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detection: daily event-count windows whose volume sits more
    than 2σ above that type's mean window — rate anomalies, where
    anomaly_zscore flags value anomalies. Two map-side-combinable
    aggregations + a broadcast of the |types|-row stats table; the
    boundary compares the ROUNDED z on both engines."""
    from pyspark_graph_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    w = ev.groupBy(
        "event_type",
        (F.floor(F.unix_micros("ts") / 86_400_000_000) * 86400)
        .cast("long")
        .alias("bucket_start_s"),
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = w.groupBy("event_type").agg(
        F.avg("n").alias("mu"), F.stddev_pop("n").alias("sigma")
    )
    z = F.round((F.col("n") - F.col("mu")) / F.col("sigma"), 4)
    return (
        w.join(F.broadcast(stats), on="event_type")
        .filter((F.col("sigma") > 0) & (z > 2))
        .select("event_type", "bucket_start_s", "n", z.alias("z"))
    )

@query(
    "event_transitions",
    oracle="""
WITH seq AS (
    SELECT user_id, event_type,
           lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS next_type
    FROM events
),
c AS (
    SELECT event_type, next_type, COUNT(*) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY 1, 2
),
tot AS (SELECT event_type, SUM(n) AS t FROM c GROUP BY event_type)
SELECT c.event_type, c.next_type, c.n,
       ROUND(CAST(c.n AS DOUBLE) / tot.t, 6) AS p
FROM c JOIN tot ON c.event_type = tot.event_type
""",
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition estimates over per-user event
    sequences: P(next type | current type) from a lead window partitioned
    by user (state bounded per user) and two |types|²-sized aggregates —
    the behavioral-model primitive for session simulation and anomaly
    scoring."""
    from pyspark_graph_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    seq = ev.select(
        "event_type",
        F.lead("event_type")
        .over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        )
        .alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    c = seq.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = c.groupBy(F.col("event_type").alias("__et")).agg(
        F.sum("n").alias("t")
    )
    return (
        c.join(F.broadcast(tot), on=c.event_type == tot["__et"])
        .select(
            "event_type",
            "next_type",
            "n",
            F.round(F.col("n") / F.col("t"), 6).alias("p"),
        )
    )

@query(
    "running_cusum",
    oracle="""
WITH ordered AS (
    SELECT user_id,
           list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vs
    FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(len(vs) AS BIGINT) AS n_events,
       ROUND(list_reduce(list_prepend(CAST(0 AS DOUBLE), vs),
             (acc, x) -> greatest(CAST(0 AS DOUBLE),
                                  acc + (x - CAST(60 AS DOUBLE)))), 6)
           AS cusum,
       list_reduce(list_prepend(CAST(0 AS DOUBLE), vs),
             (acc, x) -> greatest(CAST(0 AS DOUBLE),
                                  acc + (x - CAST(60 AS DOUBLE))))
           > 200 AS drift
FROM ordered
""",
)
def q_running_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user one-sided CUSUM drift statistic s = max(0, s + v - 60)
    folded in (ts, event_id) order with a drift alarm at 200 — streaming
    change-point detection, the second custom-state operator next to the
    running EMA (state = two scalars per key). Gate runs the
    applyInPandas batch twin; the oracle replays the identical IEEE left
    fold with list_reduce seeded by a prepended 0."""
    from pyspark_graph_spark.sources.tables import load_table
    from pyspark_graph_spark.streaming.stateful import running_cusum_batch

    events = load_table(spark, sf_dir, "events")
    return running_cusum_batch(events).select(
        "user_id",
        "n_events",
        F.round("cusum", 6).alias("cusum"),
        "drift",
    )

@query(
    "temporal_reachability",
    oracle="""
WITH RECURSIVE tedges AS (
    SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst,
           epoch_us(o_orderdate) AS t
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
sym AS (
    SELECT src, dst, t FROM tedges
    UNION ALL
    SELECT dst AS src, src AS dst, t FROM tedges
),
reach(id, a) AS (
    SELECT CAST(2 AS BIGINT), CAST(0 AS BIGINT)
    UNION
    SELECT e.dst, e.t
    FROM reach JOIN sym e ON e.src = reach.id AND e.t >= reach.a
)
SELECT id, MIN(a) AS earliest_us FROM reach GROUP BY id
""",
)
def q_temporal_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-respecting reachability (temporal BFS) over the
    customer-supplier contact graph, edges stamped with the order date:
    earliest arrival at every vertex from customer #1 — the
    contact-tracing primitive plain reachability gets wrong on temporal
    graphs (an edge that fired before you arrived cannot carry you).
    Min-arrival relaxation is safe because a smaller arrival enables a
    superset of onward edges (optimal substructure); the oracle instead
    ENUMERATES every time-respecting (vertex, arrival) pair recursively
    and takes the min — two independent formulations must agree."""
    from pyspark_graph_spark.operators.temporal import earliest_arrival
    from pyspark_graph_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    te = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
                "ts"
            ),
        )
        .distinct()
    )
    sym = te.unionByName(
        te.select(
            F.col("dst").alias("src"),
            F.col("src").alias("dst"),
            "ts",
        )
    )
    seeds = spark.createDataFrame([(2, 0)], "id long, t0 long")
    # sf0.1's order-date zigzag paths exceed the operator's default
    # 20-round budget (the old silent-truncation behavior masked this —
    # the raise added in round 4 surfaced it); 60 covers the fixpoint
    # with headroom at bench scale
    return earliest_arrival(
        sym, seeds, "src", "dst", "ts", max_rounds=60
    ).select("id", F.col("arrival").alias("earliest_us"))

@query(
    "ab_test_z",
    oracle="""
WITH g AS (
    SELECT event_type,
           CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS grp,
           value
    FROM events
),
s AS (
    SELECT event_type, grp, COUNT(*) AS n, AVG(value) AS m,
           var_pop(value) AS v
    FROM g GROUP BY 1, 2
)
SELECT a.event_type,
       a.n AS n_a, b.n AS n_b,
       ROUND(a.m, 4) AS mean_a, ROUND(b.m, 4) AS mean_b,
       ROUND((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n), 3) AS z
FROM s a JOIN s b
  ON a.event_type = b.event_type AND a.grp = 'A' AND b.grp = 'B'
""",
)
def q_ab_test_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch two-sample z statistic per event type between the
    even-user-id (A) and odd-user-id (B) cohorts — the experiment-
    analysis primitive. Two map-side-combinable moment aggregations, one
    |types|-sized join; z rounded to 3 so cross-engine variance
    summation noise cannot flip hashes (|z|<2 here: the synthetic
    cohorts genuinely do not differ, which is itself the check)."""
    from pyspark_graph_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    g = ev.select(
        "event_type",
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("grp"),
        "value",
    )
    s = g.groupBy("event_type", "grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("value").alias("m"),
        F.var_pop("value").alias("v"),
    )
    a = s.filter(F.col("grp") == "A").alias("a")
    b = s.filter(F.col("grp") == "B").alias("b")
    return a.join(
        b, on=F.col("a.event_type") == F.col("b.event_type")
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
        F.round(F.col("a.m"), 4).alias("mean_a"),
        F.round(F.col("b.m"), 4).alias("mean_b"),
        F.round(
            (F.col("a.m") - F.col("b.m"))
            / F.sqrt(
                F.col("a.v") / F.col("a.n") + F.col("b.v") / F.col("b.n")
            ),
            3,
        ).alias("z"),
    )

@query(
    "seasonality_chi2",
    oracle="""
WITH d AS (
    SELECT event_type, dayofweek(ts) AS dow, COUNT(*) AS o
    FROM events GROUP BY 1, 2
),
t AS (SELECT event_type, SUM(o) AS n FROM d GROUP BY event_type)
SELECT d.event_type,
       CAST(COUNT(*) AS INT) AS n_buckets,
       ROUND(SUM((d.o - t.n / 7.0) * (d.o - t.n / 7.0)
                 / (t.n / 7.0)), 4) AS chi2
FROM d JOIN t ON d.event_type = t.event_type
GROUP BY d.event_type
""",
)
def q_seasonality_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality: χ² goodness-of-fit of each event type's
    daily counts against a uniform week (6 degrees of freedom; χ² above
    ~12.6 rejects uniformity at 5%). The O/E table is |types|×7 — the
    detector runs on aggregates, never the stream."""
    from pyspark_graph_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.dayofweek("ts").alias("dow")
    ).agg(F.count(F.lit(1)).alias("o"))
    t = d.groupBy(F.col("event_type").alias("__et")).agg(
        F.sum("o").alias("n")
    )
    e = F.col("n") / 7.0
    return (
        d.join(F.broadcast(t), on=d.event_type == t["__et"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_buckets"),
            F.round(
                F.sum((F.col("o") - e) * (F.col("o") - e) / e), 4
            ).alias("chi2"),
        )
    )

@query(
    "survival_curve",
    oracle="""
WITH lags AS (
    SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 60
                THEN date_diff('day', o_orderdate, l_shipdate)
                ELSE 60 END AS t,
           CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 60
                THEN 1 ELSE 0 END AS event
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE date_diff('day', o_orderdate, l_shipdate) >= 0
),
per_t AS (
    SELECT t, CAST(SUM(event) AS BIGINT) AS d, COUNT(*) AS c
    FROM lags GROUP BY t
),
km AS (
    SELECT t, d,
           CAST(SUM(c) OVER (ORDER BY t DESC) AS BIGINT) AS n_risk
    FROM per_t
)
SELECT CAST(t AS INT) AS t, n_risk, d,
       CASE WHEN MAX(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
                 OVER (ORDER BY t) = 1
            THEN 0.0
            ELSE ROUND(EXP(SUM(CASE WHEN d < n_risk
                                    THEN LN(1.0 - CAST(d AS DOUBLE)
                                            / n_risk) END)
                           OVER (ORDER BY t)), 6) END AS s
FROM km WHERE d > 0
""",
)
def q_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of order-to-ship lag (event = shipped
    within 60 days; later shipments are right-CENSORED at 60 — the
    estimator's whole point vs a plain histogram): S(t) = Π (1 − dᵢ/nᵢ)
    over event times, with the at-risk counts as a reverse cumulative
    window and the product as exp-sum-log. Two windows over a
    |distinct lags|-sized table — the survival-analysis readout for any
    time-to-event metric (job latencies, session lifetimes, churn)."""
    from pyspark_graph_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    lags = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(lag >= 0)
        .select(
            F.when(lag <= 60, lag).otherwise(F.lit(60)).alias("t"),
            F.when(lag <= 60, 1).otherwise(0).alias("event"),
        )
    )
    from pyspark_graph_spark.functions.stats import kaplan_meier

    return kaplan_meier(lags, "t", "event").select(
        F.col("t").cast("int").alias("t"), "n_risk", "d", "s"
    )

@query(
    "autocorrelation",
    oracle=f"""
WITH {_DAILY_CTE.strip()},
lags AS (SELECT UNNEST(range(1, 8)) AS lag)
SELECT CAST(l.lag AS INT) AS lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(corr(a.c, b.c), 6) AS acf
FROM lags l
JOIN daily a ON TRUE
JOIN daily b ON b.d = a.d - l.lag
GROUP BY l.lag
""",
)
def q_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..7 autocorrelation of the daily event-count series — the
    seasonality probe behind watermark/window sizing. The series is one
    row per day (already tiny after the first aggregate); each lag is an
    equi-join of the series against itself shifted by the exploded lag
    value — no theta join, no window over a single partition."""
    from pyspark_graph_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.floor(F.unix_micros("ts") / F.lit(86400000000)).alias("d")
    ).agg(F.count(F.lit(1)).alias("c"))
    a = daily.select(
        "d",
        F.col("c").alias("ca"),
        F.explode(F.array(*[F.lit(i) for i in range(1, 8)])).alias("lag"),
    )
    b = daily.select(F.col("d").alias("db"), F.col("c").alias("cb"))
    return (
        a.join(b, a.d - a.lag == b.db)
        .groupBy(F.col("lag").cast("int").alias("lag"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.corr("ca", "cb"), 6).alias("acf"),
        )
    )

@query(
    "changepoint",
    oracle=f"""
WITH {_DAILY_CTE.strip()},
seq AS (
    SELECT d, c,
           ROW_NUMBER() OVER (ORDER BY d) AS i,
           SUM(c) OVER (ORDER BY d) AS s
    FROM daily
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(c) AS st FROM daily)
SELECT d AS split_day,
       ROUND(ABS(s * 1.0 / i - (st - s) * 1.0 / (n - i))
             * sqrt(i * 1.0 * (n - i) / n), 6) AS stat
FROM seq CROSS JOIN tot
WHERE i >= 3 AND i <= n - 3
""",
)
def q_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-shift changepoint curve (binary-segmentation statistic) over
    the daily event-count series: for every split point, the scaled
    between-segment mean gap |m_L - m_R|*sqrt(k(n-k)/n). Inputs are exact
    integer prefix sums, so both engines compute bit-identical doubles.
    The rank/prefix window runs on the one-row-per-day series (bounded by
    the calendar, not the data volume); totals use the broadcast-
    singleton idiom."""
    from pyspark_graph_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.floor(F.unix_micros("ts") / F.lit(86400000000)).alias("d")
    ).agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("d")
    seq = daily.select(
        "d",
        F.row_number().over(w).alias("i"),
        F.sum("c").over(w).alias("s"),
    )
    tot = daily.agg(
        F.count(F.lit(1)).alias("n"), F.sum("c").alias("st")
    )
    return (
        seq.crossJoin(F.broadcast(tot))
        .filter((F.col("i") >= 3) & (F.col("i") <= F.col("n") - 3))
        .select(
            F.col("d").alias("split_day"),
            F.round(
                F.abs(
                    F.col("s") / F.col("i")
                    - (F.col("st") - F.col("s")) / (F.col("n") - F.col("i"))
                )
                * F.sqrt(
                    F.col("i")
                    * (F.col("n") - F.col("i"))
                    / F.col("n").cast("double")
                ),
                6,
            ).alias("stat"),
        )
    )

# ---------------------------------------------------------------------------
# Round 4 — clickstream paths, personalized PageRank, centralization
# ---------------------------------------------------------------------------
@query(
    "session_paths",
    oracle="""
WITH s1 AS (
    SELECT user_id, event_id, ts, event_type,
           CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                 OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                THEN 1 ELSE 0 END AS brk
    FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s2 AS (
    SELECT *, SUM(brk) OVER (
        PARTITION BY user_id ORDER BY ts, event_id) AS sid
    FROM s1
),
s3 AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id, sid ORDER BY ts, event_id) AS rn
    FROM s2
),
paths AS (
    SELECT user_id, sid,
           string_agg(event_type, '>' ORDER BY ts, event_id) AS path
    FROM s3 WHERE rn <= 3 GROUP BY user_id, sid
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM paths GROUP BY path
""",
)
def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clickstream path analysis: the first three event types of every
    30-minute session, joined '>' — the entry-funnel fingerprint. All
    windows partition by user (or user+session); the path string is
    assembled from an array_sort'ed struct list, so collect order can
    never leak nondeterminism."""
    from pyspark_graph_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    prev = F.lag(us).over(wo)
    brk = F.when(
        prev.isNull() | ((us - prev) > 1800000000), 1
    ).otherwise(0)
    s2 = ev.withColumn("brk", brk).withColumn(
        "sid", F.sum("brk").over(wo)
    )
    ws = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    s3 = s2.withColumn("rn", F.row_number().over(ws)).filter(
        F.col("rn") <= 3
    )
    paths = s3.groupBy("user_id", "sid").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("ts", "event_id", "event_type")
                    )
                ),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return paths.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_sessions")
    )

@query(
    "seasonal_decompose",
    oracle=f"""
WITH {_DAILY_CTE.strip()},
dow AS (
    SELECT d % 7 AS w, AVG(c) AS seasonal
    FROM daily GROUP BY 1
),
tr AS (
    SELECT d, c, AVG(c) OVER (
        ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS trend
    FROM daily
),
gm AS (SELECT AVG(c) AS g FROM daily)
SELECT tr.d AS day, tr.c AS n_events,
       ROUND(dow.seasonal, 6) AS seasonal,
       ROUND(tr.trend, 6) AS trend,
       ROUND(tr.c - dow.seasonal - tr.trend + gm.g, 6) AS residual
FROM tr JOIN dow ON tr.d % 7 = dow.w CROSS JOIN gm
""",
)
def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of the daily event-count series:
    day-of-week seasonal means + centered 7-day moving-average trend +
    residual (value − seasonal − trend + grand mean). All three
    components divide exact integer sums, so the doubles agree bit-for-
    bit across engines; the rows-frame window runs on the calendar-
    bounded daily series."""
    from pyspark_graph_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.floor(F.unix_micros("ts") / F.lit(86400000000)).alias("d")
    ).agg(F.count(F.lit(1)).alias("c"))
    dow = daily.groupBy((F.col("d") % 7).alias("w")).agg(
        F.avg("c").alias("seasonal")
    )
    tr = daily.select(
        "d",
        "c",
        F.avg("c")
        .over(Window.orderBy("d").rowsBetween(-3, 3))
        .alias("trend"),
    )
    gm = daily.agg(F.avg("c").alias("g"))
    return (
        tr.join(F.broadcast(dow), tr.d % 7 == dow.w)
        .crossJoin(F.broadcast(gm))
        .select(
            F.col("d").alias("day"),
            F.col("c").alias("n_events"),
            F.round("seasonal", 6).alias("seasonal"),
            F.round("trend", 6).alias("trend"),
            F.round(
                F.col("c") - F.col("seasonal") - F.col("trend") + F.col("g"),
                6,
            ).alias("residual"),
        )
    )

@query(
    "conversion_lag",
    oracle="""
WITH su AS (
    SELECT user_id, MIN(ts) AS t0 FROM events
    WHERE event_type = 'signup' GROUP BY 1
),
pu AS (
    SELECT e.user_id,
           MIN(epoch_us(e.ts) - epoch_us(su.t0)) / 1000000.0 AS lag_s
    FROM events e
    JOIN su ON e.user_id = su.user_id
    WHERE e.event_type = 'purchase' AND e.ts >= su.t0
    GROUP BY e.user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
       ROUND(quantile_cont(lag_s, 0.5), 6) AS median_s,
       ROUND(quantile_cont(lag_s, 0.9), 6) AS p90_s,
       ROUND(AVG(lag_s), 6) AS mean_s
FROM pu
""",
)
def q_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase conversion lag: per converting user the time from
    first signup to first subsequent purchase, summarized as exact
    interpolated percentiles (Spark `percentile` = DuckDB
    `quantile_cont`). Two per-user aggregates + one summary row — the
    funnel-latency readout."""
    from pyspark_graph_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    pu = (
        ev.filter(F.col("event_type") == "purchase")
        .join(su, on="user_id")
        .filter(F.col("ts") >= F.col("t0"))
        .groupBy("user_id")
        .agg(
            (
                F.min(F.unix_micros("ts") - F.unix_micros("t0"))
                / 1000000.0
            ).alias("lag_s")
        )
    )
    return pu.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.percentile("lag_s", F.lit(0.5)), 6).alias("median_s"),
        F.round(F.percentile("lag_s", F.lit(0.9)), 6).alias("p90_s"),
        F.round(F.avg("lag_s"), 6).alias("mean_s"),
    )

@query(
    "seasonality_strength",
    oracle=f"""
WITH {_DAILY_CTE.strip()},
dow AS (SELECT d % 7 AS w, AVG(c) AS seasonal FROM daily GROUP BY 1),
tr AS (
    SELECT d, c, AVG(c) OVER (
        ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS trend
    FROM daily
),
comp AS (
    SELECT tr.c - tr.trend AS detrended,
           tr.c - tr.trend - (dow.seasonal - gm.g) AS resid
    FROM tr
    JOIN dow ON tr.d % 7 = dow.w
    CROSS JOIN (SELECT AVG(c) AS g FROM daily) gm
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(GREATEST(0.0, 1.0 - var_pop(resid) / var_pop(detrended)), 6)
         AS seasonal_strength
FROM comp
""",
)
def q_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyndman seasonal-strength statistic F_s = max(0, 1 −
    Var(remainder)/Var(detrended)) over the daily event series — the
    one-number answer to 'does this stream have a weekly cycle worth
    modeling'. Same calendar-bounded components as seasonal_decompose,
    collapsed to two variance aggregates."""
    from pyspark_graph_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.floor(F.unix_micros("ts") / F.lit(86400000000)).alias("d")
    ).agg(F.count(F.lit(1)).alias("c"))
    dow = daily.groupBy((F.col("d") % 7).alias("w")).agg(
        F.avg("c").alias("seasonal")
    )
    tr = daily.select(
        "d",
        "c",
        F.avg("c")
        .over(Window.orderBy("d").rowsBetween(-3, 3))
        .alias("trend"),
    )
    gm = daily.agg(F.avg("c").alias("g"))
    comp = (
        tr.join(F.broadcast(dow), tr.d % 7 == dow.w)
        .crossJoin(F.broadcast(gm))
        .select(
            (F.col("c") - F.col("trend")).alias("detrended"),
            (
                F.col("c")
                - F.col("trend")
                - (F.col("seasonal") - F.col("g"))
            ).alias("resid"),
        )
    )
    return comp.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(
            F.greatest(
                F.lit(0.0),
                F.lit(1.0) - F.var_pop("resid") / F.var_pop("detrended"),
            ),
            6,
        ).alias("seasonal_strength"),
    )

@query(
    "markov_stationary",
    oracle=f"""
WITH {_MARKOV_P_CTE.strip()},
states AS (SELECT DISTINCT s FROM P),
ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM states),
pi0 AS (SELECT s AS st, 1.0 / ns.n AS v FROM states CROSS JOIN ns),
{_MARKOV_ITER.format(n=1, p=0).strip()},
{_MARKOV_ITER.format(n=2, p=1).strip()},
{_MARKOV_ITER.format(n=3, p=2).strip()},
{_MARKOV_ITER.format(n=4, p=3).strip()}
SELECT st AS event_type, ROUND(v, 6) AS pi FROM pi4
""",
)
def q_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the user-behavior Markov chain: four
    power-iteration steps from uniform over the event-transition matrix —
    where sessions spend their time in the long run. The matrix is
    |types|² rows (broadcast); each step is one tiny join + aggregate,
    mirrored exactly in the unrolled oracle."""
    from pyspark_graph_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    seq = ev.select(
        "event_type",
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    c = seq.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = c.groupBy(F.col("event_type").alias("__et")).agg(
        F.sum("n").alias("t")
    )
    P = (
        c.join(tot, c.event_type == tot["__et"])
        .select(
            F.col("event_type").alias("s"),
            F.col("next_type").alias("d"),
            (F.col("n").cast("double") / F.col("t")).alias("p"),
        )
        .localCheckpoint()
    )
    states = P.select("s").distinct()
    ns = states.agg(F.count(F.lit(1)).alias("n"))
    pi = states.crossJoin(F.broadcast(ns)).select(
        F.col("s").alias("st"), (F.lit(1.0) / F.col("n")).alias("v")
    )
    for _ in range(4):
        pi = (
            F.broadcast(pi)
            .join(P, P.s == F.col("st"))
            .groupBy(F.col("d").alias("st"))
            .agg(F.sum(F.col("v") * F.col("p")).alias("v"))
        )
    return pi.select(
        F.col("st").alias("event_type"), F.round("v", 6).alias("pi")
    )

@query(
    "stickiness",
    oracle="""
WITH du AS (
    SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
           COUNT(DISTINCT user_id) AS dau
    FROM events GROUP BY 1
),
mau AS (SELECT COUNT(DISTINCT user_id) AS m FROM events)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(AVG(dau), 6) AS avg_dau,
       CAST(MAX(m) AS BIGINT) AS mau,
       ROUND(AVG(dau) / MAX(m), 6) AS stickiness
FROM du CROSS JOIN mau
""",
)
def q_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness over the window: average daily distinct users
    divided by window distinct users — the one-number engagement pulse.
    Two distinct-count aggregates (map-side partials), one broadcast
    singleton."""
    from pyspark_graph_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    du = ev.groupBy(
        F.floor(F.unix_micros("ts") / F.lit(86400000000)).alias("d")
    ).agg(F.count_distinct("user_id").alias("dau"))
    mau = ev.agg(F.count_distinct("user_id").alias("m"))
    return du.crossJoin(F.broadcast(mau)).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.avg("dau"), 6).alias("avg_dau"),
        F.max("m").cast("long").alias("mau"),
        F.round(F.avg("dau") / F.max("m"), 6).alias("stickiness"),
    )

@query(
    "hourly_profile",
    oracle="""
WITH h AS (
    SELECT CAST((epoch_us(ts) % 86400000000) // 3600000000 AS INT)
             AS hour_of_day,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1
),
tot AS (SELECT SUM(n_events) AS t FROM h)
SELECT hour_of_day, n_events,
       ROUND(n_events * 1.0 / t, 6) AS share
FROM h CROSS JOIN tot
""",
)
def q_hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day load curve (the capacity-planning histogram): event
    counts and share per UTC hour. One aggregate + one broadcast
    singleton; partition-prunable by date at scale."""
    from pyspark_graph_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(
        F.floor(
            F.pmod(F.unix_micros("ts"), F.lit(86400000000))
            / F.lit(3600000000)
        )
        .cast("int")
        .alias("hour_of_day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    tot = h.agg(F.sum("n_events").alias("t"))
    return h.crossJoin(F.broadcast(tot)).select(
        "hour_of_day",
        "n_events",
        F.round(F.col("n_events") / F.col("t"), 6).alias("share"),
    )
