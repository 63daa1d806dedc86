"""TPC-H-style relational analytics over the synthetic tables."""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from pyspark_graph_spark.queries._registry import query


# ---------------------------------------------------------------------------
# Relational breadth: TPC-H-style aggregates, rollup, decimal-exact sums
# ---------------------------------------------------------------------------
@query(
    "pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary. Monetary sums run in DECIMAL so the
    result is exact and order-independent (double summation would drift
    ~1e-4 between engines at sf0.1 volumes); cast to double at the edge."""
    from pyspark_graph_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
        .cast("double")
        .alias("sum_disc_price"),
        F.count(F.lit(1)).alias("count_order"),
    )

@query(
    "revenue_rollup",
    oracle="""
SELECT n.n_name AS nation, s.s_name AS supplier_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY ROLLUP (n.n_name, s.s_name)
""",
)
def q_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier revenue ROLLUP (nation -> supplier -> grand total):
    grouping-sets coverage with broadcast dimension joins."""
    from pyspark_graph_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .rollup(F.col("n_name").alias("nation"), F.col("s_name").alias("supplier_name"))
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )

@query(
    "top_customers_per_nation",
    oracle="""
WITH rev AS (
    SELECT c.c_nationkey, c.c_custkey, c.c_name,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_nationkey, c.c_custkey, c.c_name
)
SELECT c_nationkey AS nationkey, c_custkey AS custkey, total, CAST(rnk AS BIGINT) AS rank
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY c_nationkey ORDER BY total DESC, c_custkey
    ) AS rnk FROM rev
)
WHERE rnk <= 3
""",
)
def q_top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed top-3 customers by order value per nation (ranking window
    over a decimal-exact aggregate, deterministic tie-break)."""
    from pyspark.sql import Window

    from pyspark_graph_spark.sources.tables import load_table

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    rev = (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_nationkey", "c_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total")
        )
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("total"), F.asc("c_custkey")
    )
    return (
        rev.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_custkey").alias("custkey"),
            "total",
            "rank",
        )
    )

@query(
    "value_percentiles",
    oracle="""
SELECT event_type,
       quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.9) AS p90,
       quantile_cont(value, 0.99) AS p99
FROM events GROUP BY event_type
""",
)
def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles per event type (Spark
    `percentile` and DuckDB `quantile_cont` share the interpolation rule)."""
    from pyspark_graph_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("p50"),
        F.percentile("value", F.lit(0.9)).alias("p90"),
        F.percentile("value", F.lit(0.99)).alias("p99"),
    )

@query(
    "integrity_audit",
    oracle="""
SELECT
  (SELECT COUNT(*) FROM lineitem l
   WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
    AS orphan_lineitems,
  (SELECT COUNT(*) FROM orders o
   WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
    AS orphan_orders,
  (SELECT COUNT(*) FROM lineitem l
   WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
    AS unknown_suppliers,
  (SELECT COUNT(*) FROM customer c
   WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
    AS unknown_nations
""",
)
def q_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema: orphan counts
    per FK edge in ONE row (anti-joins against broadcast dimension key
    sets — at 100 TB each audit is a broadcast anti-join over the fact
    scan, no shuffles). The data-quality gate you run before trusting any
    downstream join."""
    from pyspark_graph_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    def orphans(fact, key, dim, dim_key):
        return (
            fact.select(F.col(key))
            .join(
                F.broadcast(dim.select(F.col(dim_key).alias(key)).distinct()),
                key,
                "left_anti",
            )
            .select(F.count(F.lit(1)).alias("n"))
        )

    a = orphans(li, "l_orderkey", orders, "o_orderkey").select(
        F.col("n").alias("orphan_lineitems")
    )
    b = orphans(orders, "o_custkey", cust, "c_custkey").select(
        F.col("n").alias("orphan_orders")
    )
    c = orphans(li, "l_suppkey", supp, "s_suppkey").select(
        F.col("n").alias("unknown_suppliers")
    )
    d = orphans(cust, "c_nationkey", nation, "n_nationkey").select(
        F.col("n").alias("unknown_nations")
    )
    # each side is a 1-row aggregate; broadcast keeps the singleton-join
    # plan contract uniform (BroadcastNestedLoopJoin, never a shuffle)
    return (
        a.crossJoin(F.broadcast(b))
        .crossJoin(F.broadcast(c))
        .crossJoin(F.broadcast(d))
    )

# ---------------------------------------------------------------------------
# Temporal joins, sequence packing, k-means (round 2 batch 2)
# ---------------------------------------------------------------------------
@query(
    "as_of_join",
    oracle="""
WITH clicks AS (
    SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'click'
    QUALIFY row_number() OVER (
        PARTITION BY user_id, ts ORDER BY event_id DESC, value DESC) = 1
),
p AS (
    SELECT event_id, user_id, ts, value FROM events
    WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.value,
       CASE WHEN c.ts >= p.ts - INTERVAL 2 HOUR THEN c.event_id END
         AS click_event_id,
       CASE WHEN c.ts >= p.ts - INTERVAL 2 HOUR THEN c.value END
         AS click_value,
       CASE WHEN c.ts >= p.ts - INTERVAL 2 HOUR
            THEN ROUND(epoch(p.ts) - epoch(c.ts), 3) END AS gap_sec
FROM p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
)
def q_as_of_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each purchase picks up the user's most recent
    click at-or-before it, within a 2 h tolerance. Union-and-fill plan (one
    shuffle on user_id, no pair explosion) vs DuckDB's native ASOF JOIN as
    the oracle — two independent engines, two independent as-of
    implementations."""
    from pyspark_graph_spark.operators.temporal import as_of_join
    from pyspark_graph_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    out = as_of_join(
        purchases, clicks, on="user_id", tolerance="2 HOURS",
        right_prefix="click_",
    )
    return out.select(
        "event_id",
        "user_id",
        "value",
        F.col("click_event_id"),
        F.col("click_value"),
        F.round(
            F.col("ts").cast("double") - F.col("click_ts").cast("double"), 3
        ).alias("gap_sec"),
    )

@query(
    "range_join",
    oracle="""
WITH hours AS (
    SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n_err
    FROM events WHERE event_type = 'error' GROUP BY 1
),
bursts AS (
    SELECT h - INTERVAL 30 MINUTE AS w_start, h + INTERVAL 90 MINUTE AS w_end
    FROM hours WHERE n_err >= (SELECT AVG(n_err) * 1.5 FROM hours)
)
SELECT b.w_start, e.event_type,
       COUNT(*) AS n_events, ROUND(SUM(e.value), 3) AS sum_value
FROM events e JOIN bursts b
  ON e.ts >= b.w_start AND e.ts < b.w_end
GROUP BY 1, 2
""",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless point-in-interval range join: error-burst context windows
    (hours with >= 1.5x the mean error count, padded to [-30 min, +90 min))
    joined to ALL events by time containment. Spark side uses the binned
    range join (intervals exploded to 1 h bins, equi-join on bin, exact
    containment filter) — the oracle is DuckDB's native inequality join."""
    from pyspark_graph_spark.operators.temporal import (
        range_join_points_intervals,
    )
    from pyspark_graph_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    hours = ev.filter(F.col("event_type") == "error").groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).alias("n_err"))
    thr = hours.agg((F.avg("n_err") * 1.5).alias("__thr"))
    bursts = (
        hours.crossJoin(F.broadcast(thr))
        .filter(F.col("n_err") >= F.col("__thr"))
        .select(
            (F.col("h") - F.expr("INTERVAL 30 MINUTES")).alias("w_start"),
            (F.col("h") + F.expr("INTERVAL 90 MINUTES")).alias("w_end"),
        )
    )
    pts = ev.select("ts", "event_type", "value")
    joined = range_join_points_intervals(
        pts, bursts, "ts", "w_start", "w_end", bin_seconds=3600
    )
    return joined.groupBy("w_start", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 3).alias("sum_value"),
    )

@query(
    "skew_report",
    oracle="""
WITH counts AS (
    SELECT l_suppkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM lineitem GROUP BY l_suppkey
),
tot AS (SELECT SUM(cnt) AS total FROM counts)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, key) AS INT) AS rank,
       key, cnt, CAST(cnt AS DOUBLE) / total AS share
FROM counts, tot
ORDER BY cnt DESC, key LIMIT 10
""",
)
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key pre-flight: the 10 heaviest supplier keys in lineitem
    with their share of the table — one map-side-combined aggregate plus
    a TakeOrdered top-k, the measurement that decides salting/AQE
    settings before a 100 TB join."""
    from pyspark_graph_spark.functions.mixture import skew_report
    from pyspark_graph_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    return skew_report(li, "l_suppkey", top=10)

@query(
    "shipping_priority",
    oracle="""
SELECT l.l_orderkey AS orderkey,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS revenue,
       CAST(epoch(o.o_orderdate) AS BIGINT) AS orderdate_s,
       o.o_orderpriority AS orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, orderkey
LIMIT 10
""",
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shape shipping priority: top-10 unshipped BUILDING-segment
    orders by pending revenue. Segment + both date predicates push into
    the parquet scans; customer is a broadcast dim; the only shuffle is
    the orders⋈lineitem orderkey join + the per-order aggregate. Revenue
    sums in DECIMAL for cross-engine exactness, cast to double at the
    edge; (revenue DESC, orderkey) makes the top-10 deterministic."""
    from pyspark_graph_spark.sources.tables import load_table

    cutoff = "1998-01-01"
    c = F.broadcast(
        load_table(spark, sf_dir, "customer").filter(
            F.col("c_mktsegment") == "BUILDING"
        )
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(cutoff).cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(cutoff).cast("timestamp")
    )
    dec = lambda col: F.col(col).cast("decimal(18,2)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            # NTZ -> epoch seconds (session tz is UTC) for engine-portable
            # output typing; the driver hashes strings, not timestamps
            (
                F.unix_micros(F.col("o_orderdate").cast("timestamp"))
                / 1_000_000
            )
            .cast("long")
            .alias("orderdate_s"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), "orderkey")
        .limit(10)
        .select("orderkey", "revenue", "orderdate_s", "orderpriority")
    )

@query(
    "local_supplier_volume",
    oracle="""
SELECT n.n_name AS nation,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
                AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
""",
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shape local supplier volume: 1996 revenue where the
    supplier and customer share an ASIA nation. All four dimension
    tables broadcast; the date filter pushes into the orders scan; the
    local-supplier predicate (c_nationkey = s_nationkey) rides the
    existing join keys, so the plan stays one orderkey shuffle wide.
    DECIMAL sums, double at the edge."""
    from pyspark_graph_spark.sources.tables import load_table

    c = F.broadcast(load_table(spark, sf_dir, "customer"))
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda col: F.col(col).cast("decimal(18,2)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )

@query(
    "order_priority",
    oracle="""
SELECT o.o_orderpriority AS orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o.o_orderpriority
""",
)
def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shape order priority check: Q1-1996 orders with at least
    one lineitem shipped more than 90 days after order date (the dataset
    has no commit/receipt dates, so lateness is ship-vs-order + 90d),
    counted per priority. The EXISTS is a LEFT SEMI join on the orderkey
    — one shuffle, no duplicate-row inflation, late-date predicate
    evaluated inside the join."""
    from pyspark_graph_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    late = o.join(
        li,
        on=[
            o.o_orderkey == li.l_orderkey,
            li.l_shipdate
            > o.o_orderdate + F.expr("INTERVAL 90 DAYS"),
        ],
        how="semi",
    )
    return late.groupBy(
        F.col("o_orderpriority").alias("orderpriority")
    ).agg(F.count(F.lit(1)).alias("order_count"))

@query(
    "returned_items",
    oracle="""
SELECT c.c_custkey AS custkey, c.c_name AS name, n.n_name AS nation,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS lost_revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY 1, 2, 3
ORDER BY lost_revenue DESC, custkey
LIMIT 20
""",
)
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shape returned-item reporting: top-20 customers by
    revenue lost to returns in H1-1996. Return-flag and date predicates
    push to the scans; customer/nation broadcast; deterministic
    (revenue DESC, custkey) top-k."""
    from pyspark_graph_spark.sources.tables import load_table

    c = F.broadcast(load_table(spark, sf_dir, "customer"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    dec = lambda col: F.col(col).cast("decimal(18,2)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("n_name").alias("nation"),
        )
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("lost_revenue")
        )
        .orderBy(F.desc("lost_revenue"), "custkey")
        .limit(20)
        .select("custkey", "name", "nation", "lost_revenue")
    )

@query(
    "k_anonymity",
    oracle="""
WITH g AS (
    SELECT c_nationkey AS nationkey, c_mktsegment AS mktsegment,
           CAST(floor(c_acctbal / 2000) AS INT) AS balance_band,
           COUNT(*) AS group_size
    FROM customer GROUP BY 1, 2, 3
)
SELECT nationkey, mktsegment, balance_band, group_size
FROM g WHERE group_size < 5
""",
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the (nation, market segment, balance band)
    quasi-identifier: equivalence classes smaller than k=5 — the rows a
    privacy review would generalize or suppress before release. One hash
    aggregation on the quasi-identifier tuple."""
    from pyspark_graph_spark.sources.tables import load_table

    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_mktsegment").alias("mktsegment"),
            F.floor(F.col("c_acctbal") / 2000)
            .cast("int")
            .alias("balance_band"),
        )
        .agg(F.count(F.lit(1)).alias("group_size"))
        .filter(F.col("group_size") < 5)
    )

@query(
    "daily_type_pivot",
    oracle="""
SELECT CAST(floor(epoch_us(ts) / 86400000000) * 86400 AS BIGINT)
           AS day_s,
       CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT)
           AS click,
       CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT)
           AS view,
       CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
           AS purchase,
       CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT)
           AS signup,
       CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT)
           AS error
FROM events GROUP BY 1
""",
)
def q_daily_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crosstab via ``groupBy().pivot()`` with explicit pivot values —
    days × event types. Naming the pivot values keeps the plan a single
    pass (no extra distinct-values job) and the output schema stable,
    which is the pivot contract any BI layer needs."""
    from pyspark_graph_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy(
            (F.floor(F.unix_micros("ts") / 86_400_000_000) * 86400)
            .cast("long")
            .alias("day_s")
        )
        .pivot(
            "event_type", ["click", "view", "purchase", "signup", "error"]
        )
        .count()
    )
    return out.select(
        "day_s",
        *[
            F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
            for c in ["click", "view", "purchase", "signup", "error"]
        ],
    )

@query(
    "frequent_itemsets",
    oracle="""
WITH b AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
pairs AS (
    SELECT a.l_suppkey AS i1, b2.l_suppkey AS i2, COUNT(*) AS support
    FROM b a JOIN b b2
      ON a.l_orderkey = b2.l_orderkey AND a.l_suppkey < b2.l_suppkey
    GROUP BY 1, 2 HAVING COUNT(*) >= 30
),
tri_cand AS (
    SELECT p1.i1, p1.i2, p2.i2 AS i3
    FROM pairs p1
    JOIN pairs p2 ON p1.i1 = p2.i1 AND p1.i2 < p2.i2
    JOIN pairs p3 ON p3.i1 = p1.i2 AND p3.i2 = p2.i2
),
tri AS (
    SELECT t.i1, t.i2, t.i3, COUNT(*) AS support
    FROM tri_cand t
    JOIN b x ON x.l_suppkey = t.i1
    JOIN b y ON y.l_orderkey = x.l_orderkey AND y.l_suppkey = t.i2
    JOIN b z ON z.l_orderkey = x.l_orderkey AND z.l_suppkey = t.i3
    GROUP BY 1, 2, 3 HAVING COUNT(*) >= 5
)
SELECT CAST(i1 AS VARCHAR) || ',' || CAST(i2 AS VARCHAR) AS itemset,
       2 AS size, support FROM pairs
UNION ALL
SELECT CAST(i1 AS VARCHAR) || ',' || CAST(i2 AS VARCHAR) || ','
           || CAST(i3 AS VARCHAR) AS itemset,
       3 AS size, support FROM tri
""",
)
def q_frequent_itemsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apriori frequent itemsets over order baskets: pairs of suppliers
    co-appearing in >= 30 orders, and triples (support >= 5) whose
    candidates come ONLY from frequent pairs — the downward-closure prune
    that collapses the triple space from O(items³) to a self-join of the
    small frequent-pair relation. Support counts are basket-keyed
    map-side-combinable aggregations."""
    from pyspark_graph_spark.functions.itemsets import (
        frequent_pairs,
        frequent_triples,
    )
    from pyspark_graph_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    pairs = frequent_pairs(li, "l_orderkey", "l_suppkey", 30).localCheckpoint()
    tri = frequent_triples(li, pairs, "l_orderkey", "l_suppkey", 5)
    p_out = pairs.select(
        F.concat_ws(",", F.col("i1"), F.col("i2")).alias("itemset"),
        F.lit(2).alias("size"),
        "support",
    )
    t_out = tri.select(
        F.concat_ws(",", F.col("i1"), F.col("i2"), F.col("i3")).alias(
            "itemset"
        ),
        F.lit(3).alias("size"),
        "support",
    )
    return p_out.unionByName(t_out)

@query(
    "table_profile",
    oracle="""
SELECT 'o_custkey' AS col, COUNT(*) AS n,
       COUNT(*) - COUNT(o_custkey) AS nulls,
       COUNT(DISTINCT o_custkey) AS distincts,
       CAST(MIN(o_custkey) AS DOUBLE) AS min_v,
       CAST(MAX(o_custkey) AS DOUBLE) AS max_v
FROM orders
UNION ALL
SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
       COUNT(DISTINCT o_totalprice),
       ROUND(CAST(MIN(o_totalprice) AS DOUBLE), 6),
       ROUND(CAST(MAX(o_totalprice) AS DOUBLE), 6)
FROM orders
UNION ALL
SELECT 'o_orderpriority', COUNT(*),
       COUNT(*) - COUNT(o_orderpriority),
       COUNT(DISTINCT o_orderpriority), NULL, NULL
FROM orders
""",
)
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling audit (the data-quality report every ingestion
    pipeline runs first): row/null/distinct counts and numeric ranges
    per column, computed in ONE pass over the table — all profiles are
    aggregates of the same scan, so Spark reads the parquet once and
    every statistic is map-side combinable."""
    from pyspark_graph_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    prof = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_custkey").alias("nn_ck"),
        F.countDistinct("o_custkey").alias("d_ck"),
        F.min("o_custkey").cast("double").alias("min_ck"),
        F.max("o_custkey").cast("double").alias("max_ck"),
        F.count("o_totalprice").alias("nn_tp"),
        F.countDistinct("o_totalprice").alias("d_tp"),
        F.round(F.min("o_totalprice").cast("double"), 6).alias("min_tp"),
        F.round(F.max("o_totalprice").cast("double"), 6).alias("max_tp"),
        F.count("o_orderpriority").alias("nn_op"),
        F.countDistinct("o_orderpriority").alias("d_op"),
    )
    rows = [
        ("o_custkey", "nn_ck", "d_ck", "min_ck", "max_ck"),
        ("o_totalprice", "nn_tp", "d_tp", "min_tp", "max_tp"),
        ("o_orderpriority", "nn_op", "d_op", None, None),
    ]
    parts = []
    for col, nn, d, mn, mx in rows:
        parts.append(
            prof.select(
                F.lit(col).alias("col"),
                F.col("n").alias("n"),
                (F.col("n") - F.col(nn)).alias("nulls"),
                F.col(d).alias("distincts"),
                (
                    F.col(mn) if mn else F.lit(None).cast("double")
                ).alias("min_v"),
                (
                    F.col(mx) if mx else F.lit(None).cast("double")
                ).alias("max_v"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out

@query(
    "association_rules",
    oracle="""
WITH b AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
nb AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM b),
item AS (SELECT l_suppkey AS i, COUNT(*) AS c FROM b GROUP BY 1),
pairs AS (
    SELECT a.l_suppkey AS i1, b2.l_suppkey AS i2, COUNT(*) AS support
    FROM b a JOIN b b2
      ON a.l_orderkey = b2.l_orderkey AND a.l_suppkey < b2.l_suppkey
    GROUP BY 1, 2 HAVING COUNT(*) >= 30
)
SELECT p.i1, p.i2, p.support,
       ROUND(CAST(p.support AS DOUBLE) / ia.c, 6) AS confidence,
       ROUND(CAST(p.support AS DOUBLE) * nb.n / (ia.c * ib.c), 6)
           AS lift
FROM pairs p
JOIN item ia ON ia.i = p.i1
JOIN item ib ON ib.i = p.i2
CROSS JOIN nb
""",
)
def q_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over the frequent supplier pairs: confidence
    P(i2|i1) and lift P(i1,i2)/(P(i1)·P(i2)) — lift > 1 marks genuinely
    associated items vs merely-popular ones, the readout that makes
    frequent itemsets actionable. Item counts broadcast; the basket
    total is a 1-row broadcast."""
    from pyspark_graph_spark.functions.itemsets import frequent_pairs
    from pyspark_graph_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    b = li.distinct()
    nb = b.agg(F.countDistinct("l_orderkey").alias("n"))
    item = b.groupBy(F.col("l_suppkey").alias("i")).agg(
        F.count(F.lit(1)).alias("c")
    )
    pairs = frequent_pairs(li, "l_orderkey", "l_suppkey", 30)
    ia = item.select(F.col("i").alias("i1"), F.col("c").alias("ca"))
    ib = item.select(F.col("i").alias("i2"), F.col("c").alias("cb"))
    return (
        pairs.join(F.broadcast(ia), on="i1")
        .join(F.broadcast(ib), on="i2")
        .crossJoin(F.broadcast(nb))
        .select(
            "i1",
            "i2",
            "support",
            F.round(
                F.col("support").cast("double") / F.col("ca"), 6
            ).alias("confidence"),
            F.round(
                F.col("support").cast("double")
                * F.col("n")
                / (F.col("ca") * F.col("cb")),
                6,
            ).alias("lift"),
        )
    )

@query(
    "gini_concentration",
    oracle="""
WITH rev AS (
    SELECT s.s_nationkey AS nation, l.l_suppkey,
           SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS r
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY 1, 2
),
ranked AS (
    SELECT nation, CAST(r AS DOUBLE) AS x,
           ROW_NUMBER() OVER (
               PARTITION BY nation ORDER BY r, l_suppkey
           ) AS i,
           COUNT(*) OVER (PARTITION BY nation) AS n
    FROM rev
)
SELECT nation, CAST(MAX(n) AS BIGINT) AS n_suppliers,
       ROUND(2.0 * SUM(i * x) / (MAX(n) * SUM(x))
             - (MAX(n) + 1.0) / MAX(n), 6) AS gini
FROM ranked GROUP BY nation
""",
)
def q_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of supplier revenue per nation — the
    concentration/inequality readout (0 = equal shares, →1 = one
    supplier takes all). Revenue in exact DECIMAL; the rank window
    partitions by nation so state is per-group; the closed-form
    G = 2Σi·xᵢ/(nΣx) − (n+1)/n avoids any pairwise term."""
    from pyspark_graph_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice"
    )
    sup = F.broadcast(
        load_table(spark, sf_dir, "supplier").select(
            "s_suppkey", "s_nationkey"
        )
    )
    rev = (
        li.join(sup, li.l_suppkey == F.col("s_suppkey"))
        .groupBy(
            F.col("s_nationkey").alias("nation"),
            "l_suppkey",
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias(
                "r"
            )
        )
    )
    w = Window.partitionBy("nation").orderBy("r", "l_suppkey")
    wn = Window.partitionBy("nation")
    ranked = rev.select(
        "nation",
        F.col("r").cast("double").alias("x"),
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return ranked.groupBy("nation").agg(
        F.max("n").cast("long").alias("n_suppliers"),
        F.round(
            F.lit(2.0)
            * F.sum(F.col("i") * F.col("x"))
            / (F.max("n") * F.sum("x"))
            - (F.max("n") + 1.0) / F.max("n"),
            6,
        ).alias("gini"),
    )

# ---------------------------------------------------------------------------
# Round 4 — warehouse analytics (TPC-H q8/q9/q14/q18 shapes)
# ---------------------------------------------------------------------------
@query(
    "promo_revenue",
    oracle="""
SELECT CAST(EXTRACT(year FROM l_shipdate) AS INT) AS year,
       CAST(EXTRACT(month FROM l_shipdate) AS INT) AS month,
       CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         AS promo_revenue,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS total_revenue,
       ROUND(100.0
             * CAST(SUM(CASE WHEN p_type = 'PROMO'
                             THEN CAST(l_extendedprice AS DECIMAL(18,2))
                                  * (1 - CAST(l_discount AS DECIMAL(18,2)))
                             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2))))
                    AS DOUBLE), 6) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1, 2
""",
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style promotion-revenue share per ship month: fraction of
    discounted revenue on PROMO-type parts. One broadcast dim join +
    map-side-combinable DECIMAL sums (exact, order-independent); the
    percentage is a single division of two exact sums."""
    from pyspark_graph_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(
        load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    )
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    price = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", price).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    out = (
        li.join(p, li.l_partkey == F.col("p_partkey"))
        .groupBy(
            F.year("l_shipdate").alias("year"),
            F.month("l_shipdate").alias("month"),
        )
        .agg(
            F.sum(promo).cast("double").alias("promo_revenue"),
            F.sum(price).cast("double").alias("total_revenue"),
        )
    )
    return out.select(
        "year",
        "month",
        "promo_revenue",
        "total_revenue",
        F.round(
            F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue"), 6
        ).alias("promo_pct"),
    )

@query(
    "large_orders",
    oracle="""
WITH big AS (
    SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
    FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 200
)
SELECT o_orderkey, o_custkey, o_totalprice, sum_qty
FROM orders JOIN big ON o_orderkey = l_orderkey
""",
)
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style large-volume orders: orders whose total line
    quantity exceeds the threshold. The HAVING filter runs in the first
    aggregate (map-side combined), so the join input is already the small
    filtered set; quantities are integral so the double sum is exact."""
    from pyspark_graph_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 200)
        .select("l_orderkey", F.col("__q").cast("long").alias("sum_qty"))
    )
    return o.join(big, o.o_orderkey == big.l_orderkey).select(
        "o_orderkey", "o_custkey", "o_totalprice", "sum_qty"
    )

@query(
    "market_share",
    oracle="""
SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS year,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS asia_revenue,
       ROUND(CAST(SUM(CASE WHEN rs.r_name = 'ASIA'
                           THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(18,2))))
                    AS DOUBLE), 6) AS intra_share
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
JOIN region rc ON cn.n_regionkey = rc.r_regionkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
JOIN region rs ON sn.n_regionkey = rs.r_regionkey
WHERE rc.r_name = 'ASIA'
GROUP BY 1
""",
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style market share: per order year, the fraction of
    revenue from ASIA customers that was supplied from within ASIA.
    Every dimension (customer, supplier, nation, region) broadcasts; the
    only shuffle is the final year aggregation of exact DECIMAL sums."""
    from pyspark_graph_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = F.broadcast(
        load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_nationkey"
        )
    )
    s = F.broadcast(
        load_table(spark, sf_dir, "supplier").select(
            "s_suppkey", "s_nationkey"
        )
    )
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").select(
        "r_regionkey", "r_name"
    )
    nr = F.broadcast(
        n.join(r, n.n_regionkey == r.r_regionkey).select(
            "n_nationkey", "r_name"
        )
    )
    dec = lambda c_: F.col(c_).cast("decimal(18,2)")
    price = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            nr.withColumnRenamed("r_name", "cust_region"),
            F.col("c_nationkey") == nr.n_nationkey,
        )
        .drop("n_nationkey")
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(
            F.broadcast(nr.withColumnRenamed("r_name", "supp_region")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .filter(F.col("cust_region") == "ASIA")
    )
    intra = F.when(F.col("supp_region") == "ASIA", price).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    out = joined.groupBy(F.year("o_orderdate").alias("year")).agg(
        F.sum(price).cast("double").alias("asia_revenue"),
        F.sum(intra).cast("double").alias("__intra"),
    )
    return out.select(
        "year",
        "asia_revenue",
        F.round(F.col("__intra") / F.col("asia_revenue"), 6).alias(
            "intra_share"
        ),
    )

@query(
    "brand_revenue",
    oracle="""
SELECT sn.n_name AS nation, CAST(EXTRACT(year FROM o.o_orderdate) AS INT)
         AS year, p.p_brand AS brand,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
GROUP BY 1, 2, 3
""",
)
def q_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style product-line revenue: discounted revenue per
    (supplier nation, order year, part brand) through the 5-way star
    join. All dimensions broadcast; one shuffle on the composite group
    key; DECIMAL sums exact."""
    from pyspark_graph_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
        "l_discount",
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    p = F.broadcast(
        load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    )
    s = F.broadcast(
        load_table(spark, sf_dir, "supplier").select(
            "s_suppkey", "s_nationkey"
        )
    )
    n = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            "n_nationkey", "n_name"
        )
    )
    dec = lambda c_: F.col(c_).cast("decimal(18,2)")
    price = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("year"),
            F.col("p_brand").alias("brand"),
        )
        .agg(F.sum(price).cast("double").alias("revenue"))
    )

# ---------------------------------------------------------------------------
# Round 4, batch 4 — RFM, Q16/Q22 shapes, filter calibration, seasonality
# ---------------------------------------------------------------------------
@query(
    "rfm_segments",
    oracle="""
WITH p AS (
    SELECT user_id,
           MAX(epoch_us(ts)) AS last_us,
           CAST(COUNT(*) AS BIGINT) AS freq,
           SUM(value) AS monetary
    FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
mx AS (SELECT MAX(last_us) AS now_us FROM p),
r AS (
    SELECT user_id, (now_us - last_us) / 86400000000.0 AS rec_days,
           freq, monetary
    FROM p CROSS JOIN mx
),
med AS (
    SELECT quantile_cont(rec_days, 0.5) AS mr,
           quantile_cont(freq, 0.5) AS mf,
           quantile_cont(monetary, 0.5) AS mm
    FROM r
)
SELECT CONCAT(CASE WHEN rec_days <= mr THEN 'R' ELSE 'r' END,
              CASE WHEN freq >= mf THEN 'F' ELSE 'f' END,
              CASE WHEN monetary >= mm THEN 'M' ELSE 'm' END) AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       ROUND(AVG(monetary), 6) AS avg_monetary
FROM r CROSS JOIN med
GROUP BY 1
""",
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency/frequency/monetary) customer segmentation from the
    purchase stream: each dimension split at its corpus median (exact
    interpolated percentile, ONE broadcast singleton row — no global
    NTILE sort), users labeled into the 8 R/F/M octants. The canonical
    marketing segmentation, fully scale-safe."""
    from pyspark_graph_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max(F.unix_micros("ts")).alias("last_us"),
            F.count(F.lit(1)).alias("freq"),
            F.sum("value").alias("monetary"),
        )
    )
    mx = p.agg(F.max("last_us").alias("now_us"))
    r = p.crossJoin(F.broadcast(mx)).select(
        "user_id",
        ((F.col("now_us") - F.col("last_us")) / 86400000000.0).alias(
            "rec_days"
        ),
        "freq",
        "monetary",
    )
    med = r.agg(
        F.percentile("rec_days", F.lit(0.5)).alias("mr"),
        F.percentile("freq", F.lit(0.5)).alias("mf"),
        F.percentile("monetary", F.lit(0.5)).alias("mm"),
    )
    seg = F.concat(
        F.when(F.col("rec_days") <= F.col("mr"), "R").otherwise("r"),
        F.when(F.col("freq") >= F.col("mf"), "F").otherwise("f"),
        F.when(F.col("monetary") >= F.col("mm"), "M").otherwise("m"),
    )
    return (
        r.crossJoin(F.broadcast(med))
        .groupBy(seg.alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.avg("monetary"), 6).alias("avg_monetary"),
        )
    )

@query(
    "parts_supplier_counts",
    oracle="""
SELECT p.p_brand AS brand, p.p_type AS type, p.p_size AS size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY 1, 2, 3
""",
)
def q_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style supplier diversity per (brand, type, size): how
    many distinct suppliers actually shipped each part class. One
    broadcast dim join + a distinct-count aggregate (two-phase
    partial-distinct under the hood — map-side combined)."""
    from pyspark_graph_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    p = F.broadcast(
        load_table(spark, sf_dir, "part").select(
            "p_partkey", "p_brand", "p_type", "p_size"
        )
    )
    return (
        li.join(p, li.l_partkey == F.col("p_partkey"))
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("type"),
            F.col("p_size").alias("size"),
        )
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )

@query(
    "idle_customers",
    oracle="""
WITH avg_bal AS (SELECT AVG(c_acctbal) AS ab FROM customer
                 WHERE c_acctbal > 0),
oc AS (
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_custkey
)
SELECT c.c_nationkey AS nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
         AS total_balance
FROM customer c
CROSS JOIN avg_bal
LEFT JOIN oc ON c.c_custkey = oc.o_custkey
WHERE c.c_acctbal > avg_bal.ab AND COALESCE(oc.n_orders, 0) < 3
GROUP BY 1
""",
)
def q_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style dormant high-value accounts: customers whose
    balance exceeds the positive-balance average yet placed fewer than 3
    orders, grouped by nation. The average is a broadcast singleton; the
    order counts join is an aggregate-then-join (never orders×customers
    raw); balances sum in DECIMAL."""
    from pyspark_graph_spark.sources.tables import load_table

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    oc = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .join(oc, c.c_custkey == oc.o_custkey, "left")
        .filter(
            (F.col("c_acctbal") > F.col("ab"))
            & (F.coalesce("n_orders", F.lit(0)) < 3)
        )
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_balance"),
        )
    )

# ---------------------------------------------------------------------------
# Round 5 (cont.): TPC-H shape completion over the available schema
# ---------------------------------------------------------------------------
# The dataset has no partsupp table, no l_shipmode/p_container columns and
# no commit/receipt dates, so Q2/Q11/Q12/Q20 have no faithful analogue;
# the remaining classic shapes are covered below (Q6, Q7, Q15, Q17, Q19,
# Q21 — adapted where a missing column forces it, noted per query).
@query(
    "forecast_revenue",
    oracle="""
SELECT CAST(COALESCE(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                         * CAST(l_discount AS DECIMAL(18,2))), 0)
            AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shape forecast revenue change: one scan, every predicate
    (date range, discount band, quantity cap) pushed to the parquet
    reader, one DECIMAL-exact map-side-combined sum. The plan should be
    scan -> partial agg -> single-row exchange -> final agg and nothing
    else — the canonical predicate-pushdown probe."""
    from pyspark_graph_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return li.agg(
        F.coalesce(
            F.sum(dec("l_extendedprice") * dec("l_discount")).cast(
                "double"
            ),
            F.lit(0.0),
        ).alias("revenue")
    )

@query(
    "volume_shipping",
    oracle="""
WITH flow AS (
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS year,
           CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation nc ON c.c_nationkey = nc.n_nationkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns ON s.s_nationkey = ns.n_nationkey
    WHERE (ns.n_name = 'NATION_3' AND nc.n_name = 'NATION_7')
       OR (ns.n_name = 'NATION_7' AND nc.n_name = 'NATION_3')
)
SELECT supp_nation, cust_nation, year,
       CAST(SUM(volume) AS DOUBLE) AS revenue
FROM flow GROUP BY 1, 2, 3
""",
)
def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shape bilateral shipping volume between two nations by
    ship year. Nation filters are applied INSIDE the supplier/customer
    dimensions before any fact join, so the broadcast hash joins
    semi-prune lineitem and orders down to the two trading nations'
    rows; the only fact-fact shuffle is lineitem-orders on the order
    key. Supplier and nation broadcast outright; the nation-filtered
    customer side joins by shuffle — the correct shape when the
    customer dimension itself is large."""
    from pyspark_graph_spark.sources.tables import load_table

    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nat),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cus = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(nat),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        "l_shipdate",
        "l_extendedprice",
        "l_discount",
    )
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    flow = (
        li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cus, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return flow.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("int").alias("year"),
    ).agg(
        F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
        .cast("double")
        .alias("revenue")
    )

@query(
    "top_supplier",
    oracle="""
WITH rev AS (
    SELECT l_suppkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY 1
)
SELECT s.s_suppkey AS suppkey, s.s_name AS name, r.total_revenue
FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
""",
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shape top supplier for Q1-1996: per-supplier revenue
    aggregate, then an equality join against the broadcast one-row max
    (the scalar-subquery shape). Revenue is summed in DECIMAL, so both
    engines produce bit-identical doubles and the equality match on the
    max cannot be split by FP summation order. Ties all surface."""
    from pyspark_graph_spark.sources.tables import load_table

    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    rev = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("__mx"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("name"),
            "total_revenue",
        )
    )

@query(
    "small_qty_revenue",
    oracle="""
WITH tp AS (
    SELECT p_partkey FROM part
    WHERE p_brand = 'Brand#23' AND p_size <= 5
),
tl AS (
    SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
    FROM lineitem l JOIN tp ON l.l_partkey = tp.p_partkey
),
pa AS (SELECT l_partkey, AVG(l_quantity) AS aq FROM tl GROUP BY 1)
SELECT CAST(CAST(COALESCE(SUM(CAST(t.l_extendedprice AS DECIMAL(18,2))), 0)
                 AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
FROM tl t JOIN pa ON t.l_partkey = pa.l_partkey
WHERE t.l_quantity < 0.2 * pa.aq
""",
)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shape small-quantity-order revenue: for one brand's
    small parts (p_size stands in for the absent container column),
    lineitems below 20% of that part's average quantity, summed and
    divided by 7 years. The correlated AVG subquery becomes a per-part
    aggregate broadcast back onto the same filtered fact slice — the
    fact table is scanned once, the brand filter prunes it via the
    broadcast part join before any aggregation. AVG over integer-valued
    quantities is exact in double (sums < 2^53), so the 0.2-threshold
    comparison cannot diverge between engines."""
    from pyspark_graph_spark.sources.tables import load_table

    tp = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#23") & (F.col("p_size") <= 5))
        .select("p_partkey")
    )
    tl = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(F.broadcast(tp), F.col("l_partkey") == F.col("p_partkey"))
        .drop("p_partkey")
        .localCheckpoint()
    )
    pa = tl.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.avg("l_quantity").alias("aq")
    )
    hits = tl.join(
        F.broadcast(pa),
        (F.col("l_partkey") == F.col("__pk"))
        & (F.col("l_quantity") < F.lit(0.2) * F.col("aq")),
    )
    return hits.agg(
        (
            F.coalesce(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast(
                    "double"
                ),
                F.lit(0.0),
            )
            / F.lit(7.0)
        )
        .cast("double")
        .alias("avg_yearly")
    )

@query(
    "special_revenue",
    oracle="""
SELECT CAST(COALESCE(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 0)
            AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#3'
       AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#13'
       AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#24'
       AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def q_special_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shape disjunctive-predicate revenue: three brand/size/
    quantity bands OR-ed together (size stands in for the absent
    container column) over the part-lineitem broadcast join. Catalyst
    pushes the common part of each disjunct (the brand membership) into
    the dimension scan and evaluates the residual OR-of-ANDs inside the
    join — the classic test that disjunctions don't force a fallback to
    a nested-loop plan."""
    from pyspark_graph_spark.sources.tables import load_table

    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    band = (
        (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#24")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    hits = li.join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")
    ).filter(band)
    return hits.agg(
        F.coalesce(
            F.sum(
                dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
            ).cast("double"),
            F.lit(0.0),
        ).alias("revenue")
    )

@query(
    "waiting_suppliers",
    oracle="""
WITH fo AS (
    SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderstatus = 'F'
),
ll AS (
    SELECT DISTINCT l.l_orderkey, l.l_suppkey
    FROM lineitem l JOIN fo ON l.l_orderkey = fo.o_orderkey
    WHERE l.l_shipdate > fo.o_orderdate + INTERVAL 60 DAY
),
la AS (
    SELECT DISTINCT l.l_orderkey, l.l_suppkey
    FROM lineitem l JOIN fo ON l.l_orderkey = fo.o_orderkey
)
SELECT s.s_name AS name, COUNT(*) AS numwait
FROM ll l1 JOIN supplier s ON l1.l_suppkey = s.s_suppkey
WHERE EXISTS (
        SELECT 1 FROM la l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
        SELECT 1 FROM ll l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY 1
ORDER BY numwait DESC, name
LIMIT 20
""",
)
def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shape suppliers who kept orders waiting: in finished
    ('F') multi-supplier orders, the supplier who shipped more than 60
    days after the order date while every OTHER supplier shipped on
    time (lateness is ship-vs-order since the dataset has no commit/
    receipt dates). The EXISTS becomes a LEFT SEMI and the NOT EXISTS a
    LEFT ANTI join, both shuffled on the order key with the suppkey
    inequality as a residual — no correlated re-scan of the fact table.
    Top-20 by (numwait, name) is deterministic because names are
    unique."""
    from pyspark_graph_spark.sources.tables import load_table

    fo = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    base = li.join(
        fo.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    late = (
        base.filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .localCheckpoint()
    )
    allsup = base.select("l_orderkey", "l_suppkey").distinct()
    l1 = late.alias("l1")
    l2 = allsup.alias("l2")
    l3 = late.alias("l3")
    waiting = (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "semi",
        )
        .alias("l1")
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "anti",
        )
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        waiting.join(
            F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy(F.col("s_name").alias("name"))
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("name"))
        .limit(20)
    )

# ---------------------------------------------------------------------------
# Round 5 (cont.): TPC-H shape closure — Q2 / Q11 / Q12 / Q13 / Q20
# ---------------------------------------------------------------------------
# The dataset has no partsupp table, so the part-supplier relation for the
# Q2/Q11/Q20 shapes derives from lineitem (unit cost = min observed
# extendedprice/quantity per part-supplier pair); the relational SHAPES —
# correlated-min subquery, global-scalar HAVING, conditional counting,
# left-outer count distribution, nested aggregate-threshold semi-join —
# are preserved exactly.
@query(
    "min_cost_supplier",
    oracle="""
WITH eu AS (
    SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE'
),
tp AS (
    SELECT p_partkey, p_brand FROM part
    WHERE p_type = 'ECONOMY' AND p_size BETWEEN 10 AND 20
),
offers AS (
    SELECT l.l_partkey, l.l_suppkey,
           MIN(CAST(l.l_extendedprice AS DOUBLE)
               / CAST(l.l_quantity AS DOUBLE)) AS unit_cost
    FROM lineitem l
    JOIN tp ON l.l_partkey = tp.p_partkey
    JOIN eu ON l.l_suppkey = eu.s_suppkey
    GROUP BY 1, 2
),
best AS (
    SELECT *, MIN(unit_cost) OVER (PARTITION BY l_partkey) AS best_cost
    FROM offers
)
SELECT CAST(eu.s_acctbal AS DOUBLE) AS acctbal,
       eu.s_name AS name, eu.n_name AS nation,
       b.l_partkey AS partkey, tp.p_brand AS brand,
       b.unit_cost AS unit_cost
FROM best b
JOIN eu ON b.l_suppkey = eu.s_suppkey
JOIN tp ON b.l_partkey = tp.p_partkey
WHERE b.unit_cost = b.best_cost
ORDER BY acctbal DESC, nation, name, partkey
LIMIT 100
""",
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shape minimum-cost supplier: for each mid-size ECONOMY
    part, the EUROPE supplier(s) whose observed unit cost (min
    extendedprice/quantity over their lineitems — the partsupp stand-in)
    equals the per-part minimum. The correlated MIN subquery of the
    original becomes a window min over the per-pair aggregate: one
    shuffle keyed (partkey, suppkey) for the pair aggregate, then the
    partkey-partitioned window rides the same hash without a second
    fact-table scan. Dimension sides (EUROPE suppliers, filtered parts)
    broadcast; unit cost divides in DOUBLE on both engines so the
    min-equality filter cannot diverge. Top-100 ordering is
    deterministic: (name, partkey) is unique."""
    from pyspark_graph_spark.sources.tables import load_table

    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    eu = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    tp = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "ECONOMY") & F.col("p_size").between(10, 20)
    ).select("p_partkey", "p_brand")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    offers = (
        li.join(F.broadcast(tp), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(eu.select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(
                F.col("l_extendedprice").cast("double")
                / F.col("l_quantity").cast("double")
            ).alias("unit_cost")
        )
    )
    w = Window.partitionBy("l_partkey")
    best = offers.withColumn("best_cost", F.min("unit_cost").over(w)).filter(
        F.col("unit_cost") == F.col("best_cost")
    )
    return (
        best.join(
            F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .join(F.broadcast(tp), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.col("s_acctbal").cast("double").alias("acctbal"),
            F.col("s_name").alias("name"),
            F.col("n_name").alias("nation"),
            F.col("l_partkey").alias("partkey"),
            F.col("p_brand").alias("brand"),
            "unit_cost",
        )
        .orderBy(
            F.desc("acctbal"), F.asc("nation"), F.asc("name"), F.asc("partkey")
        )
        .limit(100)
    )

@query(
    "important_parts",
    oracle="""
WITH sl AS (
    SELECT s_suppkey FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_7'
),
pv AS (
    SELECT l.l_partkey,
           SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS val
    FROM lineitem l JOIN sl ON l.l_suppkey = sl.s_suppkey
    GROUP BY 1
),
tot AS (SELECT SUM(val) AS total FROM pv)
SELECT pv.l_partkey AS partkey, CAST(pv.val AS DOUBLE) AS part_value
FROM pv CROSS JOIN tot
WHERE CAST(pv.val AS DOUBLE) > CAST(tot.total AS DOUBLE) * 0.001
ORDER BY part_value DESC, partkey
""",
)
def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shape important stock: per-part traded value through
    one nation's suppliers, kept only where it exceeds 0.1% of that
    nation's total — the HAVING-against-a-scalar-subquery shape. The
    scalar total is a no-grouping-key aggregate broadcast as a provably
    1-row build side (the plan-audit-clean singleton BNLJ shape); the
    per-part aggregate shuffles once on partkey. Value sums run in
    DECIMAL, the threshold compares in DOUBLE on both engines. Result
    is self-bounded: at most 1000 parts can each exceed 0.1% of the
    total."""
    from pyspark_graph_spark.sources.tables import load_table

    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_7"
    )
    sl = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    pv = (
        li.join(F.broadcast(sl), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(
                dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
            ).alias("val")
        )
    )
    tot = pv.agg(F.sum("val").alias("total"))
    return (
        pv.crossJoin(F.broadcast(tot))
        .filter(
            F.col("val").cast("double")
            > F.col("total").cast("double") * F.lit(0.001)
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("val").cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), F.asc("partkey"))
    )

@query(
    "priority_line_counts",
    oracle="""
SELECT l.l_returnflag AS returnflag,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1
""",
)
def q_priority_line_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shape priority counting (returnflag stands in for the
    absent shipmode column): 1997 shipments classified by whether their
    order was urgent/high priority, counted per return flag with the
    CASE-inside-SUM conditional-aggregation idiom. The shipdate range
    pushes into the lineitem scan before the one orderkey-keyed shuffle
    join; the CASE evaluates JVM-side inside whole-stage codegen."""
    from pyspark_graph_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_returnflag")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )

@query(
    "customer_order_distribution",
    oracle="""
WITH co AS (
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey
     AND o.o_orderpriority <> '4-NOT SPECIFIED'
    GROUP BY 1
)
SELECT c_count, COUNT(*) AS custdist
FROM co GROUP BY 1
ORDER BY custdist DESC, c_count DESC
""",
)
def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shape customer order-count distribution: orders per
    customer counting only specified-priority orders (the stand-in for
    Q13's comment NOT-LIKE filter), INCLUDING zero-order customers via
    the left outer join, then the distribution of those counts. Two
    shuffles by construction (custkey join+agg, then the tiny c_count
    regroup); the priority filter lands in the orders scan, and the
    left join preserves customers no inner join could."""
    from pyspark_graph_spark.sources.tables import load_table

    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )

@query(
    "dominant_suppliers",
    oracle="""
WITH rp AS (
    SELECT p_partkey FROM part WHERE p_name LIKE 'red %'
),
asia AS (
    SELECT s.s_suppkey, s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
),
l96 AS (
    SELECT l.l_partkey, l.l_suppkey,
           CAST(l.l_quantity AS DOUBLE) AS qty
    FROM lineitem l JOIN rp ON l.l_partkey = rp.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
),
pairq AS (
    SELECT l_partkey, l_suppkey, SUM(qty) AS sq
    FROM l96 GROUP BY 1, 2
),
partq AS (
    SELECT l_partkey, SUM(sq) AS tq FROM pairq GROUP BY 1
),
dom AS (
    SELECT DISTINCT p.l_suppkey
    FROM pairq p JOIN partq t ON p.l_partkey = t.l_partkey
    WHERE p.sq > 0.5 * t.tq
)
SELECT a.s_name AS name, CAST(a.s_acctbal AS DOUBLE) AS acctbal
FROM asia a JOIN dom ON a.s_suppkey = dom.l_suppkey
ORDER BY name
""",
)
def q_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shape nested aggregate-threshold semi-join: ASIA
    suppliers who shipped more than half of some red part's total 1996
    volume. Q20's availqty-vs-half-of-shipped comparison becomes
    pair-quantity vs half of part-quantity — the same two-level
    aggregate with the inner total joined back on its grouping key.
    The part-level total re-aggregates the pair-level result (no second
    fact scan), the join-back is partkey-co-partitioned with the pair
    aggregate, and the supplier side resolves as a broadcast semi-join.
    Quantities are integer-valued, so DOUBLE sums are exact and the
    0.5-threshold cannot diverge between engines."""
    from pyspark_graph_spark.sources.tables import load_table

    rp = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("red %")
    ).select("p_partkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal")
    )
    l96 = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(rp), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "l_partkey",
            "l_suppkey",
            F.col("l_quantity").cast("double").alias("qty"),
        )
    )
    pairq = l96.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("qty").alias("sq")
    )
    partq = pairq.groupBy("l_partkey").agg(F.sum("sq").alias("tq"))
    dom = (
        pairq.join(partq, "l_partkey")
        .filter(F.col("sq") > F.lit(0.5) * F.col("tq"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        asia.join(
            F.broadcast(dom), F.col("s_suppkey") == F.col("l_suppkey"), "semi"
        )
        .select(
            F.col("s_name").alias("name"),
            F.col("s_acctbal").cast("double").alias("acctbal"),
        )
        .orderBy("name")
    )

@query(
    "skyline_parts",
    oracle="""
WITH pairs AS (
    SELECT p_size AS size, CAST(p_retailprice AS DOUBLE) AS price,
           COUNT(*) AS n_parts
    FROM part GROUP BY 1, 2
),
best AS (SELECT size, MIN(price) AS price FROM pairs GROUP BY 1),
bestc AS (
    SELECT b.size, b.price, p.n_parts
    FROM best b JOIN pairs p ON b.size = p.size AND b.price = p.price
)
SELECT size, price, n_parts FROM bestc s
WHERE NOT EXISTS (
    SELECT 1 FROM bestc o
    WHERE o.price <= s.price AND o.size >= s.size
      AND (o.price < s.price OR o.size > s.size)
)
ORDER BY size
""",
)
def q_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto frontier) of the part catalog: cheapest price per
    size class, keeping only points no other point beats on BOTH price
    (minimize) and size (maximize) — the dominance NOT EXISTS of the
    oracle without its O(n²) self-join. The operator reduces to distinct
    value pairs, prefilters each Arrow batch to its local frontier, and
    finishes with one running-min window over the tiny survivor set
    (operators/skyline.py — Börzsönyi et al. ICDE 2001 decomposition).
    n_parts counts catalog entries at the surviving (size, price) point."""
    from pyspark_graph_spark.operators.skyline import Skyline2D
    from pyspark_graph_spark.sources.tables import load_table

    parts = load_table(spark, sf_dir, "part").select(
        F.col("p_size").alias("size"),
        F.col("p_retailprice").cast("double").alias("price"),
    )
    sky = Skyline2D(
        "size", "price", minimize_x=False, minimize_y=True
    ).run(parts)
    return sky.select(
        "size", "price", F.col("n_rows").alias("n_parts")
    ).orderBy("size")
