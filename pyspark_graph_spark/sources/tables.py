"""Parquet sources and graph fixtures over the TPC-H-ish synthetic tables.

The reference has no sources of its own — callers supply DataFrames
(reference graph.py:21-22). Our engine reads parquet (columnar, pushdown- and
pruning-friendly); the builders below derive graphs that are definable in both
PySpark and ANSI SQL, so every graph operator gets a DuckDB oracle
(FIXTURES.md §B).

All builders return graphs with ``indexed=True`` over natural LONG keys, so
the id space is identical between the Spark plan and the SQL oracle.

Scale notes: the co-occurrence self-join shuffles lineitem once on
``l_orderkey`` (its natural key — at 100 TB, bucketing lineitem by orderkey
makes this shuffle-free); the per-order neighbor lists are bounded by order
size (TPC-H ≤ 7 lines/order), so the pair expansion is linear, not quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_graph_spark.constants import DST, ID, SRC
from pyspark_graph_spark.graph import Graph

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS). Spark versions that cannot
        # read nanos natively need spark.sql.legacy.parquet.nanosAsLong and a
        # manual rebuild to a microsecond timestamp; newer Spark reads nanos
        # directly as TIMESTAMP_NTZ truncated to micros (exactly DuckDB's
        # behavior). Handle both by inspecting the resolved type.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        from pyspark.sql.types import LongType, TimestampNTZType

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        elif isinstance(ts_type, TimestampNTZType):
            # rebuild an epoch-based TIMESTAMP from the naive value without
            # going through the session timezone (a plain NTZ->TIMESTAMP cast
            # would shift by the session offset): microseconds since the NTZ
            # epoch is pure arithmetic, timezone-independent in any session
            df = df.withColumn(
                "ts",
                F.timestamp_micros(
                    F.expr(
                        "timestampdiff(MICROSECOND, "
                        "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
                    )
                ),
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLE_NAMES}


def supplier_co_occurrence_edges(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Distinct supplier pairs (src < dst) that ship lines of the same order.

    Canonical-ordered and self-loop-free by construction (matches
    ``order_edges`` semantics, reference util.py:35-39).

    Physical plan: one shuffle of (l_orderkey, l_suppkey) pairs, then a
    self-equi-join on the order key — per-order fan-out is bounded by lines
    per order, so output is O(E), not O(V^2).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    ).distinct()
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.l_orderkey") == F.col("b.l_orderkey"),
                F.col("a.l_suppkey") < F.col("b.l_suppkey"),
            ],
        )
        .select(
            F.col("a.l_suppkey").alias(SRC),
            F.col("b.l_suppkey").alias(DST),
        )
        .distinct()
    )


def supplier_co_occurrence_graph(
    spark: SparkSession, sf_dir: str, directed: bool = False
) -> Graph:
    """Undirected supplier graph: edge (s1, s2) iff they co-supply an order."""
    vertices = (
        load_table(spark, sf_dir, "supplier")
        .select(F.col("s_suppkey").alias(ID), "s_name", "s_nationkey")
    )
    return Graph(
        vertices,
        supplier_co_occurrence_edges(spark, sf_dir),
        directed=directed,
        indexed=True,
    )


def customer_supplier_graph(
    spark: SparkSession, sf_dir: str, directed: bool = True
) -> Graph:
    """Bipartite customer→supplier graph (directed).

    Vertex ids are made disjoint arithmetically — customer ``2*c_custkey``,
    supplier ``2*s_suppkey + 1`` — an expression both Spark and SQL can state
    identically (no hash dependency in the oracle). Edge (customer, supplier)
    iff the customer has an order with a line shipped by the supplier.
    """
    customers = load_table(spark, sf_dir, "customer").select(
        (F.col("c_custkey") * 2).alias(ID),
        F.lit("customer").alias("kind"),
        F.col("c_nationkey").alias("nationkey"),
    )
    suppliers = load_table(spark, sf_dir, "supplier").select(
        (F.col("s_suppkey") * 2 + 1).alias(ID),
        F.lit("supplier").alias("kind"),
        F.col("s_nationkey").alias("nationkey"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    edges = (
        orders.join(li, on=orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias(SRC),
            (F.col("l_suppkey") * 2 + 1).alias(DST),
        )
        .distinct()
    )
    return Graph(
        customers.unionByName(suppliers), edges, directed=directed, indexed=True
    )


def nation_graph(spark: SparkSession, sf_dir: str) -> Graph:
    """Tiny undirected graph: nation pairs sharing a region (25 vertices).

    Exact all-pairs similarity oracles are cheap here; also broadcast-join
    fodder for tests.
    """
    nation = load_table(spark, sf_dir, "nation")
    vertices = nation.select(
        F.col("n_nationkey").cast("long").alias(ID), "n_name", "n_regionkey"
    )
    a = nation.alias("a")
    b = nation.alias("b")
    edges = a.join(
        b,
        on=[
            F.col("a.n_regionkey") == F.col("b.n_regionkey"),
            F.col("a.n_nationkey") < F.col("b.n_nationkey"),
        ],
    ).select(
        F.col("a.n_nationkey").cast("long").alias(SRC),
        F.col("b.n_nationkey").cast("long").alias(DST),
    )
    return Graph(vertices, edges, directed=False, indexed=True)


def directed_trade_graph(spark: SparkSession, sf_dir: str) -> Graph:
    """Directed graph with genuine cycles for SCC-family operators.

    Same disjoint id space as :func:`customer_supplier_graph` (customer
    ``2k``, supplier ``2k+1``).  Forward edges: customer → supplier they
    ordered from.  Return edges: supplier → every 7th customer of the same
    nation (``c_custkey % 7 == 0``) — a bounded dimension product (25
    nations, 1/7 of customers) that closes customer→supplier→customer
    cycles into one large SCC plus a periphery of one-way vertices, the
    standard web-graph bowtie shape.  Every edge rule is plain integer
    arithmetic so an external SQL oracle can rebuild the graph exactly.
    """
    base = customer_supplier_graph(spark, sf_dir, directed=True)
    suppliers = load_table(spark, sf_dir, "supplier").select(
        (F.col("s_suppkey") * 2 + 1).alias(SRC),
        F.col("s_nationkey").alias("nationkey"),
    )
    customers = (
        load_table(spark, sf_dir, "customer")
        .filter((F.col("c_custkey") % 7) == 0)
        .select(
            (F.col("c_custkey") * 2).alias(DST),
            F.col("c_nationkey").alias("nationkey"),
        )
    )
    returns = suppliers.join(customers, on="nationkey").select(SRC, DST)
    edges = base.edges.select(SRC, DST).unionByName(returns).distinct()
    return Graph(base.vertices, edges, directed=True, indexed=True)
