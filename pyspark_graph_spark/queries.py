"""Driver-facing query registry: Spark queries + matching DuckDB oracle SQL.

Each registered query is a ``(spark, sf_dir) -> DataFrame`` callable; the
oracle is the ANSI-SQL equivalent DuckDB runs over the same parquet tables
(pre-registered views: region nation customer supplier part orders lineitem
events documents embeddings). Column names and types are aligned on both
sides — the driver sorts columns by name and value-hashes.

Shared SQL fragments mirror the graph builders in ``sources/tables.py`` so the
Spark plan and the oracle operate on the identical graph.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_graph_spark.constants import ADJ, DEGREE, ID, IN_DEGREE, OUT_DEGREE
from pyspark_graph_spark.datalog import DatalogQuery, Edge, Vertex
from pyspark_graph_spark.operators.similarity import (
    JaccardSimilarity,
    OverlapCoefficient,
)
from pyspark_graph_spark.operators.triangle_count import TriangleCount
from pyspark_graph_spark.sources.tables import (
    customer_supplier_graph,
    nation_graph,
    supplier_co_occurrence_graph,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Shared SQL fragments (must mirror sources/tables.py builders exactly)
# ---------------------------------------------------------------------------

# supplier co-occurrence edges: src < dst suppliers sharing an order
SUPPLIER_EDGES_CTE = """
supplier_pairs AS (
    SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
),
supplier_edges AS (
    SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
    FROM supplier_pairs a
    JOIN supplier_pairs b
      ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
),
supplier_sym AS (
    SELECT src, dst FROM supplier_edges
    UNION ALL
    SELECT dst AS src, src AS dst FROM supplier_edges
)
"""

# customer->supplier bipartite edges in the disjoint 2k / 2k+1 id space
BIPARTITE_EDGES_CTE = """
bipartite_edges AS (
    SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
)
"""

# nation graph: pairs sharing a region, canonical order
NATION_EDGES_CTE = """
nation_edges AS (
    SELECT CAST(a.n_nationkey AS BIGINT) AS src,
           CAST(b.n_nationkey AS BIGINT) AS dst
    FROM nation a
    JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
),
nation_sym AS (
    SELECT src, dst FROM nation_edges
    UNION ALL
    SELECT dst AS src, src AS dst FROM nation_edges
)
"""


# ---------------------------------------------------------------------------
# M0 — core data model views
# ---------------------------------------------------------------------------


@query(
    "degrees",
    oracle=f"""
WITH {SUPPLIER_EDGES_CTE.strip()},
deg AS (
    SELECT src AS id, COUNT(DISTINCT dst) AS degree
    FROM supplier_sym GROUP BY src
)
SELECT s.s_suppkey AS id, CAST(COALESCE(deg.degree, 0) AS BIGINT) AS degree
FROM supplier s LEFT JOIN deg ON s.s_suppkey = deg.id
""",
)
def q_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected degrees (distinct neighbors) on the supplier co-occurrence
    graph; isolated suppliers included with degree 0."""
    g = supplier_co_occurrence_graph(spark, sf_dir)
    return g.degrees.select(ID, F.col(DEGREE).cast("long").alias(DEGREE))


@query(
    "out_degrees",
    oracle=f"""
WITH {BIPARTITE_EDGES_CTE.strip()}
SELECT src AS id, COUNT(*) AS out_degree
FROM bipartite_edges GROUP BY src
""",
)
def q_out_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = customer_supplier_graph(spark, sf_dir)
    return g.out_degrees


@query(
    "in_degrees",
    oracle=f"""
WITH {BIPARTITE_EDGES_CTE.strip()}
SELECT dst AS id, COUNT(*) AS in_degree
FROM bipartite_edges GROUP BY dst
""",
)
def q_in_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = customer_supplier_graph(spark, sf_dir)
    return g.in_degrees


@query(
    "adjacency",
    oracle=f"""
WITH {NATION_EDGES_CTE.strip()},
adj AS (
    SELECT src AS id, list_sort(list(DISTINCT dst)) AS adjacent
    FROM nation_sym GROUP BY src
)
SELECT CAST(n.n_nationkey AS BIGINT) AS id,
       COALESCE(adj.adjacent, CAST([] AS BIGINT[])) AS adjacent
FROM nation n LEFT JOIN adj ON n.n_nationkey = adj.id
""",
)
def q_adjacency(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = nation_graph(spark, sf_dir)
    return g.adjacency.select(ID, F.col(ADJ).cast("array<long>").alias(ADJ))


@query(
    "triplets",
    oracle=f"""
WITH {NATION_EDGES_CTE.strip()}
SELECT e.src, e.dst, a.n_name AS src_name, b.n_name AS dst_name
FROM nation_edges e
JOIN nation a ON e.src = a.n_nationkey
JOIN nation b ON e.dst = b.n_nationkey
""",
)
def q_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = nation_graph(spark, sf_dir)
    return g.triplets().select(
        "src",
        "dst",
        F.col("src_n_name").alias("src_name"),
        F.col("dst_n_name").alias("dst_name"),
    )


@query(
    "degree_topk",
    oracle=f"""
WITH {SUPPLIER_EDGES_CTE.strip()},
deg AS (
    SELECT src AS id, COUNT(DISTINCT dst) AS degree
    FROM supplier_sym GROUP BY src
)
SELECT id, CAST(degree AS BIGINT) AS degree
FROM deg ORDER BY degree DESC, id ASC LIMIT 20
""",
)
def q_degree_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship M0 query: top-20 most-connected suppliers by co-occurrence
    degree. Deterministic tie-break on id."""
    g = supplier_co_occurrence_graph(spark, sf_dir)
    return (
        g.degrees.filter(F.col(DEGREE) > 0)
        .select(ID, F.col(DEGREE).cast("long").alias(DEGREE))
        .orderBy(F.desc(DEGREE), F.asc(ID))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# M1 — one-shot operators: triangle count, similarity, datalog
# ---------------------------------------------------------------------------


@query(
    "triangle_count",
    oracle=f"""
WITH {SUPPLIER_EDGES_CTE.strip()}
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM supplier_edges e1
JOIN supplier_edges e2 ON e1.dst = e2.src
JOIN supplier_edges e3 ON e1.src = e3.src AND e2.dst = e3.dst
""",
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangles in the supplier co-occurrence graph (single-row count)."""
    g = supplier_co_occurrence_graph(spark, sf_dir)
    return TriangleCount().triangles(g).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


@query(
    "jaccard",
    oracle=f"""
WITH {NATION_EDGES_CTE.strip()},
deg AS (
    SELECT src AS id, COUNT(DISTINCT dst) AS d FROM nation_sym GROUP BY src
),
common AS (
    SELECT a.src AS src, b.src AS dst, COUNT(*) AS common
    FROM nation_sym a
    JOIN nation_sym b ON a.dst = b.dst AND a.src < b.src
    GROUP BY a.src, b.src
)
SELECT c.src, c.dst,
       c.common * 1.0 / (da.d + db.d - c.common) AS jaccard
FROM common c
JOIN deg da ON c.src = da.id
JOIN deg db ON c.dst = db.id
""",
)
def q_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard neighbor similarity on the nation graph (pairs sharing ≥1
    neighbor, canonical src<dst)."""
    g = nation_graph(spark, sf_dir)
    return JaccardSimilarity().run(g)


@query(
    "overlap",
    oracle=f"""
WITH {NATION_EDGES_CTE.strip()},
deg AS (
    SELECT src AS id, COUNT(DISTINCT dst) AS d FROM nation_sym GROUP BY src
),
common AS (
    SELECT a.src AS src, b.src AS dst, COUNT(*) AS common
    FROM nation_sym a
    JOIN nation_sym b ON a.dst = b.dst AND a.src < b.src
    GROUP BY a.src, b.src
)
SELECT c.src, c.dst,
       c.common * 1.0 / LEAST(da.d, db.d) AS overlap
FROM common c
JOIN deg da ON c.src = da.id
JOIN deg db ON c.dst = db.id
""",
)
def q_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = nation_graph(spark, sf_dir)
    return OverlapCoefficient().run(g)


@query(
    "jaccard_suppliers",
    oracle=f"""
WITH {SUPPLIER_EDGES_CTE.strip()},
deg AS (
    SELECT src AS id, COUNT(DISTINCT dst) AS d FROM supplier_sym GROUP BY src
),
common AS (
    SELECT a.src AS src, b.src AS dst, COUNT(*) AS common
    FROM supplier_sym a
    JOIN supplier_sym b ON a.dst = b.dst AND a.src < b.src
    GROUP BY a.src, b.src
)
SELECT c.src, c.dst,
       c.common * 1.0 / (da.d + db.d - c.common) AS jaccard
FROM common c
JOIN deg da ON c.src = da.id
JOIN deg db ON c.dst = db.id
WHERE c.common * 1.0 / (da.d + db.d - c.common) >= 0.5
""",
)
def q_jaccard_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard at supplier-graph scale with a similarity threshold."""
    g = supplier_co_occurrence_graph(spark, sf_dir)
    return JaccardSimilarity(min_similarity=0.5).run(g)


@query(
    "datalog_non_adjacent",
    oracle=f"""
WITH {BIPARTITE_EDGES_CTE.strip()}
SELECT c.c_custkey * 2 AS a, s.s_suppkey * 2 + 1 AS b
FROM customer c
JOIN supplier s ON c.c_nationkey = s.s_nationkey
WHERE NOT EXISTS (
    SELECT 1 FROM bipartite_edges e
    WHERE e.src = c.c_custkey * 2 AND e.dst = s.s_suppkey * 2 + 1
)
""",
)
def q_datalog_non_adjacent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datalog with negation: same-nation (customer, supplier) pairs where
    the customer never bought from the supplier."""
    g = customer_supplier_graph(spark, sf_dir)
    q = DatalogQuery(
        projection=["a", "b"],
        premises=[
            Vertex("a", F.col("kind") == "customer", nk="nationkey"),
            Vertex("b", F.col("kind") == "supplier", nk="nationkey"),
        ],
        negated_premises=[Edge("a", "b")],
    )
    return q.apply(g)


@query(
    "datalog_triangles",
    oracle=f"""
WITH {SUPPLIER_EDGES_CTE.strip()}
SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
FROM supplier_edges e1
JOIN supplier_edges e2 ON e1.dst = e2.src
JOIN supplier_edges e3 ON e1.src = e3.src AND e2.dst = e3.dst
JOIN supplier s ON s.s_suppkey = e1.src
WHERE s.s_nationkey < 13
""",
)
def q_datalog_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datalog motif: triangles whose lowest vertex is a sub-13-nation
    supplier (vertex condition + 3 edge premises)."""
    g = supplier_co_occurrence_graph(spark, sf_dir)
    q = DatalogQuery(
        projection=["a", "b", "c"],
        premises=[
            Vertex("a", F.col("s_nationkey") < 13),
            Edge("a", "b"),
            Edge("b", "c"),
            Edge("a", "c"),
        ],
    )
    return q.apply(g)


# ---------------------------------------------------------------------------
# M2 — iterative operators: connected components, BFS, messaging
# ---------------------------------------------------------------------------

_CC_ORACLE = f"""
WITH RECURSIVE {BIPARTITE_EDGES_CTE.strip()},
bipartite_sym AS (
    SELECT src, dst FROM bipartite_edges
    UNION ALL
    SELECT dst AS src, src AS dst FROM bipartite_edges
),
verts AS (
    SELECT c_custkey * 2 AS id FROM customer
    UNION
    SELECT s_suppkey * 2 + 1 AS id FROM supplier
),
reach(id, r) AS (
    SELECT id, id FROM verts
    UNION
    SELECT e.dst, reach.r
    FROM reach JOIN bipartite_sym e ON e.src = reach.id
)
SELECT id, MIN(r) AS component FROM reach GROUP BY id
"""


@query("connected_components", oracle=_CC_ORACLE)
def q_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weakly connected components of the customer-supplier graph via the
    O(log n)-round alternating large-star/small-star algorithm."""
    from pyspark_graph_spark.operators import AlternatingConnectedComponents

    g = customer_supplier_graph(spark, sf_dir)
    return AlternatingConnectedComponents().run(g)


@query("connected_components_pregel", oracle=_CC_ORACLE)
def q_connected_components_pregel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same result via Pregel min-label propagation (diameter-bound rounds)."""
    from pyspark_graph_spark.operators import ConnectedComponents

    g = customer_supplier_graph(spark, sf_dir)
    return ConnectedComponents(max_iterations=30).run(g)


@query(
    "bfs",
    oracle=f"""
WITH {BIPARTITE_EDGES_CTE.strip()}
SELECT CAST(2 AS BIGINT) AS start_id, e.dst AS end_id,
       [CAST(2 AS BIGINT), e.dst] AS vertices
FROM bipartite_edges e WHERE e.src = 2
""",
)
def q_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS from customer #1 to any supplier (depth-1 paths with vertex
    arrays; edge-id arrays projected out for oracle comparability)."""
    from pyspark_graph_spark.operators import BreadthFirstSearch

    g = customer_supplier_graph(spark, sf_dir)
    bfs = BreadthFirstSearch(
        (F.col("kind") == "customer") & (F.col(ID) == 2),
        F.col("kind") == "supplier",
    )
    return bfs.run(g).select(
        F.col("start").alias("start_id"),
        F.col("end").alias("end_id"),
        "vertices",
    )


@query(
    "aggregate_messages",
    oracle=f"""
WITH {SUPPLIER_EDGES_CTE.strip()}
SELECT e.src AS id, CAST(SUM(sup.s_nationkey) AS BIGINT) AS msg
FROM supplier_sym e JOIN supplier sup ON sup.s_suppkey = e.dst
GROUP BY e.src
""",
)
def q_aggregate_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One round of triplet messaging: per supplier, the sum of its
    co-occurrence neighbors' nation keys."""
    from pyspark_graph_spark.operators import AggregateMessages

    g = supplier_co_occurrence_graph(spark, sf_dir)
    am = AggregateMessages(
        agg=F.sum("msg").cast("long"),
        to_dst=F.col("src_s_nationkey"),
        to_src=F.col("dst_s_nationkey"),
    )
    return am.run(g)


@query("label_propagation")  # iterative mode fixpoint: rows-only check
def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark_graph_spark.operators import LabelPropagation

    g = supplier_co_occurrence_graph(spark, sf_dir)
    return LabelPropagation(max_iterations=5).run(g)


@query("wl_kernel")  # iterated hashing: rows-only check
def q_wl_kernel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark_graph_spark.operators import WLKernel

    g = nation_graph(spark, sf_dir)
    h = WLKernel().run(g)
    return spark.createDataFrame([(h,)], "graph_hash string")


# ---------------------------------------------------------------------------
# M3 — shortest paths (landmarks) and Katz index
# ---------------------------------------------------------------------------


@query(
    "shortest_paths",
    oracle=f"""
WITH RECURSIVE {BIPARTITE_EDGES_CTE.strip()},
bipartite_sym AS (
    SELECT src, dst FROM bipartite_edges
    UNION ALL
    SELECT dst AS src, src AS dst FROM bipartite_edges
),
lm(id) AS (
    SELECT CAST(2 AS BIGINT) UNION ALL SELECT 3 UNION ALL SELECT 5
),
walk(id, landmark, d) AS (
    SELECT id, id, 0 FROM lm
    UNION
    SELECT e.src, walk.landmark, walk.d + 1
    FROM walk JOIN bipartite_sym e ON e.dst = walk.id
    WHERE walk.d < 15
)
SELECT id, landmark, CAST(MIN(d) AS INTEGER) AS distance
FROM walk GROUP BY id, landmark
""",
)
def q_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop distances from every vertex to landmarks {customer #1,
    supplier #1, supplier #2} on the undirected customer-supplier graph,
    exploded to (id, landmark, distance) rows."""
    from pyspark_graph_spark.operators import ShortestPaths

    g = customer_supplier_graph(spark, sf_dir, directed=False)
    return ShortestPaths([2, 3, 5], max_iterations=15).run_exploded(g)


@query(
    "katz",
    oracle=f"""
WITH RECURSIVE {NATION_EDGES_CTE.strip()},
walks(src, dst, k) AS (
    SELECT src, dst, 1 FROM nation_sym
    UNION ALL
    SELECT w.src, e.dst, w.k + 1
    FROM walks w JOIN nation_sym e ON w.dst = e.src
    WHERE w.k < 3
)
SELECT src, dst, SUM(POWER(0.125, k)) AS katz_index
FROM walks GROUP BY src, dst
""",
)
def q_katz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated Katz index (beta=1/8, K=3) on the nation graph. Dyadic
    beta makes every partial sum exact, so values are bit-comparable."""
    from pyspark_graph_spark.operators import KatzIndex

    g = nation_graph(spark, sf_dir)
    return KatzIndex(beta=0.125, max_iterations=3).run(g)
