import math

import pytest
from pyspark.sql import functions as F

from pyspark_graph_spark import Graph
from pyspark_graph_spark.operators import KatzIndex, ShortestPaths
from tests.fixtures import labelled, two_components


def chain_graph(spark, n=6, directed=True):
    v = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    e = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], ["src", "dst"])
    return Graph(v, e, directed=directed, indexed=True)


# ------------------------------------------------------- shortest paths


def test_sp_directed_chain(spark):
    # edges i -> i+1; distance to landmark 5 follows edge direction
    g = chain_graph(spark, 6, directed=True)
    out = {
        (r["id"], r["landmark"]): r["distance"]
        for r in ShortestPaths([5]).run_exploded(g).collect()
    }
    assert out == {(i, 5): 5 - i for i in range(6)}


def test_sp_directed_unreachable(spark):
    g = chain_graph(spark, 4, directed=True)
    # landmark 0: nothing reaches it except itself (edges point away)
    out = {
        (r["id"], r["landmark"]): r["distance"]
        for r in ShortestPaths([0]).run_exploded(g).collect()
    }
    assert out == {(0, 0): 0}


def test_sp_undirected_multiple_landmarks(spark):
    g = chain_graph(spark, 5, directed=False)
    out = {
        (r["id"], r["landmark"]): r["distance"]
        for r in ShortestPaths([0, 4]).run_exploded(g).collect()
    }
    assert out[(2, 0)] == 2 and out[(2, 4)] == 2
    assert out[(3, 0)] == 3 and out[(3, 4)] == 1
    assert len(out) == 10


def test_sp_max_iterations_truncates(spark):
    g = chain_graph(spark, 8, directed=False)
    out = {
        (r["id"], r["landmark"]): r["distance"]
        for r in ShortestPaths([0], max_iterations=3).run_exploded(g).collect()
    }
    assert max(out.values()) == 3
    assert (7, 0) not in out


def test_sp_disconnected_components(spark):
    g = two_components(spark, directed=False)
    # landmark = surrogate id of vertex 'a'
    a_id = g.vertices.filter(F.col("old_id") == "a").first()["id"]
    rows = ShortestPaths([a_id]).run_exploded(g).collect()
    reached = {r["id"] for r in rows}
    abc = {
        r["id"]
        for r in g.vertices.filter(F.col("old_id").isin("a", "b", "c")).collect()
    }
    assert reached == abc


def test_sp_landmarks_as_dataframe(spark):
    g = chain_graph(spark, 4, directed=False)
    lm = spark.createDataFrame([(0,)], ["id"])
    out = ShortestPaths(lm).run_exploded(g)
    assert out.count() == 4


# ----------------------------------------------------------------- Katz


def test_katz_single_edge_directed(spark):
    v = spark.createDataFrame([(0,), (1,)], ["id"])
    e = spark.createDataFrame([(0, 1)], ["src", "dst"])
    g = Graph(v, e, indexed=True)
    out = {(r["src"], r["dst"]): r["katz_index"] for r in KatzIndex(beta=0.125, max_iterations=3).run(g).collect()}
    # only one walk: 0->1 length 1
    assert out == {(0, 1): 0.125}


def test_katz_undirected_pair_series(spark):
    # single undirected edge: walks alternate endpoints
    v = spark.createDataFrame([(0,), (1,)], ["id"])
    e = spark.createDataFrame([(0, 1)], ["src", "dst"])
    g = Graph(v, e, directed=False, indexed=True)
    out = {
        (r["src"], r["dst"]): r["katz_index"]
        for r in KatzIndex(beta=0.5, max_iterations=3).run(g).collect()
    }
    # walks 0->1: length 1 (1 walk) + length 3 (1 walk): 0.5 + 0.125
    assert out[(0, 1)] == pytest.approx(0.625)
    # closed walks 0->0: length 2 only: 0.25
    assert out[(0, 0)] == pytest.approx(0.25)


def test_katz_triangle_walk_counts(spark):
    v = spark.createDataFrame([(i,) for i in range(3)], ["id"])
    e = spark.createDataFrame([(0, 1), (1, 2), (0, 2)], ["src", "dst"])
    g = Graph(v, e, directed=False, indexed=True)
    beta = 0.125
    out = {
        (r["src"], r["dst"]): r["katz_index"]
        for r in KatzIndex(beta=beta, max_iterations=2).run(g).collect()
    }
    # pair (0,1): 1 walk len1, 1 walk len2 (0-2-1)
    assert out[(0, 1)] == pytest.approx(beta + beta**2)
    # diagonal (0,0): 2 closed walks of len 2
    assert out[(0, 0)] == pytest.approx(2 * beta**2)


def test_katz_tolerance_early_stop(spark):
    g = chain_graph(spark, 4, directed=False)
    full = KatzIndex(beta=0.125, max_iterations=6).run(g)
    stopped = KatzIndex(beta=0.125, tolerance=1.0, max_iterations=6).run(g)
    # tolerance=1.0 halts after the k=2 term (beta^2*max < 1)
    assert stopped.agg(F.max("katz_index")).first()[0] <= full.agg(
        F.max("katz_index")
    ).first()[0]
    assert stopped.count() > 0
