import pytest
from pyspark.sql import functions as F

from pyspark_graph_spark import Graph
from pyspark_graph_spark.operators import (
    NeighborhoodContainment,
    WeightedShortestPaths,
    bipartite_project,
    graph_summary,
)
from tests.fixtures import labelled, two_components


def test_graph_summary(spark):
    g = labelled(spark, directed=False)
    row = graph_summary(g).first()
    assert row["n_vertices"] == 6 and row["n_edges"] == 5
    assert row["max_degree"] == 2  # vertices 1-neighbors... triangle members have 2
    assert row["avg_degree"] == pytest.approx(10 / 6)


def test_bipartite_project_src_and_dst(spark):
    v = spark.createDataFrame([(i,) for i in range(6)], ["id"])
    # bipartite: 0,1 -> 3,4,5 (customers->products)
    e = spark.createDataFrame(
        [(0, 3), (0, 4), (1, 3), (1, 5), (2, 5)], ["src", "dst"]
    )
    g = Graph(v, e, indexed=True)
    src_proj = {
        (r["src"], r["dst"]): r["weight"]
        for r in bipartite_project(g, "src").collect()
    }
    assert src_proj == {(0, 1): 1, (1, 2): 1}  # 0&1 share product 3; 1&2 share 5
    dst_proj = {
        (r["src"], r["dst"]): r["weight"]
        for r in bipartite_project(g, "dst").collect()
    }
    assert dst_proj == {(3, 4): 1, (3, 5): 1}


def test_bipartite_project_validates_side(spark):
    g = labelled(spark)
    with pytest.raises(ValueError):
        bipartite_project(g, "sideways")


def test_containment_asymmetric(spark):
    # star: 0 connected to 1,2,3; 1 connected to 0 only (undirected)
    v = spark.createDataFrame([(i,) for i in range(4)], ["id"])
    e = spark.createDataFrame([(0, 1), (0, 2), (0, 3), (1, 2)], ["src", "dst"])
    g = Graph(v, e, directed=False, indexed=True)
    out = {
        (r["src"], r["dst"]): r["containment"]
        for r in NeighborhoodContainment().run(g).collect()
    }
    # N(1)={0,2}, N(3)={0}: common={0}; containment(3->1)=1.0, (1->3)=0.5
    assert out[(3, 1)] == pytest.approx(1.0)
    assert out[(1, 3)] == pytest.approx(0.5)


def test_weighted_shortest_paths_chain(spark):
    v = spark.createDataFrame([(i,) for i in range(4)], ["id"])
    e = spark.createDataFrame(
        [(0, 1, 10.0), (1, 2, 1.0), (2, 3, 1.0), (0, 3, 1.0)],
        ["src", "dst", "weight"],
    )
    g = Graph(v, e, directed=False, indexed=True)
    out = {
        (r["id"], r["landmark"]): r["distance"]
        for r in WeightedShortestPaths([0], max_iterations=8)
        .run_exploded(g)
        .collect()
    }
    # best path 0->1 goes around: 0-3-2-1 = 3.0 < direct 10.0
    assert out[(1, 0)] == pytest.approx(3.0)
    assert out[(3, 0)] == pytest.approx(1.0)
    assert out[(0, 0)] == 0.0


def test_weighted_shortest_paths_directed_respects_direction(spark):
    v = spark.createDataFrame([(i,) for i in range(3)], ["id"])
    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0)], ["src", "dst", "weight"]
    )
    g = Graph(v, e, directed=True, indexed=True)
    out = {
        (r["id"], r["landmark"]): r["distance"]
        for r in WeightedShortestPaths([2]).run_exploded(g).collect()
    }
    assert out == {(2, 2): 0.0, (1, 2): 1.0, (0, 2): 2.0}


def test_local_clustering_coefficient(spark):
    from pyspark_graph_spark.operators import LocalClusteringCoefficient

    # triangle {0,1,2} + pendant 3 attached to 0
    v = spark.createDataFrame([(i,) for i in range(4)], ["id"])
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (0, 3)], ["src", "dst"]
    )
    g = Graph(v, e, directed=False, indexed=True)
    out = {r["id"]: r["clustering"] for r in LocalClusteringCoefficient().run(g).collect()}
    assert out[1] == pytest.approx(1.0)  # both neighbors adjacent
    assert out[0] == pytest.approx(1 / 3)  # 1 triangle of 3 possible pairs
    assert out[3] == 0.0  # degree 1


def test_personalized_pagerank_confines_mass(spark):
    from pyspark_graph_spark.operators import PageRank

    # two disconnected pairs
    v = spark.createDataFrame([(i,) for i in range(4)], ["id"])
    e = spark.createDataFrame([(0, 1), (1, 0), (2, 3), (3, 2)], ["src", "dst"])
    g = Graph(v, e, indexed=True)
    out = {r["id"]: r["pagerank"] for r in PageRank(sources=[0], max_iterations=5).run(g).collect()}
    assert out[2] == 0.0 and out[3] == 0.0
    assert out[0] > 0 and out[1] > 0
