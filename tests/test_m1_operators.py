import pytest
from pyspark.sql import functions as F

from pyspark_graph_spark import Graph
from pyspark_graph_spark.datalog import DatalogQuery, Edge, Vertex
from pyspark_graph_spark.operators import (
    JaccardSimilarity,
    OverlapCoefficient,
    TriangleCount,
)
from tests.fixtures import labelled, sample1, two_components


def test_triangle_count_sample1(spark):
    assert TriangleCount().run(sample1(spark)) == 2


def test_triangle_count_two_components(spark):
    assert TriangleCount().run(two_components(spark)) == 1


def test_triangle_enumeration_canonical(spark):
    g = labelled(spark)
    tris = sorted(
        tuple(r) for r in TriangleCount().triangles(g).collect()
    )
    assert tris == [(0, 1, 2)]


def test_jaccard_labelled(spark):
    # undirected: triangle {0,1,2}; star 3-(4,5)
    g = labelled(spark, directed=False)
    sims = {
        (r["src"], r["dst"]): r["jaccard"]
        for r in JaccardSimilarity().run(g).collect()
    }
    # 0 and 1 share neighbor {2}; union = {1,2} | {0,2} = 3 distinct
    assert sims[(0, 1)] == pytest.approx(1 / 3)
    # 4 and 5 share neighbor {3}; each has only that neighbor
    assert sims[(4, 5)] == pytest.approx(1.0)
    # no cross-component pairs
    assert all(not (a < 3 <= b) for a, b in sims)


def test_overlap_labelled(spark):
    g = labelled(spark, directed=False)
    sims = {
        (r["src"], r["dst"]): r["overlap"]
        for r in OverlapCoefficient().run(g).collect()
    }
    assert sims[(4, 5)] == pytest.approx(1.0)
    assert sims[(0, 1)] == pytest.approx(1 / 2)  # 1 common / min(2,2)


def test_jaccard_min_similarity_filter(spark):
    g = labelled(spark, directed=False)
    out = JaccardSimilarity(min_similarity=0.9).run(g).collect()
    assert {(r["src"], r["dst"]) for r in out} == {(4, 5)}


def test_datalog_conjunction_and_projection(spark):
    g = labelled(spark)
    q = DatalogQuery(
        projection=["a", "b", "la"],
        premises=[Vertex("a", la="label"), Edge("a", "b")],
    )
    rows = {(r["a"], r["b"], r["la"]) for r in q.apply(g).collect()}
    assert (0, 1, "a") in rows
    assert (3, 4, "d") in rows
    assert len(rows) == 5


def test_datalog_vertex_condition(spark):
    g = labelled(spark)
    q = DatalogQuery(
        projection=["a", "b"],
        premises=[Vertex("a", F.col("label") == "d"), Edge("a", "b")],
    )
    rows = {(r["a"], r["b"]) for r in q.apply(g).collect()}
    assert rows == {(3, 4), (3, 5)}


def test_datalog_negation_joins_on_shared_vars(spark):
    """Regression for reference datalog.py:65 (anti-join without ON deletes
    everything): negation must remove only matching bindings."""
    g = labelled(spark)
    # pairs of vertices (a,b) with an edge, where NO edge (b,c) exists
    q = DatalogQuery(
        projection=["a", "b"],
        premises=[Edge("a", "b")],
        negated_premises=[Edge("b", "c")],
    )
    rows = {(r["a"], r["b"]) for r in q.apply(g).collect()}
    # edges out of 1,2,0 exist: (0,1)->1 has out-edge, (1,2)->2 has out-edge,
    # (2,0)->0 has out-edge; 4 and 5 are sinks
    assert rows == {(3, 4), (3, 5)}


def test_datalog_cross_variable_condition(spark):
    g = labelled(spark)
    q = DatalogQuery(
        projection=["a", "b"],
        premises=[Edge("a", "b")],
        condition=F.col("a") > F.col("b"),
    )
    rows = {(r["a"], r["b"]) for r in q.apply(g).collect()}
    assert rows == {(2, 0)}


def test_datalog_negation_requires_shared_vars(spark):
    g = labelled(spark)
    q = DatalogQuery(
        projection=["a", "b"],
        premises=[Edge("a", "b")],
        negated_premises=[Edge("x", "y")],
    )
    with pytest.raises(ValueError):
        q.apply(g)
