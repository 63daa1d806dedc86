import pytest
from pyspark.sql import functions as F

from pyspark_graph_spark import Graph
from pyspark_graph_spark.motif import find
from tests.fixtures import labelled


def test_single_edge_with_structs(spark):
    g = labelled(spark)
    out = find(g, "(a)-[e]->(b)")
    assert set(out.columns) == {"a", "b", "e"}
    rows = {(r["a"]["id"], r["b"]["id"]) for r in out.collect()}
    assert rows == {(0, 1), (1, 2), (2, 0), (3, 4), (3, 5)}
    labels = {(r["a"]["label"], r["b"]["label"]) for r in out.collect()}
    assert ("a", "b") in labels


def test_two_hop_join(spark):
    g = labelled(spark)
    out = find(g, "(a)-[]->(b); (b)-[]->(c)")
    rows = {(r["a"]["id"], r["b"]["id"], r["c"]["id"]) for r in out.collect()}
    assert (0, 1, 2) in rows and (1, 2, 0) in rows
    assert not any(r[0] == 3 for r in rows)  # star has no 2-hop


def test_triangle_motif(spark):
    g = labelled(spark)
    out = find(g, "(a)-[]->(b); (b)-[]->(c); (c)-[]->(a)")
    rows = {(r["a"]["id"], r["b"]["id"], r["c"]["id"]) for r in out.collect()}
    assert rows == {(0, 1, 2), (1, 2, 0), (2, 0, 1)}  # 3 rotations


def test_negation(spark):
    g = labelled(spark)
    # edges whose reverse does not exist: all of them (no 2-cycles here)
    out = find(g, "(a)-[]->(b); !(b)-[]->(a)")
    assert out.count() == 5
    # edges that close a path back: (a)->(b) with some (b)->(c)->(a)
    out2 = find(g, "(a)-[]->(b); (b)-[]->(c); !(c)-[]->(a)")
    rows = {(r["a"]["id"], r["b"]["id"], r["c"]["id"]) for r in out2.collect()}
    assert rows == set()  # in the triangle every 2-hop closes


def test_anonymous_elements(spark):
    g = labelled(spark)
    out = find(g, "(a)-[]->()")
    assert out.columns == ["a"]
    assert {r["a"]["id"] for r in out.collect()} == {0, 1, 2, 3}


def test_struct_field_filter(spark):
    g = labelled(spark)
    out = find(g, "(a)-[]->(b)").filter(F.col("a.label") == "d")
    assert {r["b"]["id"] for r in out.collect()} == {4, 5}


def test_graph_find_method(spark):
    g = labelled(spark)
    assert g.find("(x)-[]->(y)").count() == 5


def test_parse_errors(spark):
    g = labelled(spark)
    with pytest.raises(ValueError):
        find(g, "(a)->(b)")
    with pytest.raises(ValueError):
        find(g, "")
    with pytest.raises(ValueError):
        find(g, "!(a)-[]->(b)")  # negation only
    with pytest.raises(ValueError):
        find(g, "(a)-[]->(b); !(a)-[x]->(b)")  # edge var in negation
    with pytest.raises(ValueError):
        find(g, "(a)-[]->(b); !(a)-[]->(zz)")  # unbound var in negation
    with pytest.raises(ValueError):
        find(g, "(a)-[e]->(b); (b)-[e]->(c)")  # edge var bound twice


def test_vertex_filters_pushdown_equivalence(spark):
    g = labelled(spark)
    pushed = find(
        g,
        "(a)-[]->(b); (c)-[]->(b)",
        vertex_filters={"b": F.col("label") == "d"},
    )
    post = find(g, "(a)-[]->(b); (c)-[]->(b)").filter(
        F.col("b.label") == "d"
    )
    key = lambda r: (r["a"]["id"], r["b"]["id"], r["c"]["id"])
    assert sorted(map(key, pushed.collect())) == sorted(
        map(key, post.collect())
    )


def test_vertex_filters_unknown_var(spark):
    g = labelled(spark)
    with pytest.raises(ValueError):
        find(g, "(a)-[]->(b)", vertex_filters={"zz": F.col("label") == "d"})
