import pytest
from pyspark.sql import functions as F

from pyspark_graph_spark import ADJ, DEGREE, ID, IN_DEGREE, OUT_DEGREE, Graph
from tests.fixtures import labelled, sample1, two_components


def id_map(g):
    """old_id -> surrogate id."""
    return {r["old_id"]: r["id"] for r in g.vertices.collect()}


def test_indexing_deterministic(spark):
    g1 = sample1(spark)
    g2 = sample1(spark)
    assert id_map(g1) == id_map(g2)
    assert len(id_map(g1)) == 6
    # edge endpoints resolve to the same surrogate space
    vids = set(id_map(g1).values())
    for r in g1.edges.collect():
        assert r["src"] in vids and r["dst"] in vids
        assert r["edge_id"] is not None


def test_indexing_dedups(spark):
    v = spark.createDataFrame([("a",), ("a",), ("b",)], ["id"])
    e = spark.createDataFrame([("a", "b", 1), ("a", "b", 1)], ["src", "dst", "x"])
    g = Graph(v, e)
    assert g.vertices.count() == 2
    assert g.edges.count() == 1


def test_collision_guards(spark):
    v = spark.createDataFrame([("a", 1)], ["id", "old_id"])
    e = spark.createDataFrame([("a", "a")], ["src", "dst"])
    with pytest.raises(ValueError):
        Graph(v, e)
    with pytest.raises(ValueError):
        Graph(e.select(F.col("src").alias("id")), e.withColumn("old_src", F.lit(1)))


def test_degrees_directed(spark):
    g = sample1(spark)
    m = id_map(g)
    out = {r[ID]: r[OUT_DEGREE] for r in g.out_degrees.collect()}
    inn = {r[ID]: r[IN_DEGREE] for r in g.in_degrees.collect()}
    assert out[m["b"]] == 4  # b->d,c,e,a
    assert out[m["a"]] == 2
    assert inn[m["d"]] == 2  # b->d, e->d
    assert m["f"] not in out and m["f"] not in inn


def test_degrees_undirected_counts_distinct_neighbors(spark):
    g = sample1(spark, directed=False)
    m = id_map(g)
    deg = {r[ID]: r[DEGREE] for r in g.degrees.collect()}
    # b: neighbors a,c,d,e (a<->b dedups to one neighbor)
    assert deg[m["b"]] == 4
    assert deg[m["f"]] == 0  # isolated vertex present with 0


def test_adjacency_undirected_sorted_with_isolated(spark):
    g = sample1(spark, directed=False)
    m = id_map(g)
    adj = {r[ID]: r[ADJ] for r in g.adjacency.collect()}
    assert adj[m["f"]] == []
    assert adj[m["b"]] == sorted([m["a"], m["c"], m["d"], m["e"]])
    assert adj[m["b"]] == sorted(adj[m["b"]])  # array_sort applied


def test_triplets(spark):
    g = labelled(spark)
    t = g.triplets()
    rows = {(r["src"], r["dst"]): (r["src_label"], r["dst_label"]) for r in t.collect()}
    assert rows[(0, 1)] == ("a", "b")
    assert rows[(3, 5)] == ("d", "f")
    assert t.count() == 5


def test_with_vertex_column(spark):
    g = labelled(spark)
    g2 = g.with_vertex_column("upper", F.upper(F.col("label")))
    assert "upper" in g2.vertices.columns
    assert "upper" not in g.vertices.columns
    vals = {r["label"]: r["upper"] for r in g2.vertices.collect()}
    assert vals["a"] == "A"


def test_symmetric_edges(spark):
    g = two_components(spark, directed=False)
    assert g.symmetric_edges.count() == 2 * g.edges.count()
    gd = two_components(spark, directed=True)
    assert gd.symmetric_edges.count() == gd.edges.count()


def test_validate_index_passes_on_clean_graph(spark):
    g = sample1(spark)
    g.validate_index()  # no exception


def test_validate_index_detects_collision(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from pyspark_graph_spark import Graph as _Graph

    # forge a graph whose surrogate ids collide (indexed=True bypass)
    v = spark.createDataFrame(
        [("a", 1), ("b", 1)], ["old_id", "id"]
    )
    e = spark.createDataFrame([], "src long, dst long")
    g = _Graph(v, e, indexed=True)
    with _pytest.raises(ValueError):
        g.validate_index()


# ---------------------------------------------------------- subgraph filters


def _toy_graph(spark):
    from pyspark_graph_spark.graph import Graph

    v = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b")], ["id", "grp"]
    )
    e = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 5.0), (3, 4, 2.0), (1, 4, 9.0)],
        ["src", "dst", "w"],
    )
    return Graph(v, e, directed=True, indexed=True)


def test_filter_edges_keeps_all_vertices(spark):
    from pyspark.sql import functions as F

    g = _toy_graph(spark)
    sub = g.filter_edges(F.col("w") < 3)
    assert sub.vertices.count() == 4
    assert {(r.src, r.dst) for r in sub.edges.collect()} == {(1, 2), (3, 4)}


def test_filter_vertices_induces_edges(spark):
    from pyspark.sql import functions as F

    g = _toy_graph(spark)
    sub = g.filter_vertices(F.col("grp") == "a")
    assert {r.id for r in sub.vertices.collect()} == {1, 2}
    # only 1->2 has both endpoints surviving
    assert {(r.src, r.dst) for r in sub.edges.collect()} == {(1, 2)}


def test_subgraph_composes_edge_then_vertex(spark):
    from pyspark.sql import functions as F

    g = _toy_graph(spark)
    sub = g.subgraph(
        vertex_condition=F.col("id") <= 3,
        edge_condition=F.col("w") >= 2,
    )
    assert {r.id for r in sub.vertices.collect()} == {1, 2, 3}
    assert {(r.src, r.dst) for r in sub.edges.collect()} == {(2, 3)}


def test_subgraph_preserves_flags_and_columns(spark):
    from pyspark.sql import functions as F

    g = _toy_graph(spark)
    sub = g.filter_vertices(F.col("grp") == "a")
    assert sub.directed == g.directed
    assert sub.edges.columns == g.edges.columns
    assert sub.vertices.columns == g.vertices.columns
