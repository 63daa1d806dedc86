"""Drive the reference-compatible ``pyspark_graph`` package exactly as a
reference user would (imports, signatures, result columns) — the
switch-the-dependency contract."""

import pytest
from pyspark.sql import functions as F

from pyspark_graph import (
    ADJ,
    DEGREE,
    Graph,
    ID,
    match_structure,
    multiple_join,
    ne_null_safe,
    order_edges,
)
from pyspark_graph.algorithms import (
    AggregateMessages,
    Algorithm,
    AlternatingConnectedComponents,
    BreadthFirstSearch,
    ConnectedComponents,
    JaccardSimilarity,
    KatzIndex,
    LabelPropagation,
    OverlapCoefficient,
    Pregel,
    ShortestPaths,
    TriangleCount,
    WLKernel,
)
from pyspark_graph.datalog import DatalogQuery, Edge, Vertex


def ref_sample1(spark, directed=True):
    v = spark.createDataFrame([(c,) for c in "abcdef"], ["id"])
    e = spark.createDataFrame(
        [("a", "b", 9), ("a", "c", 9), ("b", "d", 9), ("b", "c", 9),
         ("b", "e", 9), ("e", "d", 9), ("b", "a", 9)],
        ["src", "dst", "nine"],
    )
    return Graph(v, e, directed=directed, spark_session=spark)


def ref_two_components(spark):
    v = spark.createDataFrame([(c,) for c in "abcdef"], ["id"])
    e = spark.createDataFrame(
        [("a", "b", 9), ("b", "c", 9), ("c", "a", 9), ("d", "e", 9), ("d", "f", 9)],
        ["src", "dst", "nine"],
    )
    return Graph(v, e, spark_session=spark)


def test_graph_constructor_reference_signature(spark):
    g = ref_sample1(spark)
    assert g.spark is spark
    assert {ID, "old_id"} <= set(g.vertices.columns)
    assert {"src", "dst", "edge_id", "nine"} <= set(g.edges.columns)


def test_triangle_count_reference_goldens(spark):
    # reference test_triangle_count.py goldens: 2 and 1
    assert TriangleCount().run(ref_sample1(spark)) == 2
    assert TriangleCount().run(ref_two_components(spark)) == 1


def test_connected_components_reference_goldens(spark):
    # reference test_connected_components.py: 2 components of 3 vertices
    for algo in (ConnectedComponents(), AlternatingConnectedComponents()):
        out = algo.run(ref_two_components(spark))
        assert out.columns == ["id", "component"]
        sizes = sorted(
            r["n"] for r in out.groupBy("component").agg(
                F.count(F.lit(1)).alias("n")).collect()
        )
        assert sizes == [3, 3]


def test_label_propagation_reference_result_shape(spark):
    v = spark.createDataFrame(list(zip(range(6), "abcdef")), ["id", "label"])
    e = spark.createDataFrame([(0, 1), (1, 2), (2, 0), (3, 4), (3, 5)], ["src", "dst"])
    g = Graph(v, e, indexed=True, spark_session=spark)
    out = LabelPropagation().run(g)
    assert out.columns == ["id", "label"]
    labels = {r["id"]: r["label"] for r in out.collect()}
    assert labels[0] == labels[1] == labels[2]


def test_pregel_class_attrs_and_signature(spark):
    # reference usage: column refs via Pregel.MSG / Pregel.STATE attrs,
    # msg_to_src positional-first signature
    v = spark.createDataFrame([(i,) for i in range(4)], ["id"])
    e = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], ["src", "dst"])
    g = Graph(v, e, indexed=True, spark_session=spark)
    p = Pregel(
        F.col(ID),
        F.min(F.col(Pregel.MSG)),
        msg_to_src=F.col(Pregel.STATE),
        msg_to_dst=F.col(Pregel.STATE),
        update_expr=F.least(F.col(Pregel.STATE), F.col(Pregel.MSG)),
    )
    out = {r["id"]: r["state"] for r in p.run(g).collect()}
    assert set(out.values()) == {0}


def test_pregel_rejects_zero_iterations():
    with pytest.raises(ValueError):
        Pregel(F.lit(0), F.min(F.col("msg")), msg_to_src=F.lit(1), max_iterations=0)


def test_wl_kernel_custom_hashfunc(spark):
    g = ref_sample1(spark)
    h_md5 = WLKernel(hashfunc=F.md5).run(g)
    h_sha = WLKernel().run(g)
    assert h_md5 != h_sha and len(h_md5) == 32


def test_everything_else_importable_and_runs(spark):
    g = ref_sample1(spark, directed=False)
    assert JaccardSimilarity().run(g).count() > 0
    assert OverlapCoefficient().run(g).count() > 0
    assert KatzIndex(beta=0.125, max_iterations=2).run(g).count() > 0
    assert BreadthFirstSearch(
        F.col("old_id") == "a", F.col("old_id") == "d"
    ).run(g).count() > 0
    lm = g.vertices.filter(F.col("old_id") == "a").select(ID)
    assert ShortestPaths(lm).run(g).count() == 6
    am = AggregateMessages(
        agg=F.count(F.col("msg")), to_dst=F.col("src_id")
    )
    assert am.run(g).count() > 0
    q = DatalogQuery(["a", "b"], [Edge("a", "b")])
    assert q.apply(g).count() == 7
    assert issubclass(Algorithm, object)
    assert ne_null_safe is not None and multiple_join is not None
    assert match_structure is not None and order_edges is not None
    assert ADJ == "adjacent" and DEGREE == "degree"
