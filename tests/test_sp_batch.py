"""Bounded-batch landmark BFS (round 12) == the distributed Pregel.

Hop distances are the unique integer BFS fixpoint, so equality is exact
(no float tolerance), including the max_iterations truncation.
"""

from __future__ import annotations

from pyspark_graph_spark.constants import ID
from pyspark_graph_spark.graph import Graph
from pyspark_graph_spark.operators.shortest_paths import ShortestPaths


def _graph(spark, directed):
    edges = [
        (0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7),
        (2, 8), (8, 9), (9, 0), (10, 10), (11, 3),
    ]
    v = spark.createDataFrame([(i,) for i in range(13)], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    return Graph(v, e, directed=directed, indexed=True)


def _maps(df):
    return {r[ID]: dict(r["distances"]) for r in df.collect()}


def test_sp_batch_equals_distributed_undirected(spark):
    g = _graph(spark, directed=False)
    a = ShortestPaths([0, 3, 12], max_iterations=10).run(g)
    b = ShortestPaths([0, 3, 12], max_iterations=10, batch_finish=0).run(g)
    assert _maps(a) == _maps(b)


def test_sp_batch_equals_distributed_directed(spark):
    g = _graph(spark, directed=True)
    a = ShortestPaths([0, 7], max_iterations=10).run(g)
    b = ShortestPaths([0, 7], max_iterations=10, batch_finish=0).run(g)
    assert _maps(a) == _maps(b)


def test_sp_batch_truncation_matches(spark):
    """max_iterations below the diameter truncates IDENTICALLY."""
    g = _graph(spark, directed=False)
    a = ShortestPaths([0], max_iterations=2).run(g)
    b = ShortestPaths([0], max_iterations=2, batch_finish=0).run(g)
    am, bm = _maps(a), _maps(b)
    assert am == bm
    assert max(d for m in am.values() for d in m.values()) == 2


def test_sp_batch_missing_landmark_matches(spark):
    """A landmark id absent from the vertex table seeds nothing in
    either path."""
    g = _graph(spark, directed=False)
    a = ShortestPaths([0, 99], max_iterations=5).run(g)
    b = ShortestPaths([0, 99], max_iterations=5, batch_finish=0).run(g)
    assert _maps(a) == _maps(b)
