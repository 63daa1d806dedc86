"""Densest subgraph parallel peeling (operators/densest.py)."""

import pytest

from pyspark_graph_spark import Graph
from pyspark_graph_spark.operators.densest import DensestSubgraph


def _graph(spark, edges, n):
    v = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    e = spark.createDataFrame(edges, ["src", "dst"])
    return Graph(v, e, directed=False, indexed=True)


def test_peeling_isolates_the_dense_core(spark):
    # K4 core {0,1,2,3} (density 6/4 = 1.5) + a pendant path 3-4-5
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    g = _graph(spark, k4 + [(3, 4), (4, 5)], 6)
    rows = {r["round"]: r for r in DensestSubgraph(epsilon=0.1).run(g).collect()}
    best = max(rows.values(), key=lambda r: r["density"])
    assert best["density"] == pytest.approx(1.5)
    assert best["n_vertices"] == 4 and best["n_edges"] == 6


def test_round_zero_reports_whole_graph(spark):
    g = _graph(spark, [(0, 1), (1, 2)], 3)
    r0 = {r["round"]: r for r in DensestSubgraph().run(g).collect()}[0]
    assert (r0["n_vertices"], r0["n_edges"]) == (3, 2)


def test_rejects_bad_epsilon():
    with pytest.raises(ValueError):
        DensestSubgraph(epsilon=0)
