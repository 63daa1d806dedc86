"""Bit-identity of the batched greedy coloring vs the per-color MIS loop.

Round 11 collapses the whole Luby-MIS coloring into one cogrouped Arrow
batch once the residual graph fits the bound (operators/mis.py
``_batch_color``). The kernel claims bit-identity with the per-color
distributed path (same xxhash64 priorities via the NumPy replica, same
round budgets, same win rule) — these tests check that claim on graphs
with cliques, isolated vertices, odd cycles and hubs, plus the proper-
coloring invariants the gate oracle pins.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_graph_spark.graph import Graph
from pyspark_graph_spark.operators.mis import greedy_coloring


def _graph(spark, n, edges):
    v = spark.createDataFrame([(i,) for i in range(n)], "id long")
    e = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    if not edges:
        e = e.filter("src < 0")
    return Graph(v, e, directed=False, indexed=True)


CASES = {
    "two_cliques": (8, [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (6, 7)]),
    "odd_cycle": (5, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0)]),
    "hub_star": (10, [(0, i) for i in range(1, 10)]),
    "isolated": (6, [(0, 1), (2, 3)]),
    "path": (7, [(i, i + 1) for i in range(6)]),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_batch_coloring_bit_identical(spark, name):
    n, edges = CASES[name]
    g = _graph(spark, n, edges)
    batched = {
        (r["id"], r["color"]) for r in greedy_coloring(g).collect()
    }
    distributed = {
        (r["id"], r["color"])
        for r in greedy_coloring(g, batch_finish=0).collect()
    }
    assert batched == distributed


def test_batch_coloring_proper_and_total(spark):
    n, edges = 12, [
        (0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3),
        (6, 7), (8, 9), (9, 10), (10, 8), (10, 11),
    ]
    g = _graph(spark, n, edges)
    rows = greedy_coloring(g).collect()
    colors = {r["id"]: r["color"] for r in rows}
    assert set(colors) == set(range(n))  # total
    for s, d in edges:
        assert colors[s] != colors[d]  # proper
    assert all(c >= 0 for c in colors.values())


def test_batch_coloring_exhaustion_raises(spark):
    # K4 needs 4 colors; max_colors=3 must fail loudly on both paths
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    g = _graph(spark, 4, edges)
    with pytest.raises(RuntimeError, match="not colored within"):
        greedy_coloring(g, max_colors=3)
