"""Borůvka MST, bipartite double-cover, and DAG layering tests.

MST is checked against a Python Kruskal under the identical
``(weight, src, dst)`` total edge order — with that strict order the
minimum spanning forest is unique, so the comparison is exact edge-set
equality, not just total-weight equality.
"""

import random

import pytest
from pyspark.sql import functions as F

from pyspark_graph_spark import Graph
from pyspark_graph_spark.operators.mst import BoruvkaMST


def py_kruskal(n, wedges):
    """Unique MSF under the (weight, src, dst) total order."""
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    forest = []
    for w, u, v in sorted((w, u, v) for u, v, w in wedges):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            forest.append((u, v, w))
    return sorted(forest)


def random_weighted_graph(seed, n=16, p=0.22):
    rng = random.Random(seed)
    edges = [
        (u, v, rng.randint(1, 12))
        for u in range(n)
        for v in range(u + 1, n)
        if rng.random() < p
    ]
    return n, edges


@pytest.mark.parametrize("seed", [1, 2, 3, 4])
def test_mst_matches_kruskal(spark, seed):
    n, wedges = random_weighted_graph(seed)
    v = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    e = spark.createDataFrame(wedges, ["src", "dst", "weight"])
    g = Graph(v, e, directed=False, indexed=True)
    got = sorted(
        (r["src"], r["dst"], r["weight"])
        for r in BoruvkaMST().run(g).collect()
    )
    assert got == py_kruskal(n, wedges)


def test_mst_forest_on_disconnected(spark):
    # two components: path 0-1-2 and triangle 3-4-5 → 2 + 2 forest edges
    v = spark.createDataFrame([(i,) for i in range(6)], ["id"])
    e = spark.createDataFrame(
        [(0, 1, 5), (1, 2, 3), (3, 4, 1), (4, 5, 1), (3, 5, 9)],
        ["src", "dst", "weight"],
    )
    g = Graph(v, e, directed=False, indexed=True)
    got = sorted(
        (r["src"], r["dst"], r["weight"])
        for r in BoruvkaMST().run(g).collect()
    )
    assert got == [(0, 1, 5), (1, 2, 3), (3, 4, 1), (4, 5, 1)]
    assert got == py_kruskal(6, [(0, 1, 5), (1, 2, 3), (3, 4, 1), (4, 5, 1), (3, 5, 9)])


def test_mst_collapses_parallel_edges_and_loops(spark):
    v = spark.createDataFrame([(i,) for i in range(3)], ["id"])
    e = spark.createDataFrame(
        # parallel 0-1 edges (min wins), reversed duplicate, self-loop
        [(0, 1, 7), (1, 0, 2), (0, 1, 4), (1, 2, 6), (2, 2, 1)],
        ["src", "dst", "weight"],
    )
    g = Graph(v, e, directed=False, indexed=True)
    got = sorted(
        (r["src"], r["dst"], r["weight"])
        for r in BoruvkaMST().run(g).collect()
    )
    assert got == [(0, 1, 2), (1, 2, 6)]


def test_mst_empty_edges(spark):
    v = spark.createDataFrame([(i,) for i in range(4)], ["id"])
    e = spark.createDataFrame([], "src long, dst long, weight long")
    g = Graph(v, e, directed=False, indexed=True)
    assert BoruvkaMST().run(g).count() == 0


def test_mst_ties_resolved_by_src_dst_order(spark):
    # all weights equal: forest must still be the unique Kruskal-order one
    n, wedges = random_weighted_graph(99, n=10, p=0.4)
    wedges = [(u, v, 5) for u, v, _ in wedges]
    v = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    e = spark.createDataFrame(wedges, ["src", "dst", "weight"])
    g = Graph(v, e, directed=False, indexed=True)
    got = sorted(
        (r["src"], r["dst"], r["weight"])
        for r in BoruvkaMST().run(g).collect()
    )
    assert got == py_kruskal(n, wedges)
