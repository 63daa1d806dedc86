"""NeighborhoodFunction: estimates track exact ball sizes."""

import pytest

from pyspark_graph_spark import Graph
from pyspark_graph_spark.operators.neighborhood import NeighborhoodFunction


def _exact_n(n, edges, hops):
    """Exact neighborhood function by BFS from every vertex."""
    adj = {i: set() for i in range(n)}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    out = []
    for h in range(hops + 1):
        total = 0
        for s in range(n):
            ball = {s}
            frontier = {s}
            for _ in range(h):
                frontier = {w for u in frontier for w in adj[u]} - ball
                ball |= frontier
            total += len(ball)
        out.append(total)
    return out


def _run(spark, n, edges, hops=3, b=6):
    v = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    e = spark.createDataFrame(edges, ["src", "dst"])
    g = Graph(v, e, directed=False, indexed=True)
    rows = NeighborhoodFunction(hops=hops, b=b).run(g).collect()
    return {r["hop"]: r["n_pairs"] for r in rows}


def test_neighborhood_function_path_graph(spark):
    n = 20
    edges = [(i, i + 1) for i in range(n - 1)]
    got = _run(spark, n, edges, hops=3)
    want = _exact_n(n, edges, 3)
    for h in range(4):
        # m=64 registers → ~13% standard error; 3-sigma bound
        assert got[h] == pytest.approx(want[h], rel=0.4)
    # monotone non-decreasing in h
    assert got[0] <= got[1] <= got[2] <= got[3]


def test_neighborhood_function_star_saturates(spark):
    n = 30
    edges = [(0, i) for i in range(1, n)]
    got = _run(spark, n, edges, hops=3)
    want = _exact_n(n, edges, 3)  # saturates at n^2 by hop 2
    assert got[2] == pytest.approx(want[2], rel=0.4)
    assert got[2] == got[3]  # fixpoint reached → estimates identical


def test_neighborhood_function_disconnected(spark):
    # two cliques of 5: N(h>=1) = 2 * 25
    edges = [(u, v) for u in range(5) for v in range(u + 1, 5)]
    edges += [(u + 5, v + 5) for u, v in edges]
    got = _run(spark, 10, edges, hops=2)
    assert got[1] == pytest.approx(50, rel=0.4)
    assert got[1] == got[2]


def test_neighborhood_direction_ignored(spark):
    # directed chain still yields undirected reachability balls
    n = 6
    edges = [(i, i + 1) for i in range(n - 1)]
    v = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    e = spark.createDataFrame(edges, ["src", "dst"])
    g = Graph(v, e, directed=True, indexed=True)
    rows = {
        r["hop"]: r["n_pairs"]
        for r in NeighborhoodFunction(hops=2, b=6).run(g).collect()
    }
    assert rows[1] == pytest.approx(_exact_n(n, edges, 2)[1], rel=0.4)
