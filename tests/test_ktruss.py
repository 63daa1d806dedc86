"""KTruss vs a pure-Python peel on random graphs, plus structural cases."""

import random
from itertools import combinations

import pytest

from pyspark_graph_spark import Graph
from pyspark_graph_spark.operators import KTruss


def py_ktruss(edges, k):
    """Reference peel: recompute support, drop, repeat to fixpoint."""
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    while True:
        adj = {}
        for a, b in es:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        kept = {
            (a, b)
            for a, b in es
            if len(adj[a] & adj[b]) >= k - 2
        }
        if kept == es:
            return es
        es = kept


def random_graph(spark, seed, n=13, p=0.3):
    rng = random.Random(seed)
    edges = [
        (a, b) for a in range(n) for b in range(a + 1, n) if rng.random() < p
    ]
    if not edges:
        edges = [(0, 1)]
    v = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    e = spark.createDataFrame(edges, ["src", "dst"])
    return Graph(v, e, directed=False, indexed=True), edges


@pytest.mark.parametrize("seed", [2, 11, 42])
@pytest.mark.parametrize("k", [3, 4])
def test_ktruss_matches_python_peel(spark, seed, k):
    g, edges = random_graph(spark, seed)
    op = KTruss(k)
    got = {(r.src, r.dst) for r in op.run(g).collect()}
    assert got == py_ktruss(edges, k)
    assert op.converged


def test_ktruss_clique_survives_pendant_drops(spark):
    # K5 plus a pendant path: the 5-clique is a 5-truss; pendants never are
    clique = list(combinations(range(5), 2))
    edges = clique + [(4, 5), (5, 6)]
    v = spark.createDataFrame([(i,) for i in range(7)], ["id"])
    e = spark.createDataFrame(edges, ["src", "dst"])
    g = Graph(v, e, directed=False, indexed=True)
    got = {(r.src, r.dst) for r in KTruss(5).run(g).collect()}
    assert got == set(clique)


def test_ktruss_triangle_free_graph_is_empty(spark):
    # 6-cycle has no triangles: 3-truss is empty
    edges = [(i, (i + 1) % 6) for i in range(6)]
    v = spark.createDataFrame([(i,) for i in range(6)], ["id"])
    e = spark.createDataFrame(edges, ["src", "dst"])
    g = Graph(v, e, directed=False, indexed=True)
    op = KTruss(3)
    assert op.run(g).count() == 0
    assert op.converged


def test_ktruss_rejects_k_below_3(spark):
    with pytest.raises(ValueError):
        KTruss(2)
