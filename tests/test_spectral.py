"""Eigenvector centrality and HITS vs NumPy power-iteration oracles on
random graphs (same adversarial-structure strategy as test_property.py)."""

import random

import numpy as np
import pytest

from pyspark_graph_spark import Graph
from pyspark_graph_spark.operators import HITS, EigenvectorCentrality

SEEDS = [1, 7, 23]


def random_graph(spark, seed, n=12, p=0.25, directed=True):
    rng = random.Random(seed)
    edges = [
        (a, b)
        for a in range(n)
        for b in range(n)
        if a != b and rng.random() < p
    ]
    if not edges:
        edges = [(0, 1)]
    v = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    e = spark.createDataFrame(edges, ["src", "dst"])
    return Graph(v, e, directed=directed, indexed=True), n, edges


def _l2(x):
    nrm = np.sqrt((x * x).sum())
    return x / nrm if nrm > 0 else x * 0.0


@pytest.mark.parametrize("seed", SEEDS)
def test_eigenvector_matches_numpy(spark, seed):
    g, n, edges = random_graph(spark, seed, directed=False)
    # Graph.symmetric_edges is edges ∪ reversed WITHOUT dedup: reciprocal
    # input pairs get multiplicity 2 (multigraph semantics, same as the
    # engine's PageRank) — model that, don't set-dedup
    A = np.zeros((n, n))
    for a, b in set(edges):  # indexing dedups exact duplicates only
        A[b, a] += 1.0  # x flows src -> dst
        A[a, b] += 1.0  # the reversal
    x = np.ones(n)
    for _ in range(5):
        x = _l2(A @ x)
    got = {r.id: r.eigenvector for r in EigenvectorCentrality(5).run(g).collect()}
    assert len(got) == n
    for i in range(n):
        assert got[i] == pytest.approx(x[i], abs=1e-9)


@pytest.mark.parametrize("seed", SEEDS)
def test_hits_matches_numpy(spark, seed):
    g, n, edges = random_graph(spark, seed, directed=True)
    dedup = set(edges)
    A = np.zeros((n, n))
    for a, b in dedup:
        A[a, b] = 1.0
    h = np.ones(n)
    for _ in range(4):
        a_ = _l2(A.T @ h)
        h = _l2(A @ a_)
    got = {r.id: (r.hub, r.authority) for r in HITS(4).run(g).collect()}
    assert len(got) == n
    for i in range(n):
        assert got[i][0] == pytest.approx(h[i], abs=1e-9)
        assert got[i][1] == pytest.approx(a_[i], abs=1e-9)


def test_eigenvector_concentrates_on_clique(spark):
    # clique {0,1,2} + pendant 3 attached to 0: clique members dominate,
    # vertex 4 isolated -> exactly 0
    v = spark.createDataFrame([(i,) for i in range(5)], ["id"])
    e = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (0, 3)], ["src", "dst"]
    )
    g = Graph(v, e, directed=False, indexed=True)
    got = {r.id: r.eigenvector for r in EigenvectorCentrality(8).run(g).collect()}
    assert got[4] == 0.0
    assert got[0] > got[1] > got[3]  # 0 has the extra pendant edge
    assert got[1] == pytest.approx(got[2], abs=1e-12)  # symmetric pair


def test_hits_bipartite_roles(spark):
    # directed star: 0 -> {1,2,3}: 0 is the only hub, pure authorities right
    v = spark.createDataFrame([(i,) for i in range(4)], ["id"])
    e = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], ["src", "dst"])
    g = Graph(v, e, directed=True, indexed=True)
    got = {r.id: (r.hub, r.authority) for r in HITS(3).run(g).collect()}
    assert got[0][0] == pytest.approx(1.0, abs=1e-12)  # sole hub
    assert got[0][1] == 0.0
    for i in (1, 2, 3):
        assert got[i][0] == 0.0
        assert got[i][1] == pytest.approx(1 / np.sqrt(3), abs=1e-12)
