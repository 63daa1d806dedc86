"""SimRank vs a direct Python fixpoint, plus structural properties."""

import random

import pytest
from pyspark.sql import functions as F

from pyspark_graph_spark import Graph
from pyspark_graph_spark.operators.simrank import SimRank


def py_simrank(n, edges, c, iters, directed=True):
    """Dense Python fixpoint with the same update rule."""
    inn = [[] for _ in range(n)]
    for u, v in edges:
        inn[v].append(u)
        if not directed:
            inn[u].append(v)
    inn = [sorted(set(x)) for x in inn]
    s = [[1.0 if i == j else 0.0 for j in range(n)] for i in range(n)]
    for _ in range(iters):
        t = [[1.0 if i == j else 0.0 for j in range(n)] for i in range(n)]
        for a in range(n):
            for b in range(n):
                if a == b or not inn[a] or not inn[b]:
                    continue
                acc = sum(s[i][j] for i in inn[a] for j in inn[b])
                t[a][b] = c * acc / (len(inn[a]) * len(inn[b]))
        s = t
    return s


def _run(spark, n, edges, directed=True, iters=3, c=0.8):
    v = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    e = spark.createDataFrame(edges, ["src", "dst"])
    g = Graph(v, e, directed=directed, indexed=True)
    out = SimRank(c=c, max_iterations=iters).run(g)
    return {(r["a"], r["b"]): r["simrank"] for r in out.collect()}


@pytest.mark.parametrize("seed", [3, 11])
def test_simrank_matches_python(spark, seed):
    rng = random.Random(seed)
    n = 9
    edges = list(
        {
            (rng.randrange(n), rng.randrange(n))
            for _ in range(22)
        }
    )
    edges = [(u, v) for u, v in edges if u != v]
    got = _run(spark, n, edges, directed=True)
    want = py_simrank(n, edges, c=0.8, iters=3)
    for a in range(n):
        for b in range(a + 1, n):
            expect = round(want[a][b], 6)
            if expect > 0:
                assert got.get((a, b)) == pytest.approx(expect, abs=2e-6)
            else:
                assert (a, b) not in got


def test_simrank_symmetric_siblings(spark):
    # two leaves referenced by the same parent: s = c after one round
    got = _run(spark, 3, [(0, 1), (0, 2)], directed=True, iters=1)
    assert got[(1, 2)] == pytest.approx(0.8)


def test_simrank_no_shared_ancestry_is_zero(spark):
    got = _run(spark, 4, [(0, 1), (2, 3)], directed=True)
    assert (1, 3) not in got and (0, 2) not in got


def test_simrank_eps_prunes(spark):
    rng = random.Random(5)
    n = 10
    edges = [(u, v) for u in range(n) for v in range(n)
             if u != v and rng.random() < 0.3]
    full = _run(spark, n, edges)
    v = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    e = spark.createDataFrame(edges, ["src", "dst"])
    g = Graph(v, e, directed=True, indexed=True)
    pruned = {
        (r["a"], r["b"]): r["simrank"]
        for r in SimRank(c=0.8, max_iterations=3, eps=0.05).run(g).collect()
    }
    assert set(pruned) <= set(full)
    # surviving pairs keep sensible scores (pruning only removes mass)
    for k, s in pruned.items():
        assert s <= full[k] + 1e-9
