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


# ---------------------------------------------------------------------------
# Node2VecWalks (second-order biased walks)
# ---------------------------------------------------------------------------

import hashlib


def _h60(*parts):
    s = ",".join(str(p) for p in parts)
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def py_node2vec(n, edges, length, seed, wr, wc, wf):
    adj = {i: set() for i in range(n)}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    adj = {k: sorted(v) for k, v in adj.items()}
    walks = {}
    for s0 in range(n):
        wid = _h60(s0, 0, seed)
        path, prev, cur = [s0], None, s0
        for t in range(1, length):
            nbrs = adj[cur]
            if not nbrs:
                break
            if prev is None:
                w = [1] * len(nbrs)
            else:
                pn = set(adj[prev])
                w = [wr if c == prev else wc if c in pn else wf
                     for c in nbrs]
            r = _h60(wid, t, seed) % sum(w)
            cum, sel = 0, None
            for i, x in enumerate(w):
                cum += x
                if cum > r:
                    sel = i
                    break
            prev, cur = cur, nbrs[sel]
            path.append(cur)
        walks[wid] = (s0, path)
    return walks


def test_node2vec_matches_python_replay(spark):
    from pyspark_graph_spark.operators.walks import Node2VecWalks

    rng = random.Random(13)
    n = 12
    edges = [(u, v) for u in range(n) for v in range(u + 1, n)
             if rng.random() < 0.35]
    v = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    e = spark.createDataFrame(edges, ["src", "dst"])
    g = Graph(v, e, directed=False, indexed=True)
    out = Node2VecWalks(
        length=6, seed=3, hash_mode="md5", w_return=1, w_common=2, w_far=4
    ).run(g)
    got = {r["walk_id"]: (r["start"], list(r["path"])) for r in out.collect()}
    want = py_node2vec(n, edges, length=6, seed=3, wr=1, wc=2, wf=4)
    assert got == want


def test_node2vec_unit_weights_equal_first_order(spark):
    """With all weights 1 the cumulative pick reduces to index r — i.e.
    exactly RandomWalks' next-hop rule — so the corpora must coincide."""
    from pyspark_graph_spark.operators.walks import Node2VecWalks, RandomWalks

    rng = random.Random(21)
    n = 10
    edges = [(u, v) for u in range(n) for v in range(u + 1, n)
             if rng.random() < 0.4]
    v = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    e = spark.createDataFrame(edges, ["src", "dst"])
    g = Graph(v, e, directed=False, indexed=True)
    a = {r["walk_id"]: list(r["path"]) for r in RandomWalks(
        length=5, seed=11, hash_mode="md5").run(g).collect()}
    b = {r["walk_id"]: list(r["path"]) for r in Node2VecWalks(
        length=5, seed=11, hash_mode="md5",
        w_return=1, w_common=1, w_far=1).run(g).collect()}
    assert a == b


def test_node2vec_return_bias_oscillates(spark):
    """Overwhelming return weight on a path graph pins the walk to
    oscillating between its first two vertices."""
    from pyspark_graph_spark.operators.walks import Node2VecWalks

    v = spark.createDataFrame([(i,) for i in range(5)], ["id"])
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4)], ["src", "dst"]
    )
    g = Graph(v, e, directed=False, indexed=True)
    out = Node2VecWalks(
        length=8, seed=1, hash_mode="md5",
        w_return=10**6, w_common=1, w_far=1,
    ).run(g)
    for r in out.collect():
        p = list(r["path"])
        # from step 2 on, overwhelmingly likely each hop returns
        assert all(p[i] == p[i + 2] for i in range(len(p) - 2))
