"""Property-based checks for round-4 operators vs pure-Python oracles on
random inputs — adversarial structure the fixed gate tables can't supply
(random temporal zigzags, disconnected digraphs, skewed group sizes)."""

import hashlib
import random
from collections import deque

import pytest
from pyspark.sql import functions as F

from pyspark_graph_spark.constants import DST, ID, SRC
from pyspark_graph_spark.graph import Graph
from pyspark_graph_spark.operators.dag import CriticalPath
from pyspark_graph_spark.operators.scc import reachable_set
from pyspark_graph_spark.operators.temporal import earliest_arrival
from pyspark_graph_spark.functions.sketch import kmv_pairwise

SEEDS = [3, 17, 41, 88]


# ---------------------------------------------------------------------------
# earliest_arrival vs pure-Python temporal BFS (post-rework regression net)
# ---------------------------------------------------------------------------

def _py_earliest_arrival(edges, seeds):
    """Label-correcting fixpoint over (src, dst, ts) triples."""
    arrival = dict(seeds)
    work = deque(arrival)
    adj = {}
    for s, d, t in edges:
        adj.setdefault(s, []).append((d, t))
    while work:
        u = work.popleft()
        au = arrival[u]
        for v, t in adj.get(u, ()):
            if t >= au and t < arrival.get(v, float("inf")):
                arrival[v] = t
                work.append(v)
    return arrival


@pytest.mark.parametrize("seed", SEEDS)
def test_earliest_arrival_matches_python(spark, seed):
    rng = random.Random(seed)
    n = 12
    edges = [
        (rng.randrange(n), rng.randrange(n), rng.randrange(50))
        for _ in range(40)
    ]
    seeds = [(0, 0), (5, 10)]
    expected = _py_earliest_arrival(edges, seeds)
    got = {
        r.id: r.arrival
        for r in earliest_arrival(
            spark.createDataFrame(edges, ["src", "dst", "ts"]),
            spark.createDataFrame(seeds, ["id", "t0"]),
            max_rounds=80,
        ).collect()
    }
    assert got == expected


@pytest.mark.parametrize("threshold", [0, 10**9])
def test_earliest_arrival_same_result_both_join_plans(spark, threshold):
    # broadcast path (huge threshold) and shuffle path (0) must agree
    edges = [(i, i + 1, i) for i in range(8)] + [(3, 0, 9)]
    seeds = [(0, 0)]
    out = earliest_arrival(
        spark.createDataFrame(edges, ["src", "dst", "ts"]),
        spark.createDataFrame(seeds, ["id", "t0"]),
        max_rounds=40,
        broadcast_threshold=threshold,
    ).collect()
    expected = _py_earliest_arrival(edges, seeds)
    assert {r.id: r.arrival for r in out} == expected


# ---------------------------------------------------------------------------
# reachable_set vs pure-Python BFS
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", SEEDS)
def test_reachable_set_matches_python(spark, seed):
    rng = random.Random(seed)
    n = 15
    edges = list(
        {(rng.randrange(n), rng.randrange(n)) for _ in range(30)}
    )
    seed_ids = [0, 7]
    fwd_adj, bwd_adj = {}, {}
    for s, d in edges:
        fwd_adj.setdefault(s, []).append(d)
        bwd_adj.setdefault(d, []).append(s)

    def bfs(adj):
        seen = set(seed_ids)
        work = deque(seen)
        while work:
            u = work.popleft()
            for v in adj.get(u, ()):
                if v not in seen:
                    seen.add(v)
                    work.append(v)
        return seen

    e = spark.createDataFrame(edges, [SRC, DST])
    s = spark.createDataFrame([(i,) for i in seed_ids], [ID])
    fwd = {r.id for r in reachable_set(e, s, "forward").collect()}
    bwd = {r.id for r in reachable_set(e, s, "backward").collect()}
    assert fwd == bfs(fwd_adj)
    assert bwd == bfs(bwd_adj)


# ---------------------------------------------------------------------------
# kmv_pairwise vs pure-Python KMV replication
# ---------------------------------------------------------------------------

def _h60(v: str) -> int:
    return int(hashlib.md5(v.encode()).hexdigest()[:15], 16)


def _py_kmv_pairwise(rows, groups, k):
    per = {g: sorted({_h60(str(v)) for gg, v in rows if gg == g})[:k]
           for g in groups}
    out = {}
    for i, a in enumerate(sorted(groups)):
        for b in sorted(groups)[i + 1:]:
            union = sorted(set(per[a]) | set(per[b]))[:k]
            k_eff = len(union)
            common = sum(
                1 for h in union if h in set(per[a]) and h in set(per[b])
            )
            kth = union[-1]
            union_est = (
                float(k_eff)
                if k_eff < k
                else (k - 1) * float(1 << 60) / kth
            )
            out[(a, b)] = (
                k_eff,
                common,
                round(common / k_eff, 6),
                round(union_est, 3),
                round(common / k_eff * union_est, 3),
            )
    return out


@pytest.mark.parametrize("seed", SEEDS[:2])
def test_kmv_pairwise_matches_python(spark, seed):
    rng = random.Random(seed)
    groups = ["a", "b", "c"]
    rows = [
        (rng.choice(groups), rng.randrange(40)) for _ in range(300)
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {
        (r.type_a, r.type_b): (
            r.k_eff, r.common, r.jaccard_est, r.union_est, r.inter_est
        )
        for r in kmv_pairwise(df, "g", "v", groups, k=16).collect()
    }
    assert got == _py_kmv_pairwise(rows, groups, k=16)


# ---------------------------------------------------------------------------
# CriticalPath (double weights) vs pure-Python max-plus DP
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", SEEDS[:2])
def test_critical_path_matches_python_dag(spark, seed):
    rng = random.Random(seed)
    n = 10
    # random DAG: edges only i -> j with i < j
    edges = list(
        {
            (i, j)
            for _ in range(25)
            for i, j in [(rng.randrange(n - 1), rng.randrange(n))]
            if i < j
        }
    )
    wedges = [(s, d, rng.random()) for s, d in edges]
    dist = {i: 0.0 for i in range(n)}
    for i in range(n):  # topological order = numeric order here
        for s, d, w in wedges:
            if s == i:
                dist[d] = max(dist[d], dist[s] + w)
    g = Graph(
        spark.createDataFrame([(i,) for i in range(n)], [ID]),
        spark.createDataFrame(wedges, [SRC, DST, "weight"]),
        directed=True,
        indexed=True,
    )
    got = {
        r.id: r.critical_path
        for r in CriticalPath(weight_col="weight").run(g).collect()
    }
    for i in range(n):
        assert got[i] == pytest.approx(dist[i], abs=1e-9)
