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


# ---------------------------------------------------------------------------
# BipartiteCheck (double cover)
# ---------------------------------------------------------------------------

from pyspark_graph_spark.operators.bipartite import BipartiteCheck
from pyspark_graph_spark.operators.dag import TopologicalLayers


def _bip(spark, edges, n):
    v = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    e = spark.createDataFrame(edges, ["src", "dst"])
    g = Graph(v, e, directed=False, indexed=True)
    return {r["id"]: r for r in BipartiteCheck().run(g).collect()}


def test_bipartite_even_cycle(spark):
    rows = _bip(spark, [(0, 1), (1, 2), (2, 3), (3, 0)], 4)
    assert all(rows[i]["bipartite"] for i in range(4))
    # proper coloring: adjacent vertices differ
    for u, v in [(0, 1), (1, 2), (2, 3), (3, 0)]:
        assert rows[u]["color"] != rows[v]["color"]
    assert {rows[i]["component"] for i in range(4)} == {0}


def test_bipartite_odd_cycle_rejected(spark):
    rows = _bip(spark, [(0, 1), (1, 2), (2, 0)], 3)
    assert not any(rows[i]["bipartite"] for i in range(3))
    assert all(rows[i]["color"] is None for i in range(3))


def test_bipartite_self_loop_is_odd_cycle(spark):
    rows = _bip(spark, [(0, 1), (1, 1)], 2)
    assert not rows[0]["bipartite"] and not rows[1]["bipartite"]


def test_bipartite_mixed_components(spark):
    # component {0,1}: bipartite edge; component {2,3,4}: triangle
    rows = _bip(spark, [(0, 1), (2, 3), (3, 4), (4, 2)], 5)
    assert rows[0]["bipartite"] and rows[1]["bipartite"]
    assert rows[0]["color"] != rows[1]["color"]
    assert not rows[2]["bipartite"]
    assert rows[0]["component"] == 0 and rows[2]["component"] == 2
    # isolated-free: every vertex reported exactly once
    assert len(rows) == 5


def test_bipartite_isolated_vertex_is_bipartite(spark):
    rows = _bip(spark, [(0, 1)], 3)
    assert rows[2]["bipartite"] and rows[2]["component"] == 2


# ---------------------------------------------------------------------------
# TopologicalLayers (Kahn peel)
# ---------------------------------------------------------------------------


def _layers(spark, edges, n, max_iterations=30):
    v = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    e = spark.createDataFrame(edges, ["src", "dst"])
    g = Graph(v, e, directed=True, indexed=True)
    out = TopologicalLayers(max_iterations=max_iterations).run(g)
    return {r["id"]: r["layer"] for r in out.collect()}


def test_layers_diamond_dag(spark):
    #    0 -> 1 -> 3,  0 -> 2 -> 3, 2 -> 4
    got = _layers(spark, [(0, 1), (0, 2), (1, 3), (2, 3), (2, 4)], 5)
    assert got == {0: 0, 1: 1, 2: 1, 3: 2, 4: 2}


def test_layers_longest_path_not_shortest(spark):
    # 0->3 direct, but 0->1->2->3 forces layer(3)=3
    got = _layers(spark, [(0, 3), (0, 1), (1, 2), (2, 3)], 4)
    assert got[3] == 3


def test_layers_cycle_marked_null(spark):
    # 0 -> 1 -> 2 -> 1 cycle; 3 isolated
    got = _layers(spark, [(0, 1), (1, 2), (2, 1)], 4)
    assert got[0] == 0 and got[3] == 0
    assert got[1] is None and got[2] is None


def test_layers_self_loop_null_downstream_too(spark):
    got = _layers(spark, [(0, 0), (0, 1)], 2)
    assert got[0] is None and got[1] is None


def test_layers_matches_python_dp(spark):
    rng = random.Random(7)
    n = 20
    edges = [
        (u, v)
        for u in range(n)
        for v in range(u + 1, n)
        if rng.random() < 0.15
    ]
    got = _layers(spark, edges, n)
    # python longest-path DP over the topological (natural) order
    depth = [0] * n
    for u in range(n):
        for a, b in edges:
            if a == u:
                depth[b] = max(depth[b], depth[u] + 1)
    assert got == {i: depth[i] for i in range(n)}


# ---------------------------------------------------------------------------
# 4-cycle census invariants (gate logic tested on known graphs)
# ---------------------------------------------------------------------------


def _c4_count(spark, edges):
    from pyspark.sql import functions as F

    sym = spark.createDataFrame(edges, ["src", "dst"])
    sym = sym.unionByName(sym.selectExpr("dst AS src", "src AS dst")).distinct()
    a, b = sym.alias("a"), sym.alias("b")
    cn = (
        a.join(b, on=[F.col("a.dst") == F.col("b.dst"),
                      F.col("a.src") < F.col("b.src")])
        .groupBy(F.col("a.src"), F.col("b.src"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return cn.agg(
        F.floor(F.sum(F.col("c") * (F.col("c") - 1) / 2) / 2)
        .cast("long").alias("c4")
    ).first()["c4"]


def test_four_cycles_known_graphs(spark):
    # a single square has exactly one 4-cycle
    assert _c4_count(spark, [(0, 1), (1, 2), (2, 3), (3, 0)]) == 1
    # K4: 3 distinct 4-cycles
    k4 = [(u, v) for u in range(4) for v in range(u + 1, 4)]
    assert _c4_count(spark, k4) == 3
    # K5: C(5,4) * 3 = 15
    k5 = [(u, v) for u in range(5) for v in range(u + 1, 5)]
    assert _c4_count(spark, k5) == 15
    # triangle has none
    assert _c4_count(spark, [(0, 1), (1, 2), (2, 0)]) == 0


# --------------------------------------------------------------------------
# CriticalPath (max-plus DP)
# --------------------------------------------------------------------------


def test_critical_path_diamond(spark):
    from pyspark_graph_spark import Graph
    from pyspark_graph_spark.operators.dag import CriticalPath

    # diamond 0 -> {1, 2} -> 3 with asymmetric weights: the long arm wins
    v = spark.createDataFrame([(i,) for i in range(4)], ["id"])
    e = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 10), (1, 3, 1), (2, 3, 1)],
        ["src", "dst", "weight"],
    )
    g = Graph(v, e, directed=True, indexed=True)
    out = {r["id"]: r["critical_path"] for r in CriticalPath().run(g).collect()}
    assert out == {0: 0, 1: 1, 2: 10, 3: 11}


def test_critical_path_raises_on_cycle(spark):
    import pytest as _pytest

    from pyspark_graph_spark import Graph
    from pyspark_graph_spark.operators.dag import CriticalPath

    v = spark.createDataFrame([(i,) for i in range(2)], ["id"])
    e = spark.createDataFrame(
        [(0, 1, 1), (1, 0, 1)], ["src", "dst", "weight"]
    )
    g = Graph(v, e, directed=True, indexed=True)
    with _pytest.raises(ValueError):
        CriticalPath(max_iterations=5).run(g)


def test_mst_batch_cc_equals_distributed(spark):
    """Round 9: the bounded-batch union-find contraction must produce the
    IDENTICAL forest as the distributed AlternatingCC contraction — the
    same provably-equal-continuation contract as matching's
    batch_finish."""
    import random
    from pyspark.sql import functions as F
    from pyspark_graph_spark.constants import DST, ID, SRC
    from pyspark_graph_spark.graph import Graph
    from pyspark_graph_spark.operators.mst import BoruvkaMST

    rng = random.Random(11)
    n = 40
    edges = {
        (a, b)
        for _ in range(140)
        for a, b in [sorted(rng.sample(range(n), 2))]
    }
    rows = [(a, b, float((a * 7 + b * 13) % 29 + 1)) for a, b in edges]
    v = spark.createDataFrame([(i,) for i in range(n)], f"{ID} long")
    e = spark.createDataFrame(rows, f"{SRC} long, {DST} long, weight double")
    g = Graph(v, e, directed=False, indexed=True)
    batch = {
        (r[SRC], r[DST], r["weight"])
        for r in BoruvkaMST().run(g).collect()
    }
    dist = {
        (r[SRC], r[DST], r["weight"])
        for r in BoruvkaMST(batch_cc=0).run(g).collect()
    }
    assert batch == dist and len(batch) > 0
