"""Bounded-batch spectral kernels (round 12) == the distributed plans.

Same contract as tests/test_svd_batch.py: 1e-9 elementwise agreement and
exact equality at the gate queries' 6-decimal rounding.
"""

from __future__ import annotations

import pytest

from pyspark_graph_spark.constants import ID
from pyspark_graph_spark.graph import Graph
from pyspark_graph_spark.operators.spectral import HITS, EigenvectorCentrality


def _graph(spark, directed):
    edges = [
        (0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2), (5, 3),
        (6, 7), (1, 4), (0, 3),
    ]
    v = spark.createDataFrame([(i,) for i in range(9)], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    return Graph(v, e, directed=directed, indexed=True)


def _pin(a, b, cols):
    am = {r[ID]: tuple(r[c] for c in cols) for r in a.collect()}
    bm = {r[ID]: tuple(r[c] for c in cols) for r in b.collect()}
    assert set(am) == set(bm)
    for k in am:
        for x, y in zip(am[k], bm[k]):
            assert x == pytest.approx(y, abs=1e-9)
            assert round(x, 6) == round(y, 6)


def test_eigenvector_batch_equals_distributed(spark):
    g = _graph(spark, directed=False)
    a = EigenvectorCentrality(iterations=5).run(g)
    b = EigenvectorCentrality(iterations=5, batch_finish=0).run(g)
    _pin(a, b, ["eigenvector"])


def test_hits_batch_equals_distributed(spark):
    g = _graph(spark, directed=True)
    a = HITS(iterations=4).run(g)
    b = HITS(iterations=4, batch_finish=0).run(g)
    _pin(a, b, ["hub", "authority"])


def test_hits_batch_nonvertex_destination_relays(spark):
    """An edge destination outside the vertex table still relays hub
    mass within a round (auth is not verts-refilled mid-round) — the
    kernel must reproduce the distributed plan's values exactly."""
    v = spark.createDataFrame([(0,), (1,), (3,)], "id long")
    e = spark.createDataFrame(
        [(0, 2), (2, 3), (1, 2), (0, 1)], "src long, dst long"
    )
    g = Graph(v, e, directed=True, indexed=True)
    a = HITS(iterations=3).run(g)
    b = HITS(iterations=3, batch_finish=0).run(g)
    _pin(a, b, ["hub", "authority"])


def test_betweenness_batch_equals_distributed(spark):
    """Batch Brandes == distributed sweeps (1e-9 + 6dp equality),
    including a source outside the vertex table and a depth budget."""
    from pyspark_graph_spark.operators.betweenness import (
        BetweennessCentrality,
    )

    edges = [
        (0, 1), (1, 2), (2, 3), (3, 4), (1, 5), (5, 3), (4, 6),
        (6, 7), (7, 0), (2, 8),
    ]
    v = spark.createDataFrame([(i,) for i in range(9)], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    g = Graph(v, e, directed=False, indexed=True)
    a = BetweennessCentrality([0, 3, 99], max_depth=4).run(g)
    b = BetweennessCentrality([0, 3, 99], max_depth=4, batch_finish=0).run(g)
    _pin(a, b, ["betweenness"])


def _louvain_pin(spark, **kw):
    from pyspark_graph_spark.operators.louvain import Louvain

    edges = [
        (0, 1, 3), (1, 2, 1), (0, 2, 2), (3, 4, 4), (4, 5, 2),
        (3, 5, 1), (2, 3, 1), (6, 6, 2), (6, 0, 1), (7, 8, 5),
    ]
    v = spark.createDataFrame([(i,) for i in range(10)], "id long")
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    g = Graph(v, e, directed=False, indexed=True)
    a = Louvain(weight_col="w", **kw).run(g)
    b = Louvain(weight_col="w", batch_finish=0, **kw).run(g)
    am = {r[ID]: r["community"] for r in a.collect()}
    bm = {r[ID]: r["community"] for r in b.collect()}
    assert am == bm


def test_louvain_batch_equals_distributed_fixed_rounds(spark):
    """Exact integer move arithmetic: batch == distributed bit for bit
    (the gate shape, fixed_rounds=3)."""
    _louvain_pin(spark, fixed_rounds=3)


def test_louvain_batch_equals_distributed_probed(spark):
    """Probed mode replays the stop-after-any-no-move-round rule."""
    _louvain_pin(spark, max_rounds=10)


def test_kahn_batch_equals_distributed(spark):
    """Batch Kahn == distributed peel exactly, including cycle NULLs,
    self-loops, the round budget, and a non-vertex edge source that
    blocks its destination forever."""
    from pyspark_graph_spark.operators.dag import TopologicalLayers

    edges = [
        (0, 1), (1, 2), (0, 2), (2, 3), (4, 5), (5, 4),  # 4<->5 cycle
        (6, 6),  # self-loop
        (99, 7),  # non-vertex source blocks 7
    ]
    v = spark.createDataFrame([(i,) for i in range(9)], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    g = Graph(v, e, directed=True, indexed=True)
    for itr in (30, 2):  # full run and a truncating budget
        a = TopologicalLayers(max_iterations=itr).run(g)
        b = TopologicalLayers(max_iterations=itr, batch_finish=0).run(g)
        am = {r[ID]: r["layer"] for r in a.collect()}
        bm = {r[ID]: r["layer"] for r in b.collect()}
        assert am == bm


def test_critical_path_batch_equals_distributed(spark):
    from pyspark_graph_spark.operators.dag import CriticalPath

    edges = [
        (0, 1, 2.5), (1, 2, 1.0), (0, 2, 1.25), (2, 3, 4.0), (1, 3, 0.5),
    ]
    v = spark.createDataFrame([(i,) for i in range(4)], "id long")
    e = spark.createDataFrame(edges, "src long, dst long, weight double")
    g = Graph(v, e, directed=True, indexed=True)
    a = CriticalPath().run(g)
    b = CriticalPath(batch_finish=0).run(g)
    am = {r[ID]: r["critical_path"] for r in a.collect()}
    bm = {r[ID]: r["critical_path"] for r in b.collect()}
    assert am == bm  # exact: max-plus has no accumulation


def test_critical_path_batch_cycle_raises_same(spark):
    import pytest as _pt

    from pyspark_graph_spark.operators.dag import CriticalPath

    v = spark.createDataFrame([(0,), (1,)], "id long")
    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 0, 1.0)], "src long, dst long, weight double"
    )
    g = Graph(v, e, directed=True, indexed=True)
    for bf in (1_000_000, 0):
        with _pt.raises(ValueError, match="did not converge"):
            CriticalPath(max_iterations=5, batch_finish=bf).run(g)


def test_md5_walks_batch_equals_distributed(spark):
    """md5-mode walks are a pure function of (graph, seed): batch ==
    distributed bit for bit, including early-ended walks."""
    from pyspark_graph_spark.operators.walks import RandomWalks

    edges = [(0, 1), (1, 2), (2, 3), (3, 1), (4, 4), (5, 6)]
    v = spark.createDataFrame([(i,) for i in range(8)], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    g = Graph(v, e, directed=True, indexed=True)
    a = RandomWalks(length=6, walks_per_vertex=2, hash_mode="md5").run(g)
    b = RandomWalks(
        length=6, walks_per_vertex=2, hash_mode="md5", batch_finish=0
    ).run(g)
    am = {(r["walk_id"], r["start"]): list(r["path"]) for r in a.collect()}
    bm = {(r["walk_id"], r["start"]): list(r["path"]) for r in b.collect()}
    assert am == bm
