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
