"""parallel_personalized_pagerank (operators/pagerank.py) — round 9.

The reference README's comparison matrix lists ParallelPersonalizedPageRank
as unsupported (reference README.md:30); this is the engine's batched
counterpart. Validated two ways: (a) per-source equivalence with the dense
single-source PageRank(sources=[s]) path (same recurrence, independently
implemented state layouts), (b) a pure-Python replay of the sparse
recurrence on a hand-built digraph.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_graph_spark.constants import DST, ID, SRC
from pyspark_graph_spark.graph import Graph
from pyspark_graph_spark.operators.pagerank import (
    PageRank,
    parallel_personalized_pagerank,
)


def _graph(spark, n, edges, directed=True):
    v = spark.createDataFrame([(i,) for i in range(n)], f"{ID} long")
    e = spark.createDataFrame(sorted(edges), f"{SRC} long, {DST} long")
    return Graph(v, e, directed=directed, indexed=True)


EDGES = {
    (0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 3), (1, 4), (5, 0),
}


def _replay(n, edges, sources, alpha, iters):
    """Sparse pure-Python replay of the documented recurrence."""
    out = {}
    outdeg = {}
    for u, v in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    for s in sources:
        pr = {s: 1.0}
        for _ in range(iters):
            nxt = {s: 1.0 - alpha}
            for (u, v) in edges:
                if u in pr:
                    nxt[v] = nxt.get(v, 0.0) + alpha * pr[u] / outdeg[u]
            pr = nxt
        for v, x in pr.items():
            out[(v, s)] = x
    return out


def test_matches_pure_python_replay(spark):
    got = {
        (r[ID], r["source"]): r["pagerank"]
        for r in parallel_personalized_pagerank(
            _graph(spark, 6, EDGES), [0, 5], alpha=0.85, max_iterations=4
        ).collect()
    }
    want = _replay(6, EDGES, [0, 5], 0.85, 4)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9)


def test_each_source_matches_dense_single_source(spark):
    g = _graph(spark, 6, EDGES)
    batched = parallel_personalized_pagerank(
        g, [0, 3, 5], alpha=0.85, max_iterations=3
    ).collect()
    for s in (0, 3, 5):
        dense = {
            r[ID]: r["pagerank"]
            for r in PageRank(alpha=0.85, max_iterations=3, sources=[s])
            .run(g)
            .collect()
        }
        sparse = {r[ID]: r["pagerank"] for r in batched if r["source"] == s}
        # sparse rows are exactly the positive dense entries
        assert set(sparse) == {v for v, x in dense.items() if x > 0}
        for v, x in sparse.items():
            assert x == pytest.approx(dense[v], rel=1e-9)


def test_duplicate_sources_and_validation(spark):
    g = _graph(spark, 6, EDGES)
    out = parallel_personalized_pagerank(g, [2, 2], max_iterations=2)
    assert out.filter(F.col("source") == 2).count() == out.count()
    with pytest.raises(ValueError):
        parallel_personalized_pagerank(g, [])


def test_undirected_mass_stays_in_component(spark):
    # two components: {0,1,2} path and {3,4} edge — no cross rows ever
    g = _graph(spark, 5, {(0, 1), (1, 2), (3, 4)}, directed=False)
    rows = parallel_personalized_pagerank(
        g, [0, 3], max_iterations=5
    ).collect()
    for r in rows:
        if r["source"] == 0:
            assert r[ID] in (0, 1, 2)
        else:
            assert r[ID] in (3, 4)
