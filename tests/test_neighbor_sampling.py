"""Bounded k-hop neighbor sampling (operators/neighbor_sampling.py)."""

import pytest
from pyspark.sql import functions as F

from pyspark_graph_spark.graph import Graph
from pyspark_graph_spark.operators.neighbor_sampling import NeighborSampler


def star_plus_chain(spark):
    """Hub 0 with leaves 1..10, and a chain 1-101-201."""
    edges = [(0, i) for i in range(1, 11)] + [(1, 101), (101, 201)]
    e = spark.createDataFrame(edges, ["src", "dst"])
    ids = sorted({u for p in edges for u in p})
    v = spark.createDataFrame([(i,) for i in ids], ["id"])
    return Graph(v, e, directed=False, indexed=True)


def seeds_of(spark, *ids):
    return spark.createDataFrame([(i,) for i in ids], ["id"])


def test_fanout_caps_hub_expansion(spark):
    g = star_plus_chain(spark)
    out = NeighborSampler(fanouts=[3], undirected=True).run(
        g, seeds_of(spark, 0)
    )
    rows = out.collect()
    assert len(rows) == 3
    assert all(r.hop == 1 and r.src == 0 for r in rows)
    assert len({r.dst for r in rows}) == 3


def test_hop_numbering_and_frontier_progression(spark):
    g = star_plus_chain(spark)
    out = NeighborSampler(fanouts=[1, 2], undirected=True).run(
        g, seeds_of(spark, 201)
    )
    by_hop = {}
    for r in out.collect():
        by_hop.setdefault(r.hop, []).append((r.src, r.dst))
    # 201's only neighbor is 101
    assert by_hop[1] == [(201, 101)]
    # hop 2 leaves 101: neighbors {1, 201}, capped at 2
    assert {s for s, _ in by_hop[2]} == {101}
    assert len(by_hop[2]) == 2


def test_deterministic_and_salt_redraws(spark):
    g = star_plus_chain(spark)
    s = seeds_of(spark, 0)
    a = sorted(tuple(r) for r in NeighborSampler([3]).run(g, s).collect())
    b = sorted(tuple(r) for r in NeighborSampler([3]).run(g, s).collect())
    assert a == b
    # across many salts the drawn set should vary at least once
    draws = {
        tuple(sorted(r.dst for r in NeighborSampler([3], salt=str(k)).run(g, s).collect()))
        for k in range(6)
    }
    assert len(draws) > 1


def test_sample_is_subset_of_true_neighbors(spark):
    g = star_plus_chain(spark)
    out = NeighborSampler(fanouts=[5, 5], undirected=True).run(
        g, seeds_of(spark, 1)
    )
    sym = {(r.src, r.dst) for r in g.edges.collect()}
    sym |= {(b, a) for a, b in sym}
    for r in out.collect():
        assert (r.src, r.dst) in sym


def test_fanout_larger_than_degree_keeps_all(spark):
    g = star_plus_chain(spark)
    out = NeighborSampler(fanouts=[99], undirected=True).run(
        g, seeds_of(spark, 0)
    )
    assert {r.dst for r in out.collect()} == set(range(1, 11))


def test_invalid_fanouts_raise(spark):
    with pytest.raises(ValueError):
        NeighborSampler([])
    with pytest.raises(ValueError):
        NeighborSampler([2, 0])


def test_directed_respects_edge_direction(spark):
    e = spark.createDataFrame([(1, 2), (3, 1)], ["src", "dst"])
    v = spark.createDataFrame([(1,), (2,), (3,)], ["id"])
    g = Graph(v, e, directed=True, indexed=True)
    out = NeighborSampler(fanouts=[5], undirected=False).run(
        g, seeds_of(spark, 1)
    )
    # only the out-edge 1->2 is visible
    assert [(r.src, r.dst) for r in out.collect()] == [(1, 2)]
