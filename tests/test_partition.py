"""MultilevelPartition: coverage, balance (Graham bound), cut reporting,
stall contract."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark_graph_spark.constants import DST, ID, SRC
from pyspark_graph_spark.graph import Graph
from pyspark_graph_spark.operators.partition import (
    MultilevelPartition,
    partition_report,
)


def _graph(spark, n, edges):
    v = spark.createDataFrame([(i,) for i in range(n)], f"{ID} long")
    e = spark.createDataFrame(edges, f"{SRC} long, {DST} long")
    return Graph(v, e, directed=False, indexed=True)


def _path(spark, n):
    return _graph(spark, n, [(i, i + 1) for i in range(n - 1)])


def test_every_vertex_gets_exactly_one_part(spark):
    g = _path(spark, 16)
    parts = MultilevelPartition(k=3, max_coarse=4, seed=1).run(g)
    rows = parts.collect()
    assert sorted(r[ID] for r in rows) == list(range(16))
    assert all(0 <= r.part < 3 for r in rows)


def test_all_k_parts_used_when_enough_supervertices(spark):
    # greedy fills empty bins first, so parts_used = min(k, n_coarsest)
    g = _path(spark, 16)
    parts = MultilevelPartition(k=4, max_coarse=4).run(g)
    n_super = parts.select("super").distinct().count()
    assert parts.select("part").distinct().count() == min(4, n_super)
    # and with a coarsest level guaranteed >= k (halving can't jump from
    # >8 below 5), all 4 parts must be used
    parts8 = MultilevelPartition(k=4, max_coarse=8).run(g)
    assert parts8.select("part").distinct().count() == 4


def test_graham_balance_bound(spark):
    # two dense blobs + a path tail: skewed supervertex sizes
    edges = (
        [(a, b) for a in range(5) for b in range(a + 1, 5)]
        + [(a, b) for a in range(5, 10) for b in range(a + 1, 10)]
        + [(i, i + 1) for i in range(10, 19)]
        + [(4, 5), (9, 10)]
    )
    g = _graph(spark, 20, edges)
    k = 3
    parts = MultilevelPartition(k=k, max_coarse=6, seed=2).run(g)
    sizes = {
        r.part: r.c
        for r in parts.groupBy("part")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    max_super = (
        parts.groupBy("super")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c").alias("m"))
        .collect()[0]
        .m
    )
    bound = 20 / k + max_super
    assert all(s <= bound for s in sizes.values())


def test_partition_report_invariants_and_cut(spark):
    g = _path(spark, 8)
    parts = MultilevelPartition(k=2, max_coarse=2).run(g)
    rep = partition_report(g, parts.select(ID, "part")).collect()[0]
    assert rep.assign_defect == 0
    assert rep.k_defect == 0
    # a connected path split into 2 nonempty parts must cut >= 1 edge
    assert rep.cut_edges >= 1


def test_no_coarsening_when_already_small(spark):
    g = _path(spark, 6)
    parts = MultilevelPartition(k=2, max_coarse=100).run(g)
    # supers are the vertices themselves: no contraction happened
    assert parts.filter(F.col(ID) != F.col("super")).count() == 0
    assert parts.count() == 6


def test_isolated_residue_raises_when_over_batch(spark):
    g = _graph(spark, 6, [])  # no edges: nothing contractible
    with pytest.raises(ValueError, match="stalled"):
        MultilevelPartition(k=2, max_coarse=2, max_batch=3).run(g)


def test_isolated_residue_ok_within_batch(spark):
    g = _graph(spark, 6, [])
    parts = MultilevelPartition(k=2, max_coarse=2, max_batch=10).run(g)
    assert parts.count() == 6
    sizes = [
        r.c
        for r in parts.groupBy("part")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ]
    assert sorted(sizes) == [3, 3]  # unit items pack perfectly


def test_k_validation(spark):
    with pytest.raises(ValueError, match="k must be positive"):
        MultilevelPartition(k=0)


def test_first_matching_reuse_matches_fresh_run(spark):
    from pyspark_graph_spark.operators.matching import MaximalMatching

    g = _path(spark, 16)
    m0 = MaximalMatching(seed=0).run(g)
    a = MultilevelPartition(k=2, max_coarse=4, seed=0).run(g)
    b = MultilevelPartition(
        k=2, max_coarse=4, seed=0, first_matching=m0
    ).run(g)
    assert sorted(map(tuple, a.collect())) == sorted(
        map(tuple, b.collect())
    )


# ---------------------------------------------------------------------------
# refine: independent-set boundary moves — cut monotonically decreases,
# balance cap respected, assignment stays total
# ---------------------------------------------------------------------------

def _cut(g, parts):
    return partition_report(g, parts).collect()[0].cut_edges


def test_refine_improves_alternating_path(spark):
    from pyspark_graph_spark.operators.partition import refine

    g = _path(spark, 12)
    # worst-case assignment: alternate parts along the path (cut = 11)
    bad = spark.createDataFrame(
        [(i, i % 2) for i in range(12)], f"{ID} long, part int"
    )
    out = refine(g, bad, k=2, cap=8, rounds=4, seed=1)
    assert sorted(r[ID] for r in out.collect()) == list(range(12))
    assert _cut(g, out) < _cut(g, bad)
    # balance cap holds
    sizes = [
        r.c
        for r in out.groupBy("part").agg(F.count(F.lit(1)).alias("c")).collect()
    ]
    assert max(sizes) <= 8


def test_refine_never_increases_cut(spark):
    from pyspark_graph_spark.operators.partition import refine

    edges = (
        [(a, b) for a in range(5) for b in range(a + 1, 5)]
        + [(a, b) for a in range(5, 10) for b in range(a + 1, 10)]
        + [(0, 5), (1, 6), (2, 7)]
    )
    g = _graph(spark, 10, edges)
    for seed in (0, 1, 2):
        # hash-scrambled initial assignment
        init = spark.createDataFrame(
            [(i, (i * 7 + seed) % 3) for i in range(10)],
            f"{ID} long, part int",
        )
        out = refine(g, init, k=3, cap=10, rounds=3, seed=seed)
        assert _cut(g, out) <= _cut(g, init)
        assert out.count() == 10


def test_refine_cap_blocks_moves(spark):
    from pyspark_graph_spark.operators.partition import refine

    # star: leaves all want the center's part, but cap forbids any intake
    g = _graph(spark, 5, [(0, i) for i in range(1, 5)])
    init = spark.createDataFrame(
        [(0, 0)] + [(i, 1) for i in range(1, 5)], f"{ID} long, part int"
    )
    out = refine(g, init, k=2, cap=1, rounds=2)
    # part 0 already holds 1 vertex = cap, so nothing may move into it;
    # center moving to part 1 is the only legal improvement
    sizes = {
        r.part: r.c
        for r in out.groupBy("part").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert all(v <= max(1, sizes.get(1, 0)) for k_, v in sizes.items() if k_ == 0)
    assert _cut(g, out) <= _cut(g, init)


def test_refine_cap_as_dataframe(spark):
    from pyspark_graph_spark.operators.partition import refine

    g = _path(spark, 12)
    bad = spark.createDataFrame(
        [(i, i % 2) for i in range(12)], f"{ID} long, part int"
    )
    cap_df = spark.createDataFrame([(8,)], "cap long")
    a = refine(g, bad, k=2, cap=8, rounds=2, seed=3)
    b = refine(g, bad, k=2, cap=cap_df, rounds=2, seed=3)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# --- round 7: 2-hop matching (hub-star coarsening fix) ----------------------


def test_two_hop_pairs_star(spark):
    """Hub 0 with leaves 1..9, matching (0,1): the 8 unmatched leaves all
    anchor to hub 0 and pair consecutively by id — 4 pairs, disjoint from
    the matching and from each other, odd leaf out unmatched."""
    from pyspark_graph_spark.operators.partition import two_hop_pairs

    g = _graph(spark, 10, [(0, i) for i in range(1, 10)])
    m = spark.createDataFrame([(0, 1)], f"{SRC} long, {DST} long")
    pairs = two_hop_pairs(g, m).collect()
    assert {(r.src, r.dst) for r in pairs} == {
        (2, 3), (4, 5), (6, 7), (8, 9)
    }
    touched = [v for r in pairs for v in (r.src, r.dst)]
    assert len(touched) == len(set(touched))
    assert not ({0, 1} & set(touched))


def test_two_hop_union_is_valid_contraction_set(spark):
    """On a random-ish graph the matching ∪ 2-hop pairs must still be
    vertex-disjoint (coarsen's only requirement on its input)."""
    from pyspark_graph_spark.operators import MaximalMatching
    from pyspark_graph_spark.operators.partition import two_hop_pairs

    edges = [(i, (i * 7 + 1) % 40) for i in range(40)] + [
        (0, j) for j in range(10, 30)  # a hub star on top
    ]
    g = _graph(spark, 40, [(a, b) for a, b in edges if a != b])
    m = MaximalMatching().run(g)
    union = m.select(SRC, DST).unionByName(two_hop_pairs(g, m))
    touched = [
        v for r in union.collect() for v in (r.src, r.dst)
    ]
    assert len(touched) == len(set(touched))


def test_multilevel_two_hop_coarsens_stars_and_keeps_invariants(spark):
    """A 3-hub star forest defeats pure edge matching (each level removes
    ~1 vertex per hub); with two_hop=True the level count drops while the
    partition invariants (totality, Graham balance) still hold."""
    edges = (
        [(0, i) for i in range(3, 100)]
        + [(1, i) for i in range(100, 200)]
        + [(2, i) for i in range(200, 300)]
        + [(0, 1), (1, 2)]
    )
    g = _graph(spark, 300, edges)
    out = MultilevelPartition(k=4, max_coarse=16, max_levels=12).run(g)
    rows = out.collect()
    assert len(rows) == 300
    assert {r.part for r in rows} <= set(range(4))
    rep = partition_report(g, out.select(ID, "part")).collect()[0]
    assert rep.assign_defect == 0


def test_multilevel_two_hop_false_reverts(spark):
    """two_hop=False is the pure edge-matching coarsening; on a plain path
    both modes produce a full valid assignment."""
    g = _path(spark, 64)
    a = MultilevelPartition(k=2, max_coarse=8, two_hop=False).run(g)
    b = MultilevelPartition(k=2, max_coarse=8, two_hop=True).run(g)
    assert a.count() == 64 and b.count() == 64


def test_two_hop_pairs_mega_hub_sub_buckets(spark):
    """A 1000-leaf hub exceeds the 256-leaf sub-bucket threshold: pairing
    must stay disjoint and near-complete (≤1 unpaired leftover per
    sub-bucket), with no single window partition holding all leaves."""
    from pyspark_graph_spark.operators.partition import two_hop_pairs

    n = 1001
    g = _graph(spark, n, [(0, i) for i in range(1, n)])
    m = spark.createDataFrame([(0, 1)], f"{SRC} long, {DST} long")
    pairs = two_hop_pairs(g, m).collect()
    touched = [v for r in pairs for v in (r.src, r.dst)]
    assert len(touched) == len(set(touched))  # disjoint
    assert 0 not in touched and 1 not in touched
    # 999 unmatched leaves over ceil-free floor(999/128)=7 buckets:
    # at most 7 leftovers -> at least (999-7)//2 pairs
    assert len(pairs) >= (999 - 7) // 2
