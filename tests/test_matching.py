"""MaximalMatching: exact equivalence with sequential greedy + invariants."""

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pyspark_graph_spark import Graph
from pyspark_graph_spark.constants import DST, SRC
from pyspark_graph_spark.operators import MaximalMatching

from fixtures import sample1, sample2, two_components


def canonical_edges_with_priority(g, seed=0):
    base = g.edges.select(SRC, DST)
    return (
        base.unionByName(
            base.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
        )
        .filter(F.col(SRC) < F.col(DST))
        .distinct()
        .withColumn("p", F.xxhash64(F.col(SRC), F.col(DST), F.lit(seed)))
    )


def sequential_greedy(prio_rows):
    """Greedy matching over edges in ascending (p, src, dst) order —
    the exact fixpoint the parallel peeling must reproduce."""
    matched_v, matched_e = set(), set()
    for p, s, d in sorted(prio_rows):
        if s not in matched_v and d not in matched_v:
            matched_v.update((s, d))
            matched_e.add((s, d))
    return matched_e


def assert_equals_greedy(spark, g):
    prio = [
        (r.p, r[SRC], r[DST])
        for r in canonical_edges_with_priority(g).collect()
    ]
    expected = sequential_greedy(prio)
    # all three execution paths must agree with sequential greedy:
    # pure distributed peel, pure batch finish (default swallows these
    # small graphs whole), and the hybrid transition (peel a few rounds,
    # then batch the residual)
    for mm in (
        MaximalMatching(batch_finish=0),
        MaximalMatching(),
        MaximalMatching(batch_finish=8),
    ):
        got = {(r[SRC], r[DST]) for r in mm.run(g).collect()}
        assert got == expected, f"batch_finish={mm.batch_finish}"


def test_matching_equals_sequential_greedy_fixtures(spark):
    for fix in (sample1, sample2, two_components):
        assert_equals_greedy(spark, fix(spark, directed=False))


def test_matching_equals_sequential_greedy_random(spark):
    rng = random.Random(11)
    edges = list(
        {
            (rng.randrange(40), rng.randrange(40))
            for _ in range(160)
        }
    )
    v = spark.createDataFrame([(i,) for i in range(40)], ["id"])
    e = spark.createDataFrame(edges, ["src", "dst"])
    g = Graph(v, e, directed=False)
    assert_equals_greedy(spark, g)


def test_matching_invariants(spark):
    g = sample1(spark, directed=False)
    m = MaximalMatching().run(g).collect()
    # vertex-disjoint: no vertex in two matched edges
    verts = [x for r in m for x in (r[SRC], r[DST])]
    assert len(verts) == len(set(verts))
    # maximal: every graph edge touches a matched vertex
    mv = set(verts)
    base = g.edges.select(SRC, DST).collect()
    assert all(r[SRC] in mv or r[DST] in mv for r in base)


def test_matching_empty_graph(spark):
    v = spark.createDataFrame([(1,), (2,)], ["id"])
    e = spark.createDataFrame([], "src long, dst long")
    g = Graph(v, e, directed=False)
    assert MaximalMatching().run(g).count() == 0


def test_weighted_matching_equals_sequential_greedy_by_weight(spark):
    rng = random.Random(23)
    edges = list(
        {(rng.randrange(30), rng.randrange(30)) for _ in range(120)}
    )
    weighted = [(s, d, float(rng.randrange(1, 9))) for s, d in edges]
    v = spark.createDataFrame([(i,) for i in range(30)], ["id"])
    e = spark.createDataFrame(weighted, ["src", "dst", "w"])
    g = Graph(v, e, directed=False)
    # replay: canonicalize + priorities exactly as the operator does
    base = g.edges.select(SRC, DST, "w")
    prio = (
        base.unionByName(
            base.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST), "w")
        )
        .filter(F.col(SRC) < F.col(DST))
        .distinct()
        .withColumn("p", F.xxhash64(F.col(SRC), F.col(DST), F.lit(0)))
        .collect()
    )
    order = sorted((-r.w, r.p, r[SRC], r[DST]) for r in prio)
    matched_v, expected = set(), set()
    for _, _, s, d in order:
        if s not in matched_v and d not in matched_v:
            matched_v.update((s, d))
            expected.add((s, d))
    for bf in (0, 8, 100_000):
        got = {
            (r[SRC], r[DST])
            for r in MaximalMatching(
                weight_col="w", batch_finish=bf
            ).run(g).collect()
        }
        assert got == expected, f"batch_finish={bf}"


def test_coarsen_matching_contraction(spark):
    from pyspark_graph_spark.operators.matching import coarsen

    g = sample2(spark, directed=False)
    m = MaximalMatching().run(g)
    n_matched = m.count()
    coarse, mapping = coarsen(g, m)
    # |V(coarse)| = |V| - |M| exactly
    assert coarse.vertices.count() == g.vertices.count() - n_matched
    # every input vertex mapped exactly once
    assert mapping.count() == g.vertices.count()
    assert mapping.select("id").distinct().count() == g.vertices.count()
    rows = coarse.edges.collect()
    # no self loops; canonical order; weights count parallel originals
    assert all(r.src < r.dst for r in rows)
    total_weight = sum(r.weight for r in rows)
    sup = {r.id: r.super for r in mapping.collect()}
    base = g.edges.select("src", "dst").collect()
    crossing = [r for r in base if sup[r.src] != sup[r.dst]]
    assert total_weight == len(crossing)


def test_coarsen_twice_preserves_fine_edge_weights(spark):
    """Level-2 coarse weights must stay in FINE-edge units: a second
    coarsen() sums the level-1 weight column instead of counting
    level-1 edges, so Σ weight over level-2 edges equals the number of
    fine edges whose endpoints land in different level-2 supers."""
    from pyspark_graph_spark.operators.matching import coarsen

    g = sample2(spark, directed=False)
    m1 = MaximalMatching(seed=0).run(g)
    c1, map1 = coarsen(g, m1)
    m2 = MaximalMatching(seed=1).run(c1)
    if m2.isEmpty():  # nothing contractible at level 1: vacuous
        return
    c2, map2 = coarsen(c1, m2, sum_weights=True)
    # compose fine -> level-2 super
    s1 = {r.id: r.super for r in map1.collect()}
    s2 = {r.id: r.super for r in map2.collect()}
    fine = g.edges.select("src", "dst").collect()
    crossing = [
        r for r in fine if s2[s1[r.src]] != s2[s1[r.dst]]
    ]
    total_weight = sum(r.weight for r in c2.edges.collect())
    assert total_weight == len(crossing)
