"""Louvain community detection + modularity metric (operators/louvain.py).

The reference has no modularity-based detector (only LabelPropagation,
reference label_propagation.py:11-35); these tests pin the semantics against
hand-computed modularity values and structural invariants.
"""

from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from pyspark_graph_spark.graph import Graph
from pyspark_graph_spark.operators.louvain import (
    Louvain,
    canonical_undirected,
    modularity,
)


def two_cliques(spark, bridge=True):
    """Two 4-cliques {0..3} and {10..13}, optionally bridged by (3, 10)."""
    edges = []
    for grp in ([0, 1, 2, 3], [10, 11, 12, 13]):
        for i in range(4):
            for j in range(i + 1, 4):
                edges.append((grp[i], grp[j]))
    if bridge:
        edges.append((3, 10))
    e = spark.createDataFrame(edges, ["src", "dst"])
    v = spark.createDataFrame(
        [(i,) for i in [0, 1, 2, 3, 10, 11, 12, 13]], ["id"]
    )
    return Graph(v, e, directed=False, indexed=True)


def python_modularity(edges, assignment):
    """Independent fraction-exact oracle: Q = sum_c(e_c/m - (deg_c/2m)^2)."""
    und = {tuple(sorted(e)) for e in edges}
    m = len(und)
    deg: dict = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    e_c: dict = {}
    deg_c: dict = {}
    for v, d in deg.items():
        deg_c[assignment[v]] = deg_c.get(assignment[v], 0) + d
    for a, b in und:
        if assignment[a] == assignment[b]:
            e_c[assignment[a]] = e_c.get(assignment[a], 0) + 1
    q = Fraction(0)
    for c, d in deg_c.items():
        q += Fraction(e_c.get(c, 0), m) - Fraction(d, 2 * m) ** 2
    return float(q)


def test_modularity_matches_fraction_oracle(spark):
    g = two_cliques(spark)
    edges = [(r.src, r.dst) for r in g.edges.collect()]
    asg = {i: (0 if i < 10 else 1) for i in [0, 1, 2, 3, 10, 11, 12, 13]}
    asg_df = spark.createDataFrame(
        [(k, v) for k, v in asg.items()], ["id", "community"]
    )
    got = modularity(g, asg_df).first()["modularity"]
    assert got == pytest.approx(python_modularity(edges, asg), abs=1e-12)


def test_modularity_singletons_negative(spark):
    g = two_cliques(spark)
    singles = g.vertices.select("id", F.col("id").alias("community"))
    assert modularity(g, singles).first()["modularity"] < 0


def test_louvain_recovers_planted_cliques(spark):
    g = two_cliques(spark)
    out = {r.id: r.community for r in Louvain(max_rounds=8).run(g).collect()}
    # labels are canonical minimum member ids
    assert {out[i] for i in (0, 1, 2, 3)} == {0}
    assert {out[i] for i in (10, 11, 12, 13)} == {10}


def test_louvain_beats_singletons(spark):
    g = two_cliques(spark)
    asg = Louvain(max_rounds=8).run(g)
    q_final = modularity(g, asg).first()["modularity"]
    singles = g.vertices.select("id", F.col("id").alias("community"))
    q_single = modularity(g, singles).first()["modularity"]
    assert q_final > q_single


def test_louvain_deterministic(spark):
    g = two_cliques(spark)
    a = sorted(tuple(r) for r in Louvain(max_rounds=8).run(g).collect())
    b = sorted(tuple(r) for r in Louvain(max_rounds=8).run(g).collect())
    assert a == b


def test_louvain_multilevel_agrees_on_converged_graph(spark):
    g = two_cliques(spark)
    one = sorted(tuple(r) for r in Louvain(max_rounds=8, levels=1).run(g).collect())
    two = sorted(tuple(r) for r in Louvain(max_rounds=8, levels=2).run(g).collect())
    assert one == two


def test_louvain_partition_is_total(spark):
    g = two_cliques(spark)
    out = Louvain(max_rounds=4).run(g)
    ids = {r.id for r in out.collect()}
    assert ids == {0, 1, 2, 3, 10, 11, 12, 13}
    # every community label is a member vertex id
    for r in out.collect():
        assert r.community in ids


def test_canonical_undirected_merges_parallel_and_reversed(spark):
    e = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (3, 3)], ["src", "dst"]
    )
    und = {(r.a, r.b): r.w for r in canonical_undirected(e).collect()}
    assert und == {(1, 2): 3, (3, 3): 1}


def test_weighted_modularity_scales_like_unweighted(spark):
    """Uniformly scaling all weights leaves Q unchanged (Q is scale-free)."""
    g = two_cliques(spark)
    weighted = g.edges.withColumn("w", F.lit(7))
    gw = Graph(g.vertices, weighted, directed=False, indexed=True)
    asg = g.vertices.select(
        "id", F.when(F.col("id") < 10, 0).otherwise(10).alias("community")
    )
    q1 = modularity(g, asg).first()["modularity"]
    q7 = modularity(gw, asg, weight_col="w").first()["modularity"]
    assert q1 == pytest.approx(q7, abs=1e-12)
