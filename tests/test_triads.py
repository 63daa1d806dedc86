"""Triad census: the 64-mask classifier is validated INDEPENDENTLY of its
own rules (canonical representative masks from the published class
definitions + permutation orbits), then the distributed census is checked
against a brute-force all-triples enumeration on random digraphs."""

from __future__ import annotations

import itertools
import random

from pyspark_graph_spark.constants import DST, ID, SRC
from pyspark_graph_spark.graph import Graph
from pyspark_graph_spark.operators.triads import (
    MASK_TABLE,
    TRIAD_TYPES,
    classify_codes,
    oracle_case_sql,
    triad_census,
)

# ---------------------------------------------------------------------------
# Independent ground truth: representative EDGE masks for the 16 classes,
# hand-written from the published pattern definitions (igraph/Pajek docs),
# with vertices (A, B, C) = (0, 1, 2) and edge bits
# bit0 A->B, bit1 B->A, bit2 A->C, bit3 C->A, bit4 B->C, bit5 C->B.
# ---------------------------------------------------------------------------
_BIT = {
    (0, 1): 1, (1, 0): 2, (0, 2): 4, (2, 0): 8, (1, 2): 16, (2, 1): 32,
}


def _emask(edges) -> int:
    return sum(_BIT[e] for e in edges)


REPRESENTATIVES = {
    "003": _emask([]),
    "012": _emask([(0, 1)]),                                  # A->B
    "102": _emask([(0, 1), (1, 0)]),                          # A<->B
    "021D": _emask([(1, 0), (1, 2)]),                         # A<-B->C
    "021U": _emask([(0, 1), (2, 1)]),                         # A->B<-C
    "021C": _emask([(0, 1), (1, 2)]),                         # A->B->C
    "111D": _emask([(0, 1), (1, 0), (2, 1)]),                 # A<->B<-C
    "111U": _emask([(0, 1), (1, 0), (1, 2)]),                 # A<->B->C
    "030T": _emask([(0, 1), (2, 1), (0, 2)]),                 # A->B<-C, A->C
    "030C": _emask([(1, 0), (2, 1), (0, 2)]),                 # A<-B<-C, A->C
    "201": _emask([(0, 1), (1, 0), (1, 2), (2, 1)]),          # A<->B<->C
    "120D": _emask([(1, 0), (1, 2), (0, 2), (2, 0)]),         # A<-B->C, A<->C
    "120U": _emask([(0, 1), (2, 1), (0, 2), (2, 0)]),         # A->B<-C, A<->C
    "120C": _emask([(0, 1), (1, 2), (0, 2), (2, 0)]),         # A->B->C, A<->C
    "210": _emask([(0, 1), (1, 2), (2, 1), (0, 2), (2, 0)]),  # A->B<->C, A<->C
    "300": _emask([(0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1)]),
}


def _edges_of(emask: int):
    return {e for e, b in _BIT.items() if emask & b}


def _permute(emask: int, perm) -> int:
    return _emask({(perm[u], perm[v]) for (u, v) in _edges_of(emask)})


def _codes_of(emask: int):
    """Edge mask -> (c_01, c_02, c_12) dyad codes for ordered vertices."""
    edges = _edges_of(emask)
    out = []
    for u, v in ((0, 1), (0, 2), (1, 2)):
        f, b = (u, v) in edges, (v, u) in edges
        out.append(3 if f and b else 1 if f else 2 if b else 0)
    return tuple(out)


def _classify_emask(emask: int) -> str:
    return classify_codes(*_codes_of(emask))


def test_classifier_matches_published_representatives():
    """Every one of the 64 edge configurations must classify as the name
    of the unique published representative in its permutation orbit —
    validating classify_codes against definitions it does not share."""
    orbit_name: dict[int, str] = {}
    for name, rep in REPRESENTATIVES.items():
        for perm in itertools.permutations(range(3)):
            m = _permute(rep, perm)
            assert orbit_name.get(m, name) == name, (
                f"mask {m} in two orbits: {orbit_name[m]} and {name}"
            )
            orbit_name[m] = name
    assert len(orbit_name) == 64, (
        f"orbits of the 16 representatives cover {len(orbit_name)}/64 masks"
    )
    for m, name in orbit_name.items():
        assert _classify_emask(m) == name, (
            f"mask {m}: classifier says {_classify_emask(m)}, orbit of "
            f"{name}"
        )


def test_classifier_is_isomorphism_invariant():
    for emask in range(64):
        names = {
            _classify_emask(_permute(emask, p))
            for p in itertools.permutations(range(3))
        }
        assert len(names) == 1, f"mask {emask} orbit maps to {names}"


def test_mask_table_and_sql_case_agree_with_classifier():
    for c_ij in range(4):
        for c_ik in range(4):
            for c_jk in range(4):
                m = c_ij + 4 * c_ik + 16 * c_jk
                assert MASK_TABLE[m][0] == classify_codes(c_ij, c_ik, c_jk)
    case = oracle_case_sql()
    for m in range(64):
        assert f"WHEN {m} THEN '{MASK_TABLE[m][0]}'" in case


def _brute_census(n: int, edges: set[tuple[int, int]]) -> dict[str, int]:
    counts = {t: 0 for t in TRIAD_TYPES}
    for i, j, k in itertools.combinations(range(n), 3):
        codes = []
        for u, v in ((i, j), (i, k), (j, k)):
            f, b = (u, v) in edges, (v, u) in edges
            codes.append(3 if f and b else 1 if f else 2 if b else 0)
        counts[classify_codes(*codes)] += 1
    return counts


def _spark_census(spark, n: int, edges: set[tuple[int, int]]):
    v = spark.createDataFrame([(i,) for i in range(n)], f"{ID} long")
    if edges:
        e = spark.createDataFrame(sorted(edges), f"{SRC} long, {DST} long")
    else:
        e = spark.createDataFrame([], f"{SRC} long, {DST} long")
    g = Graph(v, e, directed=True, indexed=True)
    rows = triad_census(g).collect()
    assert [r["triad_type"] for r in rows] == sorted(TRIAD_TYPES)
    return {r["triad_type"]: r["n_triads"] for r in rows}


def test_census_empty_graph(spark):
    got = _spark_census(spark, 6, set())
    assert got["003"] == 20 and sum(got.values()) == 20
    # degenerate: below 3 vertices every class is zero (C(n,3) = 0),
    # with or without edges
    assert sum(_spark_census(spark, 0, set()).values()) == 0
    assert sum(_spark_census(spark, 2, {(0, 1), (1, 0)}).values()) == 0


def test_census_single_asym_edge(spark):
    got = _spark_census(spark, 7, {(0, 1)})
    assert got["012"] == 5  # the 5 triads containing the edge
    assert got["003"] == 30 and sum(got.values()) == 35


def test_census_complete_mutual(spark):
    n = 5
    edges = {(u, v) for u in range(n) for v in range(n) if u != v}
    got = _spark_census(spark, n, edges)
    assert got["300"] == 10 and sum(got.values()) == 10
    # partition invariance: a different physical layout of the same edge
    # list must produce the identical census
    v = spark.createDataFrame([(i,) for i in range(n)], f"{ID} long")
    e = spark.createDataFrame(sorted(edges), f"{SRC} long, {DST} long")
    g = Graph(v.repartition(7), e.repartition(5), directed=True, indexed=True)
    got2 = {
        r["triad_type"]: r["n_triads"] for r in triad_census(g).collect()
    }
    assert got2 == got


def test_census_matches_bruteforce_random(spark):
    rng = random.Random(42)
    for trial in range(4):
        n = 8
        edges = {
            (u, v)
            for u in range(n)
            for v in range(n)
            if u != v and rng.random() < 0.35
        }
        got = _spark_census(spark, n, edges)
        want = _brute_census(n, edges)
        assert got == want, f"trial {trial}: {got} != {want}"
        assert sum(got.values()) == n * (n - 1) * (n - 2) // 6


def test_census_ignores_self_loops_and_duplicates(spark):
    """Self-loops and parallel/duplicate edges must not shift any class:
    the census of a dirtied edge list equals the census of its clean
    core."""
    clean = {(0, 1), (1, 0), (1, 2), (3, 4), (4, 5), (5, 3)}
    dirty = list(clean) + [(0, 0), (2, 2), (0, 1), (1, 2), (5, 3), (4, 4)]
    from pyspark.sql import functions as F  # noqa: F401

    v = spark.createDataFrame([(i,) for i in range(6)], f"{ID} long")
    e = spark.createDataFrame(dirty, f"{SRC} long, {DST} long")
    g = Graph(v, e, directed=True, indexed=True)
    got = {
        r["triad_type"]: r["n_triads"] for r in triad_census(g).collect()
    }
    want = _brute_census(6, clean)
    assert got == want
    assert sum(got.values()) == 20


def test_census_huge_int64_ids_no_overflow(spark):
    """Round-9 regression (ADVICE r8): the middle-vertex extraction used
    v+o+o2 minus least/greatest — for xxhash64 surrogate ids spanning the
    full int64 range the sum overflows and PySpark 4's default ANSI mode
    raises ARITHMETIC_OVERFLOW. Now extracted via sort_array. Ids near
    2^62 make the old path deterministically overflow (3*2^62 > 2^63-1)."""
    base = 1 << 62
    ids = [base, base + 1, base + 2, base + 3]
    edges = {
        (ids[0], ids[1]), (ids[1], ids[2]), (ids[2], ids[0]),
        (ids[0], ids[3]),
    }
    v = spark.createDataFrame([(i,) for i in ids], f"{ID} long")
    e = spark.createDataFrame(sorted(edges), f"{SRC} long, {DST} long")
    g = Graph(v, e, directed=True, indexed=True)
    got = {r["triad_type"]: r["n_triads"] for r in triad_census(g).collect()}
    # remap to small ids for the brute-force twin
    remap = {x: i for i, x in enumerate(ids)}
    want = _brute_census(4, {(remap[u], remap[v2]) for u, v2 in edges})
    assert got == want


def test_census_hashed_string_ids(spark):
    """The default (indexed=False) construction hashes string ids to
    arbitrary int64 surrogates; the census must work there too (same
    latent-overflow class as above, plus exercises the non-contiguous-id
    assumption end to end)."""
    names = ["alpha", "beta", "gamma", "delta", "epsilon"]
    edges = [("alpha", "beta"), ("beta", "alpha"), ("beta", "gamma"),
             ("gamma", "delta"), ("delta", "gamma"), ("epsilon", "alpha")]
    v = spark.createDataFrame([(n,) for n in names], f"{ID} string")
    e = spark.createDataFrame(edges, f"{SRC} string, {DST} string")
    g = Graph(v, e, directed=True)
    got = {r["triad_type"]: r["n_triads"] for r in triad_census(g).collect()}
    remap = {n: i for i, n in enumerate(names)}
    want = _brute_census(5, {(remap[a], remap[b]) for a, b in edges})
    assert got == want


def test_wedge_budget_guard_fires(spark, monkeypatch):
    """The exact census probes its O(sum deg^2) wedge budget before the
    self-join (round 9 — the real-sf1 trade graph needs 13.4e9 wedge
    rows) and points at the estimate path."""
    import pytest

    monkeypatch.setenv("SPARK_GRAFT_WEDGE_BUDGET", "1")
    edges = {(0, 1), (1, 2), (2, 0), (0, 3)}
    v = spark.createDataFrame([(i,) for i in range(4)], f"{ID} long")
    e = spark.createDataFrame(sorted(edges), f"{SRC} long, {DST} long")
    g = Graph(v, e, directed=True, indexed=True)
    with pytest.raises(ValueError, match="triad_census_estimate"):
        triad_census(g).collect()


def test_estimate_sample_mod_one_equals_exact(spark):
    """sample_mod=1 keeps every vertex: n_sampled == n_est == the exact
    census, class by class."""
    from pyspark_graph_spark.operators.triads import triad_census_estimate

    edges = {(0, 1), (1, 0), (1, 2), (2, 3), (3, 1), (4, 0)}
    v = spark.createDataFrame([(i,) for i in range(5)], f"{ID} long")
    e = spark.createDataFrame(sorted(edges), f"{SRC} long, {DST} long")
    g = Graph(v, e, directed=True, indexed=True)
    rows = triad_census_estimate(g, sample_mod=1).collect()
    want = _brute_census(5, edges)
    got_sampled = {r["triad_type"]: r["n_sampled"] for r in rows}
    got_est = {r["triad_type"]: r["n_est"] for r in rows}
    assert got_sampled == want and got_est == want


def test_estimate_explicit_keep_matches_induced_bruteforce(spark):
    """With an explicit keep predicate, n_sampled is the exact census of
    the induced subgraph and n_est applies the sample_mod^3 scale."""
    from pyspark.sql import functions as F
    from pyspark_graph_spark.operators.triads import triad_census_estimate

    n = 8
    edges = {
        (u, v) for u in range(n) for v in range(n)
        if u != v and (u * 7 + v * 3) % 4 == 0
    }
    kept = [i for i in range(n) if i % 2 == 0]
    v = spark.createDataFrame([(i,) for i in range(n)], f"{ID} long")
    e = spark.createDataFrame(sorted(edges), f"{SRC} long, {DST} long")
    g = Graph(v, e, directed=True, indexed=True)
    rows = triad_census_estimate(
        g, sample_mod=2, keep=F.col(ID) % 2 == 0
    ).collect()
    remap = {x: i for i, x in enumerate(kept)}
    induced = {
        (remap[u], remap[w]) for u, w in edges if u in remap and w in remap
    }
    want = _brute_census(len(kept), induced)
    for r in rows:
        assert r["n_sampled"] == want[r["triad_type"]]
        assert r["n_est"] == want[r["triad_type"]] * 8


def test_closed_forms_exact_past_int64_ceiling(spark):
    """r9 verdict #3: the closed forms 003/012/102 (and the estimator's
    1/p^3 scale-up) are DECIMAL(38,0) — a sparse 4.2M-vertex graph passes
    the wedge budget but C(n,3) ~ 1.23e19 > 2^63-1, which the previous
    exact-long arithmetic raised ARITHMETIC_OVERFLOW on. Vertices-only
    (zero wedges), so the test is cheap; the count is compared against
    Python's arbitrary-precision C(n,3)."""
    from decimal import Decimal

    from pyspark.sql import functions as F
    from pyspark.sql.types import DecimalType

    n = 4_200_000
    v = spark.range(n).select(F.col("id").alias(ID))
    e = spark.createDataFrame([], f"{SRC} long, {DST} long")
    g = Graph(v, e, directed=True, indexed=True)
    df = triad_census(g)
    assert df.schema["n_triads"].dataType == DecimalType(38, 0)
    got = {r["triad_type"]: r["n_triads"] for r in df.collect()}
    expected = Decimal(n * (n - 1) * (n - 2) // 6)
    assert expected > 2**63 - 1  # the case long arithmetic cannot hold
    assert got["003"] == expected
    assert all(c == 0 for t, c in got.items() if t != "003")


def test_estimate_scale_up_is_decimal(spark):
    """The estimator's n_est = n_sampled * sample_mod^3 also rides
    DECIMAL(38,0) so a large sample_mod on a closed-form class cannot
    re-introduce the int64 ceiling."""
    from pyspark.sql.types import DecimalType
    from pyspark_graph_spark.operators.triads import triad_census_estimate

    edges = {(0, 1), (1, 2)}
    v = spark.createDataFrame([(i,) for i in range(4)], f"{ID} long")
    e = spark.createDataFrame(sorted(edges), f"{SRC} long, {DST} long")
    g = Graph(v, e, directed=True, indexed=True)
    df = triad_census_estimate(g, sample_mod=1)
    assert df.schema["n_sampled"].dataType == DecimalType(38, 0)
    assert df.schema["n_est"].dataType == DecimalType(38, 0)
