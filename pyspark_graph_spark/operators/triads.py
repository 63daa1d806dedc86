"""Holland–Leinhardt triad census — all 16 directed triad isomorphism
classes, counted for every vertex triple, without materializing C(n,3).

The classic social-network statistic (Holland & Leinhardt 1976; the class
names 003…300 follow the M-A-N convention: #Mutual, #Asymmetric, #Null
dyads, with D/U/C orientation suffixes as documented by igraph and Pajek).
The reference exposes dyad-level structure only (reciprocity); the triad
census is its standard completion and the workhorse behind transitivity /
structural-balance tests.

Algorithm (Batagelj & Mrvar, Social Networks 23(4), 2001 — "A subquadratic
triad census algorithm"): only triads containing at least TWO linked dyads
are enumerated; any two linked dyads of a triad share a vertex, so those
triads are exactly the wedges of the linked-dyad graph. The remaining
classes have closed forms:

- ``012`` (one asymmetric dyad, isolated third vertex):
  ``A * (n - 2) - sum over enumerated triads of their asymmetric-dyad
  count`` — each asymmetric dyad sits in n-2 triads, and the ones whose
  third vertex touches the pair are exactly the enumerated (>=2 linked
  dyads) triads containing it.
- ``102`` symmetrically with mutual dyads.
- ``003`` = C(n,3) minus everything else.

Scale shape: one dyad canonicalization aggregate (shuffle on the vertex
pair), one wedge self-join of the incident-dyad list (O(sum deg^2) rows —
the same budget class as triangle counting and `four_cycles`), three hash
joins to look up the triad's dyad codes, and ONE map-side-combined
16-group aggregate as the wedge table's only consumer (no distinct, no
second scan: enumeration multiplicity is 3 for zero-null-dyad classes and
1 otherwise, folded per class — SCALE.md round 9, 3.6x). The wedge
budget is probed in O(E) before the join; over-budget graphs (hub-skewed,
e.g. the real-sf1 trade graph at 13.4e9 wedges) are directed to
``triad_census_estimate`` — an unbiased vertex sparsifier, NOT a hub
prefilter, which would bias every class containing hub triads. The
mask -> class mapping is a 64-entry pure-expression lookup
(``F.element_at`` on an array literal), no UDF, no driver loop.

The classifier below is validated two independent ways in
tests/test_triads.py: (a) against hand-written canonical representative
masks for all 16 classes under all 6 vertex permutations of all 64 dyad
configurations, (b) by exhaustive/randomized census comparison with a
brute-force all-triples enumeration.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyspark_graph_spark.constants import DST, ID, SRC
from pyspark_graph_spark.graph import Graph

#: Holland–Leinhardt / igraph ENUMERATION order (classifier table order —
#: NOT the output row order; triad_census sorts rows lexicographically)
TRIAD_TYPES: tuple[str, ...] = (
    "003", "012", "102", "021D", "021U", "021C", "111D", "111U",
    "030T", "030C", "201", "120D", "120U", "120C", "210", "300",
)


def classify_codes(c_ij: int, c_ik: int, c_jk: int) -> str:
    """Name the triad class of an ordered triple (i < j < k) from its three
    dyad codes: 0 = null, 1 = lower->higher only, 2 = higher->lower only,
    3 = mutual. Pure Python — used to freeze the 64-entry lookup the Spark
    expression and the DuckDB oracle CASE both consume."""
    edges: set[tuple[int, int]] = set()
    for code, (u, v) in zip(
        (c_ij, c_ik, c_jk), ((0, 1), (0, 2), (1, 2))
    ):
        if code & 1:
            edges.add((u, v))
        if code & 2:
            edges.add((v, u))
    dyads = []
    for u, v in ((0, 1), (0, 2), (1, 2)):
        f, b = (u, v) in edges, (v, u) in edges
        dyads.append(3 if f and b else 1 if f else 2 if b else 0)
    m = sum(1 for d in dyads if d == 3)
    a = sum(1 for d in dyads if d in (1, 2))
    base = f"{m}{a}{3 - m - a}"
    if base in ("003", "012", "102", "201", "210", "300"):
        return base
    mutual_members = {u for (u, v) in edges if (v, u) in edges}
    asym = [(u, v) for (u, v) in edges if (v, u) not in edges]
    if base == "021":  # two asymmetric edges sharing exactly one vertex
        (a1, b1), (a2, b2) = asym
        (shared,) = {a1, b1} & {a2, b2}
        if a1 == shared and a2 == shared:
            return "021D"  # out-star: A<-B->C
        if b1 == shared and b2 == shared:
            return "021U"  # in-star: A->B<-C
        return "021C"  # chain: A->B->C
    if base == "030":
        outdeg = {0: 0, 1: 0, 2: 0}
        for u, _ in edges:
            outdeg[u] += 1
        return "030C" if all(outdeg[v] == 1 for v in outdeg) else "030T"
    if base == "111":  # one mutual dyad + one asymmetric edge
        return "111D" if asym[0][1] in mutual_members else "111U"
    # base == "120": mutual dyad + the odd vertex linked to both members
    (odd,) = {0, 1, 2} - mutual_members
    if all(u == odd for (u, _) in asym):
        return "120D"  # odd vertex sends both: A<-B->C, A<->C
    if all(v == odd for (_, v) in asym):
        return "120U"  # odd vertex receives both: A->B<-C, A<->C
    return "120C"  # chain through the odd vertex: A->B->C, A<->C


def _mask(c_ij: int, c_ik: int, c_jk: int) -> int:
    return c_ij + 4 * c_ik + 16 * c_jk


#: mask (c_ij + 4*c_ik + 16*c_jk) -> (class name, #asym dyads, #mutual dyads)
MASK_TABLE: tuple[tuple[str, int, int], ...] = tuple(
    (
        classify_codes(c_ij, c_ik, c_jk),
        sum(1 for c in (c_ij, c_ik, c_jk) if c in (1, 2)),
        sum(1 for c in (c_ij, c_ik, c_jk) if c == 3),
    )
    for c_jk in range(4)
    for c_ik in range(4)
    for c_ij in range(4)
)
# index check: entry for mask m must sit at position m
assert all(
    MASK_TABLE[_mask(i, k, j2)][0] == classify_codes(i, k, j2)
    for i in range(4)
    for k in range(4)
    for j2 in range(4)
)


def oracle_case_sql(expr: str = "c_ij + 4 * c_ik + 16 * c_jk") -> str:
    """The 64-way classification as a SQL CASE over the mask expression —
    shared with the DuckDB gate oracle so both engines consume the SAME
    frozen classifier table (validated independently in tests)."""
    whens = " ".join(
        f"WHEN {m} THEN '{MASK_TABLE[m][0]}'" for m in range(64)
    )
    return f"CASE {expr} {whens} END"


def triad_census(g: Graph) -> DataFrame:
    """Return the 16-row census ``(triad_type string, n_triads
    decimal(38,0))`` of
    the directed graph, one row per Holland–Leinhardt class, zero-filled,
    sorted lexicographically by class name (003, 012, 021C, 021D, ...,
    102, ... — the order the cross-engine oracle pins; NOT the
    Holland–Leinhardt enumeration order of ``TRIAD_TYPES``). Self-loops
    and duplicate edges are ignored."""
    spark = g.edges.sparkSession
    e = (
        g.edges.select(SRC, DST)
        .filter(F.col(SRC) != F.col(DST))
        .distinct()
    )
    # canonical linked dyads: (a < b, code in {1: a->b, 2: b->a, 3: mutual})
    dy = (
        e.groupBy(
            F.least(SRC, DST).alias("a"), F.greatest(SRC, DST).alias("b")
        )
        .agg(
            (
                F.max(
                    F.when(F.col(SRC) < F.col(DST), 1).otherwise(0)
                )
                + 2
                * F.max(
                    F.when(F.col(SRC) > F.col(DST), 1).otherwise(0)
                )
            ).alias("code")
        )
        .localCheckpoint()
    )
    # wedges of the linked-dyad graph = every triad with >=2 linked dyads
    inc = dy.select(F.col("a").alias("v"), F.col("b").alias("o")).unionByName(
        dy.select(F.col("b").alias("v"), F.col("a").alias("o"))
    )
    # O(E) budget probe before the O(sum deg^2) self-join (same contract
    # as the four_cycles wedge guard): the real-sf1 trade graph measures
    # 13.4e9 wedges — a spill-killer — vs 241e6 at sf0.1
    budget = int(os.environ.get("SPARK_GRAFT_WEDGE_BUDGET", "2000000000"))
    wedges = int(
        inc.groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
        .agg(F.sum(F.expr("d * (d - 1) DIV 2")).alias("w"))
        .first()["w"]
        or 0
    )
    if wedges > budget:
        raise ValueError(
            f"triad_census: exact census needs {wedges:,} wedge rows >"
            f" budget {budget:,} (SPARK_GRAFT_WEDGE_BUDGET). Use"
            " triad_census_estimate (deterministic vertex sparsifier,"
            " exact census on the induced subgraph, 1/p^3 scaling) or"
            " raise the budget explicitly."
        )
    o2 = inc.withColumnsRenamed({"o": "o2"})
    tri = (
        inc.join(o2, on="v")
        .filter(F.col("o") < F.col("o2"))
        .select(
            # sort the 3-array rather than sum-minus-extremes: ids are
            # xxhash64 surrogates spanning all of int64 when indexed=False,
            # so v+o+o2 can overflow (ANSI mode raises); sort_array is
            # type-agnostic and exact
            F.element_at(
                F.sort_array(F.array("v", "o", "o2")), 1
            ).alias("i"),
            F.element_at(
                F.sort_array(F.array("v", "o", "o2")), 2
            ).alias("j"),
            F.element_at(
                F.sort_array(F.array("v", "o", "o2")), 3
            ).alias("k"),
        )
        # NO distinct: dy is already distinct, so a triad is enumerated
        # once per wedge center — exactly 3x when all three dyads are
        # linked (zero null dyads), 1x otherwise. The class itself tells
        # the multiplicity (its name encodes the dyad multiset), so the
        # per-class counts are corrected by DIV 3 after the aggregate —
        # saving a full-width shuffle+dedup of the wedge table (the
        # 241M-row distinct was ~40% of the sf0.1 trade-graph runtime)
    )
    coded = (
        tri.join(
            dy.withColumnsRenamed({"a": "i", "b": "j", "code": "c_ij"}),
            on=["i", "j"],
            how="left",
        )
        .join(
            dy.withColumnsRenamed({"a": "i", "b": "k", "code": "c_ik"}),
            on=["i", "k"],
            how="left",
        )
        .join(
            dy.withColumnsRenamed({"a": "j", "b": "k", "code": "c_jk"}),
            on=["j", "k"],
            how="left",
        )
        .select(
            (
                F.coalesce("c_ij", F.lit(0))
                + 4 * F.coalesce("c_ik", F.lit(0))
                + 16 * F.coalesce("c_jk", F.lit(0))
            ).alias("__mask")
        )
    )
    # mask -> class as a pure expression (1-based element_at); the wedge
    # table is consumed by exactly ONE map-side-combined aggregate — no
    # checkpoint, no second scan, no per-row (asym, mutual) columns
    # (the class name encodes its dyad multiset, so those sums fold over
    # the 16-row class table instead)
    type_arr = F.array(*[F.lit(t) for t, _, _ in MASK_TABLE])
    raw_counts = (
        coded.select(
            F.element_at(type_arr, F.col("__mask") + 1).alias("triad_type")
        )
        .groupBy("triad_type")
        .agg(F.count(F.lit(1)).alias("__raw"))
    )
    # per-class dyad multiset from the M-A-N name: m = #mutual,
    # a = #asymmetric, n = #null; wedge-enumeration multiplicity is 3
    # when n == 0 (three centers), else 1
    class_meta = [
        (t, int(t[0]), int(t[1]), int(t[2])) for t in TRIAD_TYPES
    ]
    types_df = spark.createDataFrame(
        class_meta, "triad_type string, __cm int, __ca int, __cn int"
    )
    enum_counts = (
        types_df.join(raw_counts, on="triad_type", how="left")
        .withColumn("__raw", F.coalesce("__raw", F.lit(0)))
        .withColumn(
            "__enum",
            F.when(
                F.col("__cn") == 0, F.expr("__raw DIV 3")
            ).otherwise(F.col("__raw")),
        )
        .localCheckpoint()  # 16 rows; reused by the conn fold below
    )
    conn = enum_counts.agg(
        F.coalesce(F.sum(F.col("__enum") * F.col("__ca")), F.lit(0)).alias(
            "__conn_asym"
        ),
        F.coalesce(F.sum(F.col("__enum") * F.col("__cm")), F.lit(0)).alias(
            "__conn_mut"
        ),
        F.coalesce(F.sum("__enum"), F.lit(0)).alias("__conn_total"),
    )
    dyad_counts = dy.agg(
        F.coalesce(
            F.sum(F.when(F.col("code") == 3, 1).otherwise(0)), F.lit(0)
        ).alias("__M"),
        F.coalesce(
            F.sum(F.when(F.col("code") != 3, 1).otherwise(0)), F.lit(0)
        ).alias("__A"),
    )
    nv = g.vertices.agg(F.count(F.lit(1)).alias("__n"))
    # closed forms in DECIMAL(38,0) (r9 verdict #3): the previous exact
    # long arithmetic overflowed at n ~ 3.05M vertices — a sparse
    # 10M-vertex graph passes the wedge budget yet C(n,3) ~ 1.7e20
    # doesn't fit int64, and at 1e9 vertices it's ~1.7e26. DECIMAL(38,0)
    # keeps every term exact to 1e38. C(n,3) goes through
    # exact_math.choose3_dec (r10 ADVICE #1): the one-shot `/ 6` landed
    # in DECIMAL(38,6), exact only below ~1e32 (n ~ 8e10); pulling the
    # factors 2 and 3 out with exact long DIVs before the decimal
    # product is exact to n ~ 8.4e12 and LOUD (null/ANSI error) beyond.
    from pyspark_graph_spark.functions.exact_math import choose3_dec

    dec = "decimal(38,0)"
    t012 = (
        F.col("__A").cast(dec) * (F.col("__n") - 2).cast(dec)
        - F.col("__conn_asym").cast(dec)
    ).cast(dec)
    t102 = (
        F.col("__M").cast(dec) * (F.col("__n") - 2).cast(dec)
        - F.col("__conn_mut").cast(dec)
    ).cast(dec)
    c_n3 = choose3_dec(F.col("__n"))
    t003 = (
        c_n3 - F.col("__conn_total").cast(dec) - t012 - t102
    ).cast(dec)
    return (
        enum_counts.crossJoin(F.broadcast(conn))
        .crossJoin(F.broadcast(dyad_counts))
        .crossJoin(F.broadcast(nv))
        .select(
            "triad_type",
            F.when(F.col("triad_type") == "012", t012)
            .when(F.col("triad_type") == "102", t102)
            .when(F.col("triad_type") == "003", t003)
            .otherwise(F.col("__enum").cast(dec))
            .alias("n_triads"),
        )
        .orderBy("triad_type")
    )


def triad_census_estimate(
    g: Graph, sample_mod: int = 4, keep: Column | None = None
) -> DataFrame:
    """Vertex-sparsified triad census — the scale path when the exact
    census's wedge budget is blown (the real-sf1 trade graph needs
    13.4e9 wedge rows; SCALE.md).

    Keep each vertex iff ``keep`` (default: a deterministic cross-engine
    md5 hash of the id, ``pmod(md5_hash60(id), sample_mod) == 0`` — so an
    external SQL oracle can rebuild the identical sample), run the EXACT
    16-class census on the induced subgraph, and scale every class by
    ``sample_mod^3``: a triad of G survives iff all three vertices are
    kept (probability p^3 under a random hash, p = 1/sample_mod), and its
    class is unchanged because induction preserves every edge among kept
    vertices — so ``n_est`` is the Horvitz–Thompson unbiased estimator
    for ALL 16 classes, closed-form ones included. Same
    exact-on-subgraph + 1/p^k contract as ``four_cycles_estimate``.

    Wedge cost drops ~p^3 per class budget (each kept vertex's dyad
    degree thins binomially), so ``sample_mod`` is the knob that brings
    any hub-skewed graph under SPARK_GRAFT_WEDGE_BUDGET.

    Returns ``(triad_type, n_sampled, n_est)``, 16 rows, lexicographic.
    """
    if sample_mod < 1:
        raise ValueError("sample_mod must be >= 1")
    from pyspark_graph_spark.functions.hashing import md5_hash60

    if keep is None:
        keep = (
            F.pmod(md5_hash60(F.col(ID).cast("string")), F.lit(sample_mod))
            == 0
        )
    vs = g.vertices.select(ID).filter(keep).localCheckpoint()
    kept_src = vs.select(F.col(ID).alias(SRC))
    kept_dst = vs.select(F.col(ID).alias(DST))
    induced = (
        g.edges.select(SRC, DST)
        .join(kept_src, on=SRC, how="leftsemi")
        .join(kept_dst, on=DST, how="leftsemi")
    )
    sub = Graph(vs, induced, directed=g.directed, indexed=True)
    # the 1/p^3 scale-up rides the census's DECIMAL(38,0) counts — a
    # large sample_mod on a closed-form class must not re-introduce the
    # int64 ceiling the census itself just escaped (r9 verdict #3)
    scale = sample_mod ** 3
    return triad_census(sub).select(
        "triad_type",
        F.col("n_triads").alias("n_sampled"),
        (F.col("n_triads") * F.lit(scale).cast("decimal(12,0)"))
        .cast("decimal(38,0)")
        .alias("n_est"),
    )
