"""Matching, coarsening, multilevel k-way partitioning, MIS/coloring."""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark_graph_spark.constants import DST, ID, SRC
from pyspark_graph_spark.functions.hashing import md5_hash60_sql as _h60sql
from pyspark_graph_spark.sources.tables import (
    nation_graph,
    supplier_co_occurrence_graph,
)

from pyspark_graph_spark.queries._registry import query
from pyspark_graph_spark.queries._shared import (
    SUPPLIER_EDGES_CTE,
    _supplier_cooc_graph,
    _supplier_matching,
    _supplier_partition,
)


def _edge_cut_sql(k: int) -> str:
    from pyspark_graph_spark.functions.hashing import md5_hash60_sql

    hs = md5_hash60_sql("CAST(src AS VARCHAR)")
    hd = md5_hash60_sql("CAST(dst AS VARCHAR)")
    return f"""
WITH {SUPPLIER_EDGES_CTE.strip()},
parts AS (
    SELECT src, dst,
           ({hs}) % {k} AS sp, ({hd}) % {k} AS dp
    FROM supplier_edges
),
cut AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
           CAST(SUM(CASE WHEN sp <> dp THEN 1 ELSE 0 END) AS BIGINT)
             AS cut_edges
    FROM parts
),
vparts AS (
    SELECT ({md5_hash60_sql("CAST(s_suppkey AS VARCHAR)")}) % {k} AS p,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM supplier GROUP BY 1
),
bal AS (
    SELECT MAX(n) AS max_part, SUM(n) AS total FROM vparts
)
SELECT {k} AS k, n_edges, cut_edges,
       ROUND(cut_edges * 1.0 / n_edges, 6) AS cut_frac,
       CAST(max_part AS BIGINT) AS max_part,
       ROUND(max_part * {k} * 1.0 / total, 6) AS balance
FROM cut CROSS JOIN bal
"""

_MATCH_PRIORITY_SQL = _h60sql(
    "CAST(src AS VARCHAR) || ',' || CAST(dst AS VARCHAR) || ',0'"
)

@query(
    "maximal_independent_set",
    oracle="""
SELECT CAST(0 AS BIGINT) AS independence_violations,
       CAST(COUNT(*) AS BIGINT) AS n_covered,
       CAST(COUNT(*) AS BIGINT) AS n_vertices
FROM supplier
""",
)
def q_mis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luby's MIS on the supplier co-occurrence graph (deterministic hash
    priorities). The MIS itself is not SQL-derivable, but its DEFINING
    invariants are exactly checkable: independence (no symmetric edge with
    both endpoints in the set — must be 0) and maximality (members plus
    their neighbors cover every vertex — n_covered must equal the supplier
    count, which the oracle derives from the base table). All three values
    computed distributively from the MIS result, no collect."""
    from pyspark_graph_spark.operators import MaximalIndependentSet

    g = _supplier_cooc_graph(spark, sf_dir)
    mis = MaximalIndependentSet().run(g)
    base = g.edges.select("src", "dst")
    sym = (
        base.unionByName(
            base.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    viol = (
        sym.join(mis.withColumnRenamed(ID, "src"), "src", "semi")
        .join(mis.withColumnRenamed(ID, "dst"), "dst", "semi")
        .agg(F.count(F.lit(1)).alias("independence_violations"))
    )
    covered = (
        mis.unionByName(
            sym.join(mis.withColumnRenamed(ID, "src"), "src", "semi").select(
                F.col("dst").alias(ID)
            )
        )
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_covered"))
    )
    nverts = g.vertices.agg(F.count(F.lit(1)).alias("n_vertices"))
    return viol.crossJoin(covered).crossJoin(nverts)

@query(
    "graph_coloring",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_colored,
       (SELECT CAST(MAX(c) AS BIGINT)
        FROM (SELECT COUNT(*) AS c FROM nation GROUP BY n_regionkey)) AS n_colors,
       CAST(0 AS BIGINT) AS improper_edges
FROM nation
""",
)
def q_graph_coloring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proper coloring of the nation graph via iterated Luby MIS. The
    nation graph is disjoint per-region cliques, so Luby-MIS coloring
    removes exactly one vertex per remaining clique per color — colors
    used == the largest region size, which the oracle derives from the
    base table; properness (improper_edges == 0) and full coverage
    (n_colored == nation count) are the other exact invariants. The dense
    supplier graph is deliberately not the target (one sequential MIS per
    color is the complete-graph pathology)."""
    from pyspark_graph_spark.operators import greedy_coloring

    g = nation_graph(spark, sf_dir)
    coloring = greedy_coloring(g, max_colors=16)
    base = g.edges.select("src", "dst")
    sym = (
        base.unionByName(
            base.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    improper = (
        sym.join(
            coloring.withColumnsRenamed({ID: "src", "color": "__cs"}), "src"
        )
        .join(
            coloring.withColumnsRenamed({ID: "dst", "color": "__cd"}), "dst"
        )
        .filter(F.col("__cs") == F.col("__cd"))
        .agg(F.count(F.lit(1)).alias("improper_edges"))
    )
    summary = coloring.agg(
        F.count(F.lit(1)).alias("n_colored"),
        F.countDistinct("color").cast("long").alias("n_colors"),
    )
    return summary.crossJoin(improper)

@query("edge_cut", oracle=_edge_cut_sql(8))
def q_edge_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioning-quality diagnostic: hash-partition the supplier graph
    into k=8 shards and measure the edge-cut fraction (shuffled messages
    per iteration of any vertex program) and the vertex balance factor
    (max shard / ideal). The readout that justifies — or rejects — a
    co-location layout before a 1000-executor run; pure per-row hashing +
    two singleton aggregates."""
    from pyspark_graph_spark.functions.hashing import md5_hash60
    from pyspark_graph_spark.sources.tables import (
        load_table,
        supplier_co_occurrence_graph,
    )

    k = 8
    g = _supplier_cooc_graph(spark, sf_dir)
    part = lambda c: F.pmod(md5_hash60(F.col(c).cast("string")), F.lit(k))
    parts = g.edges.select(
        part(SRC).alias("sp"), part(DST).alias("dp")
    )
    cut = parts.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.sum(F.when(F.col("sp") != F.col("dp"), 1).otherwise(0))
        .cast("long")
        .alias("cut_edges"),
    )
    vparts = (
        load_table(spark, sf_dir, "supplier")
        .select(part("s_suppkey").alias("p"))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bal = vparts.agg(
        F.max("n").alias("max_part"), F.sum("n").alias("total")
    )
    return cut.crossJoin(F.broadcast(bal)).select(
        F.lit(k).alias("k"),
        "n_edges",
        "cut_edges",
        F.round(F.col("cut_edges") / F.col("n_edges"), 6).alias("cut_frac"),
        F.col("max_part").cast("long").alias("max_part"),
        F.round(
            F.col("max_part") * F.lit(k) / F.col("total"), 6
        ).alias("balance"),
    )

@query(
    "maximal_matching",
    oracle=f"""
WITH RECURSIVE {SUPPLIER_EDGES_CTE.strip()},
pe AS (
    SELECT src, dst, {_MATCH_PRIORITY_SQL} AS p
    FROM supplier_edges
),
greedy AS (
    SELECT CAST([] AS BIGINT[]) AS matched
    UNION ALL
    SELECT g.matched || [pick.src, pick.dst]
    FROM greedy g, LATERAL (
        SELECT src, dst FROM pe
        WHERE NOT list_contains(g.matched, pe.src)
          AND NOT list_contains(g.matched, pe.dst)
        ORDER BY p, src, dst LIMIT 1
    ) pick
),
final AS (
    SELECT matched FROM greedy ORDER BY len(matched) DESC LIMIT 1
),
m AS (
    SELECT matched[2 * x.i - 1] AS src, matched[2 * x.i] AS dst
    FROM final,
         LATERAL (
             SELECT unnest(range(1, len(final.matched) // 2 + 1)) AS i
         ) x
)
SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst FROM m
""",
)
def q_maximal_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parallel greedy maximal matching on the supplier co-occurrence
    graph (operators/matching.py). VALUE-LEVEL oracle (round-6 verdict
    item 4): the matching uses md5 edge priorities, so the peeling
    fixpoint equals sequential greedy over (priority, src, dst) order
    (Blelloch/Fineman/Shun SPAA'12) and the DuckDB oracle REPLAYS that
    exact greedy with the same recursive CTE `graph_coarsen` uses,
    emitting the matched edge SET itself — every matched (src, dst)
    hash-checked, not just the disjointness/maximality invariants (those
    remain property-tested edge-for-edge in test_matching.py). The
    matching comes from the shared per-application cache
    (_supplier_matching) that `graph_coarsen` and the multilevel
    partitioner also consume."""
    m = _supplier_matching(spark, sf_dir)
    return m.select(
        F.col(SRC).cast("long").alias(SRC),
        F.col(DST).cast("long").alias(DST),
    )

@query(
    "weighted_matching",
    oracle=f"""
WITH RECURSIVE supplier_pairs AS (
    SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
),
we AS (
    SELECT a.l_suppkey AS src, b.l_suppkey AS dst,
           CAST(COUNT(*) AS BIGINT) AS weight
    FROM supplier_pairs a
    JOIN supplier_pairs b
      ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
    GROUP BY 1, 2
),
pe AS (
    SELECT src, dst, weight, {_MATCH_PRIORITY_SQL} AS p
    FROM we
),
greedy AS (
    SELECT CAST([] AS BIGINT[]) AS matched
    UNION ALL
    SELECT g.matched || [pick.src, pick.dst]
    FROM greedy g, LATERAL (
        SELECT src, dst FROM pe
        WHERE NOT list_contains(g.matched, pe.src)
          AND NOT list_contains(g.matched, pe.dst)
        ORDER BY weight DESC, p, src, dst LIMIT 1
    ) pick
),
final AS (
    SELECT matched FROM greedy ORDER BY len(matched) DESC LIMIT 1
),
m AS (
    SELECT matched[2 * x.i - 1] AS src, matched[2 * x.i] AS dst
    FROM final,
         LATERAL (
             SELECT unnest(range(1, len(final.matched) // 2 + 1)) AS i
         ) x
)
SELECT CAST(m.src AS BIGINT) AS src, CAST(m.dst AS BIGINT) AS dst,
       we.weight
FROM m JOIN we ON m.src = we.src AND m.dst = we.dst
""",
)
def q_weighted_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy maximal WEIGHTED matching — Avis's 1/2-approximation of
    maximum-weight matching (operators/matching.py weight_col) — on the
    supplier co-occurrence graph weighted by shared-order count (the
    edge weight a multilevel partitioner would preserve across levels).
    VALUE-LEVEL oracle like `maximal_matching`: with md5 priorities the
    peeling fixpoint equals sequential greedy over (weight DESC,
    priority, src, dst), which the DuckDB recursive CTE replays edge for
    edge, weights joined back onto the matched set. Exercises the
    weighted priority path (`__np = -weight`) that the unweighted gate
    queries never touch."""
    from pyspark_graph_spark.graph import Graph
    from pyspark_graph_spark.operators.matching import MaximalMatching
    from pyspark_graph_spark.sources.tables import load_table

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    a = li.withColumnsRenamed({"l_suppkey": SRC})
    b = li.withColumnsRenamed({"l_suppkey": DST})
    we = (
        a.join(b, on="l_orderkey")
        .filter(F.col(SRC) < F.col(DST))
        .groupBy(SRC, DST)
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    v = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias(ID)
    )
    g = Graph(v, we, directed=False, indexed=True)
    m = MaximalMatching(weight_col="weight", priority="md5").run(g)
    return m.join(we, on=[SRC, DST]).select(
        F.col(SRC).cast("long").alias(SRC),
        F.col(DST).cast("long").alias(DST),
        F.col("weight").cast("long").alias("weight"),
    )

@query(
    "graph_coarsen",
    oracle=f"""
WITH RECURSIVE {SUPPLIER_EDGES_CTE.strip()},
pe AS (
    SELECT src, dst, {_MATCH_PRIORITY_SQL} AS p
    FROM supplier_edges
),
greedy AS (
    SELECT CAST([] AS BIGINT[]) AS matched
    UNION ALL
    SELECT g.matched || [pick.src, pick.dst]
    FROM greedy g, LATERAL (
        SELECT src, dst FROM pe
        WHERE NOT list_contains(g.matched, pe.src)
          AND NOT list_contains(g.matched, pe.dst)
        ORDER BY p, src, dst LIMIT 1
    ) pick
),
final AS (
    SELECT matched FROM greedy ORDER BY len(matched) DESC LIMIT 1
),
m AS (
    SELECT matched[2 * x.i - 1] AS src, matched[2 * x.i] AS dst
    FROM final,
         LATERAL (
             SELECT unnest(range(1, len(final.matched) // 2 + 1)) AS i
         ) x
),
map AS (
    SELECT v.id, COALESCE(pm.super, v.id) AS super
    FROM (SELECT CAST(s_suppkey AS BIGINT) AS id FROM supplier) v
    LEFT JOIN (
        SELECT src AS id, LEAST(src, dst) AS super FROM m
        UNION ALL
        SELECT dst AS id, LEAST(src, dst) AS super FROM m
    ) pm USING (id)
),
coarse AS (
    SELECT LEAST(ms.super, md.super) AS csrc,
           GREATEST(ms.super, md.super) AS cdst,
           COUNT(*) AS weight
    FROM supplier_edges e
    JOIN map ms ON e.src = ms.id
    JOIN map md ON e.dst = md.id
    WHERE ms.super <> md.super
    GROUP BY 1, 2
),
sw AS (
    SELECT super, SUM(weight) AS w FROM (
        SELECT csrc AS super, weight FROM coarse
        UNION ALL
        SELECT cdst AS super, weight FROM coarse
    ) GROUP BY 1
)
SELECT map.id, map.super,
       CAST(COALESCE(sw.w, 0) AS BIGINT) AS super_weight
FROM map LEFT JOIN sw ON map.super = sw.super
""",
)
def q_graph_coarsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One multilevel coarsening step (Karypis & Kumar, METIS): contract
    a maximal matching of the supplier co-occurrence graph into
    supervertices. MAPPING-LEVEL oracle (round-5 verdict item 8): the
    matching uses md5 priorities, so the DuckDB oracle REPLAYS the exact
    peel — sequential greedy over edges in (priority, src, dst) order
    via a recursive CTE equals the distributed peeling fixpoint
    (Blelloch/Fineman/Shun SPAA'12) — then recomputes the contraction.
    Output is one row per fine vertex: its supervertex (the actual
    id→super mapping, value-checked, not just invariant-checked) and the
    total coarse edge weight incident to that supervertex (value-checks
    the weight aggregation of the contraction too: Σ incident weights =
    cross-super fine edge count per super). The matching comes from the
    shared per-application cache (_supplier_matching), so the peel is
    paid once across `maximal_matching`, this query, and the
    multilevel partitioner."""
    from pyspark_graph_spark.operators.matching import coarsen

    g = _supplier_cooc_graph(spark, sf_dir)
    m = _supplier_matching(spark, sf_dir)
    cg, mapping = coarsen(g, m)

    inc = cg.edges.select(
        F.col(SRC).alias("super"), F.col("weight")
    ).unionByName(cg.edges.select(F.col(DST).alias("super"), "weight"))
    sw = inc.groupBy("super").agg(F.sum("weight").alias("__w"))
    return (
        mapping.join(sw, on="super", how="left")
        .select(
            ID,
            "super",
            F.coalesce("__w", F.lit(0)).cast("long").alias("super_weight"),
        )
    )

@query(
    "coarsen_two_level",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices,
       CAST(0 AS BIGINT) AS vertex_defect,
       CAST(0 AS BIGINT) AS weight_defect
FROM supplier
""",
)
def q_coarsen_two_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO multilevel coarsening steps, verifying that weight
    conservation holds through REPEATED contraction — the level-2
    contract: because the level-2 contraction runs with sum_weights=True
    (summing level-1 weights instead of counting level-1 edges),
    Σ weight over level-2 edges must equal
    the number of FINE edges whose endpoints land in different level-2
    supervertices (composed through both mappings), and
    |V(level-2)| = |V| − |M1| − |M2| exactly. This is the invariant a
    count-based second contraction breaks (a level-2 edge covering five
    fine edges via two parallel level-1 edges would weigh 2, not 5), so
    the zero here pins the multilevel partitioner's cut bookkeeping at
    every level, not just the first. Level 0 reuses the shared matching
    cache (_supplier_matching); the level-1 peel runs on the halved
    coarse graph."""
    from pyspark_graph_spark.operators import MaximalMatching
    from pyspark_graph_spark.operators.matching import coarsen

    g = _supplier_cooc_graph(spark, sf_dir)
    m1 = _supplier_matching(spark, sf_dir)
    c1, map1 = coarsen(g, m1)
    m2 = MaximalMatching(seed=1).run(c1)
    c2, map2 = coarsen(c1, m2, sum_weights=True)
    comp = (
        map1.join(
            map2.select(
                F.col(ID).alias("super"), F.col("super").alias("__s2")
            ),
            on="super",
        )
        .select(ID, F.col("__s2").alias("super2"))
        .localCheckpoint()
    )
    nf = g.vertices.agg(F.count(F.lit(1)).alias("n_vertices"))
    nm = m1.agg(F.count(F.lit(1)).alias("__m1")).crossJoin(
        m2.agg(F.count(F.lit(1)).alias("__m2"))
    )
    nc = c2.vertices.agg(F.count(F.lit(1)).alias("__c"))
    ew = c2.edges.agg(
        F.coalesce(F.sum("weight"), F.lit(0)).cast("long").alias("__w")
    )
    cross = (
        g.edges.select(SRC, DST)
        .join(
            comp.withColumnsRenamed({ID: SRC, "super2": "__ss"}), on=SRC
        )
        .join(
            comp.withColumnsRenamed({ID: DST, "super2": "__sd"}), on=DST
        )
        .filter(F.col("__ss") != F.col("__sd"))
        .agg(F.count(F.lit(1)).alias("__x"))
    )
    return (
        nf.crossJoin(nm)
        .crossJoin(nc)
        .crossJoin(ew)
        .crossJoin(cross)
        .select(
            "n_vertices",
            (
                F.col("__c")
                - (F.col("n_vertices") - F.col("__m1") - F.col("__m2"))
            )
            .cast("long")
            .alias("vertex_defect"),
            (F.col("__w") - F.col("__x")).cast("long").alias("weight_defect"),
        )
    )

@query(
    "multilevel_partition",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices,
       CAST(LEAST(4, COUNT(*)) AS BIGINT) AS parts_used,
       CAST(0 AS BIGINT) AS assign_defect,
       CAST(0 AS BIGINT) AS balance_defect
FROM supplier
""",
)
def q_multilevel_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """METIS-style multilevel 4-way partition of the supplier
    co-occurrence graph (operators/partition.py): iterated
    match-and-contract down to <=32 supervertices, greedy least-loaded
    assignment of the coarsest level in ONE bounded Arrow batch, labels
    projected back through the composed mappings. The oracle pins the
    defining invariants: every vertex gets exactly one part
    (assign_defect), all k parts are used whenever |V| >= k (parts_used
    — greedy fills empty bins first), and every part respects Graham's
    list-scheduling bound max load <= total/k + max supervertex size
    (balance_defect) — the bound the assignment rule guarantees, so any
    violation is a real defect in the contraction or the packing. The
    level-0 peel reuses the shared supplier matching cache
    (_supplier_matching, also consumed by maximal_matching and
    graph_coarsen)."""
    g = _supplier_cooc_graph(spark, sf_dir)
    parts = _supplier_partition(spark, sf_dir)
    nf = g.vertices.agg(F.count(F.lit(1)).alias("n_vertices"))
    per = parts.groupBy(ID).agg(F.count(F.lit(1)).alias("__c"))
    assign = (
        g.vertices.select(ID)
        .join(per, on=ID, how="left")
        .filter(F.coalesce("__c", F.lit(0)) != 1)
        .agg(F.count(F.lit(1)).alias("assign_defect"))
    )
    used = parts.agg(F.count_distinct("part").alias("parts_used"))
    super_max = parts.groupBy("super").agg(
        F.count(F.lit(1)).alias("__ss")
    ).agg(F.max("__ss").alias("__ms"))
    psize = parts.groupBy("part").agg(F.count(F.lit(1)).alias("__ps"))
    bal = (
        psize.crossJoin(F.broadcast(nf.select(F.col("n_vertices").alias("__n"))))
        .crossJoin(F.broadcast(super_max))
        .filter(
            F.col("__ps").cast("double")
            > F.col("__n").cast("double") / F.lit(4.0) + F.col("__ms")
        )
        .agg(F.count(F.lit(1)).alias("balance_defect"))
    )
    return (
        nf.crossJoin(used)
        .crossJoin(assign)
        .crossJoin(bal)
        .select(
            "n_vertices",
            F.col("parts_used").cast("long").alias("parts_used"),
            "assign_defect",
            "balance_defect",
        )
    )

@query(
    "partition_refine",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices,
       CAST(0 AS BIGINT) AS assign_defect,
       CAST(0 AS BIGINT) AS balance_defect,
       CAST(0 AS BIGINT) AS cut_increase_defect
FROM supplier
""",
)
def q_partition_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FM-flavored boundary refinement of the multilevel partition
    (operators/partition.py refine): positive-gain boundary vertices are
    thinned to a Luby-style independent set (no two movers adjacent) and
    capped per target part, so each round's cut decrease equals the sum
    of accepted gains BY CONSTRUCTION — which makes quality itself an
    exact invariant. The oracle pins: every vertex still has exactly one
    part (assign_defect), no part exceeds the same Graham bound the
    initial assignment guarantees (balance_defect, cap = total/k + max
    supervertex size), and the refined cut never exceeds the original
    (cut_increase_defect). Consumes the shared partition + matching
    caches; two refinement rounds."""
    from pyspark_graph_spark.operators.partition import (
        partition_report,
        refine,
    )

    g = _supplier_cooc_graph(spark, sf_dir)
    parts = _supplier_partition(spark, sf_dir)

    nf = g.vertices.agg(F.count(F.lit(1)).alias("n_vertices"))
    cap_df = (
        nf.crossJoin(
            parts.groupBy("super")
            .agg(F.count(F.lit(1)).alias("__c"))
            .agg(F.max("__c").alias("__ms"))
        ).select(
            F.floor(
                F.col("n_vertices").cast("double") / F.lit(4.0)
                + F.col("__ms")
            ).alias("cap")
        )
    )
    refined = refine(
        g, parts.select(ID, "part"), k=4, cap=cap_df
    ).localCheckpoint()

    before = partition_report(g, parts.select(ID, "part")).select(
        F.col("cut_edges").alias("__cb")
    )
    after = partition_report(g, refined).select(
        F.col("cut_edges").alias("__ca"),
        F.col("assign_defect").alias("assign_defect"),
    )
    bal = (
        refined.groupBy("part")
        .agg(F.count(F.lit(1)).alias("__ps"))
        .crossJoin(F.broadcast(cap_df))
        .filter(F.col("__ps") > F.col("cap"))
        .agg(F.count(F.lit(1)).alias("balance_defect"))
    )
    return (
        nf.crossJoin(after)
        .crossJoin(before)
        .crossJoin(bal)
        .select(
            "n_vertices",
            "assign_defect",
            "balance_defect",
            F.when(F.col("__ca") > F.col("__cb"), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("cut_increase_defect"),
        )
    )

@query(
    "partition_star",
    oracle="""
SELECT CAST(COUNT(DISTINCT o_custkey) + COUNT(DISTINCT o_orderkey) AS BIGINT)
         AS n_vertices,
       CAST(LEAST(4, COUNT(DISTINCT o_custkey) + COUNT(DISTINCT o_orderkey))
         AS BIGINT) AS parts_used,
       CAST(0 AS BIGINT) AS assign_defect,
       CAST(0 AS BIGINT) AS balance_defect,
       CAST(0 AS BIGINT) AS super_span_defect
FROM orders WHERE o_custkey % 16 = 0
""",
)
def q_partition_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-way multilevel partition of the customer→orders STAR FOREST — the
    graph class 2-hop matching exists for (operators/partition.py
    two_hop_pairs; SCALE.md round 8 measures O(n)→O(log n) levels on a
    1 M-vertex star forest). Each customer is a hub whose orders are
    leaves; pure edge matching removes ~1 leaf per hub per level, so
    without two_hop the coarsening stalls at ~|V| supervertices.
    The oracle pins the partition invariants: exactly one part per vertex
    (assign_defect), all k parts used (parts_used), Graham's list-
    scheduling balance bound (balance_defect), and — star-specific —
    that contraction never merges vertices across two different stars
    (super_span_defect: supervertices spanning ≥2 customers; matching
    contraction can only merge within a connected component, so any
    violation is a real coarsening defect)."""
    from pyspark_graph_spark.graph import Graph
    from pyspark_graph_spark.operators.partition import MultilevelPartition
    from pyspark_graph_spark.sources.tables import load_table

    OFF = 1_000_000  # disjoint id spaces: hubs = custkey, leaves = OFF+orderkey
    # every 16th star: the invariants and the two_hop code path are
    # scale-free, and the gate pays ~2 shuffle stages per coarsening level
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 16 == 0)
        .select("o_custkey", "o_orderkey")
    )
    hubs = orders.select(F.col("o_custkey").alias(ID)).distinct()
    leaves = orders.select((F.col("o_orderkey") + OFF).alias(ID))
    # the coarsening loop's cost at gate scale is per-level scheduling,
    # not data: 8 partitions keep each of the ~5 levels' actions cheap
    # (the operator itself inherits whatever partitioning it is given,
    # so cluster callers keep their own fan-out)
    v = hubs.unionByName(leaves).repartition(8).localCheckpoint()
    e = orders.select(
        F.col("o_custkey").alias(SRC),
        (F.col("o_orderkey") + OFF).alias(DST),
    ).repartition(8).localCheckpoint()
    g = Graph(v, e, directed=False, indexed=True)
    # ONE coarsening level (star-forest shrink is ~0.52/level, so the
    # stop threshold sits at 0.6n — just above one level's result)
    # drives the whole path — matching, 2-hop pairing, contraction,
    # assignment, projection — and all four invariants at any sf; the
    # deep-coarsening (O(n)→O(log n) levels) evidence is SCALE.md round
    # 8's 1M-vertex star-forest measurement, where two_hop=False leaves
    # 99.4% of vertices uncontracted after 12 levels and two_hop=True
    # reaches 150 supervertices in 13
    n_v = v.count()
    parts = (
        MultilevelPartition(
            k=4,
            max_coarse=max(256, (n_v * 3) // 5),
            max_batch=1_000_000,
            # the graph is a KNOWN star forest: force the 2-hop pass from
            # level 0 (the "auto" default would spend one probe level
            # discovering the starvation this query exists to exercise)
            two_hop=True,
        )
        .run(g)
        .localCheckpoint()
    )

    nf = v.agg(F.count(F.lit(1)).alias("n_vertices"))
    per = parts.groupBy(ID).agg(F.count(F.lit(1)).alias("__c"))
    assign = (
        v.join(per, on=ID, how="left")
        .filter(F.coalesce("__c", F.lit(0)) != 1)
        .agg(F.count(F.lit(1)).alias("assign_defect"))
    )
    used = parts.agg(F.count_distinct("part").alias("parts_used"))
    super_max = (
        parts.groupBy("super")
        .agg(F.count(F.lit(1)).alias("__ss"))
        .agg(F.max("__ss").alias("__ms"))
    )
    psize = parts.groupBy("part").agg(F.count(F.lit(1)).alias("__ps"))
    bal = (
        psize.crossJoin(
            F.broadcast(nf.select(F.col("n_vertices").alias("__n")))
        )
        .crossJoin(F.broadcast(super_max))
        .filter(
            F.col("__ps").cast("double")
            > F.col("__n").cast("double") / F.lit(4.0) + F.col("__ms")
        )
        .agg(F.count(F.lit(1)).alias("balance_defect"))
    )
    # star membership of every vertex: hubs are their own star, leaves
    # belong to their order's customer
    star = v.join(
        orders.select(
            (F.col("o_orderkey") + OFF).alias(ID),
            F.col("o_custkey").alias("__star"),
        ),
        on=ID,
        how="left",
    ).select(ID, F.coalesce("__star", F.col(ID)).alias("__star"))
    span = (
        parts.join(star, on=ID)
        .groupBy("super")
        .agg(F.count_distinct("__star").alias("__k"))
        .filter(F.col("__k") > 1)
        .agg(F.count(F.lit(1)).alias("super_span_defect"))
    )
    return (
        nf.crossJoin(F.broadcast(used))
        .crossJoin(F.broadcast(assign))
        .crossJoin(F.broadcast(bal))
        .crossJoin(F.broadcast(span))
        .select(
            "n_vertices",
            F.col("parts_used").cast("long").alias("parts_used"),
            "assign_defect",
            "balance_defect",
            "super_span_defect",
        )
    )
