"""Round-6 fixes: four_cycles wedge-budget guard, xlingual LSH gate path
(forest-reproduction oracle + weak-threshold recall), MIS non-convergence
raise, refine() duplicate-id validation, widen_for_python plan-shape gate,
multi-sf cache eviction."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark_graph_spark.queries as Q
from pyspark_graph_spark.constants import DST, ID, SRC
from pyspark_graph_spark.graph import Graph


# ---------------------------------------------------------------------------
# four_cycles: Σ C(deg,2) budget probe must trip before the wedge join
# ---------------------------------------------------------------------------

def test_wedge_budget_guard_raises_over_budget(spark, sf_dir, monkeypatch):
    if not os.path.isdir(sf_dir):
        pytest.skip("driver testdata not present")
    monkeypatch.setenv("SPARK_GRAFT_WEDGE_BUDGET", "1")
    with pytest.raises(ValueError, match="four_cycles_estimate"):
        Q.QUERIES["four_cycles"](spark, sf_dir)


def test_wedge_budget_guard_passes_under_budget(spark, sf_dir):
    if not os.path.isdir(sf_dir):
        pytest.skip("driver testdata not present")
    # default budget (2e9) dwarfs the sf0.001 wedge count
    out = Q.QUERIES["four_cycles"](spark, sf_dir).collect()
    assert len(out) == 1 and out[0]["four_cycles"] >= 0


def test_wedge_budget_guard_direct():
    # guard math: star graph K_{1,5} has C(5,2)=10 wedges at the hub
    from pyspark_graph_spark.queries import _wedge_budget_guard
    from pyspark_graph_spark.session import get_spark

    spark = get_spark("pyspark_graph_spark-tests")
    edges = spark.createDataFrame(
        [(i, 99) for i in range(5)], f"{SRC} long, {DST} long"
    )
    sym = edges.unionByName(
        edges.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
    )
    os.environ["SPARK_GRAFT_WEDGE_BUDGET"] = "9"
    try:
        with pytest.raises(ValueError, match="10 wedge rows"):
            _wedge_budget_guard(sym, query_name="four_cycles")
        os.environ["SPARK_GRAFT_WEDGE_BUDGET"] = "10"
        _wedge_budget_guard(sym, query_name="four_cycles")  # 10 <= 10: ok
    finally:
        del os.environ["SPARK_GRAFT_WEDGE_BUDGET"]


# ---------------------------------------------------------------------------
# xlingual_mining gate path: LSH forest, weak-threshold regime
# ---------------------------------------------------------------------------

def test_embedding_dedup_lsh_weak_threshold_subset_and_recall(spark):
    """At the gate's weak-threshold regime (cosine ~0.35-0.5, θ ≈ 60-70°)
    the 16×6 forest is NOT recall-complete — the gate oracle reproduces
    the forest rather than assuming recall 1.0. Pin the two facts that
    make that design sound: precision 1.0 (lsh ⊆ brute, identical
    cosine values) and recall within the analytic band for this geometry
    (per-pair ≈ 1-(1-p^6)^16 with p = 1-θ/π)."""
    import random

    from pyspark_graph_spark.dedup import EmbeddingDedup

    rng = random.Random(3)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(64)]) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    brute = {
        (r["src"], r["dst"]): r["cosine_sim"]
        for r in EmbeddingDedup(threshold=0.35, strategy="brute")
        .pairs(df)
        .collect()
    }
    lsh = {
        (r["src"], r["dst"]): r["cosine_sim"]
        for r in EmbeddingDedup(threshold=0.35, strategy="lsh", dim=64)
        .pairs(df)
        .collect()
    }
    assert set(lsh) <= set(brute)  # precision 1.0: exact verify
    for k, v in lsh.items():
        assert v == brute[k]  # identical exact cosine values
    assert len(brute) > 20  # regime is populated
    recall = len(lsh) / len(brute)
    # analytic per-pair recall at θ≈66-70° is ~0.55-0.75; allow slack
    assert 0.30 <= recall < 1.0


def test_xlingual_oracle_reproduces_forest(spark, sf_dir):
    """The generated plane literals must round-trip: Spark's LSH gate
    query and the DuckDB forest oracle agree row-for-row at sf0.001."""
    if not os.path.isdir(sf_dir):
        pytest.skip("driver testdata not present")
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracle = sorted(
        tuple(r) for r in con.execute(Q.ORACLES["xlingual_mining"]).fetchall()
    )
    got = sorted(
        (r["src"], r["dst"], r["lang_src"], r["lang_dst"], r["cosine_sim"])
        for r in Q.QUERIES["xlingual_mining"](spark, sf_dir).collect()
    )
    assert got == oracle


# ---------------------------------------------------------------------------
# MIS: exhausting max_iterations with undecided vertices must raise
# ---------------------------------------------------------------------------

def test_mis_non_convergence_raises(spark):
    from pyspark_graph_spark.operators.mis import MaximalIndependentSet

    v = spark.createDataFrame([(i,) for i in range(6)], f"{ID} long")
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], f"{SRC} long, {DST} long"
    )
    g = Graph(v, e, directed=False, indexed=True)
    with pytest.raises(ValueError, match="did not decide every vertex"):
        MaximalIndependentSet(max_iterations=0).run(g)


def test_mis_normal_run_still_maximal(spark):
    from pyspark_graph_spark.operators.mis import MaximalIndependentSet

    v = spark.createDataFrame([(i,) for i in range(8)], f"{ID} long")
    e = spark.createDataFrame(
        [(i, (i + 1) % 8) for i in range(8)], f"{SRC} long, {DST} long"
    )
    g = Graph(v, e, directed=False, indexed=True)
    mis = {r[ID] for r in MaximalIndependentSet().run(g).collect()}
    ring = {(i, (i + 1) % 8) for i in range(8)}
    for a, b in ring:  # independent
        assert not (a in mis and b in mis)
    for i in range(8):  # maximal
        assert i in mis or ((i + 1) % 8) in mis or ((i - 1) % 8) in mis


# ---------------------------------------------------------------------------
# refine(): duplicate vertex ids in parts must raise, not corrupt
# ---------------------------------------------------------------------------

def test_refine_rejects_duplicate_ids(spark):
    from pyspark_graph_spark.operators.partition import refine

    v = spark.createDataFrame([(i,) for i in range(4)], f"{ID} long")
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], f"{SRC} long, {DST} long"
    )
    g = Graph(v, e, directed=False, indexed=True)
    parts = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1), (3, 0)],  # id 3 twice
        f"{ID} long, part int",
    )
    with pytest.raises(ValueError, match="duplicate vertex ids"):
        refine(g, parts, k=2, cap=3)


# ---------------------------------------------------------------------------
# widen_for_python: plan-shape gate (round-5 ADVICE)
# ---------------------------------------------------------------------------

def test_widen_only_bare_scans(spark, sf_dir):
    if not os.path.isdir(sf_dir):
        pytest.skip("driver testdata not present")
    from pyspark_graph_spark.multimodal.binary_ops import (
        _is_bare_scan,
        widen_for_python,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert _is_bare_scan(docs)
    assert _is_bare_scan(docs.filter(F.col("doc_id") > 3).select("doc_id"))
    joined = docs.join(
        docs.select(F.col("doc_id").alias("d2")),
        F.col("doc_id") == F.col("d2"),
    )
    # leaf files surface through the join, but the plan is NOT a bare scan
    assert len(joined.inputFiles()) > 0
    assert not _is_bare_scan(joined)
    assert widen_for_python(joined) is joined  # untouched: no rdd probe
    assert not _is_bare_scan(docs.groupBy("lang").count())
    assert not _is_bare_scan(docs.repartition(4))
    target = spark.sparkContext.defaultParallelism
    assert widen_for_python(docs).rdd.getNumPartitions() == target


# ---------------------------------------------------------------------------
# shared caches: switching sf_dir evicts the previous entry (single-key)
# ---------------------------------------------------------------------------

def test_matching_cache_single_sf_dir_eviction(spark):
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        if not os.path.isdir(d):
            pytest.skip("driver testdata not present")
    Q.clear_shared_caches()
    Q._supplier_matching(spark, "/root/testdata/sf0.001")
    assert len(Q._MATCHING_CACHE) == 1
    first_key = next(iter(Q._MATCHING_CACHE))
    Q._supplier_matching(spark, "/root/testdata/sf0.01")
    assert len(Q._MATCHING_CACHE) == 1  # old sf evicted + unpersisted
    assert next(iter(Q._MATCHING_CACHE)) != first_key
    Q.clear_shared_caches()


# ---------------------------------------------------------------------------
# anisotropic corpora: standardization must keep the forest selective
# ---------------------------------------------------------------------------

def test_lsh_standardization_survives_anisotropy(spark):
    """Real embedding corpora concentrate in a common direction
    ("all-but-the-top"); raw hyperplane bits then all compute
    sign(w0*x0) and every vector lands in one bucket per table (measured
    2.25 B candidate pairs at real-sf1). The z-scored forest must (a)
    still find a planted near-duplicate pair and (b) keep the candidate
    volume far below all-pairs on exactly that corpus shape."""
    import random

    from pyspark.sql import functions as F

    from pyspark_graph_spark.ann.lsh import RandomHyperplaneLSH
    from pyspark_graph_spark.dedup import EmbeddingDedup

    rng = random.Random(5)
    rows = []
    for i in range(400):
        # dominant dim 0 (mean 100, std 30) + tiny isotropic remainder
        v = [rng.gauss(100, 30)] + [rng.gauss(0, 1) for _ in range(15)]
        rows.append((i, v))
    # planted near-dup: same direction, small perturbation
    base_v = rows[7][1]
    rows.append((400, [x * 1.001 + rng.gauss(0, 1e-4) for x in base_v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    dd = EmbeddingDedup(
        threshold=0.9999, strategy="lsh", dim=16, planes_per_table=6
    )
    found = {(r["src"], r["dst"]) for r in dd.pairs(df).collect()}
    assert (7, 400) in found

    # candidate volume check: z-scored buckets must spread. Reproduce the
    # standardization, sketch, and bound max bucket well below n.
    base = df.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("__v")
    )
    stats = (
        base.select(
            F.posexplode(F.col("__v").cast("array<double>")).alias(
                "dim", "__x"
            )
        )
        .groupBy("dim")
        .agg(
            F.round(F.avg("__x"), 6).alias("__mu"),
            F.round(F.stddev_pop("__x"), 6).alias("__sd"),
        )
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "__mu", "__sd"))
            ).alias("__s")
        )
        .select(
            F.transform(F.col("__s"), lambda s: s["__mu"]).alias("__mean"),
            F.transform(F.col("__s"), lambda s: s["__sd"]).alias("__scale"),
        )
    )
    centered = base.crossJoin(F.broadcast(stats)).select(
        "id",
        F.zip_with(
            F.zip_with(
                F.col("__v").cast("array<double>"),
                F.col("__mean"),
                lambda a, b: a - b,
            ),
            F.col("__scale"),
            lambda a, s: a / s,
        ).alias("__v"),
    )
    lsh = RandomHyperplaneLSH(
        dim=16, num_tables=16, planes_per_table=6, multi_probe=False,
        seed=42, id_col="id", vec_col="__v",
    )
    spread = (
        lsh.sketch(centered)
        .groupBy("table", "bucket")
        .count()
        .agg(F.max("count").alias("mx"))
        .collect()[0]["mx"]
    )
    # raw vectors put ~all 401 in one bucket; z-scored must spread
    assert spread < 200
