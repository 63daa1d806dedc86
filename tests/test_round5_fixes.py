"""Round-5 ADVICE fixes: kmv_pairwise group filtering, duplicate
earliest_arrival seeds, densest final-iteration emptiness, per-exchange
BNLJ adjudication, bounded CDC cache."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark_graph_spark.functions.sketch import kmv_pairwise
from pyspark_graph_spark.operators.densest import DensestSubgraph
from pyspark_graph_spark.operators.temporal import earliest_arrival
from pyspark_graph_spark.constants import DST, ID, SRC
from pyspark_graph_spark.graph import Graph
from tools.plan_audit import audit_plan


# ---------------------------------------------------------------------------
# kmv_pairwise: rows outside `groups` must not contaminate the sketches
# ---------------------------------------------------------------------------

def test_kmv_pairwise_ignores_unlisted_groups(spark):
    rows = [("a", i) for i in range(20)] + [("b", i) for i in range(10, 30)]
    # an unlisted group sharing values with both listed groups
    noise = [("zzz", i) for i in range(100)]
    df = spark.createDataFrame(rows + noise, ["g", "v"])
    out = kmv_pairwise(df, "g", "v", ["a", "b"], k=64).collect()
    # only the (a, b) pair — no pair involving the unlisted group
    assert [(r.type_a, r.type_b) for r in out] == [("a", "b")]
    r = out[0]
    # k=64 > union size 30, so the sketch is exact: jaccard 10/30
    assert r.k_eff == 30 and r.common == 10
    assert abs(r.jaccard_est - 10 / 30) < 1e-6


def test_kmv_pairwise_unlisted_group_does_not_shift_estimates(spark):
    base = [("a", i) for i in range(20)] + [("b", i) for i in range(10, 30)]
    clean = spark.createDataFrame(base, ["g", "v"])
    noisy = spark.createDataFrame(
        base + [("c", i) for i in range(500)], ["g", "v"]
    )
    want = {
        (r.type_a, r.type_b): (r.k_eff, r.common)
        for r in kmv_pairwise(clean, "g", "v", ["a", "b"], k=16).collect()
    }
    got = {
        (r.type_a, r.type_b): (r.k_eff, r.common)
        for r in kmv_pairwise(noisy, "g", "v", ["a", "b"], k=16).collect()
    }
    assert want == got


# ---------------------------------------------------------------------------
# earliest_arrival: duplicate seed ids collapse to the earliest start
# ---------------------------------------------------------------------------

def test_earliest_arrival_duplicate_seeds_collapse(spark):
    e = spark.createDataFrame([(1, 2, 5), (2, 3, 7)], ["src", "dst", "ts"])
    # the same seed twice with different start times: only min(t0) counts
    s = spark.createDataFrame([(1, 9), (1, 3), (1, 3)], ["id", "t0"])
    out = {r.id: r.arrival for r in earliest_arrival(e, s).collect()}
    assert out == {1: 3, 2: 5, 3: 7}
    # exactly one row per id — no duplicate state rows survive
    assert earliest_arrival(e, s).count() == 3


# ---------------------------------------------------------------------------
# densest: peel emptying the graph ON the final allowed iteration is
# convergence, not truncation
# ---------------------------------------------------------------------------

def test_densest_final_iteration_empty_is_converged(spark):
    # a triangle peels to empty in one pass (every degree >= threshold
    # never holds: thr = 2(1+eps) * density > 2 = max degree)
    v = spark.createDataFrame([(i,) for i in range(3)], [ID])
    e = spark.createDataFrame([(0, 1), (1, 2), (0, 2)], [SRC, DST])
    g = Graph(v, e, directed=False, indexed=True)
    # with max_iterations=2 the peel empties on iteration 1 and the
    # emptiness probe at the top of iteration 2 observes it -> fine; with
    # max_iterations=1 the loop exits right after the emptying peel, which
    # previously raised spuriously
    out = DensestSubgraph(max_iterations=1).run(g)
    assert out.count() >= 1


# ---------------------------------------------------------------------------
# plan_audit: adjudication is per-exchange — exceeding the adjudicated
# count is a hard flag again
# ---------------------------------------------------------------------------

def _explain(df, spark):
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )


def test_audit_flags_exchange_count_above_adjudication(spark):
    big = spark.range(1000).withColumnRenamed("id", "a")
    o1 = spark.range(100).withColumnRenamed("id", "b")
    o2 = spark.range(100).withColumnRenamed("id", "c")
    # two unbounded broadcast exchanges; `ann_topk` is adjudicated for one
    bad = big.crossJoin(F.broadcast(o1)).crossJoin(F.broadcast(o2))
    flags = audit_plan(_explain(bad, spark), query="ann_topk")
    assert any("EXCEEDS adjudicated" in f for f in flags)
    assert not any(f.startswith("bounded-by-construction") for f in flags)


def test_audit_within_adjudication_still_soft(spark):
    big = spark.range(1000).withColumnRenamed("id", "a")
    o1 = spark.range(100).withColumnRenamed("id", "b")
    bad = big.crossJoin(F.broadcast(o1))
    flags = audit_plan(_explain(bad, spark), query="kmeans")
    assert flags and flags[0].startswith("bounded-by-construction")


# ---------------------------------------------------------------------------
# _CDC_CACHE: switching sf_dir evicts (and unpersists) the old entry
# ---------------------------------------------------------------------------

def test_cdc_cache_bounded_to_one_entry(spark):
    from pyspark_graph_spark import queries as Q

    if not os.path.isdir("/root/testdata/sf0.001"):
        pytest.skip("driver testdata not present")
    Q._CDC_CACHE.clear()
    a = Q.QUERIES["cdc_dedup_clusters"](spark, "/root/testdata/sf0.001")
    a.count()
    assert len(Q._CDC_CACHE) == 1
    # cache hit: same object back
    again = Q.QUERIES["cdc_dedup_clusters"](spark, "/root/testdata/sf0.001")
    assert again is a
    b = Q.QUERIES["cdc_dedup_clusters"](spark, "/root/testdata/sf0.01")
    b.count()
    assert len(Q._CDC_CACHE) == 1
    assert next(iter(Q._CDC_CACHE))[1].endswith("sf0.01")
    # the evicted DataFrame was unpersisted
    assert a.storageLevel.useMemory is False
    b.unpersist()
    Q._CDC_CACHE.clear()


# ---------------------------------------------------------------------------
# plan_audit: global-window detection — an empty partition spec is the
# single-partition scale-killer; a partitioned window is not
# ---------------------------------------------------------------------------

def test_count_global_windows_detects_unpartitioned(spark):
    from pyspark.sql import Window

    from tools.plan_audit import count_global_windows

    df = spark.range(100).select(
        "id", F.row_number().over(Window.orderBy("id")).alias("r")
    )
    assert count_global_windows(df._jdf.queryExecution()) == 1


def test_count_global_windows_ignores_partitioned(spark):
    from pyspark.sql import Window

    from tools.plan_audit import count_global_windows

    df = spark.range(100).select(
        "id",
        (F.col("id") % 7).alias("p"),
    ).select(
        "id",
        F.row_number()
        .over(Window.partitionBy("p").orderBy("id"))
        .alias("r"),
    )
    assert count_global_windows(df._jdf.queryExecution()) == 0


def test_vocab_coverage_window_is_limit_bounded(spark):
    """The rank window must run over a TakeOrdered top-max(ks) slice,
    not the full vocabulary (the round-5 single-partition-window fix):
    the physical plan keeps a global window (over max(ks) rows) but a
    TakeOrderedAndProject must sit below it in every branch."""
    from pyspark_graph_spark.functions.quality import vocab_coverage

    df = spark.createDataFrame(
        [("w x y z w x y w x w",)], ["text"]
    )
    plan = vocab_coverage(df, [2, 3])._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert "TakeOrderedAndProject" in plan
