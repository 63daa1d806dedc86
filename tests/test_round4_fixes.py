"""Round-4 ADVICE fixes: plan-audit BNLJ discrimination, NULL blocking
keys, non-convergence signals, fractional critical-path weights."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark_graph_spark.constants import DST, ID, SRC
from pyspark_graph_spark.dedup.blocking import sorted_neighborhood_pairs
from pyspark_graph_spark.graph import Graph
from pyspark_graph_spark.operators.dag import CriticalPath
from pyspark_graph_spark.operators.densest import DensestSubgraph
from pyspark_graph_spark.operators.temporal import earliest_arrival
from tools.plan_audit import audit_plan


# ---------------------------------------------------------------------------
# plan_audit: BNLJ broadcast side must be a 1-row aggregate / bounded
# ---------------------------------------------------------------------------

def _explain(df, spark):
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )


def test_audit_flags_nonsingleton_broadcast_cross_join(spark):
    big = spark.range(1000).withColumnRenamed("id", "a")
    other = spark.range(100).withColumnRenamed("id", "b")
    bad = big.crossJoin(F.broadcast(other))
    flags = audit_plan(_explain(bad, spark))
    assert any("non-singleton" in f for f in flags)


def test_audit_accepts_broadcast_singleton_aggregate(spark):
    big = spark.range(1000).withColumnRenamed("id", "a")
    tot = spark.range(100).agg(F.sum("id").alias("t"))
    good = big.crossJoin(F.broadcast(tot))
    assert audit_plan(_explain(good, spark)) == []


def test_audit_adjudicated_query_reports_reason_not_flag(spark):
    big = spark.range(1000).withColumnRenamed("id", "a")
    other = spark.range(100).withColumnRenamed("id", "b")
    bad = big.crossJoin(F.broadcast(other))
    flags = audit_plan(_explain(bad, spark), query="kmeans")
    assert flags and flags[0].startswith("bounded-by-construction")


# ---------------------------------------------------------------------------
# blocking: NULL keys participate instead of vanishing
# ---------------------------------------------------------------------------

def test_null_blocking_keys_are_not_dropped(spark):
    docs = spark.createDataFrame(
        [(0, None), (1, "a"), (2, None), (3, "b")],
        ["doc_id", "text"],
    )
    pairs = sorted_neighborhood_pairs(
        docs, F.col("text"), window=2, id_col="doc_id"
    ).collect()
    ids_in_pairs = {r.a for r in pairs} | {r.b for r in pairs}
    # NULL keys coalesce to '' and sort first: 0-2, 2-1, 1-3 adjacency
    assert ids_in_pairs == {0, 1, 2, 3}
    assert (0, 2) in {(r.a, r.b) for r in pairs}


# ---------------------------------------------------------------------------
# non-convergence must raise, not silently truncate
# ---------------------------------------------------------------------------

def _chain_graph(spark, n):
    edges = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(n - 1)], [SRC, DST, "weight"]
    )
    vertices = spark.createDataFrame([(i,) for i in range(n)], [ID])
    return Graph(vertices, edges, directed=True, indexed=True)


def test_earliest_arrival_raises_when_rounds_exhausted(spark):
    edges = spark.createDataFrame(
        [(i, i + 1, i) for i in range(5)], ["src", "dst", "ts"]
    )
    seeds = spark.createDataFrame([(0, 0)], ["id", "t0"])
    # batch_finish=0 forces the distributed label-correcting rounds —
    # the round-9 batch front-path solves any bounded input in one shot,
    # so the truncation guard only exists on the distributed path
    with pytest.raises(ValueError, match="did not converge"):
        earliest_arrival(edges, seeds, max_rounds=2, batch_finish=0)


def test_densest_raises_on_truncated_peel(spark):
    g = _chain_graph(spark, 30)
    with pytest.raises(ValueError, match="did not empty"):
        DensestSubgraph(epsilon=0.001, max_iterations=1).run(g)


# ---------------------------------------------------------------------------
# critical path keeps fractional weights
# ---------------------------------------------------------------------------

def test_critical_path_fractional_weights(spark):
    edges = spark.createDataFrame(
        [(0, 1, 0.5), (1, 2, 0.25), (0, 2, 0.6)], [SRC, DST, "weight"]
    )
    vertices = spark.createDataFrame([(0,), (1,), (2,)], [ID])
    g = Graph(vertices, edges, directed=True, indexed=True)
    out = {
        r.id: r.critical_path
        for r in CriticalPath(weight_col="weight").run(g).collect()
    }
    assert out[1] == pytest.approx(0.5)
    assert out[2] == pytest.approx(0.75)  # 0.5+0.25 beats 0.6, not truncated
