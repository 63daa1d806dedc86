"""Degenerate-input sweep: every operator on empty and single-vertex
graphs/corpora must return a sane (usually empty) result, never crash."""

import pytest
from pyspark.sql import functions as F

from pyspark_graph_spark import Graph
from pyspark_graph_spark.ann import BruteForceKNN
from pyspark_graph_spark.dedup import ExactDedup, MinHashLSH, SimHashDedup
from pyspark_graph_spark.operators import (
    AggregateMessages,
    AlternatingConnectedComponents,
    BreadthFirstSearch,
    ConnectedComponents,
    JaccardSimilarity,
    KatzIndex,
    LabelPropagation,
    OverlapCoefficient,
    PageRank,
    ShortestPaths,
    StronglyConnectedComponents,
    TriangleCount,
    WLKernel,
)
from pyspark_graph_spark.streaming import session_stats


def empty_graph(spark):
    v = spark.createDataFrame([], "id long")
    e = spark.createDataFrame([], "src long, dst long")
    return Graph(v, e, indexed=True)


def single_vertex(spark):
    v = spark.createDataFrame([(1,)], ["id"])
    e = spark.createDataFrame([], "src long, dst long")
    return Graph(v, e, indexed=True)


@pytest.fixture(scope="module", params=["empty", "single"])
def degenerate(request, spark):
    return (
        empty_graph(spark) if request.param == "empty" else single_vertex(spark)
    )


def test_views(degenerate):
    g = degenerate
    n = g.vertices.count()
    assert g.adjacency.count() == n
    assert g.degrees.count() == (0 if g.directed else n) or n in (0, 1)
    assert g.out_degrees.count() == 0
    assert g.triplets().count() == 0


def test_components(degenerate):
    g = degenerate
    n = g.vertices.count()
    assert ConnectedComponents().run(g).count() == n
    assert AlternatingConnectedComponents().run(g).count() == n
    assert StronglyConnectedComponents().run(g).count() == n


def test_one_shot_operators(degenerate):
    g = degenerate
    assert TriangleCount().run(g) == 0
    assert JaccardSimilarity().run(g).count() == 0
    assert OverlapCoefficient().run(g).count() == 0
    assert KatzIndex(max_iterations=2).run(g).count() == 0
    assert PageRank(max_iterations=2).run(g).count() == g.vertices.count()


def test_iterative_operators(degenerate):
    g = degenerate
    n = g.vertices.count()
    assert LabelPropagation(max_iterations=2).run(g).count() == n
    assert isinstance(WLKernel(max_iterations=1).run(g), (str, type(None)))
    assert (
        BreadthFirstSearch(F.lit(True), F.lit(False)).run(g).count() == 0
    )
    assert ShortestPaths([1], max_iterations=2).run_exploded(g).count() == (
        1 if n == 1 else 0
    )
    assert AggregateMessages(
        agg=F.sum("msg"), to_dst=F.col("src_id")
    ).run(g).count() == 0


def test_dedup_on_empty_corpus(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    assert ExactDedup().fingerprints(docs).count() == 0
    assert MinHashLSH().pairs(docs).count() == 0
    assert SimHashDedup().pairs(docs).count() == 0


def test_ann_on_empty_corpus(spark):
    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert BruteForceKNN().topk(emb, emb).count() == 0


def test_sessions_on_empty_events(spark):
    ev = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, value double"
    )
    assert session_stats(ev).count() == 0
