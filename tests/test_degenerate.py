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


def test_louvain_degenerate(degenerate):
    from pyspark_graph_spark.operators import Louvain, modularity

    g = degenerate
    out = Louvain(max_rounds=3).run(g)
    n = g.vertices.count()
    assert out.count() == n
    if n:
        r = out.first()
        assert r.community == r.id
    # modularity of an edgeless graph: no communities carry degree
    q = modularity(g, g.vertices.select("id", F.col("id").alias("community")))
    row = q.first()
    assert row is None or row.modularity is None or row.modularity == 0.0


def test_neighbor_sampler_degenerate(degenerate, spark):
    from pyspark_graph_spark.operators import NeighborSampler

    g = degenerate
    seeds = g.vertices
    out = NeighborSampler(fanouts=[2, 2]).run(g, seeds)
    assert out.count() == 0


def test_incremental_dedup_degenerate(spark):
    from pyspark_graph_spark.dedup import IncrementalDedup

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert IncrementalDedup().admitted(empty, empty).count() == 0


def test_training_shuffle_degenerate(spark):
    from pyspark_graph_spark.functions import assign_shards

    empty = spark.createDataFrame([], "doc_id long")
    assert assign_shards(empty, "doc_id", 4).count() == 0


def test_bpe_degenerate(spark):
    from pyspark_graph_spark.functions import apply_bpe, learn_bpe_merges

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert learn_bpe_merges(empty, n_merges=2).count() == 0
    assert apply_bpe(empty, [("a", "b")]).count() == 0


def test_sketches_degenerate(spark):
    from pyspark_graph_spark.functions import cms_sketch, kmv_distinct

    empty = spark.createDataFrame([], "grp string, val string")
    assert kmv_distinct(empty, "grp", "val", k=4).count() == 0
    assert cms_sketch(empty, "val").count() == 0


def test_pq_degenerate_tiny_corpus(spark):
    """Fewer vectors than centroids: every vector still gets a code."""
    from pyspark_graph_spark.ann import ProductQuantizer

    emb = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [3.0, 4.0])],
        "vec_id long, embedding array<double>",
    )
    out = ProductQuantizer(m=2, k=8, n_iter=2, dim=2).encode(emb)
    assert out.count() == 2


def test_event_analytics_degenerate(spark):
    from pyspark_graph_spark.streaming.events import (
        funnel,
        retention_cohorts,
        sliding_window_agg,
    )

    empty = spark.createDataFrame(
        [], "user_id long, event_type string, ts timestamp, value double"
    )
    assert sliding_window_agg(empty).count() == 0
    assert retention_cohorts(empty).count() == 0
    out = {r.step: r.n_users for r in funnel(empty, ["a", "b"]).collect()}
    assert out == {1: 0, 2: 0}


# --- round-4 additions -----------------------------------------------------


def test_reachable_set_no_edges(spark):
    from pyspark_graph_spark.operators.scc import reachable_set

    e = spark.createDataFrame([], "src long, dst long")
    s = spark.createDataFrame([(1,)], ["id"])
    out = reachable_set(e, s, "forward").collect()
    assert {r.id for r in out} == {1}


def test_earliest_arrival_no_edges(spark):
    from pyspark_graph_spark.operators.temporal import earliest_arrival

    e = spark.createDataFrame([], "src long, dst long, ts long")
    s = spark.createDataFrame([(1, 5)], ["id", "t0"])
    out = earliest_arrival(e, s).collect()
    assert {(r.id, r.arrival) for r in out} == {(1, 5)}


def test_kmv_pairwise_empty_group(spark):
    from pyspark_graph_spark.functions.sketch import kmv_pairwise

    # group 'c' has no rows: its pairs still report (union sketch = the
    # non-empty side) with zero overlap — the estimate of J(X, ∅) = 0
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 2), ("b", 3)], ["g", "v"]
    )
    rows = {
        (r.type_a, r.type_b): r
        for r in kmv_pairwise(df, "g", "v", ["a", "b", "c"], k=8).collect()
    }
    assert set(rows) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab = rows[("a", "b")]
    assert ab.k_eff == 3 and ab.common == 1  # union {1,2,3}, shared {2}
    for p in (("a", "c"), ("b", "c")):
        assert rows[p].common == 0 and rows[p].jaccard_est == 0.0


def test_kmv_pairwise_validations(spark):
    from pyspark_graph_spark.functions.sketch import kmv_pairwise

    df = spark.createDataFrame([("a", 1)], ["g", "v"])
    with pytest.raises(ValueError):
        kmv_pairwise(df, "g", "v", ["a"], k=8)
    with pytest.raises(ValueError):
        kmv_pairwise(df, "g", "v", ["a", "b"], k=1)


def test_sorted_neighborhood_single_doc(spark):
    from pyspark_graph_spark.dedup.blocking import sorted_neighborhood_pairs

    docs = spark.createDataFrame([(0, "only")], ["doc_id", "text"])
    assert (
        sorted_neighborhood_pairs(docs, F.col("text"), window=3).count() == 0
    )
