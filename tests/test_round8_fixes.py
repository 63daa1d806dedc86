"""Round-8 hardening: hot-bucket caps in the banded dedup joins.

A viral-boilerplate cluster of n identical docs collides in every MinHash
band (and every SimHash pigeonhole block), so the banded self-join emits
O(n²) candidate pairs — AQE can rebalance that shuffle but not shrink it.
These tests plant exactly that cluster and pin that the deterministic
hash-thinning cap (``max_bucket_size`` / ``max_block_size``) bounds the
explosion, stays a value-level no-op when no bucket exceeds the cap, and
is partition-invariant.
"""

import pytest
from pyspark.sql import functions as F

from pyspark_graph_spark.dedup import MinHashLSH, SimHashDedup
from pyspark_graph_spark.dedup.capping import cap_buckets

N_HOT = 200
BOILER = (
    "subscribe to our newsletter for the latest updates terms of service "
    "apply all rights reserved contact us for more information"
)


def _hot_docs(spark):
    """N_HOT identical boilerplate docs + one planted near-dup pair +
    two unrelated docs."""
    rows = [(i, BOILER) for i in range(N_HOT)]
    rows += [
        (1000, "the quick brown fox jumps over the lazy dog every day"),
        (1001, "the quick brown fox jumps over the lazy dog every night"),
        (2000, "completely unrelated text about spark physical planning"),
        (2001, "another lone document concerning parquet column pruning"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"]).repartition(8)


def test_minhash_hot_bucket_capped(spark):
    docs = _hot_docs(spark)
    capped = MinHashLSH(n=3, threshold=0.5, max_bucket_size=8).pairs(docs)
    rows = capped.collect()
    hot = [r for r in rows if r["src"] < N_HOT and r["dst"] < N_HOT]
    # uncapped would emit C(200,2)=19900 boilerplate pairs; with cap=8 each
    # of the 16 bands keeps ~8 members (binomial), so the union of per-band
    # pair sets stays ~16*C(8,2) — pin an order-of-magnitude bound
    assert 0 < len(hot) < 2500
    # the planted near-dup pair lives in cold buckets and must survive
    assert any(r["src"] == 1000 and r["dst"] == 1001 for r in rows)
    # unrelated docs still produce no pairs
    assert not any(r["src"] >= 2000 or r["dst"] >= 2000 for r in rows)


def test_minhash_uncapped_explodes(spark):
    # the counterfactual: cap=None on the same corpus really is quadratic
    docs = _hot_docs(spark)
    pairs = MinHashLSH(n=3, threshold=0.5, max_bucket_size=None).pairs(docs)
    hot = pairs.filter((F.col("src") < N_HOT) & (F.col("dst") < N_HOT))
    assert hot.count() == N_HOT * (N_HOT - 1) // 2


def test_minhash_cap_noop_below_threshold(spark):
    # no bucket exceeds the default cap on a small distinct corpus ->
    # capped and uncapped plans are value-identical
    rows = [(i, f"document number {i} about topic {i % 5} with words {i*7}")
            for i in range(40)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    capped = MinHashLSH(n=3, threshold=0.3).pairs(docs)
    uncapped = MinHashLSH(n=3, threshold=0.3, max_bucket_size=None).pairs(docs)
    assert sorted(map(tuple, capped.collect())) == sorted(
        map(tuple, uncapped.collect())
    )


def test_simhash_hot_block_capped(spark):
    docs = _hot_docs(spark)
    capped = SimHashDedup(max_hamming=3, max_block_size=8).pairs(docs)
    hot = capped.filter((F.col("src") < N_HOT) & (F.col("dst") < N_HOT))
    n = hot.count()
    assert 0 < n < 2500
    uncapped = SimHashDedup(max_hamming=3, max_block_size=None).pairs(docs)
    assert (
        uncapped.filter(
            (F.col("src") < N_HOT) & (F.col("dst") < N_HOT)
        ).count()
        == N_HOT * (N_HOT - 1) // 2
    )


def test_cap_buckets_deterministic_and_partition_invariant(spark):
    rows = [(i, i % 3, 7) for i in range(300)]
    df1 = spark.createDataFrame(rows, ["id", "k1", "k2"]).repartition(2)
    df2 = spark.createDataFrame(rows, ["id", "k1", "k2"]).repartition(17)
    kept1 = sorted(
        map(tuple, cap_buckets(df1, ("k1", "k2"), "id", 10).collect())
    )
    kept2 = sorted(
        map(tuple, cap_buckets(df2, ("k1", "k2"), "id", 10).collect())
    )
    assert kept1 == kept2
    # every bucket thinned to roughly the cap (binomial around 10 of 100)
    from collections import Counter

    per_bucket = Counter(k for _, k, _ in kept1)
    assert all(2 <= c <= 25 for c in per_bucket.values())


def test_cap_validation():
    with pytest.raises(ValueError):
        MinHashLSH(max_bucket_size=1)
    with pytest.raises(ValueError):
        SimHashDedup(max_block_size=0)


def test_ann_lsh_corpus_bucket_cap(spark):
    # opt-in hot-bucket cap on the ANN forest's corpus side: a degenerate
    # corpus (many identical vectors) floods one (table, bucket) key; the
    # cap bounds the candidate stage while real neighbors keep ranking
    from pyspark_graph_spark.ann import RandomHyperplaneLSH

    dim = 8
    hot = [(i, [1.0] * dim) for i in range(300)]
    distinct = [(1000 + i, [float(j == i) for j in range(dim)]) for i in range(dim)]
    corpus = spark.createDataFrame(hot + distinct, ["vec_id", "embedding"])
    queries = spark.createDataFrame(
        [(9000, [1.0] * dim)], ["vec_id", "embedding"]
    )
    capped = RandomHyperplaneLSH(
        dim=dim, num_tables=4, planes_per_table=4, k=5, max_bucket_size=8
    )
    out = capped.topk(corpus, queries).collect()
    # top-k still returns k hot-cluster neighbors at cosine 1.0
    assert len(out) == 5
    assert all(abs(r["cosine_sim"] - 1.0) < 1e-6 for r in out)
    # default (cap off) is unchanged behavior
    base = RandomHyperplaneLSH(dim=dim, num_tables=4, planes_per_table=4, k=5)
    assert base.max_bucket_size is None
    assert len(base.topk(corpus, queries).collect()) == 5


def test_multilevel_two_hop_auto(spark):
    # "auto" (new default) runs the 2-hop augmentation only on hub-starved
    # levels: a star forest still coarsens (two_hop fires), and the knob
    # rejects junk values
    from pyspark_graph_spark.graph import DST, ID, SRC, Graph
    from pyspark_graph_spark.operators.partition import MultilevelPartition

    v = spark.createDataFrame([(i,) for i in range(300)], [ID])
    edges = (
        [(0, i) for i in range(3, 100)]
        + [(1, i) for i in range(100, 200)]
        + [(2, i) for i in range(200, 300)]
        + [(0, 1), (1, 2)]
    )
    g = Graph(v, spark.createDataFrame(edges, [SRC, DST]),
              directed=False, indexed=True)
    out = MultilevelPartition(k=4, max_coarse=16, max_levels=12).run(g)
    assert out.count() == 300  # auto == True behavior on the starved graph

    import pytest as _pytest

    with _pytest.raises(ValueError):
        MultilevelPartition(two_hop="sometimes")


def test_cap_buckets_matches_python_replay(spark):
    # value-level contract behind the docstring's "reproducible by any
    # engine with the same hash": keep iff pmod(xxhash64(id, k1, k2), n)
    # < cap — replayed here row-by-row in Python from Spark's own hash
    from pyspark.sql import functions as F

    rows = [(i, i % 4, 9) for i in range(400)]
    df = spark.createDataFrame(rows, ["id", "k1", "k2"])
    hashed = df.withColumn("__h", F.xxhash64("id", "k1", "k2")).collect()
    from collections import Counter

    sizes = Counter((r["k1"], r["k2"]) for r in hashed)
    cap = 13
    expected = sorted(
        (r["id"], r["k1"], r["k2"])
        for r in hashed
        if sizes[(r["k1"], r["k2"])] <= cap
        or r["__h"] % sizes[(r["k1"], r["k2"])] < cap
    )
    got = sorted(
        map(tuple, cap_buckets(df, ("k1", "k2"), "id", cap).collect())
    )
    assert got == expected
