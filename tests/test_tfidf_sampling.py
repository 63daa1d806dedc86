"""TF-IDF / BM25 and deterministic sampling: semantics vs independent
Python oracles, determinism, and scale-shape invariants."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from pyspark_graph_spark.functions.sampling import (
    deterministic_sample,
    stratified_sample,
)
from pyspark_graph_spark.functions.tfidf import (
    bm25_scores,
    bm25_topk,
    term_frequencies,
    tfidf,
    tfidf_topk,
)

DOCS = [
    (0, "the cat sat on the mat", "en"),
    (1, "the dog sat on the log", "en"),
    (2, "cat dog cat dog cat", "en"),
    (3, "quantum flux capacitor", "en"),
    (4, "the the the the", "en"),
    (5, "", "en"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text", "lang"])


def _py_tf(rows):
    tf = {}
    for doc_id, text, _ in rows:
        for term, c in Counter(text.lower().split()).items():
            tf[(doc_id, term)] = c
    return tf


def test_term_frequencies_match_python(docs):
    got = {
        (r.doc_id, r.term): r.tf
        for r in term_frequencies(docs).collect()
    }
    assert got == _py_tf(DOCS)


def test_tfidf_values_match_python(docs):
    tf = _py_tf(DOCS)
    dfreq = Counter(term for _, term in tf)
    n = len(DOCS)
    got = {(r.doc_id, r.term): r.score for r in tfidf(docs).collect()}
    assert set(got) == set(tf)
    for (doc_id, term), c in tf.items():
        expect = c * (math.log((n + 1) / (dfreq[term] + 1)) + 1)
        assert got[(doc_id, term)] == pytest.approx(expect, rel=1e-12)


def test_tfidf_topk_rank_and_ties(docs):
    rows = tfidf_topk(docs, k=2).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    # doc 2: cat (tf=3) beats dog (tf=2) — same df so score ordering = tf
    assert [r.term for r in per_doc[2]] == ["cat", "dog"]
    # empty doc contributes no terms at all
    assert 5 not in per_doc
    assert all(len(v) <= 2 for v in per_doc.values())


def test_bm25_ranks_rare_term_doc_first(docs):
    # 'quantum' appears only in doc 3: for the query ['quantum', 'the'],
    # the rare-term doc must outrank the stopword-heavy docs
    top = bm25_topk(docs, ["quantum", "the"], k=3).collect()
    assert top[0].doc_id == 3


def test_bm25_matches_python_oracle(docs):
    tf = _py_tf(DOCS)
    q = ["cat", "the"]
    dfreq = Counter(t for _, t in tf if t in q)
    n = len(DOCS)
    dls = {d: len(t.split()) for d, t, _ in DOCS}
    avgdl = sum(dls.values()) / n
    k1, b = 1.2, 0.75
    expect = {}
    for (doc_id, term), c in tf.items():
        if term not in q:
            continue
        idf = math.log(1 + (n - dfreq[term] + 0.5) / (dfreq[term] + 0.5))
        s = idf * c * (k1 + 1) / (c + k1 * (1 - b + b * dls[doc_id] / avgdl))
        expect[doc_id] = expect.get(doc_id, 0.0) + s
    got = {r.doc_id: r.score for r in bm25_scores(docs, q).collect()}
    assert set(got) == set(expect)
    for d in expect:
        assert got[d] == pytest.approx(expect[d], rel=1e-12)


def test_deterministic_sample_stable_and_partition_invariant(spark):
    df = spark.range(2000).withColumnRenamed("id", "k")
    a = {r.k for r in deterministic_sample(df, 0.3, "k").collect()}
    b = {
        r.k
        for r in deterministic_sample(df.repartition(13), 0.3, "k").collect()
    }
    assert a == b  # partitioning must not change the selected set
    assert 0.25 < len(a) / 2000 < 0.35  # uniform hash → rate is honored


def test_deterministic_sample_consistent_across_tables(spark):
    # coordinated cuts: sampling two tables on the same key keeps the
    # same key set in both
    t1 = spark.range(500).withColumnRenamed("id", "k")
    t2 = t1.withColumn("other", F.col("k") * 2)
    s1 = {r.k for r in deterministic_sample(t1, 0.4, "k").collect()}
    s2 = {r.k for r in deterministic_sample(t2, 0.4, "k").collect()}
    assert s1 == s2


def test_salt_decorrelates_samples(spark):
    df = spark.range(2000).withColumnRenamed("id", "k")
    a = {r.k for r in deterministic_sample(df, 0.5, "k", salt="a").collect()}
    b = {r.k for r in deterministic_sample(df, 0.5, "k", salt="b").collect()}
    overlap = len(a & b) / 2000
    assert 0.15 < overlap < 0.35  # ~rate² for independent decisions


def test_stratified_rates_and_default(spark):
    rows = [(i, "big" if i % 2 else "small") for i in range(4000)]
    df = spark.createDataFrame(rows, ["k", "stratum"])
    kept = stratified_sample(
        df, {"big": 0.1}, "stratum", "k", default_rate=1.0
    ).collect()
    by = Counter(r.stratum for r in kept)
    assert by["small"] == 2000  # default rate 1.0 keeps everything
    assert 120 < by["big"] < 280  # ~10% of 2000


def test_stratified_sample_no_shuffle(spark):
    df = spark.createDataFrame(
        [(i, "en") for i in range(10)], ["k", "stratum"]
    )
    plan = stratified_sample(
        df, {"en": 0.5}, "stratum", "k"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure map-side filter


# ------------------------------------------------------------ quantization


def test_quantize_int8_roundtrip_error_bounded(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from pyspark_graph_spark.functions.vectors import (
        dequantize_int8,
        quantize_int8,
    )

    rng = np.random.default_rng(7)
    vecs = [(i, [float(x) for x in rng.normal(size=16)]) for i in range(50)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    codes, scale = quantize_int8(F.col("embedding"))
    out = df.select(
        "vec_id",
        "embedding",
        codes.alias("codes"),
        scale.alias("scale"),
        dequantize_int8(codes.alias("codes"), scale).alias("recon"),
    ).collect()
    for r in out:
        assert all(-127 <= c <= 127 for c in r.codes)
        half = r.scale / 2 + 1e-12
        for x, y in zip(r.embedding, r.recon):
            assert abs(x - y) <= half


def test_quantize_int8_zero_vector(spark):
    from pyspark.sql import functions as F

    from pyspark_graph_spark.functions.vectors import quantize_int8

    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    codes, scale = quantize_int8(F.col("embedding"))
    r = df.select(codes.alias("c"), scale.alias("s")).first()
    assert r.c == [0, 0, 0] and r.s == 0.0


def test_quantize_int8_preserves_ann_ranking(spark):
    """Top-1 cosine neighbor is usually preserved under int8: check on a
    well-separated synthetic set (exactness not required in general, but
    this set is constructed to survive quantization)."""
    import numpy as np
    from pyspark.sql import functions as F

    from pyspark_graph_spark.functions.vectors import (
        cosine_similarity,
        dequantize_int8,
        quantize_int8,
    )

    base = np.eye(8)
    vecs = [(i, [float(x) for x in base[i % 8] + 0.01 * i]) for i in range(24)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    codes, scale = quantize_int8(F.col("embedding"))
    q = df.select("vec_id", dequantize_int8(codes, scale).alias("recon"),
                  "embedding")
    a = q.alias("a")
    b = q.alias("b")
    for col, name in (("embedding", "exact"), ("recon", "quant")):
        pairs = (
            a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
            .select(
                F.col("a.vec_id").alias("x"),
                F.col("b.vec_id").alias("y"),
                cosine_similarity(F.col(f"a.{col}"), F.col(f"b.{col}")).alias("sim"),
            )
        )
        top = (
            pairs.orderBy(F.desc("sim"), "x", "y").limit(1).first()
        )
        if name == "exact":
            exact_top = (top.x, top.y)
        else:
            assert (top.x, top.y) == exact_top
