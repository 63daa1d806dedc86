"""Unigram LM scoring, KMV sketch, and quota sampling."""

import math

import pytest
from pyspark.sql import functions as F

from pyspark_graph_spark.functions.lm import unigram_scores
from pyspark_graph_spark.functions.sampling import quota_sample
from pyspark_graph_spark.functions.sketch import kmv_distinct


# ------------------------------------------------------------------ unigram


def test_unigram_scores_match_python(spark):
    docs = [
        (1, "a a b"),
        (2, "a c"),
        (3, "zz zz zz"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r.doc_id: (r.n_tokens, r.neg_log2_p) for r in unigram_scores(df).collect()}

    counts = {"a": 3, "b": 1, "c": 1, "zz": 3}
    total, vocab = 8, 4

    def p(t):
        return (counts[t] + 1) / (total + vocab)

    for doc_id, text in docs:
        toks = text.split()
        expect = -sum(math.log2(p(t)) for t in toks) / len(toks)
        n, score = got[doc_id]
        assert n == len(toks)
        assert score == pytest.approx(round(expect, 6), abs=1e-6)


def test_unigram_rare_tokens_score_worse(spark):
    rows = [(i, "common words repeated here") for i in range(20)]
    rows.append((99, "xqzt vrwp unseen gibberish"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r.neg_log2_p for r in unigram_scores(df).collect()}
    assert got[99] > got[0]


def test_unigram_empty_docs_omitted(spark):
    df = spark.createDataFrame([(1, "hello world"), (2, "   ")], ["doc_id", "text"])
    assert {r.doc_id for r in unigram_scores(df).collect()} == {1}


# -------------------------------------------------------------------- kmv


def test_kmv_exact_below_capacity(spark):
    df = spark.createDataFrame(
        [("s", f"v{i}") for i in range(10)], ["grp", "val"]
    )
    row = kmv_distinct(df, "grp", "val", k=64).first()
    assert row.n_kept == 10
    assert row.estimate == 10.0


def test_kmv_estimate_accuracy_above_capacity(spark):
    n = 5000
    df = spark.createDataFrame(
        [("s", f"value-{i}") for i in range(n)], ["grp", "val"]
    )
    row = kmv_distinct(df, "grp", "val", k=256).first()
    assert row.n_kept == 256
    # KMV relative error ~ 1/sqrt(k) ≈ 6%; allow 3 sigma
    assert abs(row.estimate - n) / n < 0.2


def test_kmv_duplicates_do_not_inflate(spark):
    df = spark.createDataFrame(
        [("s", f"v{i % 10}") for i in range(1000)], ["grp", "val"]
    )
    row = kmv_distinct(df, "grp", "val", k=64).first()
    assert row.n_kept == 10 and row.estimate == 10.0


def test_kmv_merge_equals_union_sketch(spark):
    """k smallest of (A ∪ B) == k smallest of (k-smallest(A) ∪ k-smallest(B))."""
    a = [("x", f"a{i}") for i in range(500)]
    b = [("x", f"b{i}") for i in range(500)]
    k = 64
    union = kmv_distinct(
        spark.createDataFrame(a + b, ["grp", "val"]), "grp", "val", k=k
    ).first()
    # merge: take each side's k-minimum hashes, union, re-take k minimum
    from pyspark_graph_spark.functions.hashing import md5_hash60

    def k_min(rows):
        df = spark.createDataFrame(rows, ["grp", "val"]).select(
            md5_hash60(F.col("val")).alias("h")
        ).distinct()
        return [r.h for r in df.orderBy("h").limit(k).collect()]

    merged = sorted(set(k_min(a)) | set(k_min(b)))[:k]
    assert merged[-1] == union.kth_hash


def test_kmv_invalid_k(spark):
    df = spark.createDataFrame([("s", "v")], ["grp", "val"])
    with pytest.raises(ValueError):
        kmv_distinct(df, "grp", "val", k=1)


# ------------------------------------------------------------------- quota


def test_quota_caps_each_group(spark):
    rows = [(f"d{i}", "big") for i in range(50)] + [
        (f"e{i}", "small") for i in range(3)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = quota_sample(df, "source", "doc_id", quota=10)
    counts = {r.source: r["count"] for r in out.groupBy("source").count().collect()}
    assert counts == {"big": 10, "small": 3}


def test_quota_deterministic_and_partition_invariant(spark):
    rows = [(f"d{i}", "s") for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    a = sorted(r.doc_id for r in quota_sample(df, "source", "doc_id", 7).collect())
    b = sorted(
        r.doc_id
        for r in quota_sample(df.repartition(17), "source", "doc_id", 7).collect()
    )
    assert a == b and len(a) == 7


def test_quota_salt_redraws(spark):
    rows = [(f"d{i}", "s") for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    draws = {
        tuple(sorted(r.doc_id for r in quota_sample(df, "source", "doc_id", 7, salt=s).collect()))
        for s in ("", "x", "y")
    }
    assert len(draws) > 1


def test_quota_invalid(spark):
    df = spark.createDataFrame([("d", "s")], ["doc_id", "source"])
    with pytest.raises(ValueError):
        quota_sample(df, "source", "doc_id", 0)


# ------------------------------------------------------------------ cms


def test_cms_never_underestimates_and_is_tight_when_wide(spark):
    from pyspark_graph_spark.functions.sketch import cms_estimate, cms_sketch

    rows = [("a",)] * 100 + [("b",)] * 10 + [(f"noise{i}",) for i in range(50)]
    df = spark.createDataFrame(rows, ["v"])
    sk = cms_sketch(df, "v", width=512, depth=4)
    items = spark.createDataFrame([("a",), ("b",), ("absent",)], ["item"])
    est = {
        r.item: r.estimate
        for r in cms_estimate(sk, items, "item", width=512, depth=4).collect()
    }
    assert est["a"] >= 100 and est["b"] >= 10
    # wide sketch, tiny corpus -> estimates should be exact here
    assert est["a"] == 100 and est["b"] == 10
    assert est["absent"] == 0


def test_cms_merges_cellwise(spark):
    from pyspark_graph_spark.functions.sketch import cms_sketch

    a = spark.createDataFrame([("x",)] * 5 + [("y",)] * 3, ["v"])
    b = spark.createDataFrame([("x",)] * 2 + [("z",)] * 4, ["v"])
    both = a.unionByName(b)
    merged = {
        (r.row, r.bucket): r.cnt
        for r in cms_sketch(both, "v", width=64, depth=3).collect()
    }
    from collections import Counter

    summed = Counter()
    for part in (a, b):
        for r in cms_sketch(part, "v", width=64, depth=3).collect():
            summed[(r.row, r.bucket)] += r.cnt
    assert merged == dict(summed)


def test_cms_invalid_params(spark):
    import pytest as _pytest

    from pyspark_graph_spark.functions.sketch import cms_sketch

    df = spark.createDataFrame([("v",)], ["v"])
    with _pytest.raises(ValueError):
        cms_sketch(df, "v", width=1)
    with _pytest.raises(ValueError):
        cms_sketch(df, "v", depth=0)


# ------------------------------------------------------ histogram quantiles


def test_histogram_quantiles_accuracy(spark):
    from pyspark_graph_spark.functions.sketch import histogram_quantiles

    df = spark.range(10000).select((F.col("id") / 1.0).alias("v"))
    out = {
        r.q: r.estimate
        for r in histogram_quantiles(df, "v", [0.5, 0.9], bins=1000).collect()
    }
    # uniform 0..9999: p50 ~ 5000, p90 ~ 9000; bin width 10 bounds error
    assert abs(out[0.5] - 5000) < 20
    assert abs(out[0.9] - 9000) < 20


def test_histogram_quantiles_partition_invariant(spark):
    from pyspark_graph_spark.functions.sketch import histogram_quantiles

    df = spark.range(5000).select((F.col("id") % 137 * 1.0).alias("v"))
    a = sorted(tuple(r) for r in histogram_quantiles(df, "v", [0.25, 0.75]).collect())
    b = sorted(
        tuple(r)
        for r in histogram_quantiles(df.repartition(13), "v", [0.25, 0.75]).collect()
    )
    assert a == b


def test_histogram_quantiles_validation(spark):
    from pyspark_graph_spark.functions.sketch import histogram_quantiles

    df = spark.range(10).select(F.col("id").cast("double").alias("v"))
    with pytest.raises(ValueError):
        histogram_quantiles(df, "v", [1.5])
    with pytest.raises(ValueError):
        histogram_quantiles(df, "v", [0.5], bins=0)


def test_histogram_quantiles_constant_column(spark):
    """hi == lo degenerate case returns the constant itself, not NULL/inf
    (ADVICE r2: Spark NULL-division vs DuckDB inf-cast divergence)."""
    from pyspark_graph_spark.functions.sketch import histogram_quantiles

    df = spark.range(100).selectExpr("CAST(42.5 AS DOUBLE) AS v")
    rows = histogram_quantiles(df, "v", [0.0, 0.5, 1.0], bins=64).collect()
    assert len(rows) == 3
    for r in rows:
        assert r.estimate == 42.5
