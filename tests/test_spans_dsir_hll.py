"""Duplicate-span detection, DSIR importance weights, HyperLogLog."""

import hashlib

from pyspark.sql import functions as F

from pyspark_graph_spark.dedup.spans import duplicate_spans
from pyspark_graph_spark.functions.dsir import dsir_weights
from pyspark_graph_spark.functions.sketch import hll_estimate


def _docs(spark, texts, langs=None):
    langs = langs or ["en"] * len(texts)
    return spark.createDataFrame(
        [(i, t, l) for i, (t, l) in enumerate(zip(texts, langs))],
        ["doc_id", "text", "lang"],
    )


SHARED = "alpha beta gamma delta epsilon zeta eta theta"  # exactly 8 tokens


def test_dup_spans_planted_passage(spark):
    # docs 0 and 1 share an 8-token passage; doc 2 is disjoint
    docs = _docs(
        spark,
        [
            SHARED + " unique0 tail0 end0",
            "head1 start1 " + SHARED,
            "totally different words that repeat nothing at all here",
        ],
    )
    got = {r["doc_id"]: r for r in duplicate_spans(docs, n=8).collect()}
    assert got[0]["dup_tokens"] == 8 and got[0]["n_tokens"] == 11
    assert got[1]["dup_tokens"] == 8 and got[1]["n_tokens"] == 10
    assert got[2]["dup_tokens"] == 0 and got[2]["dup_ratio"] == 0.0
    # clean fingerprint of doc 0 = md5 of the non-shared tail
    assert (
        got[0]["clean_fingerprint"]
        == hashlib.md5(b"unique0 tail0 end0").hexdigest()
    )
    # untouched doc keeps its full (lowercased) text fingerprint
    assert (
        got[2]["clean_fingerprint"]
        == hashlib.md5(
            b"totally different words that repeat nothing at all here"
        ).hexdigest()
    )


def test_dup_spans_identical_docs_fully_covered(spark):
    text = "one two three four five six seven eight nine ten"
    docs = _docs(spark, [text, text])
    for r in duplicate_spans(docs, n=8).collect():
        assert r["dup_tokens"] == r["n_tokens"] == 10
        assert r["dup_ratio"] == 1.0
        assert r["clean_fingerprint"] == hashlib.md5(b"").hexdigest()


def test_dup_spans_short_docs_have_no_windows(spark):
    docs = _docs(spark, ["a b c", "a b c"])  # < n tokens, even if identical
    for r in duplicate_spans(docs, n=8).collect():
        assert r["dup_tokens"] == 0 and r["n_tokens"] == 3


def test_dup_spans_min_docs_threshold(spark):
    text = "one two three four five six seven eight"
    docs = _docs(spark, [text, text, "other words " + text])
    out = duplicate_spans(docs, n=8, min_docs=4).collect()
    assert all(r["dup_tokens"] == 0 for r in out)


def test_dsir_prefers_target_like_docs(spark):
    target_text = "spark shuffle partition broadcast join agg"
    docs = _docs(
        spark,
        [target_text, target_text, "spark shuffle partition broadcast",
         "cat dog bird fish lizard"],
        langs=["en", "en", "de", "de"],
    )
    got = {
        r["doc_id"]: r["dsir_weight"]
        for r in dsir_weights(docs, target=F.col("lang") == "en").collect()
    }
    # target docs score highest, shared-vocabulary doc 2 beats disjoint
    # doc 3 (absolute sign depends on smoothing mass at toy scale)
    assert got[0] > got[2] > got[3]


def test_dsir_counts_tokens(spark):
    docs = _docs(spark, ["a b c d", "x"], langs=["en", "de"])
    got = {r["doc_id"]: r["n_tokens"] for r in dsir_weights(
        docs, target=F.col("lang") == "en").collect()}
    assert got == {0: 4, 1: 1}


def test_hll_accuracy_large(spark):
    n = 5000
    df = spark.range(n).select(F.col("id").alias("key"))
    est = hll_estimate(df, "key", b=6).first()["estimate"]
    # m=64 → standard error ~13%; allow 3 sigma
    assert abs(est - n) / n < 0.40
    # deterministic
    est2 = hll_estimate(df, "key", b=6).first()["estimate"]
    assert est == est2


def test_hll_small_range_linear_counting(spark):
    n = 30
    df = spark.range(n).select(F.col("id").alias("key"))
    row = hll_estimate(df, "key", b=6).first()
    assert row["nonzero_registers"] <= n
    assert abs(row["estimate"] - n) / n < 0.25


def test_hll_duplicates_do_not_inflate(spark):
    df = spark.range(1000).select((F.col("id") % 50).alias("key"))
    row = hll_estimate(df, "key", b=6).first()
    assert abs(row["estimate"] - 50) / 50 < 0.30
