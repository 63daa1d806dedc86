"""Decontamination, repetition metrics, and PII redaction: planted-example
semantics the synthetic corpus can't exercise (real emails/phones/IPs,
exact-overlap contamination, heavy repetition)."""

import pytest
from pyspark.sql import functions as F

from pyspark_graph_spark.functions.decontam import (
    benchmark_overlap,
    contaminated_docs,
)
from pyspark_graph_spark.functions.text import (
    dup_ngram_fraction,
    pii_counts,
    redact_pii,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over a sleeping cat"),  # partial leak
        (2, "completely unrelated text about spark and parquet files"),
        (3, "the quick brown fox jumps over the lazy dog"),  # verbatim leak
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture(scope="module")
def bench(spark):
    return spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        ["bench_id", "text"],
    )


def test_benchmark_overlap_fractions(docs, bench):
    got = {
        r.doc_id: r.overlap_frac
        for r in benchmark_overlap(docs, bench, n=3).collect()
    }
    # 7 benchmark 3-grams; doc 3 matches all, doc 1 shares the 4-token
    # prefix run = 2 full 3-grams... compute: tokens 0-8, grams at pos
    # 0..6; doc1 shares grams starting at 0,1,2,3 ("jumps over a" differs
    # from "jumps over the" at pos 4) -> 4/7
    assert got[3] == 1.0
    assert got[1] == pytest.approx(4 / 7, abs=1e-6)
    assert 2 not in got  # no shared grams -> not emitted


def test_contaminated_docs_threshold(docs, bench):
    flagged = {
        r.doc_id for r in contaminated_docs(docs, bench, min_frac=0.5).collect()
    }
    assert flagged == {0, 1, 3}  # doc1 at 4/7 ≈ 0.57 >= 0.5
    flagged_strict = {
        r.doc_id
        for r in contaminated_docs(docs, bench, min_frac=0.99).collect()
    }
    assert flagged_strict == {0, 3}


def test_benchmark_side_is_broadcast(docs, bench):
    plan = (
        benchmark_overlap(docs, bench)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan  # never a shuffle join at this shape


def test_dup_ngram_fraction(spark):
    rows = [
        (0, "spam spam spam spam spam"),  # 4 bigrams, 1 distinct -> 0.75
        (1, "all tokens here are different"),  # no repeats -> 0.0
        (2, "one"),  # shorter than n -> 0.0
        (3, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: r.f
        for r in df.select(
            "doc_id", dup_ngram_fraction(F.col("text"), 2).alias("f")
        ).collect()
    }
    assert got[0] == pytest.approx(0.75)
    assert got[1] == 0.0
    assert got[2] == 0.0
    assert got[3] == 0.0


def test_pii_counts_and_redaction(spark):
    text = (
        "mail alice@example.com or bob.smith@corp.co.uk, "
        "call 555-123-4567 or 555 987 6543, server at 10.0.0.1"
    )
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    e, p, i = pii_counts(F.col("text"))
    row = df.select(
        e.alias("e"), p.alias("p"), i.alias("i"),
        redact_pii(F.col("text")).alias("red"),
    ).collect()[0]
    assert (row.e, row.p, row.i) == (2, 2, 1)
    assert row.red == (
        "mail <EMAIL> or <EMAIL>, call <PHONE> or <PHONE>, server at <IP>"
    )


def test_redaction_leaves_clean_text_alone(spark):
    df = spark.createDataFrame([(0, "nothing sensitive here 42")], ["d", "text"])
    row = df.select(redact_pii(F.col("text")).alias("red")).collect()[0]
    assert row.red == "nothing sensitive here 42"
