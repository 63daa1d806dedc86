"""Mixture planning, skew diagnostics, BPE application (functions/)."""

import pytest
from pyspark.sql import functions as F

from pyspark_graph_spark.functions.bpe import apply_bpe
from pyspark_graph_spark.functions.mixture import mixture_plan, skew_report


def test_mixture_plan_rates_and_caps(spark):
    inv = spark.createDataFrame(
        [("web", 1000), ("code", 100), ("books", 50)], ["group", "tokens"]
    )
    out = {
        r.group: r
        for r in mixture_plan(
            inv, {"web": 0.5, "code": 0.3, "books": 0.2}, budget=400.0
        ).collect()
    }
    # web: target 200 of 1000 -> rate 0.2
    assert out["web"].rate == pytest.approx(0.2)
    assert out["web"].achievable == 200.0
    # code: target 120 > 100 available -> capped at keep-all
    assert out["code"].rate == 1.0
    assert out["code"].achievable == 100.0
    # books: target 80 > 50 -> capped
    assert out["books"].rate == 1.0 and out["books"].achievable == 50.0


def test_mixture_plan_unlisted_group_zero(spark):
    inv = spark.createDataFrame([("spam", 999)], ["group", "tokens"])
    r = mixture_plan(inv, {"web": 1.0}, budget=100.0).first()
    assert r.weight == 0.0 and r.rate == 0.0 and r.achievable == 0.0


def test_mixture_plan_invalid_budget(spark):
    inv = spark.createDataFrame([("a", 1)], ["group", "tokens"])
    with pytest.raises(ValueError):
        mixture_plan(inv, {}, budget=0)


def test_skew_report_orders_and_shares(spark):
    rows = [("hot",)] * 70 + [("warm",)] * 20 + [("cold",)] * 10
    df = spark.createDataFrame(rows, ["k"])
    out = skew_report(df, "k", top=2).collect()
    assert [(r.rank, r.key) for r in out] == [(1, "hot"), (2, "warm")]
    assert out[0].share == pytest.approx(0.7)
    assert out[1].share == pytest.approx(0.2)


def test_skew_report_tie_breaks_on_key(spark):
    df = spark.createDataFrame([("b",), ("a",)], ["k"])
    out = skew_report(df, "k", top=2).collect()
    assert [(r.rank, r.key) for r in out] == [(1, "a"), (2, "b")]


def test_apply_bpe_counts(spark):
    docs = spark.createDataFrame([(1, "low lowest")], ["doc_id", "text"])
    # merges: l+o, lo+w -> "low" becomes one token; "lowest" -> low,e,s,t
    out = apply_bpe(docs, [("l", "o"), ("lo", "w")]).first()
    assert out.n_words == 2
    assert out.n_subwords == 1 + 4


def test_apply_bpe_no_merges_counts_chars(spark):
    docs = spark.createDataFrame([(7, "ab cde")], ["doc_id", "text"])
    out = apply_bpe(docs, []).first()
    assert out.n_words == 2 and out.n_subwords == 5


def test_mixture_plan_missing_group_visible(spark):
    """A group listed in weights but absent from inventory appears in the
    plan with tokens 0 / rate 1.0 / achievable 0 (ADVICE r2)."""
    inv = spark.createDataFrame([("web", 1000)], ["group", "tokens"])
    out = {
        r.group: r
        for r in mixture_plan(
            inv, {"web": 0.5, "rare": 0.5}, budget=100.0
        ).collect()
    }
    assert set(out) == {"web", "rare"}
    r = out["rare"]
    assert r.tokens == 0 and r.weight == 0.5
    assert r.target == 50.0 and r.rate == 1.0 and r.achievable == 0.0


def test_mixture_plan_zero_token_group_rate(spark):
    inv = spark.createDataFrame([("empty", 0)], ["group", "tokens"])
    r = mixture_plan(inv, {"empty": 1.0}, budget=10.0).first()
    assert r.rate == 1.0 and r.achievable == 0.0
