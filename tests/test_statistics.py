"""Statistical gate queries vs hand-computed oracles on toy data
(the DuckDB gate checks them on the full tables; these pin the math)."""

import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


def test_kaplan_meier_product_limit(spark):
    from pyspark_graph_spark.functions.stats import kaplan_meier

    # subjects (duration, event): censored rows at t=2 and t=4
    rows = [(1, 1), (2, 0), (3, 1), (4, 0), (5, 1)]
    df = spark.createDataFrame(rows, ["t", "event"])
    out = {
        r["t"]: (r["n_risk"], r["s"])
        for r in kaplan_meier(df).collect()
    }
    assert out[1] == (5, pytest.approx(4 / 5))
    assert out[3] == (3, pytest.approx(4 / 5 * 2 / 3, abs=1e-6))
    # total mortality in the last bucket -> S exactly 0 (Spark log(0)
    # is NULL, the guard must force the zero)
    assert out[5] == (1, 0.0)


def test_kaplan_meier_no_censoring_matches_empirical(spark):
    from pyspark_graph_spark.functions.stats import kaplan_meier

    # without censoring K-M is the empirical survival function
    rows = [(t, 1) for t in [1, 1, 2, 3]]
    df = spark.createDataFrame(rows, ["t", "event"])
    out = {r["t"]: r["s"] for r in kaplan_meier(df).collect()}
    assert out[1] == pytest.approx(2 / 4, abs=1e-6)
    assert out[2] == pytest.approx(1 / 4, abs=1e-6)
    assert out[3] == 0.0


def test_welch_z_formula(spark):
    a = [10.0, 12.0, 14.0]
    b = [11.0, 13.0]
    rows = [("x", "A", v) for v in a] + [("x", "B", v) for v in b]
    df = spark.createDataFrame(rows, ["k", "grp", "value"])
    s = df.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("value").alias("m"),
        F.var_pop("value").alias("v"),
    )
    got = (
        s.filter(F.col("grp") == "A")
        .crossJoin(
            s.filter(F.col("grp") == "B").select(
                F.col("n").alias("n2"),
                F.col("m").alias("m2"),
                F.col("v").alias("v2"),
            )
        )
        .select(
            (
                (F.col("m") - F.col("m2"))
                / F.sqrt(F.col("v") / F.col("n") + F.col("v2") / F.col("n2"))
            ).alias("z")
        )
        .first()["z"]
    )
    ma, mb = sum(a) / 3, sum(b) / 2
    va = sum((x - ma) ** 2 for x in a) / 3
    vb = sum((x - mb) ** 2 for x in b) / 2
    want = (ma - mb) / math.sqrt(va / 3 + vb / 2)
    assert got == pytest.approx(want)


def test_chi2_uniform_is_zero(spark):
    # perfectly uniform observations -> chi2 == 0
    rows = [("t", d, 10) for d in range(7)]
    df = spark.createDataFrame(rows, ["event_type", "dow", "o"])
    t = df.groupBy("event_type").agg(F.sum("o").alias("n"))
    e = F.col("n") / 7.0
    chi2 = (
        df.join(t, "event_type")
        .agg(F.sum((F.col("o") - e) * (F.col("o") - e) / e).alias("c"))
        .first()["c"]
    )
    assert chi2 == pytest.approx(0.0, abs=1e-12)
