"""Exact integer arithmetic for closed-form counts (r10 verdict #1 /
ADVICE #1): every helper must agree with Python's arbitrary-precision
integers PAST the two silent ceilings the old expressions had — 2^53
(double mantissa) and 2^63 (long wrap)."""

import math
from decimal import Decimal

from pyspark.sql import functions as F

from pyspark_graph_spark.functions.exact_math import (
    choose2_dec,
    choose2_parity,
    choose3_dec,
    floor_half_choose2_dec,
    half_sum_choose2_dec,
)

# c values straddling both ceilings: tiny edge cases, past-2^53 C(c,2)
# (c ~ 2e8 gives C ~ 2e16 > 9.0e15), and past-int64 C(c,2)
# (c ~ 6e9 gives C ~ 1.8e19 > 9.2e18)
CS = [0, 1, 2, 3, 4, 5, 6, 7, 100, 2**27 + 3, 200_000_001, 6_000_000_003]


def _df(spark, vals):
    return spark.createDataFrame([(int(v),) for v in vals], "c: long")


def test_choose2_exact_past_ceilings(spark):
    rows = (
        _df(spark, CS)
        .select("c", choose2_dec(F.col("c")).alias("q"))
        .collect()
    )
    for r in rows:
        assert int(r["q"]) == math.comb(r["c"], 2), r


def test_floor_half_and_parity_exact(spark):
    rows = (
        _df(spark, CS)
        .select(
            "c",
            floor_half_choose2_dec(F.col("c")).alias("h"),
            choose2_parity(F.col("c")).alias("p"),
        )
        .collect()
    )
    for r in rows:
        q = math.comb(r["c"], 2)
        assert int(r["h"]) == q // 2, r
        assert int(r["p"]) == q % 2, r


def test_half_sum_choose2_even_total_past_double_ceiling(spark):
    # a multiset whose Σ C(c,2) is even and exceeds 2^53: the old
    # double-division expression loses integers here, silently
    vals = [6_000_000_003, 6_000_000_003, 3, 3, 7, 7]
    total = sum(math.comb(v, 2) for v in vals)
    assert total % 2 == 0 and total > 2**63  # past the LONG ceiling too
    got = (
        _df(spark, vals)
        .agg(half_sum_choose2_dec(F.col("c")).alias("h"))
        .collect()[0]["h"]
    )
    assert int(got) == total // 2


def test_half_sum_choose2_long_fast_path_bit_identical(spark):
    """total_bound fast path (round 12): identical integers on int64 —
    pinned against both Python bigints and the decimal wide path, over
    c values past 2^26 (per-row products past 2^53, where a double
    carrier would already be lossy) and across every c mod 4 branch."""
    from pyspark_graph_spark.functions.exact_math import (
        _LONG_EXACT_TOTAL,
        floor_half_choose2_long,
    )

    vals = [0, 1, 2, 3, 4, 5, 6, 7, 100, 101, 102, 103,
            2**26 + 1, 2**26 + 2, 2**26 + 3, 134_217_731]
    vals = vals + vals  # doubled multiset -> Σ C(c,2) provably even
    assert sum(vals) <= _LONG_EXACT_TOTAL  # the fast path's precondition
    total = sum(math.comb(v, 2) for v in vals)
    assert total % 2 == 0
    df = _df(spark, vals)
    fast = df.agg(
        half_sum_choose2_dec(F.col("c"), total_bound=sum(vals)).alias("h")
    )
    # same output type as the wide path (callers cast/compose identically)
    assert fast.schema["h"].dataType.simpleString() == "decimal(38,0)"
    got_fast = fast.collect()[0]["h"]
    got_wide = df.agg(
        half_sum_choose2_dec(F.col("c")).alias("h")
    ).collect()[0]["h"]
    assert int(got_fast) == total // 2
    assert got_fast == got_wide
    # per-row long floors agree with the decimal floors everywhere
    rows = df.select(
        "c",
        floor_half_choose2_long(F.col("c")).alias("l"),
        floor_half_choose2_dec(F.col("c")).alias("d"),
    ).collect()
    for r in rows:
        assert int(r["l"]) == int(r["d"]) == math.comb(r["c"], 2) // 2, r


def test_half_sum_choose2_wide_bound_falls_back_to_decimal(spark):
    # a bound past _LONG_EXACT_TOTAL must select the decimal path (the
    # past-int64 multiset would overflow the long carrier loudly)
    vals = [6_000_000_003, 6_000_000_003, 3, 3, 7, 7]
    total = sum(math.comb(v, 2) for v in vals)
    got = (
        _df(spark, vals)
        .agg(
            half_sum_choose2_dec(
                F.col("c"), total_bound=20_000_000_000
            ).alias("h")
        )
        .collect()[0]["h"]
    )
    assert int(got) == total // 2


def test_half_sum_choose2_empty_input(spark):
    got = (
        _df(spark, [])
        .agg(half_sum_choose2_dec(F.col("c")).alias("h"))
        .collect()[0]["h"]
    )
    assert int(got) == 0


def test_choose3_exact_past_int64(spark):
    # n = 4.2e6 is the triads past-int64 pin; n = 3e12 exceeds the old
    # DECIMAL(38,6) one-shot-division ceiling (~8e10, ADVICE #1)
    ns = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 4_200_000, 3_000_000_000_000]
    rows = (
        _df(spark, ns)
        .select("c", choose3_dec(F.col("c")).alias("q"))
        .collect()
    )
    for r in rows:
        assert int(r["q"]) == math.comb(r["c"], 3), r


def test_choose3_matches_decimal_type(spark):
    df = _df(spark, [10]).select(choose3_dec(F.col("c")).alias("q"))
    assert df.schema["q"].dataType.simpleString() == "decimal(38,0)"
    assert df.collect()[0]["q"] == Decimal(120)
