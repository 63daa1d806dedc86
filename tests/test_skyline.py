"""Skyline2D: brute-force parity, direction flags, duplicates, empty."""

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark_graph_spark.operators.skyline import Skyline2D


def brute_skyline(points, minimize_x, minimize_y):
    """O(n²) reference: distinct pairs not dominated by any other pair."""
    from collections import Counter

    counts = Counter(points)
    pairs = list(counts)

    def better(a, b, minimize):  # a at-least-as-good-as b
        return a <= b if minimize else a >= b

    def strictly(a, b, minimize):
        return a < b if minimize else a > b

    out = []
    for s in pairs:
        dominated = any(
            better(o[0], s[0], minimize_x)
            and better(o[1], s[1], minimize_y)
            and (
                strictly(o[0], s[0], minimize_x)
                or strictly(o[1], s[1], minimize_y)
            )
            for o in pairs
            if o != s
        )
        if not dominated:
            out.append((s[0], s[1], counts[s]))
    return sorted(out)


def run_both(spark, points, minimize_x, minimize_y):
    df = spark.createDataFrame(points, ["x", "y"])
    got = sorted(
        (r.x, r.y, r.n_rows)
        for r in Skyline2D("x", "y", minimize_x, minimize_y).run(df).collect()
    )
    assert got == brute_skyline(points, minimize_x, minimize_y)


def test_skyline_matches_bruteforce_all_orientations(spark):
    rng = random.Random(7)
    points = [
        (rng.randrange(20), float(rng.randrange(30))) for _ in range(300)
    ]
    for mx in (True, False):
        for my in (True, False):
            run_both(spark, points, mx, my)


def test_skyline_counts_duplicates(spark):
    points = [(1, 5.0), (1, 5.0), (2, 3.0), (3, 3.0), (2, 9.0)]
    df = spark.createDataFrame(points, ["x", "y"])
    got = sorted(
        (r.x, r.y, r.n_rows)
        for r in Skyline2D("x", "y", True, True).run(df).collect()
    )
    # (1,5) kept twice-counted; (2,3) beats (3,3) and (2,9)
    assert got == [(1, 5.0, 2), (2, 3.0, 1)]


def test_skyline_single_point_and_empty(spark):
    df = spark.createDataFrame([(4, 2.0)], ["x", "y"])
    assert [
        (r.x, r.y, r.n_rows)
        for r in Skyline2D("x", "y", True, True).run(df).collect()
    ] == [(4, 2.0, 1)]
    empty = df.filter("x < 0")
    assert Skyline2D("x", "y", True, True).run(empty).count() == 0


def test_skyline_preserves_dtypes(spark):
    df = spark.createDataFrame([(4, 2.0), (1, 9.0)], ["x", "y"])
    out = Skyline2D("x", "y", False, True).run(df)
    dt = dict(out.dtypes)
    assert dt["x"] == "bigint" and dt["y"] == "double"


def test_skyline_exact_beyond_double_precision(spark):
    """64-bit keys past 2^53 must keep their exact ordering: a double
    cast would collapse 2**53 and 2**53 + 1 into a tie and could drop a
    true skyline point."""
    from pyspark_graph_spark.operators.skyline import Skyline2D

    big = 2**53
    rows = [(big, 10), (big + 1, 5), (big + 2, 5)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y)
        for r in Skyline2D("x", "y").run(df).collect()
    }
    # (big+1, 5) dominates (big+2, 5) via strictly smaller x; (big, 10)
    # survives on x
    assert got == {(big, 10), (big + 1, 5)}


def test_skyline_y_beyond_double_precision(spark):
    """The pandas prefilter must not promote int64 y to float64 (a
    .shift(1) NaN slot does): 2**53 and 2**53 + 1 collapse as doubles,
    and the true skyline point (2, 2**53) would be dropped."""
    from pyspark_graph_spark.operators.skyline import Skyline2D

    big = 2**53
    df = spark.createDataFrame(
        [(1, big + 1), (2, big)], "x long, y long"
    )
    got = {(r.x, r.y) for r in Skyline2D("x", "y").run(df).collect()}
    assert got == {(1, big + 1), (2, big)}
