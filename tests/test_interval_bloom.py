"""interval_overlap_join exactly-once semantics + Bloom filter sketch."""

from pyspark.sql import functions as F

from pyspark_graph_spark.functions.sketch import bloom_build, bloom_probe
from pyspark_graph_spark.operators.temporal import interval_overlap_join


def _iv(spark, rows, prefix):
    return spark.createDataFrame(
        rows, [f"{prefix}id", f"{prefix}s", f"{prefix}e"]
    )


def test_overlap_pairs_emitted_exactly_once_across_bins(spark):
    # intervals spanning MANY bins (width 10) — the pair must appear once
    left = _iv(spark, [(1, 0, 100), (2, 95, 130), (3, 200, 210)], "l")
    right = _iv(spark, [(10, 50, 120), (11, 205, 206), (12, 300, 310)], "r")
    out = interval_overlap_join(
        left, right, "ls", "le", "rs", "re", bin_width=10
    ).select("lid", "rid")
    got = sorted((r["lid"], r["rid"]) for r in out.collect())
    # 1-10 overlap (0..100 vs 50..120), 2-10 overlap (95..130 vs 50..120),
    # 3-11 overlap; 12 overlaps nothing
    assert got == [(1, 10), (2, 10), (3, 11)]


def test_touching_intervals_do_not_overlap(spark):
    # half-open semantics: [0,10) and [10,20) share no instant
    left = _iv(spark, [(1, 0, 10)], "l")
    right = _iv(spark, [(2, 10, 20)], "r")
    assert (
        interval_overlap_join(
            left, right, "ls", "le", "rs", "re", bin_width=5
        ).count()
        == 0
    )


def test_bloom_no_false_negatives(spark):
    df = spark.createDataFrame(
        [("a", f"val{i}") for i in range(50)]
        + [("b", f"other{i}") for i in range(50)],
        ["grp", "v"],
    )
    bloom = bloom_build(df, "v", ["grp"], m=4096, k=3)
    probes = df.filter(F.col("grp") == "a").select("v").distinct()
    hits = {
        (r["grp"], r["probe"]): r["bloom_hit"]
        for r in bloom_probe(bloom, probes, "v", m=4096, k=3).collect()
    }
    # every true member of group a must hit — the Bloom guarantee
    for i in range(50):
        assert hits[("a", f"val{i}")] is True


def test_bloom_is_bounded_and_mergeable(spark):
    df = spark.createDataFrame(
        [("g", f"v{i}") for i in range(10_000)], ["grp", "v"]
    )
    bloom = bloom_build(df, "v", ["grp"], m=256, k=3).first()
    assert len(bloom["bloom"]) <= 256  # sketch bounded by m, not by rows
