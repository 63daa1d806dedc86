"""Pin the NumPy xxhash64 replica bit-for-bit against Spark's expression.

The Luby-MIS batch kernels consume xxhash64(id, seed, round) priorities
computed in NumPy (functions/xxh64_np.py) instead of shipping one Spark-
projected column per simulated round; the batch is bit-identical to the
distributed rounds ONLY if this replica is exact, so this test sweeps
negative/positive/boundary longs against ``F.xxhash64`` for several
(seed, round) literal pairs.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyspark_graph_spark.functions.xxh64_np import xxhash64_long_int_int

IDS = [
    0,
    1,
    -1,
    2,
    7,
    42,
    -42,
    2**31 - 1,
    2**31,
    -(2**31),
    2**62,
    -(2**62),
    2**63 - 1,
    -(2**63),
    123456789,
    -987654321,
    0x9E3779B185EBCA87 - 2**64,  # the prime itself as a signed long
]


@pytest.mark.parametrize("seed,rnd", [(0, 0), (0, 31), (3, 7), (15, 63)])
def test_replica_matches_spark(spark, seed, rnd):
    df = spark.createDataFrame([(i,) for i in IDS], "id long")
    expected = [
        r["h"]
        for r in df.select(
            F.xxhash64(F.col("id"), F.lit(seed), F.lit(rnd)).alias("h")
        ).collect()
    ]
    got = xxhash64_long_int_int(np.array(IDS, dtype=np.int64), seed, rnd)
    assert list(got) == expected


def test_replica_matches_spark_bulk(spark):
    rng = np.random.default_rng(11)
    ids = rng.integers(-(2**63), 2**63 - 1, size=2000, dtype=np.int64)
    df = spark.createDataFrame([(int(i),) for i in ids], "id long")
    expected = [
        r["h"]
        for r in df.select(
            F.xxhash64(F.col("id"), F.lit(5), F.lit(12)).alias("h")
        ).collect()
    ]
    got = xxhash64_long_int_int(ids, 5, 12)
    assert list(got) == expected


def test_single_and_pair_replicas_match_spark(spark):
    from pyspark_graph_spark.functions.xxh64_np import (
        xxhash64_long,
        xxhash64_long_int,
        xxhash64_long_long_int,
    )

    ids = np.array(IDS, dtype=np.int64)
    df = spark.createDataFrame([(int(i),) for i in IDS], "id long")
    exp1 = [r["h"] for r in df.select(F.xxhash64("id").alias("h")).collect()]
    assert list(xxhash64_long(ids)) == exp1
    exp2 = [
        r["h"]
        for r in df.select(
            F.xxhash64(F.col("id"), F.lit(9)).alias("h")
        ).collect()
    ]
    assert list(xxhash64_long_int(ids, 9)) == exp2

    rng = np.random.default_rng(7)
    src = rng.integers(-(2**63), 2**63 - 1, size=500, dtype=np.int64)
    dst = rng.integers(-(2**63), 2**63 - 1, size=500, dtype=np.int64)
    pdf = spark.createDataFrame(
        [(int(s), int(d)) for s, d in zip(src, dst)], "src long, dst long"
    )
    for seed in (0, 1, 5):
        exp = [
            r["h"]
            for r in pdf.select(
                F.xxhash64(F.col("src"), F.col("dst"), F.lit(seed)).alias("h")
            ).collect()
        ]
        assert list(xxhash64_long_long_int(src, dst, seed)) == exp
