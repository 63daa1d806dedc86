"""MultilevelPartition bounded-batch finish (r11): the cogrouped Arrow
kernel that replays the remaining match/contract levels, the 2-hop
pairing, and the greedy packing must be BIT-IDENTICAL to the distributed
per-level loop (batch_finish=0), because it consumes the same
xxhash64(src, dst, seed+lvl) priorities via the NumPy replica pinned by
tests/test_xxh64_np.py and the same anchor/bucket/rank arithmetic."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark_graph_spark.constants import DST, ID, SRC
from pyspark_graph_spark.graph import Graph
from pyspark_graph_spark.operators.partition import MultilevelPartition


def _graph(spark, n, edges):
    v = spark.createDataFrame([(i,) for i in range(n)], f"{ID} long")
    e = spark.createDataFrame(edges, f"{SRC} long, {DST} long")
    return Graph(v, e, directed=False, indexed=True)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _assert_identical(spark, g, **kw):
    batched = MultilevelPartition(**kw).run(g)
    distributed = MultilevelPartition(batch_finish=0, **kw).run(g)
    assert _rows(batched) == _rows(distributed)


def test_batch_identical_path(spark):
    g = _graph(spark, 64, [(i, i + 1) for i in range(63)])
    _assert_identical(spark, g, k=3, max_coarse=4, seed=1)


def test_batch_identical_random_graph(spark):
    edges = [(i, (i * 7 + 1) % 80) for i in range(80)] + [
        (i, (i * 13 + 5) % 80) for i in range(80)
    ]
    g = _graph(spark, 80, [(a, b) for a, b in edges if a != b])
    _assert_identical(spark, g, k=4, max_coarse=8, seed=3)


def test_batch_identical_star_forest_two_hop_auto(spark):
    # hub starvation flips the auto 2-hop heuristic mid-run: the kernel
    # must replay the same per-level shrink bookkeeping
    edges = (
        [(0, i) for i in range(3, 100)]
        + [(1, i) for i in range(100, 200)]
        + [(2, i) for i in range(200, 300)]
        + [(0, 1), (1, 2)]
    )
    g = _graph(spark, 300, edges)
    _assert_identical(spark, g, k=4, max_coarse=16, max_levels=12)


def test_batch_identical_two_hop_true(spark):
    edges = [(0, i) for i in range(1, 40)] + [(40 + i, 40 + i + 1) for i in range(0, 20, 2)]
    g = _graph(spark, 62, edges)
    _assert_identical(spark, g, k=3, max_coarse=6, two_hop=True)


def test_batch_identical_mega_hub_sub_buckets(spark):
    # >256 leaves per anchor exercises the xxhash64(src) sub-bucket split
    n = 600
    g = _graph(spark, n, [(0, i) for i in range(1, n)])
    _assert_identical(spark, g, k=4, max_coarse=8, two_hop=True)


def test_batch_identical_with_first_matching(spark):
    from pyspark_graph_spark.operators.matching import MaximalMatching

    g = _graph(spark, 64, [(i, i + 1) for i in range(63)])
    m0 = MaximalMatching(seed=0).run(g)
    a = MultilevelPartition(k=2, max_coarse=4, first_matching=m0).run(g)
    b = MultilevelPartition(
        k=2, max_coarse=4, first_matching=m0, batch_finish=0
    ).run(g)
    assert _rows(a) == _rows(b)


def test_batch_stall_raises_same_error(spark):
    g = _graph(spark, 6, [])
    with pytest.raises(ValueError, match="stalled at 6 supervertices"):
        MultilevelPartition(k=2, max_coarse=2, max_batch=3).run(g)
