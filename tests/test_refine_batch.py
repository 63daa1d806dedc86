"""refine() bounded-batch finish (round 12): the Arrow kernel must
produce the EXACT assignment of the distributed loop — same xxhash64
priorities, same Luby domination key, same per-part intake ranking and
cap — on every graph shape, including cap-constrained and multi-round
cascades. batched == distributed is the whole contract."""

import random

from pyspark.sql import functions as F

from pyspark_graph_spark.graph import Graph
from pyspark_graph_spark.operators.partition import refine


def _graph(spark, edges, n):
    v = spark.createDataFrame([(i,) for i in range(n)], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    return Graph(v, e, directed=False, indexed=True)


def _assign(spark, parts):
    return spark.createDataFrame(
        [(i, p) for i, p in enumerate(parts)], "id long, part long"
    )


def _both(spark, g, parts, k, cap, rounds=2, seed=0):
    a = {
        (r.id, r.part)
        for r in refine(
            g, parts, k, cap, rounds=rounds, seed=seed
        ).collect()
    }
    b = {
        (r.id, r.part)
        for r in refine(
            g, parts, k, cap, rounds=rounds, seed=seed, batch_finish=0
        ).collect()
    }
    return a, b


def test_refine_batch_matches_distributed_random(spark):
    rng = random.Random(7)
    n, k = 60, 4
    edges = list(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randrange(n), rng.randrange(n)) for _ in range(180)
            )
            if a != b
        }
    )
    g = _graph(spark, edges, n)
    parts = _assign(spark, [rng.randrange(k) for _ in range(n)])
    batched, dist = _both(spark, g, parts, k, cap=n)
    assert batched == dist


def test_refine_batch_tight_cap_and_more_rounds(spark):
    rng = random.Random(21)
    n, k = 40, 3
    edges = list(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randrange(n), rng.randrange(n)) for _ in range(120)
            )
            if a != b
        }
    )
    g = _graph(spark, edges, n)
    # skewed start: most vertices in part 0, tight cap forces ranking
    parts = _assign(spark, [0 if i % 5 else i % k for i in range(n)])
    batched, dist = _both(spark, g, parts, k, cap=16, rounds=3, seed=5)
    assert batched == dist


def test_refine_batch_cap_dataframe_and_star(spark):
    # hub star: every leaf wants the hub's part; Luby + cap thin them
    n, k = 30, 2
    edges = [(0, i) for i in range(1, n)]
    g = _graph(spark, edges, n)
    parts = _assign(spark, [i % k for i in range(n)])
    cap_df = spark.range(1).select(
        (F.lit(n) / F.lit(1.5)).alias("cap")
    )
    batched, dist = _both(spark, g, parts, k, cap=cap_df)
    assert batched == dist


def test_refine_batch_no_movers_identity(spark):
    # two monochromatic triangles: every vertex already sits with all
    # its neighbors (w_own=2, w_best=0) — zero candidates, both paths
    # return the input assignment unchanged
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)]
    g = _graph(spark, edges, 6)
    parts = _assign(spark, [0, 0, 0, 1, 1, 1])
    batched, dist = _both(spark, g, parts, 2, cap=6)
    assert batched == dist == {
        (0, 0), (1, 0), (2, 0), (3, 1), (4, 1), (5, 1)
    }
