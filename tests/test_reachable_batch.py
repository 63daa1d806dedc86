"""reachable_set bounded-batch finish (round 12): the Arrow BFS kernel
must return exactly the distributed loop's visited set, honor the same
round budget, and fail with the same eager ValueError — on both paths."""

import pytest

from pyspark_graph_spark.operators.scc import reachable_set


def _sets(spark, edges, seeds, direction, **kw):
    e = spark.createDataFrame(edges, ["src", "dst"])
    s = spark.createDataFrame([(v,) for v in seeds], ["id"])
    batched = {
        r.id for r in reachable_set(e, s, direction, **kw).collect()
    }
    distributed = {
        r.id
        for r in reachable_set(
            e, s, direction, batch_finish=0, **kw
        ).collect()
    }
    return batched, distributed


def test_batch_equals_distributed_forward_backward(spark):
    # diamond + tail + disconnected pair; seeds hit mid-graph
    edges = [
        (1, 2), (1, 3), (2, 4), (3, 4), (4, 5), (5, 6),
        (7, 1), (8, 9),
    ]
    for direction in ("forward", "backward"):
        b, d = _sets(spark, edges, [4, 8], direction)
        assert b == d


def test_batch_equals_distributed_deterministic_random(spark):
    import random

    rng = random.Random(12)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(120)]
    b, d = _sets(spark, edges, [0, 1], "forward")
    assert b == d
    b, d = _sets(spark, edges, [0, 1], "backward")
    assert b == d


def test_batch_budget_raises_same_valueerror(spark):
    # chain longer than max_rounds: both paths must raise EAGERLY
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], ["src", "dst"]
    )
    s = spark.createDataFrame([(0,)], ["id"])
    for bf in (1_000_000, 0):
        with pytest.raises(ValueError, match="did not converge"):
            reachable_set(e, s, "forward", max_rounds=2, batch_finish=bf)


def test_batch_budget_boundary_matches_distributed(spark):
    # the loop must OBSERVE the empty frontier inside the budget: a
    # 3-expansion chain converges at max_rounds=4 and raises at 3 —
    # identically on both paths (the kernel replays the round structure)
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(3)], ["src", "dst"]
    )
    s = spark.createDataFrame([(0,)], ["id"])
    for bf in (1_000_000, 0):
        got = {
            r.id
            for r in reachable_set(
                e, s, "forward", max_rounds=4, batch_finish=bf
            ).collect()
        }
        assert got == {0, 1, 2, 3}
        with pytest.raises(ValueError, match="did not converge"):
            reachable_set(e, s, "forward", max_rounds=3, batch_finish=bf)
