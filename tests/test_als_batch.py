"""Bounded-batch ALS kernels (round 12) == the distributed plans.

Same contract as tests/test_svd_batch.py: elementwise agreement at 1e-9
absolute and exact equality at the gate queries' 6-decimal rounding.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark_graph_spark.operators.als import (
    als_bias_rank2,
    als_implicit_rank2,
)


def _ratings_df(spark, seed=13, n_users=9, n_items=11, density=0.55):
    rng = np.random.RandomState(seed)
    rows = [
        (u, i, float(rng.randint(1, 8)))
        for u in range(n_users)
        for i in range(n_items)
        if rng.rand() < density
    ]
    return spark.createDataFrame(rows, "u long, i long, r double")


def _pin(side_b, side_d, cols):
    b = {r[0]: tuple(r[c] for c in cols) for r in side_b.collect()}
    d = {r[0]: tuple(r[c] for c in cols) for r in side_d.collect()}
    assert set(b) == set(d)
    for k in b:
        for x, y in zip(b[k], d[k]):
            assert x == pytest.approx(y, abs=1e-9)
            assert round(x, 6) == round(y, 6)


def test_bias_batch_equals_distributed(spark):
    df = _ratings_df(spark)
    ub, ib = als_bias_rank2(df, "u", "i", "r", iterations=2)
    ud, id_ = als_bias_rank2(df, "u", "i", "r", iterations=2, batch_finish=0)
    _pin(ub, ud, ["u1", "u2", "bu"])
    _pin(ib, id_, ["v1", "v2", "bi"])


def test_bias_batch_equals_distributed_3_iters(spark):
    df = _ratings_df(spark, seed=29, n_users=6, n_items=14, density=0.4)
    ub, ib = als_bias_rank2(df, "u", "i", "r", iterations=3, reg=0.5)
    ud, id_ = als_bias_rank2(
        df, "u", "i", "r", iterations=3, reg=0.5, batch_finish=0
    )
    _pin(ub, ud, ["u1", "u2", "bu"])
    _pin(ib, id_, ["v1", "v2", "bi"])


def test_implicit_batch_equals_distributed(spark):
    df = _ratings_df(spark, seed=37)
    ub, ib = als_implicit_rank2(df, "u", "i", "r", iterations=2)
    ud, id_ = als_implicit_rank2(
        df, "u", "i", "r", iterations=2, batch_finish=0
    )
    _pin(ub, ud, ["u1", "u2"])
    _pin(ib, id_, ["v1", "v2"])


def test_implicit_batch_equals_distributed_alpha(spark):
    df = _ratings_df(spark, seed=43, n_users=12, n_items=7)
    ub, ib = als_implicit_rank2(df, "u", "i", "r", iterations=2, alpha=2.5)
    ud, id_ = als_implicit_rank2(
        df, "u", "i", "r", iterations=2, alpha=2.5, batch_finish=0
    )
    _pin(ub, ud, ["u1", "u2"])
    _pin(ib, id_, ["v1", "v2"])
