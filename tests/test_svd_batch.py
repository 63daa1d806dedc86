"""Bounded-batch SVD kernels (round 12) == the distributed plans.

The kernels replay the identical IEEE-754 double algebra; the only
divergence channel is the per-key sum accumulation order, which Spark
itself does not pin run to run (shuffle fetch order). These pins hold
the two paths together far below the queries' 6-decimal output
rounding: elementwise agreement at 1e-9 absolute AND exact equality of
the 6dp-rounded values the gate hashes.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark_graph_spark.operators.svd import (
    block_power_iteration_svd,
    deflated_power_iteration_svd,
    power_iteration_svd,
)


def _to_spark(spark, dense):
    rows = [
        (i, j, float(dense[i, j]))
        for i in range(dense.shape[0])
        for j in range(dense.shape[1])
        if dense[i, j] != 0
    ]
    return spark.createDataFrame(rows, "r long, c long, a double")


def _collect(u, v, with_factor):
    key_u = (lambda r: (r["factor"], r["r"])) if with_factor else (
        lambda r: r["r"]
    )
    key_v = (lambda r: (r["factor"], r["c"])) if with_factor else (
        lambda r: r["c"]
    )
    um = {key_u(r): r["u"] for r in u.collect()}
    vm = {key_v(r): (r["v"], r["sigma"]) for r in v.collect()}
    return um, vm


def _pin_equal(u_b, v_b, u_d, v_d, with_factor=True):
    ub, vb = _collect(u_b, v_b, with_factor)
    ud, vd = _collect(u_d, v_d, with_factor)
    assert set(ub) == set(ud)
    assert set(vb) == set(vd)
    for k in ub:
        assert ub[k] == pytest.approx(ud[k], abs=1e-9)
        assert round(ub[k], 6) == round(ud[k], 6)
    for k in vb:
        assert vb[k][0] == pytest.approx(vd[k][0], abs=1e-9)
        assert round(vb[k][0], 6) == round(vd[k][0], 6)
        assert vb[k][1] == pytest.approx(vd[k][1], rel=1e-12)
        assert round(vb[k][1], 3) == round(vd[k][1], 3)


def test_power_batch_equals_distributed(spark):
    rng = np.random.default_rng(5)
    dense = rng.integers(0, 9, size=(14, 11)).astype(float)
    df = _to_spark(spark, dense)
    u_b, v_b = power_iteration_svd(df, "r", "c", "a", iterations=3)
    u_d, v_d = power_iteration_svd(
        df, "r", "c", "a", iterations=3, batch_finish=0
    )
    _pin_equal(u_b, v_b, u_d, v_d, with_factor=False)


def test_deflated_batch_equals_distributed(spark):
    """The gate shape: k=2, iterations=2, integer-valued quantities
    (svd_factorization_k's SUM(l_quantity) COO)."""
    rng = np.random.RandomState(17)
    dense = rng.randint(0, 40, size=(16, 10)).astype(float)
    dense[dense < 8] = 0.0  # sparse support
    dense[0, 0] = 3.0  # keep row/col 0 present
    df = _to_spark(spark, dense)
    u_b, v_b = deflated_power_iteration_svd(df, "r", "c", "a", k=2, iterations=2)
    u_d, v_d = deflated_power_iteration_svd(
        df, "r", "c", "a", k=2, iterations=2, batch_finish=0
    )
    _pin_equal(u_b, v_b, u_d, v_d)


def test_deflated_batch_equals_distributed_k3(spark):
    rng = np.random.RandomState(29)
    dense = np.abs(rng.rand(9, 7)) + np.outer(rng.rand(9), rng.rand(7)) * 4
    df = _to_spark(spark, dense)
    u_b, v_b = deflated_power_iteration_svd(df, "r", "c", "a", k=3, iterations=3)
    u_d, v_d = deflated_power_iteration_svd(
        df, "r", "c", "a", k=3, iterations=3, batch_finish=0
    )
    _pin_equal(u_b, v_b, u_d, v_d)


def test_block_batch_equals_distributed(spark):
    """The gate shape: k=4, iterations=2 (svd_factorization_block)."""
    rng = np.random.RandomState(41)
    dense = np.abs(rng.rand(12, 9)) + np.outer(rng.rand(12), rng.rand(9)) * 5
    df = _to_spark(spark, dense)
    u_b, v_b = block_power_iteration_svd(df, "r", "c", "a", k=4, iterations=2)
    u_d, v_d = block_power_iteration_svd(
        df, "r", "c", "a", k=4, iterations=2, batch_finish=0
    )
    _pin_equal(u_b, v_b, u_d, v_d)


def test_block_batch_equals_distributed_k2_signed(spark):
    """netmf's shape: k=2 over a SIGNED symmetric matrix (PPMI values
    can be negative before the >0 filter; symmetry like the walk
    matrix)."""
    rng = np.random.RandomState(53)
    m = rng.rand(8, 8) * 4 - 1.0
    dense = np.round(m + m.T, 6)
    df = _to_spark(spark, dense)
    u_b, v_b = block_power_iteration_svd(df, "r", "c", "a", k=2, iterations=2)
    u_d, v_d = block_power_iteration_svd(
        df, "r", "c", "a", k=2, iterations=2, batch_finish=0
    )
    _pin_equal(u_b, v_b, u_d, v_d)


def test_rank_exhaustion_same_error_both_paths(spark):
    dense = 7.5 * np.outer([0.6, 0.8], [1 / 3, 2 / 3, 2 / 3])  # rank 1
    df = _to_spark(spark, dense)
    with pytest.raises(ValueError, match="effective rank") as e_b:
        deflated_power_iteration_svd(df, "r", "c", "a", k=2, iterations=5)
    with pytest.raises(ValueError, match="effective rank") as e_d:
        deflated_power_iteration_svd(
            df, "r", "c", "a", k=2, iterations=5, batch_finish=0
        )
    # identical failure class and factor index either path
    assert "failed at factor 1" in str(e_b.value)
    assert "failed at factor 1" in str(e_d.value)


def test_empty_input_same_error_both_paths(spark):
    df = spark.createDataFrame([], "r long, c long, a double")
    for bf in (1_000_000, 0):
        with pytest.raises(ValueError, match="sigma is None"):
            deflated_power_iteration_svd(
                df, "r", "c", "a", k=2, iterations=2, batch_finish=bf
            )


def test_non_integral_keys_stay_distributed(spark):
    """String-keyed COO input must skip the long-keyed batch schema."""
    df = spark.createDataFrame(
        [("a", "x", 2.0), ("a", "y", 1.0), ("b", "x", 3.0)],
        "r string, c string, a double",
    )
    u, v = power_iteration_svd(df, "r", "c", "a", iterations=2)
    got = {r["r"]: r["u"] for r in u.collect()}
    assert set(got) == {"a", "b"}
