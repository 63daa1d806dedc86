"""power_iteration_svd (operators/svd.py) — round 9.

Validated against numpy's exact SVD on dense replicas: the dominant
singular value and both singular vectors (up to the sign fixed by the
all-ones start, positive for nonnegative matrices by Perron–Frobenius).
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark_graph_spark.operators.svd import power_iteration_svd


def _to_spark(spark, dense):
    rows = [
        (i, j, float(dense[i, j]))
        for i in range(dense.shape[0])
        for j in range(dense.shape[1])
        if dense[i, j] != 0
    ]
    return spark.createDataFrame(rows, "r long, c long, a double")


def _run(spark, dense, iterations):
    df = _to_spark(spark, dense)
    u, v = power_iteration_svd(df, "r", "c", "a", iterations=iterations)
    u_map = {row["r"]: row["u"] for row in u.collect()}
    v_rows = v.collect()
    v_map = {row["c"]: row["v"] for row in v_rows}
    sigma = v_rows[0]["sigma"]
    return u_map, v_map, sigma


def test_matches_numpy_on_nonnegative_matrix(spark):
    rng = np.random.default_rng(3)
    dense = rng.integers(0, 5, size=(12, 9)).astype(float)
    u_map, v_map, sigma = _run(spark, dense, iterations=40)
    U, S, Vt = np.linalg.svd(dense)
    assert sigma == pytest.approx(S[0], rel=1e-9)
    # Perron: dominant pair of a nonnegative matrix is nonnegative, and
    # the all-ones start keeps ours on that sign
    for j, x in v_map.items():
        assert x == pytest.approx(abs(Vt[0, j]), abs=1e-9)
    for i, x in u_map.items():
        assert x == pytest.approx(abs(U[i, 0]), abs=1e-9)


def test_vectors_unit_norm_and_sparse_support(spark):
    # rows/cols absent from the COO input get no vector entry at all
    dense = np.zeros((6, 5))
    dense[0, 0] = 3.0
    dense[1, 1] = 2.0
    dense[2, 0] = 1.0
    u_map, v_map, sigma = _run(spark, dense, iterations=15)
    assert set(u_map) == {0, 1, 2} and set(v_map) == {0, 1}
    assert sum(x * x for x in u_map.values()) == pytest.approx(1.0)
    assert sum(x * x for x in v_map.values()) == pytest.approx(1.0)
    # dominant block is the [3; 1] column: sigma = sqrt(10)
    assert sigma == pytest.approx(np.sqrt(10.0), rel=1e-9)


def test_rank_one_matrix_exact_in_one_iteration(spark):
    # for rank-1 A = s * u v^T, one iteration is already exact
    u_true = np.array([3.0, 4.0]) / 5.0
    v_true = np.array([1.0, 2.0, 2.0]) / 3.0
    dense = 7.5 * np.outer(u_true, v_true)
    u_map, v_map, sigma = _run(spark, dense, iterations=1)
    assert sigma == pytest.approx(7.5, rel=1e-12)
    for i, x in u_map.items():
        assert x == pytest.approx(u_true[i], rel=1e-12)
    for j, x in v_map.items():
        assert x == pytest.approx(v_true[j], rel=1e-12)


def test_iterations_validated():
    with pytest.raises(ValueError, match="iterations"):
        power_iteration_svd(None, "r", "c", "a", iterations=0)


def test_deflated_rank_k_matches_numpy(spark):
    """deflated_power_iteration_svd (round 10): the first k singular
    triplets match numpy's exact SVD — deflation is implicit
    (A x - sum sigma_p (v_p.x) u_p), never densified."""
    from pyspark_graph_spark.operators.svd import deflated_power_iteration_svd

    rng = np.random.RandomState(7)
    dense = np.abs(rng.rand(8, 6)) + np.outer(rng.rand(8), rng.rand(6)) * 5
    df = _to_spark(spark, dense)
    u, v = deflated_power_iteration_svd(df, "r", "c", "a", k=3, iterations=30)
    got_v = {
        (row["factor"], row["c"]): (row["v"], row["sigma"])
        for row in v.collect()
    }
    _, S, Vt = np.linalg.svd(dense)
    for j in range(3):
        vs = np.array([got_v[(j, c)][0] for c in range(6)])
        sig = got_v[(j, 0)][1]
        ref = Vt[j] if np.dot([got_v[(j, c)][0] for c in range(6)], Vt[j]) > 0 else -Vt[j]
        assert abs(sig - S[j]) < 1e-4, (j, sig, S[j])
        assert np.abs(vs - ref).max() < 1e-3, j
    # u side: orthonormal columns
    import collections

    u_rows = u.collect()
    by_f = collections.defaultdict(dict)
    for row in u_rows:
        by_f[row["factor"]][row["r"]] = row["u"]
    for j in range(3):
        uj = np.array([by_f[j].get(r, 0.0) for r in range(8)])
        assert abs(np.linalg.norm(uj) - 1.0) < 1e-9
    for a in range(3):
        for b in range(a + 1, 3):
            ua = np.array([by_f[a].get(r, 0.0) for r in range(8)])
            ub = np.array([by_f[b].get(r, 0.0) for r in range(8)])
            assert abs(np.dot(ua, ub)) < 1e-6


def test_deflated_rank_k_validation(spark):
    from pyspark_graph_spark.operators.svd import deflated_power_iteration_svd

    with pytest.raises(ValueError, match="iterations"):
        deflated_power_iteration_svd(None, "r", "c", "a", k=2, iterations=0)
    with pytest.raises(ValueError, match="k must"):
        deflated_power_iteration_svd(None, "r", "c", "a", k=0)


def test_deflated_k1_equals_rank1_operator(spark):
    """k=1 deflated == the rank-1 operator (no deflation terms fire):
    same algebra, same values."""
    from pyspark_graph_spark.operators.svd import deflated_power_iteration_svd

    rng = np.random.RandomState(3)
    dense = np.abs(rng.rand(5, 4))
    df = _to_spark(spark, dense)
    u1, v1 = power_iteration_svd(df, "r", "c", "a", iterations=3)
    uk, vk = deflated_power_iteration_svd(df, "r", "c", "a", k=1, iterations=3)
    a = {(row["r"],): row["u"] for row in u1.collect()}
    b = {(row["r"],): row["u"] for row in uk.collect()}
    for key in a:
        assert abs(a[key] - b[key]) < 1e-12
    av = {row["c"]: (row["v"], row["sigma"]) for row in v1.collect()}
    bv = {row["c"]: (row["v"], row["sigma"]) for row in vk.collect()}
    for key in av:
        assert abs(av[key][0] - bv[key][0]) < 1e-12
        assert abs(av[key][1] - bv[key][1]) < 1e-12


def test_deflated_rank_exhaustion_raises_loudly(spark):
    """r10 ADVICE #2: k beyond the effective rank must raise, not emit
    NaN/null factor vectors — a rank-1 matrix at k=2 exhausts the
    deflated operator after factor 0."""
    from pyspark_graph_spark.operators.svd import deflated_power_iteration_svd

    u_true = np.array([3.0, 4.0]) / 5.0
    v_true = np.array([1.0, 2.0, 2.0]) / 3.0
    dense = 7.5 * np.outer(u_true, v_true)
    df = _to_spark(spark, dense)
    with pytest.raises(ValueError, match="effective rank"):
        u, v = deflated_power_iteration_svd(
            df, "r", "c", "a", k=2, iterations=5
        )
        v.collect()


def test_block_rank_k_matches_numpy(spark):
    """block_power_iteration_svd (round 11, r10 verdict #3): the first
    k=4 singular triplets match numpy's exact SVD while all k factors
    ride the same two shuffles per iteration."""
    from pyspark_graph_spark.operators.svd import block_power_iteration_svd

    rng = np.random.RandomState(11)
    dense = np.abs(rng.rand(10, 8)) + np.outer(rng.rand(10), rng.rand(8)) * 5
    df = _to_spark(spark, dense)
    u, v = block_power_iteration_svd(df, "r", "c", "a", k=4, iterations=40)
    got_v = {
        (row["factor"], row["c"]): (row["v"], row["sigma"])
        for row in v.collect()
    }
    U, S, Vt = np.linalg.svd(dense)
    for j in range(4):
        vs = np.array([got_v[(j, c)][0] for c in range(8)])
        sig = got_v[(j, 0)][1]
        ref = Vt[j] if np.dot(vs, Vt[j]) > 0 else -Vt[j]
        assert abs(sig - S[j]) < 1e-4, (j, sig, S[j])
        assert np.abs(vs - ref).max() < 1e-3, j
    # u side: orthonormal columns
    import collections

    by_f = collections.defaultdict(dict)
    for row in u.collect():
        by_f[row["factor"]][row["r"]] = row["u"]
    for x in range(4):
        ux = np.array([by_f[x].get(r, 0.0) for r in range(10)])
        assert abs(np.linalg.norm(ux) - 1.0) < 1e-9
        for y in range(x + 1, 4):
            uy = np.array([by_f[y].get(r, 0.0) for r in range(10)])
            assert abs(np.dot(ux, uy)) < 1e-6


def test_block_rank_exhaustion_raises_loudly(spark):
    from pyspark_graph_spark.operators.svd import block_power_iteration_svd

    u_true = np.array([3.0, 4.0]) / 5.0
    v_true = np.array([1.0, 2.0, 2.0]) / 3.0
    dense = 7.5 * np.outer(u_true, v_true)  # rank 1
    df = _to_spark(spark, dense)
    with pytest.raises(ValueError, match="effective rank"):
        block_power_iteration_svd(df, "r", "c", "a", k=3, iterations=4)


def test_block_validation(spark):
    from pyspark_graph_spark.operators.svd import block_power_iteration_svd

    with pytest.raises(ValueError, match="iterations"):
        block_power_iteration_svd(None, "r", "c", "a", k=2, iterations=0)
    with pytest.raises(ValueError, match="k must"):
        block_power_iteration_svd(None, "r", "c", "a", k=0)


def test_block_driver_gram_matches_numpy_at_k12(spark):
    """gram_mode='driver' (round 11): the k >> 8 shape — the k x k
    Cholesky factors on the driver from a bounded 1-row Gram collect
    and R re-enters the plan as literals. Pinned at k=12, past the
    inline R recursion's comfort zone, against numpy's exact SVD."""
    from pyspark_graph_spark.operators.svd import block_power_iteration_svd

    rng = np.random.RandomState(23)
    # well-separated geometric spectrum (ratio 0.75) from random
    # orthogonal bases: subspace iteration converges like
    # (sigma_{j+1}/sigma_j)^(2*iters), so interior factors are pinned
    # tight without needing hundreds of rounds
    qu, _ = np.linalg.qr(rng.randn(24, 16))
    qv, _ = np.linalg.qr(rng.randn(16, 16))
    s_true = 100.0 * (0.75 ** np.arange(16))
    dense = (qu * s_true) @ qv.T
    df = _to_spark(spark, dense)
    u, v = block_power_iteration_svd(
        df, "r", "c", "a", k=12, iterations=40, gram_mode="driver"
    )
    got_v = {
        (row["factor"], row["c"]): (row["v"], row["sigma"])
        for row in v.collect()
    }
    U, S, Vt = np.linalg.svd(dense)
    for j in range(12):
        vs = np.array([got_v[(j, c)][0] for c in range(16)])
        sig = got_v[(j, 0)][1]
        ref = Vt[j] if np.dot(vs, Vt[j]) > 0 else -Vt[j]
        assert abs(sig - S[j]) < 1e-3, (j, sig, S[j])
        assert np.abs(vs - ref).max() < 1e-2, j


def test_block_driver_gram_agrees_with_expr_mode(spark):
    """Same trajectory up to float-op order inside the k x k
    factorization: driver and expr modes agree to ~1e-9 at k=4."""
    from pyspark_graph_spark.operators.svd import block_power_iteration_svd

    rng = np.random.RandomState(31)
    dense = np.abs(rng.rand(10, 8)) + np.outer(rng.rand(10), rng.rand(8)) * 3
    df = _to_spark(spark, dense)
    _, v_e = block_power_iteration_svd(df, "r", "c", "a", k=4, iterations=3)
    _, v_d = block_power_iteration_svd(
        df, "r", "c", "a", k=4, iterations=3, gram_mode="driver"
    )
    e = {(r["factor"], r["c"]): (r["v"], r["sigma"]) for r in v_e.collect()}
    d = {(r["factor"], r["c"]): (r["v"], r["sigma"]) for r in v_d.collect()}
    assert set(e) == set(d)
    for key in e:
        assert e[key][0] == pytest.approx(d[key][0], abs=1e-9)
        assert e[key][1] == pytest.approx(d[key][1], abs=1e-9)


def test_block_driver_gram_rank_exhaustion_raises_loudly(spark):
    from pyspark_graph_spark.operators.svd import block_power_iteration_svd

    dense = 7.5 * np.outer([0.6, 0.8], [1 / 3, 2 / 3, 2 / 3])  # rank 1
    df = _to_spark(spark, dense)
    with pytest.raises(ValueError, match="rank"):
        block_power_iteration_svd(
            df, "r", "c", "a", k=3, iterations=4, gram_mode="driver"
        )


def test_block_gram_mode_validation(spark):
    from pyspark_graph_spark.operators.svd import block_power_iteration_svd

    with pytest.raises(ValueError, match="gram_mode"):
        block_power_iteration_svd(None, "r", "c", "a", k=2, gram_mode="bogus")
