"""als_bias_rank2 (operators/als.py, round 11): biased rank-2 ALS —
the distributed trainer for the SVD++-class model (reference
README.md:32 marks SVDPlusPlus ❌ everywhere). Pinned by replicating
the exact alternation in numpy (same update order, same ridge solves)
and by the fit actually beating the global-mean baseline."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark_graph_spark.operators.als import als_bias_rank2


def _ratings(rng, n_users=7, n_items=9, density=0.6):
    rows = []
    for u in range(n_users):
        for i in range(n_items):
            if rng.rand() < density:
                rows.append((u, i, float(rng.randint(1, 6))))
    return rows


def _numpy_als(rows, n_users, n_items, iterations=2, reg=0.1):
    r = {}
    by_u = {u: [] for u in range(n_users)}
    by_i = {i: [] for i in range(n_items)}
    for u, i, x in rows:
        r[(u, i)] = x
        by_u[u].append(i)
        by_i[i].append(u)
    mu = float(np.mean([x for _, _, x in rows]))
    v = np.array(
        [[1.0 + (i % 2), 1.0 + (i % 3)] for i in range(n_items)]
    )
    u_f = np.zeros((n_users, 2))
    bu = np.zeros(n_users)
    bi = np.zeros(n_items)
    for _ in range(iterations):
        new_u = np.zeros_like(u_f)
        for uu in range(n_users):
            if not by_u[uu]:
                continue
            G = sum(np.outer(v[i], v[i]) for i in by_u[uu]) + reg * np.eye(2)
            rhs = sum(
                (r[(uu, i)] - mu - bu[uu] - bi[i]) * v[i] for i in by_u[uu]
            )
            new_u[uu] = np.linalg.solve(G, rhs)
        u_f = new_u
        for uu in range(n_users):
            if not by_u[uu]:
                continue
            bu[uu] = sum(
                r[(uu, i)] - mu - bi[i] - u_f[uu] @ v[i] for i in by_u[uu]
            ) / (reg + len(by_u[uu]))
        new_v = np.zeros_like(v)
        for ii in range(n_items):
            if not by_i[ii]:
                continue
            G = sum(np.outer(u_f[u], u_f[u]) for u in by_i[ii]) + reg * np.eye(2)
            rhs = sum(
                (r[(u, ii)] - mu - bu[u] - bi[ii]) * u_f[u] for u in by_i[ii]
            )
            new_v[ii] = np.linalg.solve(G, rhs)
        v = new_v
        for ii in range(n_items):
            if not by_i[ii]:
                continue
            bi[ii] = sum(
                r[(u, ii)] - mu - bu[u] - u_f[u] @ v[ii] for u in by_i[ii]
            ) / (reg + len(by_i[ii]))
    return mu, u_f, bu, v, bi


def test_matches_numpy_replication(spark):
    rng = np.random.RandomState(5)
    rows = _ratings(rng)
    df = spark.createDataFrame(rows, "u long, i long, r double")
    users, items = als_bias_rank2(df, "u", "i", "r", iterations=2, reg=0.1)
    mu, u_np, bu_np, v_np, bi_np = _numpy_als(rows, 7, 9)
    got_u = {row["u"]: row for row in users.collect()}
    got_i = {row["i"]: row for row in items.collect()}
    for uu, row in got_u.items():
        assert row["u1"] == pytest.approx(u_np[uu][0], abs=1e-9)
        assert row["u2"] == pytest.approx(u_np[uu][1], abs=1e-9)
        assert row["bu"] == pytest.approx(bu_np[uu], abs=1e-9)
    for ii, row in got_i.items():
        assert row["v1"] == pytest.approx(v_np[ii][0], abs=1e-9)
        assert row["v2"] == pytest.approx(v_np[ii][1], abs=1e-9)
        assert row["bi"] == pytest.approx(bi_np[ii], abs=1e-9)


def test_fit_beats_global_mean_baseline(spark):
    rng = np.random.RandomState(9)
    rows = _ratings(rng, n_users=10, n_items=12, density=0.7)
    df = spark.createDataFrame(rows, "u long, i long, r double")
    users, items = als_bias_rank2(df, "u", "i", "r", iterations=3, reg=0.1)
    u = {row["u"]: row for row in users.collect()}
    v = {row["i"]: row for row in items.collect()}
    mu = float(np.mean([x for _, _, x in rows]))
    sse_model = sse_mu = 0.0
    for uu, ii, x in rows:
        pred = (
            mu
            + u[uu]["bu"]
            + v[ii]["bi"]
            + u[uu]["u1"] * v[ii]["v1"]
            + u[uu]["u2"] * v[ii]["v2"]
        )
        sse_model += (x - pred) ** 2
        sse_mu += (x - mu) ** 2
    assert sse_model < 0.5 * sse_mu


def test_validation():
    with pytest.raises(ValueError, match="iterations"):
        als_bias_rank2(None, "u", "i", "r", iterations=0)
    with pytest.raises(ValueError, match="reg"):
        als_bias_rank2(None, "u", "i", "r", reg=0.0)
