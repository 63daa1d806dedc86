"""als_implicit_rank2 (operators/als.py, round 11): implicit-feedback
ALS (Hu, Koren & Volinsky 2008) — the confidence-weighted implicit half
of the SVD++ model class (reference README.md:32 marks SVDPlusPlus ❌
everywhere). Pinned by replicating the exact alternation in numpy —
including the global-Gram + sparse-correction split that keeps the
solve linear in nnz — and by the learned scores actually ranking a
user's observed items above the unobserved ones."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark_graph_spark.operators.als import als_implicit_rank2


def _ratings(rng, n_users=7, n_items=9, density=0.5):
    rows = []
    for u in range(n_users):
        for i in range(n_items):
            if rng.rand() < density:
                rows.append((u, i, float(rng.randint(1, 8))))
    return rows


def _numpy_implicit_als(rows, iterations=2, reg=0.1, alpha=0.5):
    by_u: dict[int, list] = {}
    by_i: dict[int, list] = {}
    for u, i, x in rows:
        by_u.setdefault(u, []).append((i, x))
        by_i.setdefault(i, []).append((u, x))
    item_ids = sorted(by_i)
    v = {i: np.array([1.0 + (i % 2), 1.0 + (i % 3)]) for i in item_ids}
    u_f = {}
    for _ in range(iterations):
        G = sum(np.outer(v[i], v[i]) for i in item_ids)
        for uu, obs in by_u.items():
            A = G + reg * np.eye(2)
            b = np.zeros(2)
            for i, x in obs:
                A = A + alpha * x * np.outer(v[i], v[i])
                b = b + (1.0 + alpha * x) * v[i]
            u_f[uu] = np.linalg.solve(A, b)
        G = sum(np.outer(u_f[u], u_f[u]) for u in by_u)
        for ii, obs in by_i.items():
            A = G + reg * np.eye(2)
            b = np.zeros(2)
            for u, x in obs:
                A = A + alpha * x * np.outer(u_f[u], u_f[u])
                b = b + (1.0 + alpha * x) * u_f[u]
            v[ii] = np.linalg.solve(A, b)
    return u_f, v


def test_matches_numpy_replication(spark):
    rng = np.random.RandomState(7)
    rows = _ratings(rng)
    df = spark.createDataFrame(rows, "u long, i long, r double")
    users, items = als_implicit_rank2(
        df, "u", "i", "r", iterations=2, reg=0.1, alpha=0.5
    )
    u_np, v_np = _numpy_implicit_als(rows)
    for row in users.collect():
        assert row["u1"] == pytest.approx(u_np[row["u"]][0], abs=1e-9)
        assert row["u2"] == pytest.approx(u_np[row["u"]][1], abs=1e-9)
    for row in items.collect():
        assert row["v1"] == pytest.approx(v_np[row["i"]][0], abs=1e-9)
        assert row["v2"] == pytest.approx(v_np[row["i"]][1], abs=1e-9)


def test_observed_ranked_above_unobserved(spark):
    """The whole point of the implicit model: x_u . y_i should score a
    user's observed items above the items they never touched (the
    unobserved pairs enter the loss as p = 0 with confidence 1)."""
    rng = np.random.RandomState(11)
    n_users, n_items = 10, 12
    rows = _ratings(rng, n_users=n_users, n_items=n_items, density=0.4)
    df = spark.createDataFrame(rows, "u long, i long, r double")
    users, items = als_implicit_rank2(
        df, "u", "i", "r", iterations=3, reg=0.1, alpha=0.5
    )
    u = {row["u"]: np.array([row["u1"], row["u2"]]) for row in users.collect()}
    v = {row["i"]: np.array([row["v1"], row["v2"]]) for row in items.collect()}
    observed = {(uu, ii) for uu, ii, _ in rows}
    obs_scores, unobs_scores = [], []
    for uu in u:
        for ii in v:
            s = float(u[uu] @ v[ii])
            (obs_scores if (uu, ii) in observed else unobs_scores).append(s)
    assert np.mean(obs_scores) > np.mean(unobs_scores) + 0.1


def test_solve_is_linear_in_nnz_not_cross_product(spark):
    """A user with ONE observed row must still get finite factors pulled
    toward that row (the background p=0 term regularizes, it does not
    zero the solution)."""
    rows = [(0, 0, 5.0), (1, 0, 5.0), (1, 1, 1.0), (2, 1, 3.0)]
    df = spark.createDataFrame(rows, "u long, i long, r double")
    users, items = als_implicit_rank2(
        df, "u", "i", "r", iterations=2, reg=0.1, alpha=0.5
    )
    got = {row["u"]: (row["u1"], row["u2"]) for row in users.collect()}
    assert set(got) == {0, 1, 2}
    for f in got.values():
        assert all(np.isfinite(f))
    u_np, _ = _numpy_implicit_als(rows)
    for uu, (f1, f2) in got.items():
        assert f1 == pytest.approx(u_np[uu][0], abs=1e-9)
        assert f2 == pytest.approx(u_np[uu][1], abs=1e-9)


def test_validation():
    with pytest.raises(ValueError, match="iterations"):
        als_implicit_rank2(None, "u", "i", "r", iterations=0)
    with pytest.raises(ValueError, match="reg"):
        als_implicit_rank2(None, "u", "i", "r", reg=0.0)
    with pytest.raises(ValueError, match="alpha"):
        als_implicit_rank2(None, "u", "i", "r", alpha=0.0)
