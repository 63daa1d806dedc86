"""Round-4 query invariants (exact values are driver/oracle-checked;
these pin the semantic contracts on the sf0.001 tables and on crafted
frames where a hand-computable answer exists)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark_graph_spark.queries import QUERIES


def run(spark, sf_dir, name):
    return QUERIES[name](spark, sf_dir)


def test_promo_revenue_share_bounds(spark, sf_dir):
    rows = run(spark, sf_dir, "promo_revenue").collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.promo_pct <= 100.0
        assert r.promo_revenue <= r.total_revenue + 1e-9


def test_large_orders_threshold(spark, sf_dir):
    rows = run(spark, sf_dir, "large_orders").collect()
    assert all(r.sum_qty > 200 for r in rows)


def test_market_share_is_a_fraction(spark, sf_dir):
    rows = run(spark, sf_dir, "market_share").collect()
    assert rows
    assert all(0.0 <= r.intra_share <= 1.0 for r in rows)


def test_autocorrelation_lags_and_range(spark, sf_dir):
    rows = run(spark, sf_dir, "autocorrelation").collect()
    lags = sorted(r.lag for r in rows)
    assert lags == list(range(1, 8))
    assert all(-1.0 - 1e-9 <= r.acf <= 1.0 + 1e-9 for r in rows)


def test_changepoint_stat_nonnegative_and_interior(spark, sf_dir):
    rows = run(spark, sf_dir, "changepoint").collect()
    assert rows
    assert all(r.stat >= 0.0 for r in rows)


def test_ngram_novelty_fraction(spark, sf_dir):
    rows = run(spark, sf_dir, "ngram_novelty").collect()
    assert rows
    assert all(0.0 <= r.novelty <= 1.0 and r.n_shingles > 0 for r in rows)


def test_quality_blend_zero_mean(spark, sf_dir):
    rows = run(spark, sf_dir, "quality_blend").collect()
    n = len(rows)
    assert n > 0
    # z-scores sum to ~0 per signal, so the blend averages to ~0 corpus-wide
    assert abs(sum(r.blend_z for r in rows) / n) < 0.01


def test_er_clusters_labels_are_member_min(spark, sf_dir):
    rows = run(spark, sf_dir, "er_clusters").collect()
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r.component, []).append(r.doc_id)
    for comp, members in by_comp.items():
        assert comp == min(members)


def test_session_paths_shape(spark, sf_dir):
    rows = run(spark, sf_dir, "session_paths").collect()
    assert rows
    for r in rows:
        assert 1 <= len(r.path.split(">")) <= 3
        assert r.n_sessions >= 1


def test_ppr_mass_concentrates_on_seeds(spark, sf_dir):
    out = {r.id: r.ppr for r in run(spark, sf_dir, "ppr_trade").collect()}
    # the seeds receive the restart mass every round; nothing can outrank
    # the max seed in a 3-iteration walk from a 2-seed start
    top = max(out, key=lambda k: out[k])
    assert top in (3, 5)


def test_degree_centralization_bounds_and_star(spark, sf_dir):
    row = run(spark, sf_dir, "degree_centralization").collect()[0]
    assert 0.0 <= row.centralization <= 1.0
    assert row.max_degree <= row.n_vertices - 1


def test_xlingual_pairs_differ_in_lang(spark, sf_dir):
    rows = run(spark, sf_dir, "xlingual_mining").collect()
    for r in rows:
        assert r.lang_src != r.lang_dst
        assert r.cosine_sim >= 0.35


def test_dyad_census_partitions_all_pairs(spark, sf_dir):
    r = run(spark, sf_dir, "dyad_census").collect()[0]
    assert r.mutual >= 0 and r.asym >= 0 and r.null_dyads >= 0
    n = 25
    assert r.mutual + r.asym + r.null_dyads == n * (n - 1) // 2


def test_seasonal_decompose_reconstructs(spark, sf_dir):
    rows = run(spark, sf_dir, "seasonal_decompose").collect()
    assert rows
    for r in rows:
        # value = seasonal + trend + residual - grand_mean by construction
        assert r.n_events >= 0 and r.trend > 0


def test_kmv_intersection_estimates_consistent(spark, sf_dir):
    rows = run(spark, sf_dir, "kmv_intersection").collect()
    assert len(rows) == 10  # C(5,2) event-type pairs
    for r in rows:
        assert 0.0 <= r.jaccard_est <= 1.0
        assert r.inter_est <= r.union_est + 1e-6
        assert r.common <= r.k_eff


def test_dedup_rate_curve_monotone(spark, sf_dir):
    rows = sorted(
        run(spark, sf_dir, "dedup_rate_curve").collect(),
        key=lambda r: r.threshold,
    )
    assert [r.threshold for r in rows] == [0.5, 0.6, 0.7, 0.8, 0.9]
    counts = [r.n_pairs for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_degree_ccdf_monotone(spark, sf_dir):
    rows = sorted(
        run(spark, sf_dir, "degree_ccdf").collect(), key=lambda r: r.degree
    )
    assert rows[0].ccdf == pytest.approx(1.0)  # smallest degree covers all
    ccdfs = [r.ccdf for r in rows]
    assert ccdfs == sorted(ccdfs, reverse=True)


def test_bowtie_classes_partition_vertices(spark, sf_dir):
    rows = run(spark, sf_dir, "bowtie_structure").collect()
    classes = {r.component_class for r in rows}
    assert classes <= {"core", "in", "out", "other"}
    assert "core" in classes
    assert all(r.n_vertices > 0 for r in rows)


def test_edge_cut_bounds(spark, sf_dir):
    r = run(spark, sf_dir, "edge_cut").collect()[0]
    assert r.cut_edges <= r.n_edges
    assert 0.0 <= r.cut_frac <= 1.0
    assert r.balance >= 1.0 - 1e-9  # max shard is at least the ideal share


def test_conversion_lag_positive(spark, sf_dir):
    r = run(spark, sf_dir, "conversion_lag").collect()[0]
    if r.n_converted > 0:
        assert 0.0 <= r.median_s <= r.p90_s


def test_dedup_cluster_sizes_accounts_for_all_docs(spark, sf_dir):
    rows = run(spark, sf_dir, "dedup_cluster_sizes").collect()
    from pyspark_graph_spark.sources.tables import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.cluster_size * r.n_clusters for r in rows) == n_docs


def test_reachable_set_forward_backward(spark):
    from pyspark_graph_spark.operators.scc import reachable_set

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 1)], ["src", "dst"]
    )
    seeds = spark.createDataFrame([(1,)], ["id"])
    fwd = {r.id for r in reachable_set(edges, seeds, "forward").collect()}
    bwd = {r.id for r in reachable_set(edges, seeds, "backward").collect()}
    assert fwd == {1, 2, 3}
    assert bwd == {1, 4}


def test_reachable_set_raises_on_budget(spark):
    from pyspark_graph_spark.operators.scc import reachable_set

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], ["src", "dst"]
    )
    seeds = spark.createDataFrame([(0,)], ["id"])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="did not converge"):
        reachable_set(edges, seeds, "forward", max_rounds=2)


def test_er_multipass_coarsens_single_pass(spark, sf_dir):
    single = {
        r.doc_id: r.component
        for r in run(spark, sf_dir, "er_clusters").collect()
    }
    multi = {
        r.doc_id: r.component
        for r in run(spark, sf_dir, "er_clusters_multipass").collect()
    }
    # candidate union is a superset -> same-cluster in pass 1 implies
    # same-cluster in multipass (components only merge, never split)
    by_comp = {}
    for d, c in single.items():
        by_comp.setdefault(c, []).append(d)
    for members in by_comp.values():
        assert len({multi[d] for d in members}) == 1


def test_dedup_keep_policy_one_survivor_per_cluster(spark, sf_dir):
    rows = run(spark, sf_dir, "dedup_keep_policy").collect()
    kept = {}
    for r in rows:
        kept.setdefault(r.component, 0)
        if r.kept:
            kept[r.component] += 1
    assert all(v == 1 for v in kept.values())


def test_rfm_segments_partition_users(spark, sf_dir):
    rows = run(spark, sf_dir, "rfm_segments").collect()
    segs = {r.segment for r in rows}
    assert segs <= {
        a + b + c for a in "Rr" for b in "Ff" for c in "Mm"
    }
    assert sum(r.n_users for r in rows) > 0


def test_idle_customers_bounds(spark, sf_dir):
    rows = run(spark, sf_dir, "idle_customers").collect()
    for r in rows:
        assert r.n_customers > 0 and r.total_balance > 0


def test_ppl_filter_keep_rate_global(spark, sf_dir):
    rows = run(spark, sf_dir, "ppl_filter_calibration").collect()
    n = sum(r.n_docs for r in rows)
    k = sum(r.n_keep for r in rows)
    # p75 cutoff keeps ~75% globally (exact fraction depends on ties)
    assert 0.6 <= k / n <= 0.9
    for r in rows:
        assert 0.0 <= r.keep_rate <= 1.0


def test_seasonality_strength_in_unit_interval(spark, sf_dir):
    r = run(spark, sf_dir, "seasonality_strength").collect()[0]
    assert 0.0 <= r.seasonal_strength <= 1.0


def test_markov_stationary_is_distribution(spark, sf_dir):
    rows = run(spark, sf_dir, "markov_stationary").collect()
    assert len(rows) == 5
    assert abs(sum(r.pi for r in rows) - 1.0) < 1e-4
    assert all(r.pi >= 0 for r in rows)


def test_stickiness_bounds(spark, sf_dir):
    r = run(spark, sf_dir, "stickiness").collect()[0]
    assert 0.0 < r.stickiness <= 1.0
    assert r.avg_dau <= r.mau


def test_hourly_profile_shares_sum_to_one(spark, sf_dir):
    rows = run(spark, sf_dir, "hourly_profile").collect()
    assert {r.hour_of_day for r in rows} <= set(range(24))
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-3
