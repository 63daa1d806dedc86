"""Driver-facing query registry: Spark queries + matching DuckDB oracle SQL.

Each registered query is a ``(spark, sf_dir) -> DataFrame`` callable; the
oracle is the ANSI-SQL equivalent DuckDB runs over the same parquet tables
(pre-registered views: region nation customer supplier part orders lineitem
events documents embeddings). Column names and types are aligned on both
sides — the driver sorts columns by name and value-hashes.

Shared SQL fragments mirror the graph builders in ``sources/tables.py`` so the
Spark plan and the oracle operate on the identical graph.
"""

from __future__ import annotations

from pyspark_graph_spark.queries._order import REGISTRATION_ORDER
from pyspark_graph_spark.queries._registry import (
    ORACLES,
    QUERIES,
    QueryFn,
    query,
)
from pyspark_graph_spark.queries._shared import *  # noqa: F401,F403 — caches + helpers
from pyspark_graph_spark.queries import _shared as _shared_mod

# importing the domain modules registers every query; the canonical order
# re-sort below makes the registry independent of this import order
from pyspark_graph_spark.queries import (  # noqa: E402
    tpch,
    graph_core,
    graph_analytics,
    partition,
    dedup,
    text,
    ann,
    sketch,
    multimodal,
    events,
)

# classic single-module surface: tests and tools address q_* functions,
# oracle constants, and caches as pyspark_graph_spark.queries.<name>
for _m in (tpch, graph_core, graph_analytics, partition, dedup, text, ann, sketch, multimodal, events, _shared_mod):
    for _k in dir(_m):
        if not _k.startswith("__") and _k not in globals():
            globals()[_k] = getattr(_m, _k)

# canonical order re-sort: the registry must equal the pre-split
# single-file decoration order exactly, whatever the module interleaving
assert set(QUERIES) == set(REGISTRATION_ORDER), (
    sorted(set(QUERIES) ^ set(REGISTRATION_ORDER))
)
for _mapping in (QUERIES, ORACLES):
    _snap = dict(_mapping)
    _mapping.clear()
    for _n in REGISTRATION_ORDER:
        if _n in _snap:
            _mapping[_n] = _snap[_n]


# ---------------------------------------------------------------------------
# Driver gate ordering (round 7 — rotation maintenance)
# ---------------------------------------------------------------------------
# The driver's correctness gate checks the FIRST 50 entries of the
# ``queries()`` dict.  Round 6 closed the rotation: all 247 then-registered
# queries are driver-verified and every query's LATEST driver check is green
# (fold CORRECTNESS_r01..r06 latest-wins).  Round-7 policy (per the r6 plan):
# window (a) anything NEW or semantically CHANGED this round, then (b) the
# stalest greens.  (a) = `xlingual_margin` (new: top-k margin miner),
# `maximal_matching` (upgraded invariant → value-level oracle),
# `xlingual_mining` (oracle re-frozen + 9-dp dot rounding in sketch()).
# (b) = the 47 queries whose latest check is round 2 — five rounds of shared
# scan-stage code movement ago — in registration order.  3 + 47 = 50 exactly.
# The full-suite backstop is ORACLE_FULL_r7.json (tools/check_oracle.py over
# all registered queries at the benched commit).
GATE_PRIORITY: list[str] = [
    "xlingual_margin",
    "maximal_matching",
    "xlingual_mining",
    "in_degrees",
    "adjacency",
    "triplets",
    "degree_topk",
    "triangle_count",
    "jaccard",
    "overlap",
    "jaccard_suppliers",
    "datalog_non_adjacent",
    "datalog_triangles",
    "connected_components",
    "connected_components_pregel",
    "bfs",
    "aggregate_messages",
    "label_propagation",
    "wl_kernel",
    "shortest_paths",
    "katz",
    "doc_fingerprints",
    "ngram_jaccard",
    "dedup_minhash",
    "dedup_embedding",
    "dedup_simhash",
    "text_stats",
    "ann_topk",
    "doc_tokenize_fingerprint",
    "ann_topk_lsh",
    "ann_topk_ivf",
    "session_stats",
    "session_window_stats",
    "tumbling_windows",
    "events_json",
    "multimodal_decode_pgm",
    "pagerank",
    "pricing_summary",
    "revenue_rollup",
    "top_customers_per_nation",
    "strongly_connected_components",
    "graph_summary",
    "bipartite_projection",
    "containment",
    "weighted_shortest_paths",
    "clustering_coefficient",
    "dedup_clusters",
    "value_percentiles",
    "personalized_pagerank",
    "motif_find",
]

# Queries consuming a shared per-application cached artifact, keyed by
# family (the cache that binds them). The artifact's build cost lands on
# whichever member a suite pass runs FIRST, so per-member timings are
# attribution noise across gate-order changes while the family subtotal is
# conserved — bench.py reports these subtotals (round-6 verdict item 6).
# Kept adjacent to the caches; tests/test_round7_fixes assertions are not
# needed because bench.py imports this mapping directly.
SHARED_FAMILIES: dict[str, list[str]] = {
    "ngram_pairs": ["ngram_jaccard", "dedup_rate_curve"],
    "landmark_sp": [
        "closeness_centrality",
        "harmonic_centrality",
        "eccentricity",
    ],
    "cdc_clusters": [
        "cdc_dedup_clusters",
        "leakage_safe_split",
        "dedup_keep_policy",
        "dedup_cluster_sizes",
    ],
    "supplier_matching": [
        "maximal_matching",
        "graph_coarsen",
        "coarsen_two_level",
        "multilevel_partition",
        "partition_refine",
    ],
}

def clear_shared_caches() -> None:
    """Unpersist and drop every per-application shared artifact cache
    (_NGRAM_PAIRS_CACHE, _SP_CACHE, _CDC_CACHE, _MATCHING_CACHE,
    _PARTITION_CACHE). Within one suite pass the sharing is intentional
    (the r2 verdict adjudicated suite-level reuse as fair); between
    bench passes it must be reset so a min-of-passes number measures the
    query, not a cache scan."""
    for cache in (
        _NGRAM_PAIRS_CACHE,
        _SP_CACHE,
        _CDC_CACHE,
        _MATCHING_CACHE,
        _PARTITION_CACHE,
    ):
        for key in list(cache):
            df = cache.pop(key)
            try:
                df.unpersist()
            except Exception:
                pass  # session already stopped: nothing pinned

def _reorder_gate() -> None:
    """Rebuild QUERIES/ORACLES so GATE_PRIORITY comes first (driver window),
    then every remaining query in original registration order."""
    ordered = [n for n in GATE_PRIORITY if n in QUERIES]
    ordered += [n for n in QUERIES if n not in set(ordered)]
    for mapping in (QUERIES, ORACLES):
        snapshot = dict(mapping)
        mapping.clear()
        for name in ordered:
            if name in snapshot:
                mapping[name] = snapshot[name]


_reorder_gate()
