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
# Driver gate ordering (round 8 — policy now GENERATED, tools/rotate_gate.py)
# ---------------------------------------------------------------------------
# The driver's correctness gate checks the FIRST 50 entries of the
# ``queries()`` dict.  Standing policy since round 6, now derived
# mechanically by tools/rotate_gate.py (tests/test_gate_rotation.py pins
# GATE_PRIORITY to its output): (a) everything NEW or semantically CHANGED
# this round — declared below in ROUND_CHANGED — then (b) the stalest
# latest-wins driver-green queries (fold of the committed
# CORRECTNESS_r*.json artifacts), registration order within a round.
# Round 9's changed set: ppr_multi (new: batched multi-source
# personalized PageRank — the reference README matrix's one remaining
# unsupported row, sparse (id, source) state, 3-iteration unrolled SQL
# oracle), triad_census_estimate (new: deterministic md5 vertex
# sparsifier, exact census on the induced subgraph, 1/p^3 scaling —
# the wedge-budget guard's registered scale path),
# svd_factorization (new: rank-1 truncated SVD by alternating power
# iteration, the SVDPlusPlus matrix row's factorization core),
# triad_census / triad_census_rmat (plan changed twice: middle-vertex
# extraction via sort_array instead of sum-minus-extremes — the sum
# overflowed int64 under ANSI mode on xxhash64 ids — C(n,3) in exact
# integer DIV arithmetic, the O(E) wedge-budget guard, and the
# multiplicity-fold that removed the wedge-table distinct, 3.6x),
# sorted_neighborhood / dedup_edit_verify (bucket_chars 1 -> 4 — the
# r8 verdict's one `weak` item — plus the ASCII-safe cross-engine
# normalizer), and the AlternatingCC bounded-batch union-find
# front-path (provably identical min-id labels, pinned by test) whose
# consumers — mst_forest (1.9x), connected_components, percolation,
# the dedup-cluster family, bipartite_*, bowtie_structure — are all
# fronted below.
# (b) = the stalest greens (r03-era rows).
# The full-suite backstop is ORACLE_FULL_r9.json.
ROUND_CHANGED: list[str] = [
    "ppr_multi",
    "triad_census_estimate",
    "svd_factorization",
    "triad_census",
    "triad_census_rmat",
    "sorted_neighborhood",
    "dedup_edit_verify",
    # plans moved (bounded-batch union-find front-path in
    # AlternatingCC / Boruvka contraction), values provably identical
    "mst_forest",
    "connected_components",
    "percolation",
    "dedup_clusters",
    "cdc_dedup_clusters",
    "leakage_safe_split",
    "dedup_keep_policy",
    "dedup_cluster_sizes",
    "bipartite_check",
    "bipartite_projection",
    "bowtie_structure",
    # plan moved (Arrow-batch Tarjan front-path in SCC), identical labels
    "scc",
    "strongly_connected_components",
    "graph_evolution",
    # plan moved (Arrow temporal-Dijkstra under the bound), unique fixpoint
    "temporal_reachability",
]

GATE_PRIORITY: list[str] = [
    "ppr_multi",
    "triad_census_estimate",
    "svd_factorization",
    "triad_census",
    "triad_census_rmat",
    "sorted_neighborhood",
    "dedup_edit_verify",
    "mst_forest",
    "connected_components",
    "percolation",
    "dedup_clusters",
    "cdc_dedup_clusters",
    "leakage_safe_split",
    "dedup_keep_policy",
    "dedup_cluster_sizes",
    "bipartite_check",
    "bipartite_projection",
    "bowtie_structure",
    "scc",
    "strongly_connected_components",
    "graph_evolution",
    "temporal_reachability",
    "kmv_sketch",
    "transitivity",
    "embedding_quantize",
    "weighted_pagerank",
    "bpe_merges",
    "bpe_tokenize",
    "mixture_plan",
    "funnel",
    "retention_cohorts",
    "zorder_key",
    "rmat_graph",
    "cms_frequencies",
    "walk_pmi",
    "pq_codes",
    "pq_adc_topk",
    "histogram_quantiles",
    "multimodal_decode_png",
    "reciprocity",
    "two_hop_counts",
    "multimodal_decode_wav",
    "multimodal_frames",
    "repetition_pii",
    "pmi_pairs",
    "char_entropy",
    "induced_subgraph",
    "skew_report",
    "sliding_windows",
    "knn_classifier",
]

# Queries consuming a shared per-application cached artifact, keyed by
# family (the cache that binds them). The artifact's build cost lands on
# whichever member a suite pass runs FIRST, so per-member timings are
# attribution noise across gate-order changes while the family subtotal is
# conserved — bench.py reports these subtotals (round-6 verdict item 6).
# Kept adjacent to the caches; tests/test_round7_fixes assertions are not
# needed because bench.py imports this mapping directly.
SHARED_FAMILIES: dict[str, list[str]] = {
    "ngram_pairs": ["ngram_jaccard", "dedup_rate_curve", "lsh_band_tuning"],
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
    # the shared co-occurrence GRAPH build (~8 s at sf0.1) lands on the
    # first consumer per pass (round 9, _COOC_CACHE); members overlap
    # with supplier_matching — families are attribution views, not a
    # partition of the suite
    "supplier_cooc": [
        "aggregate_messages", "attribute_assortativity",
        "coarsen_two_level", "community_conductance",
        "datalog_triangles", "degree_assortativity", "degree_ccdf",
        "degree_centralization", "degree_topk", "degrees", "edge_cut",
        "feature_propagation", "four_cycles", "four_cycles_estimate",
        "graph_coarsen", "graph_summary", "jaccard_suppliers",
        "label_propagation", "louvain", "maximal_independent_set",
        "maximal_matching", "modularity", "mst_forest",
        "multilevel_partition", "partition_refine", "rich_club",
        "transitivity", "triangle_count", "triangle_estimate",
        "vertex_annotation",
    ],
    # same for the customer-supplier bipartite graph (_CSG_CACHE);
    # landmark_sp members also draw on it through their own family
    "customer_supplier": [
        "approx_closeness", "betweenness", "bfs", "bipartite_check",
        "bipartite_projection", "connected_components",
        "connected_components_pregel", "datalog_non_adjacent",
        "effective_diameter", "hits", "in_degrees", "induced_subgraph",
        "kcore", "motif_find", "neighbor_sample",
        "neighborhood_function", "out_degrees", "percolation",
        "powerlaw_fit", "random_walks", "shortest_paths", "walk_pmi",
    ],
}

def clear_shared_caches() -> None:
    """Unpersist and drop every per-application shared artifact cache
    (_NGRAM_PAIRS_CACHE, _SP_CACHE, _CDC_CACHE, _MATCHING_CACHE,
    _PARTITION_CACHE, _COOC_CACHE). Within one suite pass the sharing is
    intentional (the r2 verdict adjudicated suite-level reuse as fair);
    between bench passes it must be reset so a min-of-passes number
    measures the query, not a cache scan."""
    for cache in (
        _NGRAM_PAIRS_CACHE,
        _SP_CACHE,
        _CDC_CACHE,
        _MATCHING_CACHE,
        _PARTITION_CACHE,
        _COOC_CACHE,
        _CSG_CACHE,
    ):
        for key in list(cache):
            val = cache.pop(key)
            # _COOC_CACHE holds a Graph (two persisted frames), the rest
            # hold a single DataFrame
            frames = (
                (val.vertices, val.edges)
                if hasattr(val, "edges")
                else (val,)
            )
            for df in frames:
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
