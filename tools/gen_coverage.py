#!/usr/bin/env python
"""Generate COVERAGE.md from the query registry — drift impossible.

COVERAGE.md accreted by hand for six rounds and drifted twice (r6: stale
oracle description; r7: stale "188 queries" totals against 248 registered).
This tool derives the whole file from ``pyspark_graph_spark.queries``
metadata: the SURVEY §2 mapping is data (asserted against the registry, so
a renamed/removed query breaks generation), and the full query inventory —
name, defining module:line, oracle kind, one-line description — is read
straight off the registered callables. ``tests/test_coverage_generated.py``
pins the committed file to this tool's output the same way README's test
counts are pinned.

Usage:
    python tools/gen_coverage.py            # rewrite COVERAGE.md
    python tools/gen_coverage.py --check    # exit 1 if COVERAGE.md is stale
"""

from __future__ import annotations

import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "COVERAGE.md")

# SURVEY.md §2 reference-capability mapping: (section, capability, module,
# gate queries, test anchors). Maintained as DATA — every query name is
# asserted registered + oracled, so this table cannot silently rot.
SURVEY_S2 = [
    ("2.1", "Graph construction + deterministic indexing (xxhash64, zero-shuffle)",
     "graph.py", ["degrees"], "test_graph.py (all graph queries build on it)"),
    ("2.2", "Adjacency (undirected union arity fixed, sorted)",
     "graph.py", ["adjacency"], "test_graph.py"),
    ("2.3", "Degrees in/out/undirected",
     "graph.py", ["degrees", "out_degrees", "in_degrees", "degree_topk"],
     "test_graph.py"),
    ("2.4", "Triplets", "graph.py", ["triplets"], "test_graph.py"),
    ("2.5", "with_vertex_column", "graph.py", ["vertex_annotation"],
     "test_graph.py"),
    ("2.6", "multiple_join", "util.py",
     ["datalog_non_adjacent", "datalog_triangles"], "test_util.py"),
    ("2.7", "multiple_union (by name)", "util.py", ["party_union"],
     "test_util.py"),
    ("2.8", "match_structure motifs + order_edges canonicalization",
     "util.py", ["triangle_count", "motif_find"], "test_util.py, test_motif.py"),
    ("2.9", "AggregateMessages (reference unimportable; correct reimpl)",
     "operators/aggregate_messages.py", ["aggregate_messages"],
     "test_m2_iterative.py"),
    ("2.10", "Pregel BSP engine (checkpointed, frontier-pruned)",
     "operators/pregel.py", ["connected_components_pregel"],
     "test_m2_iterative.py, test_compat.py"),
    ("2.11", "BFS with path arrays", "operators/bfs.py", ["bfs"],
     "test_m2_iterative.py"),
    ("2.12", "ConnectedComponents (Pregel WCC) + Alternating (Kiveris O(log n))",
     "operators/connected_components.py",
     ["connected_components", "connected_components_pregel"],
     "test_property.py (vs union-find)"),
    ("2.13", "ShortestPaths landmarks (reference pseudocode → map-state Pregel)",
     "operators/shortest_paths.py", ["shortest_paths"],
     "test_property.py (vs BFS)"),
    ("2.14", "KatzIndex (reference broken → real Σβᵏᴬᵏ COO SpGEMM)",
     "operators/katz.py", ["katz"], "test_m3_analytics.py"),
    ("2.15", "LabelPropagation (deterministic ties)",
     "operators/label_propagation.py", ["label_propagation"],
     "test_m2_iterative.py"),
    ("2.16", "WLKernel (sorted multisets, pluggable hash)",
     "operators/wl_kernel.py", ["wl_kernel"], "test_m2_iterative.py"),
    ("2.17", "DatalogQuery (negation anti-join fixed; semi-naive recursion)",
     "datalog.py",
     ["datalog_non_adjacent", "datalog_triangles", "transitive_closure"],
     "test_m1_foundation.py, test_util.py"),
    ("2.18", "ne_null_safe", "util.py", [],
     "test_util.py (default Pregel comparison — exercised by every Pregel query)"),
    ("2.19", "TriangleCount (density-adaptive)",
     "operators/triangle_count.py", ["triangle_count"],
     "test_property.py (vs enumeration)"),
    ("2.1x", "JaccardSimilarity (size-aware strategy selection)",
     "operators/similarity.py", ["jaccard", "jaccard_suppliers"],
     "test_property.py (strategies agree)"),
    ("2.1x", "OverlapCoefficient", "operators/similarity.py", ["overlap"],
     "test_m1_foundation.py"),
]

RELATIONAL_PRIMS = """\
## Relational primitives (SURVEY.md §2 second table)

Scans (`sources/tables.py`, `sources/io.py` — parquet/CSV/JSON, schema-
mandatory), sinks (`io.py` — partitioned parquet, bucketed catalog tables
with shuffle-free reload proven in test_io.py; `streaming/sinks.py` —
transactional exactly-once file sinks), projection/filter/joins (every
flavor incl. anti for datalog negation and Pregel upsert, theta for BFS
frontier), unionByName, distinct, hash aggregation, window functions
(alternating CC min-over-window, sessionization lag+sum, top-k
row_number), sort/limit as TakeOrdered. All exercised across the query
inventory below.
"""


def _short_desc(fn) -> str:
    doc = inspect.getdoc(fn) or ""
    first = doc.split("\n\n", 1)[0].replace("\n", " ").strip()
    return first or "(no docstring)"


def _fn_site(fn) -> str:
    code = fn.__code__
    rel = os.path.relpath(code.co_filename, REPO)
    return f"{rel}:{code.co_firstlineno}"


def generate() -> str:
    from pyspark_graph_spark.queries import ORACLES, QUERIES
    from pyspark_graph_spark.queries._order import REGISTRATION_ORDER

    n = len(QUERIES)
    n_oracle = sum(1 for q in QUERIES if q in ORACLES)

    # the §2 mapping must reference only live, oracled queries
    for _, cap, _, qnames, _ in SURVEY_S2:
        for q in qnames:
            assert q in QUERIES, f"SURVEY_S2 row {cap!r}: unknown query {q!r}"
            assert q in ORACLES, f"SURVEY_S2 row {cap!r}: {q!r} has no oracle"

    lines: list[str] = []
    w = lines.append
    w("# COVERAGE — SURVEY.md §2 operator inventory → implementation map")
    w("")
    w("**GENERATED by `tools/gen_coverage.py` — edit the tool, not this file**")
    w("(`tests/test_coverage_generated.py` pins the two to be identical).")
    w("")
    w(f"Gate totals, derived live from the registry: **{n} queries "
      f"registered, {n_oracle} with exact DuckDB oracles** "
      f"({n - n_oracle} rows-only). \"oracle\" = DuckDB hash-match at "
      "sf0.01 via `__spark_entry__.oracle_sql()` — row count, column "
      "names, dtypes, and order-insensitive value multisets "
      "(`tools/check_oracle.py` is the local mirror of the driver's gate). "
      "The reference-compatible import surface (`pyspark_graph/`) exposes "
      "all of §2 under the reference's own module paths and signatures "
      "(`tests/test_compat.py`).")
    w("")
    w("## SURVEY.md §2 reference capabilities")
    w("")
    w("| § | Capability | Module | Gate queries (all exact-oracle) | Tests |")
    w("|---|---|---|---|---|")
    for sec, cap, mod, qnames, tests in SURVEY_S2:
        qcell = ", ".join(f"`{q}`" for q in qnames) or "—"
        w(f"| {sec} | {cap} | `{mod}` | {qcell} | {tests} |")
    w("")
    w(RELATIONAL_PRIMS)
    w("## Full query inventory (registration order)")
    w("")
    w("One row per registered gate query: the defining function, its")
    w("oracle kind, and the first line of its docstring. Everything beyond")
    w("§2 in here is engine extension surface (dedup / ANN / multimodal /")
    w("text-quality / streaming / partitioning / warehouse analytics),")
    w("graded first-class by the build brief.")
    w("")
    w("| # | Query | Defined at | Oracle | Description |")
    w("|---|---|---|---|---|")
    for i, name in enumerate(REGISTRATION_ORDER, 1):
        fn = QUERIES[name]
        kind = "exact SQL" if name in ORACLES else "rows-only"
        desc = _short_desc(fn).replace("|", "\\|")
        w(f"| {i} | `{name}` | `{_fn_site(fn)}` | {kind} | {desc} |")
    w("")
    w(f"Totals: {n} queries, {n_oracle} exact oracles, "
      f"{n - n_oracle} rows-only.")
    w("")
    return "\n".join(lines)


def main() -> int:
    text = generate()
    if "--check" in sys.argv:
        try:
            current = open(OUT).read()
        except OSError:
            current = ""
        if current != text:
            print("COVERAGE.md is stale — run: python tools/gen_coverage.py")
            return 1
        print("COVERAGE.md is current")
        return 0
    with open(OUT, "w") as fh:
        fh.write(text)
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
