#!/usr/bin/env python
"""Plan-contract audit: explain every registered query and flag
scale-killer physical-plan shapes.

Flags:
- CartesianProduct          — any non-broadcast cross product
- BroadcastNestedLoopJoin   — allowed only when one side is a 1-row
                              aggregate (the broadcast-singleton idiom
                              used for global stats); flagged otherwise
- BatchEvalPython           — row-at-a-time Python UDF in the plan
                              (Arrow-batched ArrowEvalPython / MapInPandas
                              / FlatMapGroupsInPandas are fine)
- GlobalWindow              — a WindowExec with an EMPTY partition spec
                              moves ALL its input to one partition; allowed
                              only over aggregate-sized/limit-bounded input
                              (adjudicated per query, like BNLJ)

Usage: python tools/plan_audit.py [query ...]   (default: all)
Exit 1 if any query trips a flag. Writes PLAN_AUDIT.md next to the repo
root with one row per query for the record.
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_AUDIT_SF_DIR", "/root/testdata/sf0.001")

# BroadcastNestedLoopJoin is legitimate only when the build side is a tiny
# global aggregate (our broadcast-singleton idiom): the subtree under the
# IdentityBroadcastMode exchange must be an aggregate with NO grouping keys
# (1 row by construction).  Merely counting IdentityBroadcastMode exchanges
# is vacuous — every BNLJ build side is one — so we walk the explain tree.
_NODE_MARKER = re.compile(r"[:+]- ")
_AGG_NODE = re.compile(r"\b(Hash|Sort|ObjectHash)Aggregate\(keys=\[(.*?)\]")

# Queries whose BNLJ broadcast side is bounded by CONSTRUCTION but not by
# SYNTAX — a keyed aggregate over a bounded-cardinality key (k centroids,
# per-subspace PQ codebooks, one bloom bitmap per source) or a size-aware
# strategy selector that only picks the broadcast path for small inputs
# (similarity.py auto-selection at the sf0.001 audit scale).  These are
# adjudicated, not silently passed: PLAN_AUDIT.md prints the reason.
# Each entry is (max_syntax_unbounded_exchanges, reason): adjudication is
# per-EXCHANGE, not per-query — if a future regression introduces MORE
# unbounded broadcast exchanges than the adjudicated count, the query is
# hard-flagged again rather than silently riding its old adjudication.
ADJUDICATED_BOUNDED: dict[str, tuple[int, str]] = {
    "jaccard": (1, "size-aware strategy: broadcast path only below "
    "similarity.py BROADCAST_THRESHOLD; bucketed join at scale"),
    "overlap": (1, "size-aware strategy (similarity.py auto-selection)"),
    "jaccard_suppliers": (1, "size-aware strategy (similarity.py)"),
    "containment": (2, "size-aware strategy (similarity.py); the fwd/rev "
    "union consumes the pair subtree twice, duplicating its broadcast"),
    "dedup_embedding": (1, "broadcast = LSH-bucketed candidate centroids, "
    "bounded by n_planes"),
    "ann_topk": (1, "broadcast = the k query points, bounded by k"),
    "ann_topk_ivf": (2, "broadcast = nlist IVF centroids + query points"),
    "ann_recall": (2, "broadcast = the 10 query points, once per ranking "
    "path (float truth + int8 candidate)"),
    "kmeans": (3, "broadcast = k centroids per Lloyd round (n_iter=3)"),
    "kmeans_purity": (3, "broadcast = k centroids per Lloyd round (n_iter=3)"),
    "knn_classifier": (1, "broadcast = k centroids (feature pipeline)"),
    "pq_codes": (8, "broadcast = m sub-codebooks of 2^nbits rows each, "
    "per subspace x Lloyd round (m=4 x n_iter=2)"),
    "pq_adc_topk": (16, "broadcast = per-query ADC lookup tables, m*2^nbits "
    "rows, per subspace x round during codebook training"),
    "kcenter_select": (18, "broadcast = <=k chosen centers, one exchange per "
    "greedy round and distance update"),
    "semdedup": (2, "broadcast = k cluster centroids per Lloyd round "
    "(n_iter=2)"),
    "rich_club": (3, "broadcast = degree-threshold rows (bounded by distinct "
    "thresholds), one exchange per club statistic"),
    "bloom_membership": (1, "broadcast = one bitmap row per source "
    "(collect_set keyed by the low-cardinality source dim; 20 sources "
    "in this corpus)"),
}


# Runtime row-count assertions for the k-bounded adjudications (round-4
# verdict item 6): the adjudication stops being prose — plan_audit EXECUTES
# these queries at the audit SF and asserts every IdentityBroadcastMode
# exchange's observed numOutputRows stays within the documented bound.
# Bounds are the hyperparameter formulas from each query's docstring, with
# 2x headroom where the formula has a data-dependent term at audit scale.
BROADCAST_ROW_BOUNDS: dict[str, int] = {
    "kmeans": 8,            # k=8 centroids
    "kmeans_purity": 8,     # k=8 centroids
    "knn_classifier": 64,   # k centroids + probe points (both tiny)
    "pq_codes": 64,         # m=4 sub-codebooks x 2^4 codes
    "pq_adc_topk": 1024,    # per-query ADC LUTs: n_queries * m * 16
    "kcenter_select": 8,    # <=k=4 greedy centers (+1 working row)
    "semdedup": 8,          # k=8 cluster centroids
    "rich_club": 128,       # distinct degree thresholds of a 10-60k graph
    "bloom_membership": 32,  # one bitmap row per source (20 sources here)
    "ann_topk": 64,         # the k query points
    "ann_topk_ivf": 64,     # nlist=16 IVF centroids + query points
    "ann_recall": 64,       # the 10 query points (both ranking paths)
}


# A WindowExec with no partition spec funnels its entire input through ONE
# partition — a scale-killer when the input is corpus-sized.  It is fine
# (and idiomatic) when the window's input is bounded by construction: a
# distinct-value histogram (degrees, event days, Kaplan-Meier time points),
# a TakeOrdered top-k slice, or a per-bucket offset table.  Same contract
# as ADJUDICATED_BOUNDED: (max_global_windows, reason), per-NODE counted,
# so a regression that adds MORE global windows than adjudicated re-flags.
GLOBAL_WINDOW_BOUNDED: dict[str, tuple[int, str]] = {
    "sorted_neighborhood": (2, "per-bucket offset tables (|buckets| rows, "
    "already broadcast by the same bound) for the fwd + reversed-key "
    "passes (dedup/blocking.py _global_rank)"),
    "dedup_edit_verify": (2, "the same per-bucket offset table "
    "(|buckets| rows, broadcast) — the _global_rank subtree appears "
    "twice because the ranked frame feeds both sides of the "
    "window-gap self-join (dedup/blocking.py)"),
    "survival_curve": (2, "Kaplan-Meier at-risk + product windows run on "
    "the distinct-event-time aggregate, bounded by time resolution "
    "(functions/stats.py)"),
    "changepoint": (1, "CUSUM over the daily aggregate series — bounded "
    "by days in the observation window"),
    "seasonal_decompose": (1, "centered moving average over the daily "
    "series — days-bounded"),
    "seasonality_strength": (1, "same daily-series moving average"),
    "kmeans": (1, "seed-centroid rank over a TakeOrdered limit(k) slice"),
    "kmeans_purity": (1, "seed-centroid rank over limit(k)"),
    "semdedup": (1, "seed-centroid rank over limit(k)"),
    "pq_codes": (4, "per-subspace (m=4) codebook seed ranks, each over a "
    "limit(2^nbits) slice"),
    "pq_adc_topk": (8, "per-subspace seed ranks x train+search consumer "
    "paths, each limit(2^nbits)-bounded"),
    "skew_report": (1, "rank over the TakeOrdered top-k slice "
    "(functions/mixture.py skew_report)"),
    "histogram_quantiles": (3, "cumulative sums over the |bins| "
    "histogram aggregate"),
    "vocab_coverage": (3, "rank over the TakeOrdered top-max(ks) slice, "
    "one window node per requested-k union branch (fixed this round: "
    "previously ranked the full vocabulary)"),
    "degree_ccdf": (1, "running sum over the distinct-degree histogram, "
    "bounded by max degree"),
    "heaps_law": (3, "per-bucket offset rank (|buckets| rows) + "
    "cumulative windows over the 10-row prefix-bucket table"),
    "token_zipf_fit": (1, "rank over the TakeOrdered top-500 slice"),
    "skyline_parts": (1, "running min over the batch-prefiltered Pareto "
    "survivor set (operators/skyline.py)"),
}

_WINDOW_EXEC_CLASSES = {
    "WindowExec",
    "WindowInPandasExec",
    "WindowGroupLimitExec",
}


def count_global_windows(qe) -> int:
    """Number of Window physical nodes with an empty partition spec in
    the (pre-AQE) selected physical plan."""
    n = 0
    for node, cls in _walk_exec(qe.sparkPlan()):
        if cls in _WINDOW_EXEC_CLASSES and node.partitionSpec().isEmpty():
            n += 1
    return n


def _walk_exec(node):
    """Yield every node of an executed SparkPlan, descending through AQE
    wrappers, query stages, and reused exchanges."""
    cls = node.getClass().getSimpleName()
    yield node, cls
    if cls == "AdaptiveSparkPlanExec":
        yield from _walk_exec(node.executedPlan())
        return
    if "QueryStageExec" in cls:
        yield from _walk_exec(node.plan())
        return
    if cls == "ReusedExchangeExec":
        yield from _walk_exec(node.child())
        return
    ch = node.children()
    for i in range(ch.size()):
        yield from _walk_exec(ch.apply(i))


def observed_broadcast_rows(df) -> list[int]:
    """Execute df's physical plan (same plan OBJECT, so runtime metrics
    attach) and return numOutputRows for every IdentityBroadcastMode
    exchange — the BNLJ build sides the adjudications make claims about."""
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan()
    plan.execute().count()
    rows = []
    for node, cls in _walk_exec(qe.executedPlan()):
        if cls != "BroadcastExchangeExec":
            continue
        if "IdentityBroadcastMode" not in str(node.mode()):
            continue
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() == "numOutputRows":
                rows.append(int(kv._2().value()))
    return rows


def _node_depth(line: str) -> int:
    """Column of the tree marker (':-'/'+-'); -1 for the root line."""
    m = _NODE_MARKER.search(line)
    return m.start() if m else -1


def _bounded_subtree(lines: list[str], i: int) -> bool:
    """True iff the subtree under lines[i] is bounded by syntax: a global
    (no-grouping-keys) aggregate, an explicit limit, or literal local data
    before any keyed aggregate / unbounded scan."""
    d = _node_depth(lines[i])
    for line in lines[i + 1 :]:
        nd = _node_depth(line)
        if nd <= d:  # left the subtree
            break
        m = _AGG_NODE.search(line)
        if m:
            return m.group(2).strip() == ""
        if "GlobalLimit" in line or "LocalTableScan" in line:
            return True
        # Reused broadcast of an exchange validated elsewhere
        if "ReusedExchange" in line:
            return True
    return False


def audit_plan(plan: str, query: str | None = None) -> list[str]:
    flags: list[str] = []
    if "CartesianProduct" in plan:
        flags.append("CartesianProduct")
    if "BatchEvalPython" in plan:
        flags.append("BatchEvalPython(row-at-a-time UDF)")
    if "BroadcastNestedLoopJoin" in plan:
        lines = plan.splitlines()
        bad = 0
        for i, line in enumerate(lines):
            if "BroadcastExchange IdentityBroadcastMode" in line:
                if not _bounded_subtree(lines, i):
                    bad += 1
        if bad:
            adjudicated = ADJUDICATED_BOUNDED.get(query)
            if adjudicated is not None and bad <= adjudicated[0]:
                flags.append(
                    f"bounded-by-construction (x{bad}<=x{adjudicated[0]}): "
                    f"{adjudicated[1]}"
                )
            elif adjudicated is not None:
                flags.append(
                    f"BroadcastNestedLoopJoin(non-singleton x{bad} EXCEEDS "
                    f"adjudicated x{adjudicated[0]})"
                )
            else:
                flags.append(
                    f"BroadcastNestedLoopJoin(non-singleton x{bad})"
                )
    return flags


def main() -> None:
    from pyspark_graph_spark.queries import QUERIES
    from pyspark_graph_spark.session import get_spark

    names = sys.argv[1:] or list(QUERIES)
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    bad = 0
    for name in names:
        t0 = time.time()
        try:
            df = QUERIES[name](spark, SF_DIR)
            qe = df._jdf.queryExecution()
            plan = qe.explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "simple"
                )
            )
            flags = audit_plan(plan, query=name)
            gw = count_global_windows(qe)
            if gw:
                adjudicated = GLOBAL_WINDOW_BOUNDED.get(name)
                if adjudicated is not None and gw <= adjudicated[0]:
                    flags.append(
                        f"global-window-bounded (x{gw}<=x{adjudicated[0]}): "
                        f"{adjudicated[1]}"
                    )
                elif adjudicated is not None:
                    flags.append(
                        f"GlobalWindow(single-partition x{gw} EXCEEDS "
                        f"adjudicated x{adjudicated[0]})"
                    )
                else:
                    flags.append(f"GlobalWindow(single-partition x{gw})")
        except Exception as e:  # noqa: BLE001 - report, keep auditing
            flags = [f"EXPLAIN-ERROR: {e}"]
        if name in BROADCAST_ROW_BOUNDS and not any(
            f.startswith("EXPLAIN-ERROR") for f in flags
        ):
            bound = BROADCAST_ROW_BOUNDS[name]
            try:
                observed = observed_broadcast_rows(QUERIES[name](spark, SF_DIR))
            except Exception as e:  # noqa: BLE001
                flags.append(f"BOUND-CHECK-ERROR: {e}")
            else:
                over = [r for r in observed if r > bound]
                if over:
                    flags.append(
                        f"BroadcastRowsExceedBound({max(over)}>{bound})"
                    )
                else:
                    flags.append(
                        "bounded-verified "
                        f"(max {max(observed, default=0)}<={bound} rows)"
                    )
        status = "; ".join(flags) if flags else "clean"
        hard = [
            f
            for f in flags
            if not f.startswith(
                (
                    "bounded-by-construction",
                    "bounded-verified",
                    "global-window-bounded",
                )
            )
        ]
        if hard:
            bad += 1
        if flags:
            print(f"  {name}: {status}", flush=True)
        rows.append((name, status, round(time.time() - t0, 2)))

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PLAN_AUDIT.md",
    )
    with open(out, "w") as fh:
        fh.write(
            "# PLAN_AUDIT — physical-plan contract per registered query\n\n"
            f"Audited {len(rows)} queries at {SF_DIR} "
            "(`python tools/plan_audit.py`). Flags: CartesianProduct, "
            "row-at-a-time BatchEvalPython, non-singleton "
            "BroadcastNestedLoopJoin, single-partition GlobalWindow.\n\n"
            "A `bounded-by-construction` row is a BroadcastNestedLoopJoin "
            "whose build side is bounded by model hyperparameters or a "
            "size-aware strategy selector rather than plan syntax — "
            "adjudicated in tools/plan_audit.py ADJUDICATED_BOUNDED, not "
            "silently passed. A `global-window-bounded` row is a "
            "no-partition-spec Window whose input is aggregate-sized or "
            "limit-bounded by construction (distinct-value histograms, "
            "top-k slices, per-bucket offset tables) — adjudicated in "
            "GLOBAL_WINDOW_BOUNDED with the same per-node count contract.\n\n"
            "| query | plan contract |\n|---|---|\n"
        )
        for name, status, _ in rows:
            fh.write(f"| {name} | {status} |\n")
    print(f"\n{len(rows) - bad}/{len(rows)} plans without hard flags -> {out}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
