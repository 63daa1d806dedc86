#!/usr/bin/env python
"""Interleaved same-session-shape A/B for round 12 (verdict items 3/4):
time named queries at one git tree per invocation — the driver shell
alternates invocations between the round-11-close worktree (before) and
HEAD (after) in A-B-B-A order so host drift cancels.

Usage: python tools/ab_r12.py <tag> <out.jsonl> <query> [query ...]
Runs each named query builder + noop sink once (cold shared caches),
appends one JSON line {tag, query, sec, jobs} per query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag, out_path = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    from pyspark_graph_spark.queries import QUERIES
    from pyspark_graph_spark.session import get_spark

    spark = get_spark("ab_r12")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    warm = spark.read.parquet(f"{SF_DIR}/region.parquet")
    warm.join(warm.select("r_regionkey"), "r_regionkey").groupBy(
        "r_name"
    ).count().collect()
    tracker = spark.sparkContext.statusTracker()
    with open(out_path, "a") as fh:
        for name in names:
            sc = spark.sparkContext
            sc.setJobGroup(name, f"ab:{name}")
            t0 = time.time()
            df = QUERIES[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            sc.setJobGroup(None, None)
            jobs = len(tracker.getJobIdsForGroup(name))
            rec = {"tag": tag, "query": name, "sec": round(wall, 3), "jobs": jobs}
            fh.write(json.dumps(rec) + "\n")
            print(f"# {tag} {name}: {wall:.2f}s jobs={jobs}")


if __name__ == "__main__":
    main()
