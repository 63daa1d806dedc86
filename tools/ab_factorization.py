#!/usr/bin/env python
"""Real-sf1 A/B: block vs deflated rank-k SVD (r10 verdict #3 claim).

The block operator's pitch is that all k factors ride the SAME two
shuffles per iteration, while implicit deflation pays O(k * iterations)
shuffle rounds and an O(k^2)-branch matvec plan. This measures that
claim where it matters — the real-sf1 interaction matrix (6M lineitems
-> ~4.3M customer x part COO entries, heavy-tailed) — with the same
protocol as tools/ab_frontpaths.py: INTERLEAVED same-session passes
(block, deflated, block, deflated) so JVM/IO warmup lands on pass 1 of
each arm, min-of-two per arm, plus the per-factor sigma estimates from
both arms (different trajectories at finite iterations — block iterates
a subspace, deflation converges factor j before j+1 — so sigmas agree
approximately, not bit-exactly; both estimate the same true spectrum).

Usage:
    python tools/ab_factorization.py [k] [iterations] [gram_mode]

gram_mode (default "expr") applies to the BLOCK arm only. To
reproduce the k=16 driver-Gram row (SCALE.md round 11) — where the
deflated arm would take minutes — set SPARK_GRAFT_AB_BLOCK_ONLY=1 to
run just the block arm:
    SPARK_GRAFT_AB_BLOCK_ONLY=1 python tools/ab_factorization.py 16 2 driver
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = os.environ.get("SPARK_GRAFT_AB_DIR", "/root/repo/testdata_sf1_real")


def main() -> None:
    from pyspark.sql import functions as F

    from pyspark_graph_spark.operators.svd import (
        block_power_iteration_svd,
        deflated_power_iteration_svd,
    )
    from pyspark_graph_spark.session import get_spark
    from pyspark_graph_spark.sources.tables import load_table

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    iterations = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    gram_mode = sys.argv[3] if len(sys.argv) > 3 else "expr"
    spark = get_spark("ab-factorization")
    spark.sparkContext.setLogLevel("ERROR")

    li = load_table(spark, SF1, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    o = load_table(spark, SF1, "orders").select("o_orderkey", "o_custkey")
    inter = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.col("o_custkey").alias("custkey"),
            F.col("l_partkey").alias("partkey"),
        )
        .agg(F.sum("l_quantity").cast("double").alias("qty"))
        .localCheckpoint()
    )
    print(f"interactions: {inter.count():,} nnz  (k={k}, iters={iterations})")

    def run(which: str) -> tuple[float, list[float]]:
        fn = (
            block_power_iteration_svd
            if which == "block"
            else deflated_power_iteration_svd
        )
        kw = {"gram_mode": gram_mode} if which == "block" else {}
        t0 = time.time()
        _, v = fn(inter, "custkey", "partkey", "qty", k=k,
                  iterations=iterations, **kw)
        sig = [
            r["sigma"]
            for r in v.select("factor", "sigma")
            .distinct()
            .orderBy("factor")
            .collect()
        ]
        return time.time() - t0, sig

    arms = (
        ("block",)
        if os.environ.get("SPARK_GRAFT_AB_BLOCK_ONLY")
        else ("block", "deflated")
    )
    walls: dict[str, list[float]] = {arm: [] for arm in arms}
    sigmas: dict[str, list[float]] = {}
    for p in range(2):
        for arm in arms:
            w, sig = run(arm)
            walls[arm].append(w)
            sigmas[arm] = sig
            print(f"pass{p + 1} {arm:>8}: {w:6.1f}s  sigmas="
                  f"{[round(s, 1) for s in sig]}", flush=True)
    b = min(walls["block"])
    if "deflated" in walls:
        d = min(walls["deflated"])
        print(f"min-of-two: block {b:.1f}s  deflated {d:.1f}s  "
              f"(block/deflated = {b / d:.2f}x)")
    else:
        print(f"min-of-two: block {b:.1f}s")


if __name__ == "__main__":
    main()
