#!/usr/bin/env python
"""Real-sf1 closure A/B for auto_extend (r10 verdict #5).

Round 10's real-sf1 temporal run hit the loud default-20 refusal and
had to RESTART from scratch at max_rounds=60 (SCALE.md round 10). The
auto_extend budget exists so that never happens again: state and
frontier are checkpointed per round, so the loop continues from where
it stopped with a doubled budget. This measures the closure on the
same graph and protocol (interleaved same-session passes, min-of-two,
identical-checksum assertion):

  arm A: max_rounds=60            (the manual round-10 setting)
  arm B: max_rounds=20, auto_extend=True   (what round 10 lacked)

Equal walls = the extension does work proportional to the rounds the
graph actually needs, not restart-shaped work; identical checksums =
the continuation is the same fixpoint.

Usage:
    python tools/ab_auto_extend.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = os.environ.get("SPARK_GRAFT_AB_DIR", "/root/repo/testdata_sf1_real")


def main() -> None:
    from pyspark.sql import functions as F

    from pyspark_graph_spark.operators.temporal import earliest_arrival
    from pyspark_graph_spark.session import get_spark
    from pyspark_graph_spark.sources.tables import load_table

    spark = get_spark("ab-auto-extend")
    spark.sparkContext.setLogLevel("ERROR")

    orders = load_table(spark, SF1, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = load_table(spark, SF1, "lineitem").select("l_orderkey", "l_suppkey")
    te = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("ts"),
        )
        .distinct()
    )
    sym = te.unionByName(
        te.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "ts")
    ).localCheckpoint()
    print(f"temporal: |E_sym|={sym.count():,}")
    seeds = spark.createDataFrame([(2, 0)], "id long, arrival long")

    def checksum(df):
        r = df.agg(
            F.bit_xor(F.xxhash64("id", "arrival")).alias("x"),
            F.count(F.lit(1)).alias("n"),
        ).first()
        return (r["x"], r["n"])

    walls: dict[str, list[float]] = {"manual60": [], "auto_extend": []}
    sums = set()
    for p in (1, 2):
        for arm in ("manual60", "auto_extend"):
            kw = (
                {"max_rounds": 60}
                if arm == "manual60"
                else {"max_rounds": 20, "auto_extend": True}
            )
            t0 = time.time()
            df = earliest_arrival(
                sym, seeds, "src", "dst", "ts", batch_finish=0, **kw
            )
            cs = checksum(df)
            dt = time.time() - t0
            walls[arm].append(dt)
            sums.add(cs)
            print(f"pass{p} {arm:>11}: {dt:6.1f} s  cs={cs}", flush=True)
    assert len(sums) == 1, f"outputs differ across arms: {sums}"
    a, b = min(walls["manual60"]), min(walls["auto_extend"])
    print(
        f"min-of-two: manual60 {a:.1f}s  auto_extend {b:.1f}s  "
        f"(auto/manual = {b / a:.2f}x, identical fixpoint)"
    )


if __name__ == "__main__":
    main()
