#!/usr/bin/env python
"""Real-sf1 bound-on/bound-off A/B for the round-9 batch front-paths
(r9 verdict #5): SCC (Arrow Tarjan), MST (whole-forest Kruskal /
contraction-tail union-find), temporal BFS (Arrow Dijkstra).

Matching/MIS got these rows in round 8/9; this closes the set. Protocol
matches SCALE.md's "Sequential-finish bounds verified at real-sf1":
same-session INTERLEAVED passes (on, off, on, off) so warmup lands on
pass 1 of each arm, identical-output assertion per pair, and a
full-bound Arrow-frame probe (pandas bytes + kernel wall at the exact
batch_finish row count) against the ~200 MB adjudication threshold.

Usage:
    SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE=128 \
        python tools/ab_frontpaths.py [scc mst temporal]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = os.environ.get("SPARK_GRAFT_AB_DIR", "/root/repo/testdata_sf1_real")


def _checksum(df, cols):
    from pyspark.sql import functions as F

    r = df.agg(
        F.bit_xor(F.xxhash64(*cols)).alias("x"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    return (r["x"], r["n"])


def run_scc(spark):
    from pyspark_graph_spark.operators.scc import StronglyConnectedComponents
    from pyspark_graph_spark.sources.tables import directed_trade_graph

    g = directed_trade_graph(spark, SF1)
    g = type(g)(
        g.vertices.localCheckpoint(),
        g.edges.localCheckpoint(),
        directed=True,
        indexed=True,
    )
    print(f"scc: |V|={g.vertices.count():,} |E|={g.edges.count():,}")
    out = []
    for pas in (1, 2):
        for bound in (1_000_000, 0):
            t0 = time.time()
            df = StronglyConnectedComponents(
                max_outer_iterations=20,
                max_flood_iterations=40,
                batch_finish=bound,
            ).run(g)
            cs = _checksum(df, ["id", "component"])
            dt = time.time() - t0
            out.append((pas, bound, dt, cs))
            print(f"scc pass={pas} bound={bound}: {dt:.1f} s cs={cs}")
    assert len({cs for (_, _, _, cs) in out}) == 1, "outputs differ!"
    return out


def run_mst(spark):
    from pyspark.sql import functions as F

    from pyspark_graph_spark.constants import DST, ID, SRC
    from pyspark_graph_spark.graph import Graph
    from pyspark_graph_spark.operators.mst import BoruvkaMST
    from pyspark_graph_spark.queries._shared import _supplier_cooc_graph

    g = _supplier_cooc_graph(spark, SF1)
    edges = (
        g.edges.select(
            F.col(SRC).cast("long").alias(SRC),
            F.col(DST).cast("long").alias(DST),
        )
        .withColumn("weight", (F.col(SRC) * 7 + F.col(DST) * 13) % 97 + 1)
        .localCheckpoint()
    )
    wg = Graph(
        g.vertices.select(F.col(ID).cast("long").alias(ID)).localCheckpoint(),
        edges,
        directed=False,
        indexed=True,
    )
    print(f"mst: |V|={wg.vertices.count():,} |E|={edges.count():,}")
    out = []
    for pas in (1, 2):
        for bound in (1_000_000, 0):
            t0 = time.time()
            df = BoruvkaMST(batch_cc=bound).run(wg)
            cs = _checksum(df, [SRC, DST])
            dt = time.time() - t0
            out.append((pas, bound, dt, cs))
            print(f"mst pass={pas} bound={bound}: {dt:.1f} s cs={cs}")
    assert len({cs for (_, _, _, cs) in out}) == 1, "outputs differ!"
    return out


def run_temporal(spark):
    from pyspark.sql import functions as F

    from pyspark_graph_spark.operators.temporal import earliest_arrival
    from pyspark_graph_spark.sources.tables import load_table

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
        te.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "ts"
        )
    ).localCheckpoint()
    n_edges = sym.count()
    print(f"temporal: |E_sym|={n_edges:,}")
    seeds = spark.createDataFrame([(2, 0)], "id long, arrival long")
    out = []
    for pas in (1, 2):
        for bound in (2_000_000, 0):
            t0 = time.time()
            df = earliest_arrival(
                sym,
                seeds,
                "src",
                "dst",
                "ts",
                max_rounds=60,  # real-sf1 one-keyspace graph: label-
                # correcting needs > the default 20 rounds (loud failure
                # otherwise — the operator refuses truncated fixpoints)
                batch_finish=bound,
            )
            cs = _checksum(df, ["id", "arrival"])
            dt = time.time() - t0
            out.append((pas, bound, dt, cs))
            print(f"temporal pass={pas} bound={bound}: {dt:.1f} s cs={cs}")
    assert len({cs for (_, _, _, cs) in out}) == 1, "outputs differ!"
    return out


def full_bound_frames():
    """Kernel-only probe: pandas frame bytes + wall at the exact bound."""
    import numpy as np
    import pandas as pd

    from pyspark_graph_spark.operators.connected_components import (
        _batch_union_find,
    )
    from pyspark_graph_spark.operators.mst import _batch_kruskal
    from pyspark_graph_spark.operators.scc import _batch_tarjan
    from pyspark_graph_spark.operators.temporal import (
        _batch_temporal_dijkstra,
    )

    rng = np.random.RandomState(0)
    n = 1_000_000
    e = pd.DataFrame(
        {
            "src": rng.randint(0, 200_000, n),
            "dst": rng.randint(0, 200_000, n),
        }
    )
    mb = e.memory_usage(deep=True).sum() / 1e6
    t0 = time.time()
    _batch_tarjan(e)
    print(f"tarjan@1M: frame {mb:.1f} MB, {time.time()-t0:.1f} s")
    ew = e.assign(weight=rng.randint(1, 98, n))
    mb = ew.memory_usage(deep=True).sum() / 1e6
    t0 = time.time()
    _batch_kruskal(ew)
    print(f"kruskal@1M: frame {mb:.1f} MB, {time.time()-t0:.1f} s")
    t0 = time.time()
    _batch_union_find(e)
    print(f"union_find@1M: frame {mb:.1f} MB, {time.time()-t0:.1f} s")
    n2 = 2_000_000
    et = pd.DataFrame(
        {
            "__s": rng.randint(0, 200_000, n2),
            "__d": rng.randint(0, 200_000, n2),
            "__t": rng.randint(0, 10_000, n2),
        }
    )
    seeds = pd.DataFrame({"id": [0], "arrival": [0]})
    mb = et.memory_usage(deep=True).sum() / 1e6
    t0 = time.time()
    _batch_temporal_dijkstra(seeds, et)
    print(f"temporal_dijkstra@2M: frame {mb:.1f} MB, {time.time()-t0:.1f} s")


def main():
    which = sys.argv[1:] or ["frames", "scc", "mst", "temporal"]
    if "frames" in which:
        full_bound_frames()
    spark_ops = [w for w in which if w != "frames"]
    if spark_ops:
        from pyspark_graph_spark.session import get_spark

        spark = get_spark("ab-frontpaths")
        spark.sparkContext.setLogLevel("ERROR")
        for w in spark_ops:
            {"scc": run_scc, "mst": run_mst, "temporal": run_temporal}[w](
                spark
            )


if __name__ == "__main__":
    main()
