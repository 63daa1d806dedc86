#!/usr/bin/env python
"""Planted-viral-fingerprint A/B for the CDC stop-list (r10 verdict #4).

The df stop-list (dedup/cdc.py) claims it keeps the fingerprint
self-join linear at 100 TB by bounding every join bucket at
C(max_fingerprint_df, 2) pairs. This measures that claim the way the
matching/MIS/SCC/MST front-paths were measured: on the REAL-sf1
documents corpus, PLANT one fingerprint shared by ~1000x the median
document frequency, then run the pair join cap-on / cap-off
INTERLEAVED (A/B/A/B, so host drift hits both arms) and record the
candidate-pair counts and walls.

Usage:
    python tools/cdc_viral_ab.py [viral_df] [reps]

viral_df defaults to 5000 (median df at real-sf1 is ~1-5, so ~1000x);
the off arm then carries C(5000,2) ~ 12.5M extra pre-distinct rows in
ONE join bucket — big enough to measure, bounded enough to finish.
The printed numbers go into SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BIG = os.environ.get("SPARK_GRAFT_WS_BIG", "/root/repo/testdata_sf1_real")


def main() -> None:
    from pyspark.sql import functions as F

    from pyspark_graph_spark.dedup.cdc import (
        DEFAULT_MAX_FINGERPRINT_DF,
        fingerprint_doc_pairs,
    )
    from pyspark_graph_spark.queries._shared import _shared_cdc_chunks
    from pyspark_graph_spark.session import get_spark

    viral_df = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    if not os.path.isdir(BIG):
        sys.exit(f"{BIG} missing — need the real-sf1 corpus")
    spark = get_spark("cdc-viral-ab")
    spark.sparkContext.setLogLevel("ERROR")

    membership = (
        _shared_cdc_chunks(spark, BIG)
        .select("doc_id", "fingerprint")
        .distinct()
        .localCheckpoint()
    )
    stats = membership.groupBy("fingerprint").count()
    df_stats = stats.agg(
        F.count(F.lit(1)).alias("n_fp"),
        F.expr("percentile_approx(count, 0.5)").alias("median_df"),
        F.max("count").alias("max_df"),
    ).collect()[0]
    print(
        f"# corpus: {membership.count():,} (doc,fp) rows, "
        f"{df_stats['n_fp']:,} fingerprints, median df "
        f"{df_stats['median_df']}, max df {df_stats['max_df']}"
    )

    # plant: viral_df distinct docs all sharing one synthetic fingerprint
    viral = (
        membership.select("doc_id")
        .distinct()
        .orderBy("doc_id")
        .limit(viral_df)
        .withColumn("fingerprint", F.lit("__VIRAL_PLANT__"))  # not a real md5
    )
    planted = membership.unionByName(viral).localCheckpoint()
    print(f"# planted 1 fingerprint with df={viral_df:,} "
          f"(~{viral_df // max(int(df_stats['median_df']), 1)}x median)")

    def arm(cap):
        t0 = time.time()
        n = fingerprint_doc_pairs(planted, max_fingerprint_df=cap).count()
        return time.time() - t0, n

    results: dict[str, list[tuple[float, int]]] = {"cap": [], "off": []}
    for _ in range(reps):
        for name, cap in (
            ("cap", DEFAULT_MAX_FINGERPRINT_DF),
            ("off", None),
        ):
            wall, n = arm(cap)
            results[name].append((wall, n))
            print(f"# {name}: {wall:.1f}s, {n:,} distinct pairs")
    for name, runs in results.items():
        best = min(w for w, _ in runs)
        print(
            f"RESULT {name}: min wall {best:.1f}s, "
            f"pairs {runs[0][1]:,}"
        )
    extra = viral_df * (viral_df - 1) // 2
    print(f"RESULT off-arm viral bucket emits C({viral_df},2) = "
          f"{extra:,} pre-distinct rows in ONE shuffle bucket; "
          f"cap arm emits 0 from it")


if __name__ == "__main__":
    main()
