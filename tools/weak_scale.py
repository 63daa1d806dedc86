#!/usr/bin/env python
"""Weak-scaling measurement: run queries at sf0.1 AND the 10× pseudo-sf1
replica (tools/make_scale_data.py) and print the time ratio.

Perfect linear weak scaling on fixed cores is 10×; below that is
sublinear per unit of data. Ratios far above 10× flag a quadratic term
(or a metric that is itself superlinear — see SCALE.md's
concurrent_sessions note).

Usage:
    python tools/make_scale_data.py          # once, builds testdata_sf1
    python tools/weak_scale.py q1 q2 ...     # default: a heavy-hitter set
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_WS_BASE", "/root/testdata/sf0.1")
BIG = os.environ.get(
    "SPARK_GRAFT_WS_BIG", "/root/repo/testdata_sf1"
)

DEFAULT = [
    "dedup_minhash",
    "set_similarity_join",
    "winnow_dedup",
    "connected_components",
    "louvain",
    "betweenness",
    "tfidf_cosine_pairs",
    "approx_closeness",
]


def main() -> None:
    from pyspark_graph_spark.queries import QUERIES
    from pyspark_graph_spark.session import get_spark

    if not os.path.isdir(BIG):
        sys.exit(
            f"{BIG} missing — run `python tools/make_scale_data.py` first"
        )
    names = sys.argv[1:] or DEFAULT
    spark = get_spark("weak-scale")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str, sf_dir: str) -> float:
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.time() - t0

    print(f"{'query':<28} {'sf0.1':>8} {'10x':>8} {'ratio':>7}")
    for name in names:
        a = run(name, BASE)
        b = run(name, BIG)
        flag = "" if b / a <= 10 else "  <-- superlinear, investigate"
        print(
            f"{name:<28} {a:>7.1f}s {b:>7.1f}s {b / a:>6.1f}x{flag}",
            flush=True,
        )


if __name__ == "__main__":
    main()
