#!/usr/bin/env python
"""Generate a pseudo-sf1 dataset for weak-scaling validation.

Replicates /root/testdata/sf0.1 10x with shifted keys: each copy is a
disjoint key space (suppliers, customers, orders, documents, embeddings),
so every graph/dedup workload sees 10x the data with the same per-copy
structure — textbook weak scaling.  Document text gets a per-copy token
suffix (copy 0 unchanged) so shingle/minhash work scales without
manufacturing cross-copy duplicates; embeddings get a tiny per-copy
rotation-free offset on one dimension for the same reason.

Output: /root/repo/testdata_sf1/*.parquet (gitignored; regenerate with
``python tools/make_scale_data.py``).  Dimension tables (region, nation,
part) are copied through unchanged — they are dimensions, not facts.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pyspark_graph_spark.session import get_spark

SRC = os.environ.get("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")
DST = os.environ.get(
    "SPARK_GRAFT_SCALE_DST", "/root/repo/testdata_sf1"
)
COPIES = int(os.environ.get("SPARK_GRAFT_SCALE_COPIES", "10"))

# per-copy key shifts, far above any sf0.1 key range
SHIFTS = {
    "s_suppkey": 10_000_000,
    "l_suppkey": 10_000_000,
    "ps_suppkey": 10_000_000,
    "c_custkey": 100_000_000,
    "o_custkey": 100_000_000,
    "o_orderkey": 1_000_000_000,
    "l_orderkey": 1_000_000_000,
    "doc_id": 10_000_000,
    "vec_id": 10_000_000,
    "event_id": 1_000_000_000,
    "user_id": 100_000_000,
}

PASSTHROUGH = {"region", "nation", "part"}


def replicate(spark, name: str) -> None:
    df = spark.read.parquet(f"{SRC}/{name}.parquet")
    if name in PASSTHROUGH:
        df.write.mode("overwrite").parquet(f"{DST}/{name}.parquet")
        print(f"  {name}: passthrough {df.count()} rows")
        return
    copies = spark.range(COPIES).select(F.col("id").cast("int").alias("__copy"))
    rep = df.crossJoin(copies)
    exprs = []
    for field in df.schema.fields:
        c = F.col(field.name)
        if field.name in SHIFTS:
            c = (
                c + F.col("__copy").cast("long") * SHIFTS[field.name]
            ).cast(field.dataType)
        elif field.name == "text":
            # copy 0 byte-identical; other copies suffix every token so
            # shingle spaces are disjoint across copies (no fake dups)
            c = F.when(F.col("__copy") == 0, c).otherwise(
                F.array_join(
                    F.transform(
                        F.split(c, " "),
                        lambda w: F.concat(
                            w, F.lit("_"), F.col("__copy").cast("string")
                        ),
                    ),
                    " ",
                )
            )
        elif field.name == "embedding":
            # nudge dim 0 by copy*8 so cross-copy cosine drops out of the
            # near-dup tail while intra-copy geometry is untouched
            c = F.when(F.col("__copy") == 0, c).otherwise(
                F.concat(
                    F.array(
                        (F.get(c, 0) + F.col("__copy").cast("float") * 8.0)
                        .cast("float")
                    ),
                    F.slice(c, 2, 100_000),
                )
            )
        exprs.append(c.alias(field.name))
    out = rep.select(*exprs)
    out.repartition(32).write.mode("overwrite").parquet(
        f"{DST}/{name}.parquet"
    )
    print(f"  {name}: {df.count()} -> {out.count()} rows")


def main() -> None:
    spark = get_spark("make-scale-data")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DST, exist_ok=True)
    for t in (
        "region nation part customer supplier orders lineitem "
        "events documents embeddings"
    ).split():
        replicate(spark, t)
    print(f"wrote {DST} ({COPIES}x {SRC})")


if __name__ == "__main__":
    main()
