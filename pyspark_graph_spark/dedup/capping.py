"""Hot-bucket capping for banded self-joins.

A banded dedup join (MinHash band buckets, SimHash pigeonhole blocks)
self-equi-joins on a bucket key; an n-member bucket emits O(n²) candidate
pairs. AQE skew-splitting rebalances that shuffle across tasks but cannot
reduce the pair count — at 100 TB a single viral-boilerplate bucket becomes
the whole job. ``cap_buckets`` bounds it *before* the join by
deterministically hash-thinning oversize buckets down to ~cap members.

Mechanism: one ``groupBy(keys).count()`` on the same key the join shuffles
on (map-side combine keeps hot keys cheap: each task emits one partial
count per key), joined back, then a member survives an oversize bucket iff

    pmod(xxhash64(id, *keys), n) < cap

— a pure function of (member, bucket, bucket size): deterministic,
partition-invariant, and reproducible by any engine with the same hash.
Expected survivors = cap (binomial, tight for cap ≫ 1). Buckets at or
under the cap pass through untouched, so at any corpus where no bucket
exceeds the cap the capped plan is value-identical to the uncapped one.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cap_buckets(
    buckets: DataFrame,
    keys: Sequence[str],
    member_col: str,
    cap: int | None,
    thin_hash: str = "xxhash64",
) -> DataFrame:
    """Thin buckets (grouped by ``keys``) with more than ``cap`` members.

    Returns ``buckets`` unchanged when ``cap`` is None. Otherwise each
    member of a bucket of size n > cap is kept with probability cap/n via
    a deterministic hash test, bounding the bucket's post-thinning size at
    ~cap in expectation (and hence the self-join's per-bucket output at
    ~cap²/2 pairs).

    ``thin_hash='xxhash64'`` (default) is the fast JVM path;
    ``'md5'`` switches the survival test to
    ``md5_hash60(concat_ws(',', member, *keys))`` — bit-identical in
    DuckDB (functions/hashing.py), which lets an external SQL oracle
    replay the thinning exactly (the ``dedup_simhash_capped`` gate).
    """
    if cap is None:
        return buckets
    if thin_hash == "md5":
        from pyspark_graph_spark.functions.hashing import md5_hash60_concat

        h = md5_hash60_concat(F.col(member_col), *[F.col(k) for k in keys])
    elif thin_hash == "xxhash64":
        h = F.xxhash64(member_col, *keys)
    else:
        raise ValueError("thin_hash must be 'xxhash64' or 'md5'")
    sizes = buckets.groupBy(*keys).agg(F.count(F.lit(1)).alias("__bn"))
    kept = (
        buckets.join(sizes, on=list(keys))
        .filter(
            (F.col("__bn") <= F.lit(cap))
            | (F.pmod(h, F.col("__bn")) < F.lit(cap))
        )
        .drop("__bn")
    )
    return kept.select(*buckets.columns)
