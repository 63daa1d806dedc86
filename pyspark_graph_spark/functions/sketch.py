"""KMV (k-minimum-values) distinct-count sketch — deterministic, mergeable.

The cardinality sketch for corpus statistics at 100 TB ("distinct n-grams
per source", "vocabulary growth per crawl"): keep the k smallest 60-bit
hashes of the values; the k-th smallest estimates the cardinality as
(k-1) * SPACE / h_k (Bar-Yossef et al. 2002). Unlike HyperLogLog's
register randomness, KMV over a content hash is FULLY deterministic — the
same data yields the same sketch and the same estimate on any engine, so
the estimate itself is exactly oracle-checkable.

Mergeability (the scale property): the union sketch of two corpora is the
k smallest of the concatenated hash sets — an associative combine, so
sketches roll up over shards/days without touching raw data.

Plan: distinct (group, hash) pairs (one shuffle, map-side combined), then
a per-group top-k window — identical shape to any grouped top-k; k rows
of state per group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pyspark_graph_spark.functions.hashing import md5_hash60

_SPACE = float(1 << 60)


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """(group, n_exact_kept, kth_hash, estimate) per group.

    ``estimate`` is the KMV cardinality estimate from the k-th smallest
    distinct hash; groups with fewer than k distinct values report their
    exact count (the sketch is exact below its capacity, estimate = count).
    Rounded to 3 decimals for stable cross-engine comparison.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    hashed = df.select(
        F.col(group_col).alias("grp"),
        md5_hash60(F.col(value_col).cast("string")).alias("h"),
    ).distinct()
    win = Window.partitionBy("grp").orderBy("h")
    topk = (
        hashed.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= k)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.max("h").alias("kth_hash"),
        )
    )
    return topk.select(
        F.col("grp").alias(group_col),
        "n_kept",
        "kth_hash",
        F.round(
            F.when(
                F.col("n_kept") < k, F.col("n_kept").cast("double")
            ).otherwise(
                F.lit(k - 1) * F.lit(_SPACE) / F.col("kth_hash")
            ),
            3,
        ).alias("estimate"),
    )


def cms_sketch(
    df: DataFrame,
    value_col: str,
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """Count-min sketch: ``(row, bucket, cnt)`` — ``depth`` independent
    md5-salted hash rows of ``width`` buckets.

    Frequency twin of the KMV cardinality sketch, and like it fully
    deterministic (salted content hashes, no RNG): the same data builds
    the same sketch anywhere, sketches ADD cell-wise across shards/days,
    and storage is a constant depth x width grid regardless of input
    size. One shuffle: the (row, bucket) aggregate, map-side combined.
    """
    if width < 2 or depth < 1:
        raise ValueError("width must be >= 2, depth >= 1")
    rows = []
    for d in range(depth):
        rows.append(
            df.select(
                F.lit(d).alias("row"),
                F.pmod(
                    md5_hash60(
                        F.concat_ws(
                            ",", F.lit(f"cms{d}"), F.col(value_col).cast("string")
                        )
                    ),
                    F.lit(width),
                ).alias("bucket"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """(item, estimate) point-frequency estimates: min over the sketch
    rows of the item's bucket count — never an underestimate, over by at
    most the collision mass (eps ~ e/width of the total count, prob
    1 - (1/2)^depth). Items join the depth x |items| probe keys against
    the sketch grid."""
    probes = None
    for d in range(depth):
        p = items.select(
            F.col(item_col).alias("item"),
            F.lit(d).alias("row"),
            F.pmod(
                md5_hash60(
                    F.concat_ws(
                        ",", F.lit(f"cms{d}"), F.col(item_col).cast("string")
                    )
                ),
                F.lit(width),
            ).alias("bucket"),
        )
        probes = p if probes is None else probes.unionByName(p)
    return (
        probes.join(sketch, on=["row", "bucket"], how="left")
        .na.fill({"cnt": 0})
        .groupBy("item")
        .agg(F.min("cnt").alias("estimate"))
    )


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    quantiles: list[float],
    bins: int = 1024,
) -> DataFrame:
    """(q, estimate) approximate quantiles from a fixed-width histogram —
    the deterministic single-pass alternative to a global sort.

    One pass computes (min, max); a second bins every value
    (row-local arithmetic + one tiny aggregate); quantiles interpolate
    linearly inside the hit bin. Error is bounded by the bin width
    (range/bins); the histogram is mergeable across shards by adding
    counts. Unlike sampling-based approx_percentile, the result is a pure
    function of the data — identical on any engine or partitioning.
    """
    if not quantiles or any(not 0 <= q <= 1 for q in quantiles):
        raise ValueError("quantiles must be fractions in [0, 1]")
    if bins < 1:
        raise ValueError("bins must be >= 1")
    v = F.col(value_col).cast("double")
    bounds = df.agg(
        F.min(v).alias("lo"), F.max(v).alias("hi"), F.count(v).alias("n")
    )
    binned = (
        df.crossJoin(F.broadcast(bounds))
        .select(
            # hi == lo (constant column) guard: the bin-width division is
            # 0/0 -> NULL on Spark but inf -> CAST error on DuckDB; pin the
            # degenerate case to bin 0 on both engines (estimate is then
            # lo + 0 * interp = lo exactly)
            F.when(F.col("hi") == F.col("lo"), F.lit(0))
            .otherwise(
                F.least(
                    F.lit(bins - 1),
                    F.floor(
                        (v - F.col("lo"))
                        / ((F.col("hi") - F.col("lo")) / bins)
                    ).cast("int"),
                )
            )
            .alias("bin"),
            "lo",
            "hi",
            "n",
        )
        .groupBy("bin", "lo", "hi", "n")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # cumulative counts over <= bins rows: tiny ordered window
    from pyspark.sql import Window

    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = binned.withColumn("cum", F.sum("cnt").over(w))
    out = None
    for q in quantiles:
        # first bin whose cumulative count reaches q*n; interpolate inside
        hit = (
            cum.filter(F.col("cum") >= F.lit(q) * F.col("n"))
            .orderBy("bin")
            .limit(1)
            .select(
                F.lit(q).alias("q"),
                F.round(
                    F.col("lo")
                    + ((F.col("hi") - F.col("lo")) / bins)
                    * (
                        F.col("bin")
                        + (
                            (F.lit(q) * F.col("n") - (F.col("cum") - F.col("cnt")))
                            / F.col("cnt")
                        )
                    ),
                    6,
                ).alias("estimate"),
            )
        )
        out = hit if out is None else out.unionByName(hit)
    return out


def hll_estimate(
    df: DataFrame, col: str, b: int = 6, round_to: int = 4
) -> DataFrame:
    """HyperLogLog distinct-count estimate — deterministic and mergeable.

    The third classic mergeable sketch next to KMV (distinct) and count-min
    (frequency) above: m = 2^b registers, each keeping the maximum
    "leading-zero rank" of the hashes routed to it (Flajolet et al. 2007).
    Per-register max is a map-side-combinable aggregation, registers from
    disjoint partitions/days merge by element-wise max, and state is m
    small integers regardless of input size.

    Everything is engine-portable on purpose: the hash is the cross-engine
    60-bit md5 fold, the register index its low b bits, and the rank is
    derived from the *length of the binary string* of the remaining
    (60-b)-bit value — ``bin()`` exists in both Spark and DuckDB and
    avoids float log2 edge cases at powers of two. Small cardinalities use
    the standard linear-counting correction; both engines compute the same
    registers, so the estimate matches to float rounding.

    Returns one row: ``(m, nonzero_registers, estimate)``.
    """
    from pyspark_graph_spark.functions.hashing import md5_hash60

    m = 1 << b
    width = 60 - b  # bits in the rank field
    alpha = 0.7213 / (1 + 1.079 / m)

    h = md5_hash60(F.col(col).cast("string"))
    # h >> b via integer shift — a double division would round the 60-bit
    # hash at the 53-bit mantissa boundary
    q = F.shiftright(h, b)
    # rank = leading zeros in the width-bit field + 1; bin(q) drops leading
    # zeros so its length is the bit length of q (and '0' for q == 0)
    rank = F.when(q == 0, F.lit(width + 1)).otherwise(
        F.lit(width + 1) - F.length(F.bin(q))
    )
    regs = (
        df.select(
            F.pmod(h, F.lit(m)).alias("reg"), rank.alias("rank")
        )
        .groupBy("reg")
        .agg(F.max("rank").alias("mx"))
    )
    agg = regs.agg(
        F.count(F.lit(1)).alias("nz"),
        F.sum(F.pow(F.lit(2.0), -F.col("mx"))).alias("s"),
    )
    raw = F.lit(alpha) * m * m / (F.col("s") + (m - F.col("nz")))
    # linear counting when the raw estimate is small and empty registers
    # remain (standard small-range correction)
    est = F.when(
        (raw <= 2.5 * m) & (F.col("nz") < m),
        F.lit(float(m)) * F.log(F.lit(float(m)) / (m - F.col("nz"))),
    ).otherwise(raw)
    return agg.select(
        F.lit(m).alias("m"),
        F.col("nz").cast("long").alias("nonzero_registers"),
        F.round(est, round_to).alias("estimate"),
    )


# ---------------------------------------------------------------------------
# Bloom filter — mergeable membership sketch
# ---------------------------------------------------------------------------


def bloom_positions(c: Column, m: int = 1024, k: int = 3) -> Column:
    """array<long> of the k salted bit positions for a value (j-th hash =
    md5_hash60 of "j:value" mod m) — deterministic and replayable in SQL."""
    return F.array(
        *[
            md5_hash60(F.concat(F.lit(f"{j}:"), c.cast("string"))) % m
            for j in range(k)
        ]
    )


def bloom_build(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    m: int = 1024,
    k: int = 3,
) -> DataFrame:
    """Per-group Bloom filter as a sorted array of set bit positions
    (equivalent to the bit vector, mergeable by array union / further
    ``collect_set``). One explode + one grouped collect_set — map-side
    combinable; sketch size is bounded by m regardless of group size,
    which is the entire point at corpus scale."""
    pos = df.select(
        *group_cols,
        F.explode(
            bloom_positions(F.col(value_col), m=m, k=k)
        ).alias("__p"),
    )
    return pos.groupBy(*group_cols).agg(
        F.sort_array(F.collect_set("__p")).alias("bloom")
    )


def bloom_probe(
    bloom_df: DataFrame,
    probes: DataFrame,
    probe_col: str,
    m: int = 1024,
    k: int = 3,
) -> DataFrame:
    """Cross-probe: for every (probe value, group) pair, ``bloom_hit`` is
    true iff ALL k positions are set — the no-false-negative membership
    test. The bloom table is |groups| rows and broadcasts; the probe side
    streams. (False positives are the m/k trade-off; pair with an exact
    check on the hit subset when exactness matters.)"""
    p = probes.select(
        F.col(probe_col).alias("probe"),
        bloom_positions(F.col(probe_col), m=m, k=k).alias("__pp"),
    )
    return p.crossJoin(F.broadcast(bloom_df)).select(
        "probe",
        *[c for c in bloom_df.columns if c != "bloom"],
        F.forall(
            F.col("__pp"), lambda x: F.array_contains(F.col("bloom"), x)
        ).alias("bloom_hit"),
    )


def kmv_pairwise(
    df: DataFrame,
    group_col: str,
    value_col: str,
    groups: list[str],
    k: int = 64,
) -> DataFrame:
    """Pairwise set-overlap estimates between the given groups from their
    KMV sketches alone: (type_a, type_b, k_eff, common, jaccard_est,
    union_est, inter_est).

    The union sketch of a pair is the k smallest hashes of the two
    sketches' union (the KMV merge); the fraction of those present in
    BOTH per-group sketches estimates Jaccard (Beyer et al. 2007), and
    intersection = jaccard * union-cardinality-estimate. Everything is
    derived from the two k-row sketches — the raw sets are never
    intersected, which is the whole point at corpus scale. Deterministic
    (md5 value hash), so estimates are exactly oracle-checkable.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    if len(groups) < 2:
        raise ValueError("need at least two groups")
    # Only the listed groups are sketched: an unlisted group would still
    # fan out through the t != t2 filter and emit one-sided (biased)
    # estimates for pairs it appears in.
    df = df.filter(F.col(group_col).isin(groups))
    hashed = df.select(
        F.col(group_col).alias("t"),
        md5_hash60(F.col(value_col).cast("string")).alias("h"),
    ).distinct()
    win = Window.partitionBy("t").orderBy("h")
    sk = (
        hashed.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= k)
        .select("t", "h")
        .localCheckpoint()
    )
    # each sketch row fans out to every pair it participates in
    pu = (
        sk.withColumn(
            "t2", F.explode(F.array(*[F.lit(g) for g in groups]))
        )
        .filter(F.col("t") != F.col("t2"))
        .select(
            F.least("t", "t2").alias("ta"),
            F.greatest("t", "t2").alias("tb"),
            "h",
        )
        .distinct()
    )
    uw = Window.partitionBy("ta", "tb").orderBy("h")
    kept = (
        pu.withColumn("rn", F.row_number().over(uw))
        .filter(F.col("rn") <= k)
        .select("ta", "tb", "h")
    )
    mem = (
        kept.join(
            sk.select(F.col("t").alias("ta"), "h").withColumn(
                "__ina", F.lit(1)
            ),
            on=["ta", "h"],
            how="left",
        )
        .join(
            sk.select(F.col("t").alias("tb"), "h").withColumn(
                "__inb", F.lit(1)
            ),
            on=["tb", "h"],
            how="left",
        )
        .groupBy("ta", "tb")
        .agg(
            F.count(F.lit(1)).alias("k_eff"),
            F.max("h").alias("kth"),
            F.sum(
                F.when(
                    F.col("__ina").isNotNull() & F.col("__inb").isNotNull(),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("common"),
        )
    )
    union_est = F.when(
        F.col("k_eff") < k, F.col("k_eff").cast("double")
    ).otherwise(F.lit(k - 1) * F.lit(_SPACE) / F.col("kth"))
    jac = F.col("common") / F.col("k_eff")
    return mem.select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        F.col("k_eff").cast("long").alias("k_eff"),
        "common",
        F.round(jac, 6).alias("jaccard_est"),
        F.round(union_est, 3).alias("union_est"),
        F.round(jac * union_est, 3).alias("inter_est"),
    )
