"""Data-mixture planning and skew diagnostics for corpus curation.

``mixture_plan`` turns "train on 50% web, 30% code, 20% books" into
per-source deterministic sampling rates against the actual token
inventory: rate_g = min(1, budget * w_g / tokens_g). Groups short of
their allocation are capped at keep-everything (the standard
under-supplied-domain case); the plan reports the achievable tokens so
the caller can renormalize or upsample. Pure arithmetic over a
groups-sized table — the plan feeds straight into
``stratified_sample``'s per-stratum thresholds.

``skew_report`` is the operational pre-flight for any shuffle-heavy job:
the top-k heaviest keys with their share of the table. At 100 TB you run
it on the join/groupBy key FIRST (one map-side-combined aggregate +
top-k) and decide salting/AQE thresholds from the measured ratio instead
of discovering the straggler at hour three.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mixture_plan(
    inventory: DataFrame,
    weights: dict[str, float],
    budget: float,
    group_col: str = "group",
    tokens_col: str = "tokens",
) -> DataFrame:
    """(group, tokens, weight, target, rate, achievable) per group.

    ``inventory`` holds actual token counts per group; ``weights`` the
    desired mixture (unlisted groups get weight 0); ``budget`` the total
    token target. ``rate`` is the deterministic keep-fraction to feed a
    hash sampler; ``achievable = min(target, tokens)``.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    spark = inventory.sparkSession
    # full outer join against the weight keys: a group listed in `weights`
    # but absent from the inventory must still appear in the plan (tokens
    # 0, achievable 0) so callers renormalizing see the shortfall instead
    # of silently missing the group (ADVICE r2). No broadcast hint: Spark
    # cannot broadcast-build either side of a full outer hash join (the
    # hint is ignored with a warning), and both sides are group-cardinality
    # aggregates — tiny either way.
    wdf = spark.createDataFrame(
        [(g, float(wt)) for g, wt in sorted(weights.items())],
        schema=f"`{group_col}` string, `__w` double",
    )
    joined = (
        inventory.select(
            F.col(group_col).cast("string").alias(group_col),
            F.col(tokens_col).cast("long").alias("tokens"),
        )
        .join(wdf, on=group_col, how="full_outer")
        .select(
            group_col,
            F.coalesce(F.col("tokens"), F.lit(0)).alias("tokens"),
            F.coalesce(F.col("__w"), F.lit(0.0)).alias("weight"),
        )
    )
    return joined.select(
        group_col,
        "tokens",
        "weight",
        F.round(F.col("weight") * F.lit(float(budget)), 3).alias("target"),
        # tokens = 0: keep-everything (rate 1.0) with achievable 0 — the
        # under-supplied group stays visible instead of a NULL rate
        F.when(F.col("tokens") == 0, F.lit(1.0))
        .otherwise(
            F.round(
                F.least(
                    F.lit(1.0),
                    F.col("weight") * F.lit(float(budget)) / F.col("tokens"),
                ),
                9,
            )
        )
        .alias("rate"),
        F.round(
            F.least(
                F.col("weight") * F.lit(float(budget)),
                F.col("tokens").cast("double"),
            ),
            3,
        ).alias("achievable"),
    )


def skew_report(
    df: DataFrame,
    key_col: str,
    top: int = 10,
) -> DataFrame:
    """(rank, key, cnt, share) for the ``top`` heaviest keys.

    One hash aggregate (map-side combined) + a global top-k
    (TakeOrdered — no full sort). ``share`` divides exact counts once.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    total = counts.agg(F.sum("cnt").alias("__total"))
    # top-k FIRST via orderBy+limit (planned as TakeOrdered, no global
    # sort); the rank window then runs over only `top` rows
    topk = counts.orderBy(F.desc("cnt"), F.asc("key")).limit(top)
    win = Window.orderBy(F.desc("cnt"), F.asc("key"))
    return (
        topk.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(win))
        .select(
            "rank",
            "key",
            "cnt",
            (F.col("cnt").cast("double") / F.col("__total")).alias("share"),
        )
    )
