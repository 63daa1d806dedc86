"""Statistical estimators over aggregate-sized tables.

Kaplan-Meier product-limit survival estimation: the windows run over the
|distinct event times| table, never the raw observations, so the whole
estimator is two windows on top of one aggregation — scale-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kaplan_meier(
    obs: DataFrame, t_col: str = "t", event_col: str = "event"
) -> DataFrame:
    """(t, n_risk, d, s) — the product-limit survival curve over
    (duration, event) observations (event=0 marks right-censoring).

    S(t) = Π_{tᵢ <= t} (1 − dᵢ/nᵢ); at-risk counts come from a reverse
    cumulative window, the product from exp-sum-log. A bucket with total
    mortality (d == n_risk) must drive S to exactly 0 from then on:
    Spark's log(0) is NULL (silently skipped by SUM) while DuckDB's is
    −inf, so the zero is guarded explicitly — both engines then agree
    bit-for-bit on the rounded curve.
    """
    per_t = obs.groupBy(F.col(t_col).alias("t")).agg(
        F.sum(event_col).cast("long").alias("d"),
        F.count(F.lit(1)).alias("c"),
    )
    w_risk = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    km = per_t.select(
        "t",
        "d",
        F.sum("c").over(w_risk).cast("long").alias("n_risk"),
    )
    w_s = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    hit_zero = (
        F.max(
            F.when(F.col("d") == F.col("n_risk"), 1).otherwise(0)
        ).over(w_s)
        == 1
    )
    log_term = F.when(
        F.col("d") < F.col("n_risk"),
        F.log(F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk")),
    )
    return (
        km.select(
            "t",
            "n_risk",
            "d",
            F.when(hit_zero, F.lit(0.0))
            .otherwise(F.round(F.exp(F.sum(log_term).over(w_s)), 6))
            .alias("s"),
        )
        .filter(F.col("d") > 0)
    )
