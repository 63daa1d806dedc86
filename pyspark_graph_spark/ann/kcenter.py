"""Greedy k-center (farthest-point) selection over an embedding corpus.

The classic 2-approximation to the k-center objective (Gonzalez 1985)
and the standard "diverse coreset" picker in data-curation pipelines:
start from a deterministic seed, then repeatedly add the point farthest
from the current center set.

Fully lazy and driver-loop-free: each round is
  argmax-by-(rounded distance, id)  ->  1-row DataFrame
  broadcast-crossJoin that row onto the running min-distance state
so the plan is k chained aggregate+broadcast stages — no ``collect()``,
no Python loop over data, only over the (small, fixed) k. Cost per round
is one scan of the state (map-side combinable top-1) plus a broadcast;
at corpus scale that is k linear passes, the textbook distributed shape.

Distances are squared L2 accumulated left-to-right in index order
(``F.aggregate`` over ``zip_with``), so an external oracle summing in
the same order reproduces them bit-for-bit; ranking compares the
6-decimal-rounded distance to keep the argmax engine-portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sq_l2(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


class KCenterSelection:
    """Pick ``k`` diverse points by greedy farthest-point traversal.

    ``run(df)`` returns (step, vec_id, dist): the selection order and the
    (rounded) squared distance of each pick to the previously selected
    set (0.0 for the seed). Selected points leave the candidate state
    (1-row broadcast anti-join per round), so a corpus with fewer than k
    points yields min(k, n) rows instead of repeating a center.
    """

    def __init__(self, k: int = 4, id_col: str = "vec_id",
                 vec_col: str = "embedding"):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def run(self, df: DataFrame) -> DataFrame:
        pts = df.select(
            F.col(self.id_col).alias("id"),
            F.col(self.vec_col).cast("array<double>").alias("v"),
        )
        seed = pts.orderBy("id").limit(1)
        selected = [
            seed.select(
                F.lit(0).alias("step"),
                F.col("id").alias("vec_id"),
                F.lit(0.0).alias("dist"),
            )
        ]
        state = (
            pts.join(
                F.broadcast(seed.select("id")), on="id", how="anti"
            )
            .crossJoin(
                F.broadcast(seed.select(F.col("v").alias("__cv")))
            )
            .select(
                "id", "v", _sq_l2(F.col("v"), F.col("__cv")).alias("__mind")
            )
        )
        for s in range(1, self.k):
            nxt = state.orderBy(
                F.round("__mind", 6).desc(), F.col("id").asc()
            ).limit(1)
            selected.append(
                nxt.select(
                    F.lit(s).alias("step"),
                    F.col("id").alias("vec_id"),
                    F.round("__mind", 6).alias("dist"),
                )
            )
            state = (
                state.join(
                    F.broadcast(nxt.select("id")), on="id", how="anti"
                )
                .crossJoin(
                    F.broadcast(nxt.select(F.col("v").alias("__cv")))
                )
                .select(
                    "id",
                    "v",
                    F.least(
                        F.col("__mind"), _sq_l2(F.col("v"), F.col("__cv"))
                    ).alias("__mind"),
                )
            )
        out = selected[0]
        for sel in selected[1:]:
            out = out.unionByName(sel)
        return out
