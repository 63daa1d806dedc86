"""Link-prediction scores for non-adjacent vertex pairs.

Computes the classic neighborhood-overlap predictors in one pass over the
wedge join (pairs of edges sharing a middle vertex):

- ``common_neighbors``  |N(u) ∩ N(v)|
- ``resource_allocation``  Σ_{w ∈ N(u)∩N(v)} 1/deg(w)  (Zhou et al. 2009)
- ``preferential_attachment``  deg(u) * deg(v)
- ``jaccard``  |N(u)∩N(v)| / |N(u)∪N(v)|

Candidate pairs are exactly the 2-hop pairs (any pair with at least one
common neighbor); existing edges are removed with an anti-join so the
output ranks *missing* edges, which is the link-prediction contract.

Scale: the wedge join is O(Σ deg(w)²) keyed on the middle vertex — the
same budget JaccardSimilarity already pays, with the same relief valves
(hub capping / degree thresholds) applicable upstream via
``Graph.filter_vertices``. ``min_common`` prunes the long tail of
1-common-neighbor pairs before the degree joins. The degree table is
vertex-sized and broadcastable.

Reference parity: extends the similarity family of
``pyspark_graph/similarity.py`` (Jaccard/Overlap) to the standard
link-prediction score set; the reference has no equivalent operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_graph_spark.constants import DST, ID, SRC
from pyspark_graph_spark.graph import Graph


class LinkPrediction:
    """Score non-adjacent vertex pairs by neighborhood overlap.

    ``min_common``: keep only pairs with at least this many common
    neighbors (prunes the quadratic tail before the degree joins).
    """

    def __init__(self, min_common: int = 1):
        if min_common < 1:
            raise ValueError("min_common must be >= 1")
        self.min_common = min_common

    def run(self, g: Graph) -> DataFrame:
        """(u, v, common_neighbors, preferential_attachment,
        resource_allocation, jaccard) for non-adjacent pairs, u < v."""
        sym = g.symmetric_edges.select(SRC, DST).distinct()
        deg = sym.groupBy(F.col(SRC).alias(ID)).agg(
            F.count(F.lit(1)).alias("__d")
        )
        a = sym.alias("a")
        b = sym.alias("b")
        wedges = a.join(
            b,
            on=[
                F.col("a.dst") == F.col("b.dst"),
                F.col("a.src") < F.col("b.src"),
            ],
        ).select(
            F.col("a.src").alias("u"),
            F.col("b.src").alias("v"),
            F.col("a.dst").alias("__mid"),
        )
        mid_deg = deg.select(
            F.col(ID).alias("__mid"), F.col("__d").alias("__dmid")
        )
        scored = (
            wedges.join(mid_deg, on="__mid")
            .groupBy("u", "v")
            .agg(
                F.count(F.lit(1)).alias("common_neighbors"),
                F.sum(F.lit(1.0) / F.col("__dmid")).alias("__ra"),
            )
            .filter(F.col("common_neighbors") >= self.min_common)
        )
        # drop pairs that are already edges (canonical u < v on both sides)
        canon = sym.filter(F.col(SRC) < F.col(DST)).select(
            F.col(SRC).alias("u"), F.col(DST).alias("v")
        )
        missing = scored.join(canon, on=["u", "v"], how="anti")
        du = deg.select(F.col(ID).alias("u"), F.col("__d").alias("__du"))
        dv = deg.select(F.col(ID).alias("v"), F.col("__d").alias("__dv"))
        return (
            missing.join(du, on="u")
            .join(dv, on="v")
            .select(
                "u",
                "v",
                "common_neighbors",
                (F.col("__du") * F.col("__dv")).alias(
                    "preferential_attachment"
                ),
                F.round("__ra", 6).alias("resource_allocation"),
                F.round(
                    F.col("common_neighbors")
                    / (
                        F.col("__du")
                        + F.col("__dv")
                        - F.col("common_neighbors")
                    ),
                    6,
                ).alias("jaccard"),
            )
        )
