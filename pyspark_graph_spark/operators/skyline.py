"""2-D skyline (Pareto frontier) — partition-local prefilter, exact finish.

The skyline of a set of points is the subset not dominated by any other
point (dominated = worse-or-equal in both dimensions, strictly worse in
at least one). The naive formulation is an O(n²) dominance self-join —
a CartesianProduct at any scale. This operator uses the classic
distributed decomposition (Börzsönyi et al., "The Skyline Operator",
ICDE 2001, block-nested-loop → divide-and-conquer family):

1. **Value-pair reduction** — one hash aggregate collapses the input to
   distinct (x, y) pairs with multiplicity, then a second keyed on x
   keeps only each x's best y (anything else is strictly dominated by
   construction). Both are ordinary shuffled aggregates with map-side
   partial combine; after this step the candidate set is bounded by the
   number of distinct x values.
2. **Arrow-batched local prefilter** — inside ``mapInPandas``, each
   batch is sorted by canonical-x and filtered to its own running-min
   frontier. Any batch-local filter that only removes dominated points
   is a valid prefilter (the survivors are a superset of the true
   skyline), so per-batch operation is correct AND memory-bounded: no
   partition-wide materialization, one vectorized cummin per batch.
3. **Exact global finish** — the reduced set (≤ Σ per-batch skyline
   sizes; in practice tiny, because a batch of b points over a skewed
   value distribution keeps ~O(log b)) goes through one global
   running-min window ordered by canonical-x. The single-partition
   window is bounded by the prefilter output, never by the input — the
   same reduce-then-finish shape as the library's top-k and quantile
   paths.

Maximized dimensions are canonicalized by sign flip into sort keys held
NEXT TO the original columns, so output dtypes are untouched.

Determinism: distinct x values make the canonical-x ordering total, so
the surviving frontier is a pure function of the input multiset.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class Skyline2D:
    """Exact 2-D skyline with per-dimension direction flags.

    ``run(df)`` returns one row per skyline point: the two original
    columns (original dtypes) plus ``n_rows``, the number of input rows
    at exactly that (x, y) value pair.
    """

    def __init__(
        self,
        x_col: str,
        y_col: str,
        minimize_x: bool = True,
        minimize_y: bool = True,
    ):
        self.x_col = x_col
        self.y_col = y_col
        self.minimize_x = minimize_x
        self.minimize_y = minimize_y

    def _canon(self, col: str, minimize: bool):
        c = F.col(col).cast("double")
        return c if minimize else -c

    def run(self, df: DataFrame) -> DataFrame:
        x, y = self.x_col, self.y_col
        pairs = (
            df.groupBy(x, y)
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .withColumn("_sy", self._canon(y, self.minimize_y))
        )
        # per-x best y: min canonical-y; the struct min carries that
        # pair's original y and count along (x, y distinct => no ties)
        cand = (
            pairs.groupBy(x)
            .agg(
                F.min(
                    F.struct(
                        F.col("_sy"),
                        F.col(y).alias("_y"),
                        F.col("n_rows").alias("_n"),
                    )
                ).alias("m")
            )
            .select(
                F.col(x),
                F.col("m._y").alias(y),
                F.col("m._n").alias("n_rows"),
                F.col("m._sy").alias("_sy"),
            )
            .withColumn("_sx", self._canon(x, self.minimize_x))
        )
        schema = cand.schema

        def prefilter(batches: Iterator) -> Iterator:
            for pdf in batches:
                if len(pdf) == 0:
                    yield pdf
                    continue
                pdf = pdf.sort_values(["_sx", "_sy"], kind="mergesort")
                prior_min = pdf["_sy"].cummin().shift(1)
                yield pdf[prior_min.isna() | (pdf["_sy"] < prior_min)]

        reduced = cand.mapInPandas(prefilter, schema=schema)
        w = Window.orderBy("_sx").rowsBetween(
            Window.unboundedPreceding, -1
        )
        return (
            reduced.withColumn("_rm", F.min("_sy").over(w))
            .filter(F.col("_rm").isNull() | (F.col("_sy") < F.col("_rm")))
            .select(x, y, "n_rows")
        )
