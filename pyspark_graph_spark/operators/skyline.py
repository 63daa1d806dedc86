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

Direction flags are honored by flipping the sort order and the running
min/max + comparison operators — the original column values are used
as-is, never cast or negated, so 64-bit integer keys beyond 2^53 (which
a double cast would collapse into ties) keep their exact ordering and
output dtypes are untouched.

Determinism: the per-x reduction leaves one row per distinct x, so the
x ordering is total and the surviving frontier is a pure function of
the input multiset.
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

    def run(self, df: DataFrame) -> DataFrame:
        x, y = self.x_col, self.y_col
        minimize_x, minimize_y = self.minimize_x, self.minimize_y
        pairs = df.groupBy(x, y).agg(F.count(F.lit(1)).alias("n_rows"))
        # per-x best y: min (or max) struct ordered by y first; (x, y)
        # distinct within the group => no ties, the winning pair's count
        # rides along
        best_agg = F.min if minimize_y else F.max
        cand = (
            pairs.groupBy(x)
            .agg(
                best_agg(
                    F.struct(
                        F.col(y).alias("_y"),
                        F.col("n_rows").alias("_n"),
                    )
                ).alias("m")
            )
            .select(
                F.col(x),
                F.col("m._y").alias(y),
                F.col("m._n").alias("n_rows"),
            )
        )
        schema = cand.schema

        def prefilter(batches: Iterator) -> Iterator:
            import numpy as np

            for pdf in batches:
                if len(pdf) == 0:
                    yield pdf
                    continue
                pdf = pdf.sort_values(
                    x, ascending=minimize_x, kind="mergesort"
                )
                # running best via numpy accumulate on the NATIVE dtype:
                # pandas' .shift(1) promotes int64 to float64 (NaN slot),
                # which collapses y values beyond 2^53 into ties and
                # would drop true skyline points
                vals = pdf[y].to_numpy()
                acc = (
                    np.minimum if minimize_y else np.maximum
                ).accumulate(vals)
                keep = np.empty(len(vals), dtype=bool)
                keep[0] = True
                if minimize_y:
                    keep[1:] = vals[1:] < acc[:-1]
                else:
                    keep[1:] = vals[1:] > acc[:-1]
                yield pdf[keep]

        reduced = cand.mapInPandas(prefilter, schema=schema)
        w = Window.orderBy(
            F.asc(x) if minimize_x else F.desc(x)
        ).rowsBetween(Window.unboundedPreceding, -1)
        running_best = (F.min if minimize_y else F.max)(y).over(w)
        strictly_better = (
            F.col(y) < F.col("_rm")
            if minimize_y
            else F.col(y) > F.col("_rm")
        )
        return (
            reduced.withColumn("_rm", running_best)
            .filter(F.col("_rm").isNull() | strictly_better)
            .select(x, y, "n_rows")
        )
