"""Lloyd's k-means over an embedding column — deterministic and distributed.

Complements the IVF index (``ann/ivf.py``), whose coarse quantizer is
deterministic-but-untrained: ``KMeans.fit`` produces trained centroids that
slot into the same assign/probe joins.

Spark-first shape, per iteration:
  1. assign: broadcast the k centroids (k rows — genuinely tiny) against the
     corpus, compute squared-L2 per (vector, centroid) and argmin with a
     min_by aggregation keyed by vector id. The corpus itself never
     shuffles for assignment — only the k-row table moves.
  2. update: posexplode each assigned vector to (cluster, dim, value) and
     groupBy (cluster, dim) avg. Map-side partial aggregation collapses
     each partition to at most k*d rows before the shuffle, so the update
     step's shuffle volume is O(partitions * k * d), independent of corpus
     size — the property that makes Lloyd's scale.

Initialization is deterministic (the k lowest-id vectors), so results are
bit-reproducible and SQL-replayable; k-means++ would drop in by replacing
``initial_centroids``. Iteration count is fixed rather than
convergence-tested: each extra iteration is one broadcast join + one
bounded aggregation, and a fixed count keeps lineage flat (no
driver-side loop state)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class KMeans:
    def __init__(
        self,
        k: int = 8,
        n_iter: int = 3,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ):
        self.k = k
        self.n_iter = n_iter
        self.id_col = id_col
        self.vec_col = vec_col

    def initial_centroids(self, corpus: DataFrame) -> DataFrame:
        """(cluster, centroid) — the k lowest-id vectors, cluster = rank."""
        from pyspark.sql import Window

        w = Window.orderBy(F.col(self.id_col))
        return (
            corpus.select(self.id_col, self.vec_col)
            .orderBy(self.id_col)
            .limit(self.k)
            .withColumn("cluster", F.row_number().over(w) - 1)
            .select(
                "cluster",
                F.col(self.vec_col)
                .cast("array<double>")
                .alias("centroid"),
            )
        )

    def assign(self, corpus: DataFrame, centroids: DataFrame) -> DataFrame:
        """(id, vec, cluster, sq_dist): nearest centroid per vector.
        Ties break to the lowest cluster id (min_by on (dist, cluster))."""
        vec = F.col(self.vec_col).cast("array<double>")
        sq = F.aggregate(
            F.zip_with(vec, F.col("centroid"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        scored = corpus.join(F.broadcast(centroids)).select(
            self.id_col,
            self.vec_col,
            "cluster",
            sq.alias("__sq"),
        )
        return (
            scored.groupBy(self.id_col)
            .agg(
                F.min_by(
                    F.struct("cluster", "__sq"), F.struct("__sq", "cluster")
                ).alias("__best"),
                F.first(self.vec_col).alias(self.vec_col),
            )
            .select(
                self.id_col,
                self.vec_col,
                F.col("__best.cluster").alias("cluster"),
                F.col("__best.__sq").alias("sq_dist"),
            )
        )

    def update(self, assigned: DataFrame) -> DataFrame:
        """(cluster, centroid): per-dimension mean of member vectors."""
        exploded = assigned.select(
            "cluster",
            F.posexplode(F.col(self.vec_col).cast("array<double>")).alias(
                "__dim", "__v"
            ),
        )
        means = exploded.groupBy("cluster", "__dim").agg(
            F.avg("__v").alias("__m")
        )
        return means.groupBy("cluster").agg(
            F.array_sort(
                F.collect_list(F.struct("__dim", "__m"))
            ).alias("__dm")
        ).select(
            "cluster",
            F.transform(F.col("__dm"), lambda s: s["__m"]).alias("centroid"),
        )

    def fit(self, corpus: DataFrame) -> DataFrame:
        """Run ``n_iter`` Lloyd rounds; returns the final assignment
        (id, vec, cluster, sq_dist). Empty clusters keep their previous
        centroid out of the update (they simply vanish from the mean table),
        matching the unrolled SQL replay."""
        return self.fit_with_centroids(corpus)[0]

    def fit_with_centroids(
        self, corpus: DataFrame
    ) -> tuple[DataFrame, DataFrame]:
        """(assignment, centroids): the final assignment plus the trained
        ``(cluster, centroid)`` table that produced it — the codebook a
        quantizer needs at search time."""
        cents = self.initial_centroids(corpus)
        assigned = self.assign(corpus, cents)
        for _ in range(self.n_iter - 1):
            cents = self.update(assigned)
            assigned = self.assign(corpus, cents)
        return assigned, cents
