"""Product quantization (PQ) — compressed vector codes for billion-scale ANN.

Splits each d-dim embedding into ``m`` contiguous subvectors and k-means-
quantizes each subspace independently (Jegou et al. 2011, "Product
Quantization for Nearest Neighbor Search"): a vector compresses to ``m``
small codes (m bytes at k<=256) while asymmetric distances remain
computable from per-subspace lookup tables — the standard memory layout
under IVF-PQ indexes.

Spark-first: each subspace runs the existing deterministic
:class:`~pyspark_graph_spark.ann.kmeans.KMeans` (broadcast centroids,
corpus never shuffles for assignment, update shuffle O(partitions*k*d_sub));
the ``m`` assignments join back on the vector id — m-1 id-key joins of
id+code projections, AQE-broadcast when slim. Deterministic end to end
(lowest-id init), so the full encoding is SQL-replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_graph_spark.ann.kmeans import KMeans


class ProductQuantizer:
    def __init__(
        self,
        m: int = 4,
        k: int = 16,
        n_iter: int = 2,
        dim: int = 64,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ):
        if dim % m != 0:
            raise ValueError("dim must be divisible by m")
        self.m = m
        self.k = k
        self.n_iter = n_iter
        self.dim = dim
        self.d_sub = dim // m
        self.id_col = id_col
        self.vec_col = vec_col

    def encode(self, corpus: DataFrame) -> DataFrame:
        """(id, code_0..code_{m-1}, distortion): per-subspace nearest
        trained centroid and the summed squared reconstruction error.

        Delegates to :meth:`fit` (dropping the codebooks) so the training
        loop exists exactly once and cannot drift between the two paths.
        """
        return self.fit(corpus)[0]


    def fit(self, corpus: DataFrame) -> tuple[DataFrame, DataFrame]:
        """(codes, codebooks): per-vector codes (as :meth:`encode`) plus the
        trained codebooks ``(subspace, cluster, centroid)`` needed for
        asymmetric-distance search."""
        codes = None
        books = []
        for s in range(self.m):
            sub = corpus.select(
                self.id_col,
                F.slice(
                    F.col(self.vec_col).cast("array<double>"),
                    s * self.d_sub + 1,
                    self.d_sub,
                ).alias("embedding"),
            )
            km = KMeans(
                k=self.k,
                n_iter=self.n_iter,
                id_col=self.id_col,
                vec_col="embedding",
            )
            assigned, cents = km.fit_with_centroids(sub)
            part = assigned.select(
                self.id_col,
                F.col("cluster").cast("int").alias(f"code_{s}"),
                F.col("sq_dist").alias(f"__sq_{s}"),
            )
            codes = part if codes is None else codes.join(part, on=self.id_col)
            books.append(cents.select(F.lit(s).alias("subspace"), "cluster", "centroid"))
        book = books[0]
        for b in books[1:]:
            book = book.unionByName(b)
        total = sum(F.col(f"__sq_{s}") for s in range(self.m))
        codes = codes.select(
            self.id_col,
            *[f"code_{s}" for s in range(self.m)],
            F.round(total, 6).alias("distortion"),
        )
        return codes, book

    def adc_topk(
        self,
        codes: DataFrame,
        codebooks: DataFrame,
        queries: DataFrame,
        topk: int = 5,
    ) -> DataFrame:
        """(query_id, neighbor_id, est_dist, rank): asymmetric-distance
        top-k — exact query subvectors against quantized corpus codes.

        The classic PQ search shape: a per-query LOOKUP TABLE of
        ``m * k`` subspace distances (tiny — broadcast), then each corpus
        vector's estimated distance is ``m`` LUT probes summed; the
        corpus never re-touches raw vectors. Distances rounded to 6
        before ranking (ties -> neighbor id) for cross-engine stability.
        """
        q = queries.select(
            F.col(self.id_col).alias("query_id"),
            F.col(self.vec_col).cast("array<double>").alias("__qv"),
        )
        sub = F.slice(
            F.col("__qv"),
            F.col("subspace") * self.d_sub + 1,
            self.d_sub,
        )
        lut = q.crossJoin(F.broadcast(codebooks)).select(
            "query_id",
            "subspace",
            F.col("cluster").cast("int").alias("code"),
            F.aggregate(
                F.zip_with(sub, F.col("centroid"), lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d"),
        )
        # one broadcast LUT join per subspace keeps the distance sum in a
        # FIXED operand order (d0+d1+...), which a shuffled float SUM would
        # not guarantee — determinism beats the marginally smaller plan
        est = codes.select(
            F.col(self.id_col).alias("neighbor_id"),
            *[f"code_{s}" for s in range(self.m)],
        )
        for s in range(self.m):
            lut_s = lut.filter(F.col("subspace") == s).select(
                "query_id",
                F.col("code").alias(f"code_{s}"),
                F.col("d").alias(f"__d{s}"),
            )
            on = [f"code_{s}"] + (["query_id"] if s > 0 else [])
            est = est.join(F.broadcast(lut_s), on=on)
        total = F.col("__d0")
        for s in range(1, self.m):
            total = total + F.col(f"__d{s}")
        est = est.select(
            "query_id",
            "neighbor_id",
            F.round(total, 6).alias("est_dist"),
        ).filter(F.col("query_id") != F.col("neighbor_id"))
        from pyspark.sql import Window

        w = Window.partitionBy("query_id").orderBy(
            F.asc("est_dist"), F.asc("neighbor_id")
        )
        return (
            est.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= topk)
        )
