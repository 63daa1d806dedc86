"""Random-hyperplane LSH (multi-table forest) for approximate cosine search.

Per-bit collision probability for vectors at angle θ is 1-θ/π, so a single
b-bit table collides with probability (1-θ/π)^b — hopeless for the weakly
correlated neighbors real embedding corpora have (θ ≈ 60-75°). The standard
fix is an **LSH forest**: L independent tables of b planes each; a pair is a
candidate if it collides in *any* table (recall 1-(1-p^b)^L), with 1-bit
multi-probe on the query side widening each table further.

All sketching is row-local built-in expressions (literal plane arrays,
zip_with/aggregate dot products) — zero shuffles, no UDFs, no plane table to
join. The only shuffle is the candidate join on (table, bucket).

Scale: corpus rows explode ×L into the index (the classic LSH space/recall
trade); bucket fan-in is corpus/2^b per table — size b to keep buckets
shallow and let AQE split stragglers. Exact cosine re-rank bounds the
false-positive cost.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pyspark_graph_spark.functions.vectors import cosine_similarity_arrow

SIM = "cosine_sim"
RANK = "rank"


class RandomHyperplaneLSH:
    def __init__(
        self,
        dim: int,
        num_tables: int = 16,
        planes_per_table: int = 6,
        k: int = 5,
        multi_probe: bool = True,
        seed: int = 42,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        max_bucket_size: int | None = None,
    ):
        self.dim = dim
        self.num_tables = num_tables
        self.planes_per_table = planes_per_table
        self.k = k
        self.multi_probe = multi_probe
        self.id_col = id_col
        self.vec_col = vec_col
        # opt-in corpus-side hot-bucket cap (dedup/capping.py mechanism):
        # on a degenerate corpus (mass-identical embeddings) one (table,
        # bucket) key can hold a large share of the corpus, making the
        # candidate stage ~|queries in bucket| × |bucket|. Off by default —
        # the gate's frozen-plane oracles replay the forest EXACTLY, and
        # z-scoring already prevents anisotropic collapse on real corpora —
        # but at 100 TB a known-degenerate corpus should set it; the top-k
        # re-rank then sees ~cap candidates per colliding table instead of
        # the full bucket, with recall backed by the remaining tables.
        self.max_bucket_size = max_bucket_size
        rng = random.Random(seed)
        # gaussian planes (better-behaved than ±1 for low dim counts),
        # flattened to one (tables*planes) x dim matrix
        self.planes = [
            [rng.gauss(0.0, 1.0) for _ in range(dim)]
            for _ in range(num_tables * planes_per_table)
        ]

    def _plane_df(self, df: DataFrame) -> DataFrame:
        """Broadcastable (dim, table, plane, w) weight table."""
        spark = df.sparkSession
        rows = [
            (d, t, p, self.planes[t * self.planes_per_table + p][d])
            for t in range(self.num_tables)
            for p in range(self.planes_per_table)
            for d in range(self.dim)
        ]
        return spark.createDataFrame(rows, "dim int, table int, plane int, w double")

    def sketch(self, df: DataFrame, attach_vectors: bool = True) -> DataFrame:
        """(id, __v, table, bucket) — one row per table per vector; with
        ``attach_vectors=False``, (id, table, bucket) only, skipping the
        rows×tables re-join entirely (the dedup candidate path carries ids
        alone into its bucket self-join and re-joins vectors only for the
        surviving distinct pairs — round-6 advice).

        Sketching is a broadcast equi-join against the weight table plus two
        partial aggregations — every operator whole-stage-codegen. Earlier
        row-local HOF formulations were either ~18 s of driver-side plan
        analysis (per-plane unrolled literals) or interpreted per-element
        execution (nested-literal transform); this shape measured fastest
        and scales: ~(rows × dim × planes) codegen join rows, two shuffles
        of (rows × tables) keys.

        The input is widened first: the explode fans every input row out
        ×dim×(tables·planes), so a few-split scan (single-row-group
        parquet) would pin the whole sketch stage to one task — measured
        as a 2-core ceiling on a 20k-vector corpus at real-sf1. Same
        plan-shape-gated repartition as the media codec hop.
        """
        from pyspark_graph_spark.multimodal.binary_ops import (
            widen_for_python,
        )

        df = widen_for_python(df)
        exploded = df.select(
            F.col(self.id_col).alias("id"),
            F.posexplode(F.col(self.vec_col).cast("array<double>")).alias(
                "dim", "__x"
            ),
        )
        # the dot is rounded to 9 decimals BEFORE the sign test: Spark sums
        # the partials in partition order (nondeterministic) while a SQL
        # oracle sums sequentially, so a dot within float-accumulation
        # error of zero could otherwise flip a bucket bit between engines
        # (round-6 advice; mirrors the 6-dp treatment of the z-score stats)
        dots = (
            exploded.join(F.broadcast(self._plane_df(df)), on="dim")
            .groupBy("id", "table", "plane")
            .agg(F.round(F.sum(F.col("__x") * F.col("w")), 9).alias("__dot"))
        )
        buckets = dots.groupBy("id", "table").agg(
            F.sum(
                F.when(
                    F.col("__dot") > 0,
                    F.pow(F.lit(2.0), F.col("plane")).cast("int"),
                ).otherwise(F.lit(0))
            )
            .cast("int")
            .alias("bucket")
        )
        if not attach_vectors:
            return buckets
        return buckets.join(
            df.select(
                F.col(self.id_col).alias("id"),
                F.col(self.vec_col).alias("__v"),
            ),
            on="id",
        )

    def _probe(self, sketched: DataFrame) -> DataFrame:
        """Expand query rows with single-bit-flip probe buckets per table."""
        if not self.multi_probe:
            return sketched
        flips = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << p))
                for p in range(self.planes_per_table)
            ],
        )
        return sketched.withColumn("bucket", F.explode(flips))

    def topk(self, corpus: DataFrame, queries: DataFrame) -> DataFrame:
        """(query_id, neighbor_id, cosine_sim, rank) — approximate top-k."""
        c = self.sketch(corpus).withColumnsRenamed(
            {"id": "neighbor_id", "__v": "__cv"}
        )
        if self.max_bucket_size is not None:
            from pyspark_graph_spark.dedup.capping import cap_buckets

            c = cap_buckets(
                c,
                keys=("table", "bucket"),
                member_col="neighbor_id",
                cap=self.max_bucket_size,
            )
        q = self._probe(
            self.sketch(queries).withColumnsRenamed(
                {"id": "query_id", "__v": "__qv"}
            )
        )
        cand = (
            c.join(F.broadcast(q), on=["table", "bucket"])
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id", "__qv", "__cv")
            .distinct()
        )
        scored = cand.select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity_arrow(F.col("__qv"), F.col("__cv")), 6).alias(
                SIM
            ),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc(SIM), F.asc("neighbor_id")
        )
        return scored.withColumn(RANK, F.row_number().over(w)).filter(
            F.col(RANK) <= self.k
        )
