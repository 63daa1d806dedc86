"""Exact n-gram Jaccard near-duplicate detection via an inverted index.

Candidate pairs come from a self-equi-join on shared shingles (word
n-grams) — the same shared-key trick as the graph similarity operators, so
the candidate set is Σ_s df(s)² over shingle document-frequencies instead of
O(N²). Pairs are scored with exact Jaccard over distinct-shingle counts.

Fully SQL-expressible (shingling included), hence oracle-checkable — this is
the *exact* baseline the MinHash-LSH approximation is judged against.

Scale notes: ubiquitous shingles (df in the millions) explode the join; the
``max_shingle_df`` cap drops them (standard practice — a shingle appearing
everywhere carries no near-dup signal). One shuffle for the index, one for
the pair counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_graph_spark.functions.text import word_shingles

JACCARD = "jaccard"


class NgramJaccardDedup:
    def __init__(
        self,
        n: int = 3,
        threshold: float = 0.5,
        id_col: str = "doc_id",
        text_col: str = "text",
        max_shingle_df: int | None = None,
    ):
        self.n = n
        self.threshold = threshold
        self.id_col = id_col
        self.text_col = text_col
        self.max_shingle_df = max_shingle_df

    def shingle_index(self, docs: DataFrame) -> DataFrame:
        """(id, shingle) inverted-index rows, distinct per doc. Widened:
        shingling fuses into the scan (3.0 s → 1.6 s warm at sf0.1)."""
        from pyspark_graph_spark.functions.widen import widen_for_python

        docs = widen_for_python(docs)
        out = docs.select(
            F.col(self.id_col).alias("id"),
            F.explode(
                word_shingles(F.col(self.text_col), self.n)
            ).alias("shingle"),
        )
        if self.max_shingle_df is not None:
            hot = (
                out.groupBy("shingle")
                .agg(F.count(F.lit(1)).alias("df"))
                .filter(F.col("df") > self.max_shingle_df)
                .select("shingle")
            )
            out = out.join(F.broadcast(hot), on="shingle", how="anti")
        return out

    def pairs(self, docs: DataFrame) -> DataFrame:
        """(src, dst, jaccard) for pairs with jaccard >= threshold, src < dst."""
        # the index feeds three branches (both join sides + sizes);
        # checkpoint so shingling runs once, not three times
        index = self.shingle_index(docs).localCheckpoint()
        sizes = index.groupBy("id").agg(F.count(F.lit(1)).alias("__n"))
        a = index.alias("a")
        b = index.alias("b")
        common = (
            a.join(
                b,
                on=[
                    F.col("a.shingle") == F.col("b.shingle"),
                    F.col("a.id") < F.col("b.id"),
                ],
            )
            .groupBy(
                F.col("a.id").alias("src"), F.col("b.id").alias("dst")
            )
            .agg(F.count(F.lit(1)).alias("__common"))
        )
        return (
            common.join(
                sizes.withColumnsRenamed({"id": "src", "__n": "__na"}), "src"
            )
            .join(
                sizes.withColumnsRenamed({"id": "dst", "__n": "__nb"}), "dst"
            )
            .select(
                "src",
                "dst",
                (
                    F.col("__common")
                    / (F.col("__na") + F.col("__nb") - F.col("__common"))
                ).alias(JACCARD),
            )
            .filter(F.col(JACCARD) >= self.threshold)
        )
