"""DSIR-style importance weights for data selection.

Data Selection via Importance Resampling (Xie et al., 2023): score every
raw document by how much more likely its features are under a *target*
distribution (the data you want more of) than under the raw corpus, then
resample proportionally. The published recipe uses hashed n-gram features
with bag-of-words likelihoods — exactly what fits a distributed engine:

1. hash each token into ``buckets`` feature buckets (60-bit md5, modulo);
2. estimate add-one-smoothed bucket distributions for the target subset
   and for the full corpus — two token-count aggregations, each producing
   a ≤ ``buckets``-row model that the optimizer broadcasts;
3. per-document importance weight = mean over tokens of
   ``log2(p_target(bucket) / p_corpus(bucket))``.

Positive scores mean "looks like the target"; resampling keeps the top
mass. The corpus-sized token stream is only ever aggregated by bucket and
by doc — the models are the only small side, so the plan is two map-side-
combinable aggregations plus one broadcast join, independent of corpus
size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyspark_graph_spark.functions.hashing import md5_hash60


def dsir_weights(
    docs: DataFrame,
    target: Column,
    buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document DSIR importance weight against a target subset.

    ``target`` is a boolean Column over ``docs`` rows selecting the target
    distribution's documents (e.g. ``F.col("lang") == "en"``). Returns
    ``(doc_id, n_tokens, dsir_weight)`` with the weight rounded to 6dp.
    """
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        target.alias("__target"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
            )
        ).alias("token"),
    ).withColumn("bucket", F.pmod(md5_hash60(F.col("token")), F.lit(buckets)))

    corpus = tok.groupBy("bucket").agg(F.count(F.lit(1)).alias("c_raw"))
    tgt = (
        tok.filter("__target")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c_tgt"))
    )
    model = (
        corpus.join(tgt, on="bucket", how="left")
        .select(
            "bucket",
            F.col("c_raw"),
            F.coalesce("c_tgt", F.lit(0)).alias("c_tgt"),
        )
    )
    totals = model.agg(
        F.sum("c_raw").alias("t_raw"), F.sum("c_tgt").alias("t_tgt")
    )
    scored = (
        tok.join(model, on="bucket")
        .join(F.broadcast(totals))
        .withColumn(
            "__lr",
            F.log2(
                ((F.col("c_tgt") + 1) / (F.col("t_tgt") + buckets))
                / ((F.col("c_raw") + 1) / (F.col("t_raw") + buckets))
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg("__lr"), 6).alias("dsir_weight"),
    )
