"""Prefix-filtered set-similarity join (PPJoin-style, Xiao et al. 2008).

Exact all-pairs Jaccard join above a threshold t WITHOUT comparing all
pairs and WITHOUT even indexing all tokens: order each document's token
set rarest-first (global document frequency ascending), keep only the
first |set| - ceil(t·|set|) + 1 tokens as the *prefix*, and generate
candidate pairs only from shared prefix tokens. The prefix-filter lemma
guarantees zero false negatives: two sets with Jaccard >= t must share
at least one token inside both prefixes under any common total order.
Candidates are then verified with an exact intersection count over the
full index.

Scale shape vs the plain inverted index (dedup/ngram.py):
- the candidate join runs on the PREFIX index only — at t=0.8 that is
  ~20% of the tokens, and crucially it drops the *frequent* tail last
  (rare tokens first), so bucket sizes shrink quadratically where it
  matters;
- verification cost is |candidates| × avg set size, an equi-join on the
  candidate pair key — no skew beyond true duplication;
- the global df table is token-vocabulary-sized and re-used broadcast.

Everything is built-in expressions + joins; deterministic canonical
order (df, token) makes prefixes reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyspark_graph_spark.functions.text import word_shingles


class PrefixFilterSetJoin:
    """(a, b, jaccard) for doc pairs with token-set Jaccard >= threshold.

    ``n``: word-shingle width for the token sets (1 = unigram bag).
    """

    def __init__(
        self,
        threshold: float = 0.5,
        n: int = 2,
        id_col: str = "doc_id",
        text_col: str = "text",
    ):
        if not 0.0 < threshold <= 1.0:
            raise ValueError("threshold must be in (0, 1]")
        self.threshold = threshold
        self.n = n
        self.id_col = id_col
        self.text_col = text_col

    def token_index(self, docs: DataFrame) -> DataFrame:
        """(id, token) distinct inverted-index rows.

        Tokens are xxhash64-hashed to int64 BEFORE the distinct: the
        prefix-filter lemma holds under any common total order, and
        intersection counts are hash-invariant (collisions over a
        shingle vocabulary are ~10⁻¹¹-rare — the same bet Graph indexing
        makes), so every downstream shuffle/array moves 8-byte longs
        instead of shingle strings — measured 2-3× off the index build
        and the verification join. Widened: shingling fuses into the
        scan stage (functions/widen.py)."""
        from pyspark_graph_spark.functions.widen import widen_for_python

        docs = widen_for_python(docs)
        return (
            docs.select(
                F.col(self.id_col).alias("id"),
                F.explode(
                    word_shingles(F.col(self.text_col), self.n)
                ).alias("__tok"),
            )
            .select("id", F.xxhash64("__tok").alias("token"))
            .distinct()
        )

    def run(self, docs: DataFrame) -> DataFrame:
        t = self.threshold
        # the index feeds five consumers (df table, sizes, ranking, both
        # verification sides): materialize once instead of re-running the
        # explode+distinct per branch (same idiom as dedup/ngram.py)
        idx = self.token_index(docs).localCheckpoint()
        sizes = idx.groupBy("id").agg(F.count(F.lit(1)).alias("__n"))
        df_tbl = idx.groupBy("token").agg(F.count(F.lit(1)).alias("__df"))
        ranked = (
            idx.join(df_tbl, on="token")
            .join(sizes, on="id")
            .select(
                "id",
                "token",
                "__n",
                F.row_number()
                .over(
                    Window.partitionBy("id").orderBy(
                        F.asc("__df"), F.asc("token")
                    )
                )
                .alias("__pos"),
            )
        )
        prefix = ranked.filter(
            F.col("__pos")
            <= F.col("__n") - F.ceil(F.lit(t) * F.col("__n")) + 1
        ).select("id", "token", "__n", "__pos")
        a = prefix.alias("a")
        b = prefix.alias("b")
        # two more PPJoin pruning rules, applied INSIDE the candidate
        # join so pruned pairs never materialize:
        # - length filter: J >= t forces t·|a| <= |b| and t·|b| <= |a|
        # - positional filter: a match on the __pos-th ranked token caps
        #   the overlap at 1 + min(remaining tokens on each side), which
        #   must still reach ceil(t/(1+t)·(|a|+|b|))
        overlap_need = F.ceil(
            F.lit(t / (1.0 + t))
            * (F.col("a.__n") + F.col("b.__n"))
        )
        overlap_cap = F.lit(1) + F.least(
            F.col("a.__n") - F.col("a.__pos"),
            F.col("b.__n") - F.col("b.__pos"),
        )
        cand = (
            a.join(
                b,
                on=[
                    F.col("a.token") == F.col("b.token"),
                    F.col("a.id") < F.col("b.id"),
                    F.col("b.__n") >= F.ceil(F.lit(t) * F.col("a.__n")),
                    F.col("a.__n") >= F.ceil(F.lit(t) * F.col("b.__n")),
                    overlap_cap >= overlap_need,
                ],
            )
            .select(F.col("a.id").alias("a"), F.col("b.id").alias("b"))
            .distinct()
        )
        # exact verification, row-local: join each side's full sorted
        # token array once and intersect in-row — candidate × token-list
        # explosion never hits the shuffle
        arrays = idx.groupBy("id").agg(
            F.sort_array(F.collect_list("token")).alias("__toks"),
            F.count(F.lit(1)).alias("__n"),
        )
        aa = arrays.select(
            F.col("id").alias("a"),
            F.col("__toks").alias("__ta"),
            F.col("__n").alias("__na"),
        )
        bb = arrays.select(
            F.col("id").alias("b"),
            F.col("__toks").alias("__tb"),
            F.col("__n").alias("__nb"),
        )
        inter = F.size(F.array_intersect(F.col("__ta"), F.col("__tb")))
        jac = inter / (F.col("__na") + F.col("__nb") - inter)
        return (
            cand.join(aa, on="a")
            .join(bb, on="b")
            .filter(jac >= t)
            .select("a", "b", F.round(jac, 6).alias("jaccard"))
        )
