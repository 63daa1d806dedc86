"""Word co-occurrence statistics: adjacent-pair counts and PMI.

Engine extension for the embedding-training side of a data pipeline: PMI
(pointwise mutual information) over token co-occurrence is the classic
signal behind count-based embeddings and collocation mining
("new york" vs "the the").

    pmi(a,b) = ln( (c_ab / N_pairs) / ((c_a / N_uni) * (c_b / N_uni)) )

Pairs are ADJACENT tokens canonicalized by string order (a <= b), the
deterministic w=1 window; a wider window is the same shape with more
exploded rows.

100 TB: two explode→aggregate shuffles (pairs, unigrams) with map-side
partial counts, then two equi-joins keyed on the word — the unigram side
is vocabulary-sized (small after aggregation relative to the corpus) and
usually broadcasts; hot-word skew on the join is AQE-split. A
``min_count`` filter applies BEFORE the joins, cutting the pair stream to
the frequent tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_graph_spark.functions.text import tokens


def adjacent_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(w1, w2) one row per adjacent token pair, canonical string order."""
    t = tokens(F.col(text_col))
    # keep the RAW (a, b) struct and filter the zip_with padding row before
    # canonicalizing: least/greatest SKIP nulls in Spark, so canonicalizing
    # (last_token, NULL) first would fabricate a (tok, tok) self-pair per doc
    pairs = F.filter(
        F.zip_with(
            t,
            F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("a"), b.alias("b")),
        ),
        lambda p: p["b"].isNotNull(),
    )
    return docs.select(F.explode(pairs).alias("p")).select(
        F.least("p.a", "p.b").alias("w1"),
        F.greatest("p.a", "p.b").alias("w2"),
    )


def pmi_pairs(
    docs: DataFrame,
    min_count: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(w1, w2, n_pair, pmi) for pairs seen >= min_count times."""
    pairs = adjacent_pairs(docs, id_col, text_col)
    pair_counts = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
    )
    toks = docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    totals = pairs.select(
        F.count(F.lit(1)).cast("double").alias("n_pairs")
    ).crossJoin(toks.select(F.count(F.lit(1)).cast("double").alias("n_uni")))
    return (
        pair_counts.join(
            F.broadcast(uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "c1")),
            "w1",
        )
        .join(
            F.broadcast(uni.withColumnRenamed("w", "w2").withColumnRenamed("c", "c2")),
            "w2",
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            "n_pair",
            F.round(
                F.log(
                    (F.col("n_pair") / F.col("n_pairs"))
                    / (
                        (F.col("c1") / F.col("n_uni"))
                        * (F.col("c2") / F.col("n_uni"))
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )


def doc_char_entropy(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_chars, entropy): Shannon entropy (nats) of each doc's
    lowercased character distribution — a cheap gibberish/boilerplate
    signal (very low: repeated filler; very high: random bytes).

    Explode → (doc, char) count → per-doc Σ -p·ln p, all codegen
    aggregates (a row-local HOF would rescan the char array per distinct
    char — the interpreted-lambda trap from SCALE.md). Docs with no
    characters get entropy 0.
    """
    chars = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), ""),
                lambda ch: ch != F.lit(""),
            )
        ).alias("ch"),
    )
    counts = chars.groupBy("doc_id", "ch").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_chars"),
        F.sum(F.col("c") * F.log("c")).alias("__clogc"),
    )
    # H = ln n - (Σ c·ln c)/n  (algebraically -Σ p ln p, fewer divisions)
    ent = per_doc.select(
        "doc_id",
        "n_chars",
        F.round(
            F.log(F.col("n_chars")) - F.col("__clogc") / F.col("n_chars"), 6
        ).alias("entropy"),
    )
    empty = docs.select(F.col(id_col).alias("doc_id")).join(
        ent.select("doc_id"), "doc_id", "left_anti"
    ).select(
        "doc_id",
        F.lit(0).cast("long").alias("n_chars"),
        F.lit(0.0).alias("entropy"),
    )
    return ent.unionByName(empty)
