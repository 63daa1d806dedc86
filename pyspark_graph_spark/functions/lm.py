"""Self-trained unigram language-model scoring (perplexity-proxy filter).

A standard corpus-quality signal without external model weights: train a
unigram model ON the corpus itself (token frequencies with add-one
smoothing) and score each document by its mean negative log2 token
probability. Gibberish and boilerplate-stuffed documents sit in the tails
of the resulting distribution; the common filter keeps a quantile band.

Plan shape (scale): one explode + term aggregate (map-side combined, term
cardinality ~ vocabulary, not corpus), one join of exploded tokens against
the term table — shuffled hash join on the term with AQE skew handling for
stopword-grade hot terms — and one per-doc aggregate. Nothing is
collected; vocabulary size and total count ride along as 1-row broadcast
aggregates. At 100 TB the term table is millions of rows (fits executor
hash maps after AQE decides to broadcast) while the token stream stays
fully distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_graph_spark.functions.text import tokens

NEG_LOG2_P = "neg_log2_p"


def unigram_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(token, count) over the corpus (whitespace tokens, lowercased)."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def unigram_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, neg_log2_p): mean -log2 P(token) per document under
    the corpus's own add-one-smoothed unigram model.

    P(t) = (count(t) + 1) / (total + vocab). Documents with zero tokens
    are omitted (no model support). Scores are rounded to 6 decimals so
    cross-engine float comparison is stable.
    """
    terms = unigram_counts(docs, text_col)
    totals = terms.agg(
        F.sum("cnt").alias("__total"),
        F.count(F.lit(1)).alias("__vocab"),
    )
    tok = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    )
    scored = (
        tok.join(terms, on="token")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                -F.avg(
                    F.log2(
                        (F.col("cnt") + 1)
                        / (F.col("__total") + F.col("__vocab"))
                    )
                ),
                6,
            ).alias(NEG_LOG2_P),
        )
    )
    return scored


def _bigrams(text_col):
    """(w1, w2) struct array with multiplicity from the token stream."""
    t = tokens(F.col(text_col))
    return F.when(
        F.size(t) >= 2,
        F.zip_with(
            F.slice(t, 1, F.size(t) - 1),
            F.slice(t, 2, F.size(t) - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(
        F.array().cast("array<struct<w1:string,w2:string>>")
    )


def bigram_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w1, w2, cnt) over all consecutive token pairs in the corpus."""
    return (
        docs.select(F.explode(_bigrams(text_col)).alias("b"))
        .groupBy(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c2"))
    )


def bigram_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_bigrams, neg_log2_p): mean -log2 P(w2|w1) per document under
    the corpus's own add-one-smoothed bigram model — the CCNet-style
    perplexity filter trained on the corpus itself (no external weights).

    P(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V).  Documents with fewer than
    two tokens are omitted (no bigram support).  Plan shape: two term
    aggregates (vocab- and bigram-cardinality, map-side combined), one
    hash join of the exploded bigram stream against each, one per-doc
    aggregate — nothing corpus-sized is ever broadcast or collected.
    """
    bc = bigram_counts(docs, text_col)
    uc = unigram_counts(docs, text_col).withColumnsRenamed(
        {"token": "w1", "cnt": "c1"}
    )
    vocab = uc.agg(F.count(F.lit(1)).alias("__v"))
    big = docs.select(
        F.col(id_col), F.explode(_bigrams(text_col)).alias("b")
    ).select(
        id_col,
        F.col("b.w1").alias("w1"),
        F.col("b.w2").alias("w2"),
    )
    return (
        big.join(bc, on=["w1", "w2"])
        .join(uc, on="w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                -F.avg(
                    F.log2(
                        (F.col("c2") + 1) / (F.col("c1") + F.col("__v"))
                    )
                ),
                6,
            ).alias(NEG_LOG2_P),
        )
    )
