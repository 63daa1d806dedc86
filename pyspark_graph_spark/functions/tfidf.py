"""TF-IDF weighting and BM25 retrieval over a document corpus.

Engine extension (no analogue in the graph reference — SURVEY.md §2
"planned extension operators"): the classic lexical relevance stack a
training-data pipeline needs for corpus analysis, quality filtering and
query-based selection.

Everything is built-in Column expressions over an exploded token stream —
JVM-side, whole-stage-codegen, no UDFs — and every formula is expressible
in ANSI SQL so the DuckDB oracle can recompute it exactly.

100 TB design notes:

- tokenize→explode→groupBy(doc, term) does ONE shuffle keyed on
  (doc_id, term); partial aggregation (map-side combine) collapses
  repeated terms before the exchange.
- document frequencies reuse the already-aggregated tf table (a second,
  much smaller shuffle on term alone) — never re-scan the raw text.
- the tf⋈df join shuffles on term; common-term skew is real at scale —
  AQE skew-join splitting handles it, and the BM25 path filters tf to the
  query's terms BEFORE the join (predicate prunes ~the whole corpus, and
  the few surviving df rows broadcast).
- scores use only IEEE mul/div/ln on (tf, df, N) — deterministic per
  engine; ranking ties are broken by term so ordering is reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyspark_graph_spark.functions.text import tokens

# BM25 constants (standard Robertson defaults)
BM25_K1 = 1.2
BM25_B = 0.75


def term_frequencies(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, term, tf): whitespace-token counts per document.

    One explode + one hash aggregate; the shuffle key (doc_id, term) is
    high-cardinality and near-uniform, so no skew handling is needed here.
    """
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_frequencies(tf: DataFrame) -> DataFrame:
    """(term, df): number of documents containing each term.

    Reuses the aggregated tf table — (doc_id, term) rows are unique, so
    ``count(*)`` per term IS the document frequency; never re-tokenize.
    """
    return tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def tfidf(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, term, tf, score): smooth TF-IDF.

    score = tf * (ln((N + 1)/(df + 1)) + 1)   (sklearn's smooth idf).

    The tf⋈df equi-join on term is the only wide join; at 100 TB AQE's
    skew-split covers hot terms ("the") and the df side is orders of
    magnitude smaller than tf after aggregation.
    """
    tf = term_frequencies(docs, id_col, text_col)
    df = doc_frequencies(tf)
    n_docs = docs.select(F.count(F.lit(1)).alias("n"))
    return (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_docs))  # 1-row global count: broadcast
        .select(
            "doc_id",
            "term",
            "tf",
            (
                F.col("tf")
                * (
                    F.log((F.col("n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
                    + F.lit(1.0)
                )
            ).alias("score"),
        )
    )


def tfidf_topk(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k TF-IDF terms per document (keyword extraction).

    Ranking is (score DESC, term ASC): mathematically-equal scores only
    arise from equal (tf, df), which both engines compute to the same
    double, so the term tiebreak makes the cut deterministic and
    oracle-reproducible. The window partitions by doc_id — embarrassingly
    parallel after the tf⋈df join.
    """
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term")
    )
    return (
        tfidf(docs, id_col, text_col)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "doc_id",
            "term",
            "tf",
            F.round("score", 6).alias("tfidf"),
        )
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, score): Okapi BM25 relevance of every matching document to
    a bag-of-terms query.

    idf(t)   = ln(1 + (N - df + 0.5)/(df + 0.5))
    score(D) = Σ_t idf(t) * tf * (k1 + 1) / (tf + k1*(1 - b + b*|D|/avgdl))

    Scale shape: ``term IN (query)`` filters the tf stream BEFORE any
    join — at 100 TB this prunes the corpus to the posting lists of the
    query's terms; the surviving df/doclen sides are tiny and broadcast.
    """
    tf = term_frequencies(docs, id_col, text_col).filter(
        F.col("term").isin(query_terms)
    )
    # the filtered tf stream still contains EVERY document that has each
    # query term, so per-term row counts over it ARE the full-corpus
    # document frequencies — one tokenize pass, not two
    df = doc_frequencies(tf)
    doclen = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens(F.col(text_col))).cast("double").alias("dl"),
    )
    stats = docs.select(
        F.count(F.lit(1)).cast("double").alias("n"),
    ).crossJoin(
        doclen.select(F.avg("dl").alias("avgdl"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_term = (
        F.col("tf")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    return (
        tf.join(F.broadcast(df), "term")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "term", (idf * tf_term).alias("contrib"))
        .groupBy("doc_id")
        .agg(F.sum("contrib").alias("score"))
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    **kwargs,
) -> DataFrame:
    """Top-k documents for a query, deterministic (score DESC, doc_id ASC).

    Global top-k over the scored stream is a TakeOrdered (per-partition
    heap + single driver merge of k rows) — no full sort at scale.
    """
    scored = bm25_scores(docs, query_terms, **kwargs)
    # rank by the ROUNDED score: mathematically-tied docs can drift a ulp
    # under Spark's nondeterministic partial-agg summation order, so the
    # raw double is not a reproducible sort key at the cut — the rounded
    # one is, with doc_id breaking the (now exact) ties
    return (
        scored.select("doc_id", F.round("score", 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col("doc_id"))
        .limit(k)
    )


def tfidf_cosine_pairs(
    docs: DataFrame,
    threshold: float = 0.9,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_frac: float = 0.2,
    max_df_abs: int = 1000,
) -> DataFrame:
    """(a, b, cosine) doc pairs whose TF-IDF vectors have cosine >=
    threshold — SPARSE-vector similarity join via the inverted term
    index: dot products accumulate only over SHARED terms (one term-keyed
    equi-join + a pair-keyed aggregation), norms are per-doc aggregates
    joined at the end. The sparse counterpart of the dense
    embedding-cosine dedup: no vector materialization.

    The df cap is NOT optional at scale, and it is TWO-SIDED: terms in
    more than ``max_df_frac`` of the corpus OR more than ``max_df_abs``
    documents are dropped from the vectors entirely (the stop-word
    contract — near-zero idf weight, Σdf² join cost). The absolute cap
    is what actually bounds the inverted-index join: Σdf² cost is set by
    absolute posting-list length, and a fraction-only cap stops binding
    whenever corpus growth outpaces df growth (measured: the 10× corpus
    took >10 min under a fraction-only cap because its per-shard
    stop-words sat below 0.2N; the absolute cap restored linear
    scaling). Cosine rounded to 6 so summation-order noise cannot flip
    hashes."""
    tf = term_frequencies(docs, id_col, text_col)
    dfreq = doc_frequencies(tf)
    n_docs = docs.select(F.count(F.lit(1)).alias("n"))
    w = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .filter(
            (F.col("df") <= F.col("n") * max_df_frac)
            & (F.col("df") <= max_df_abs)
        )
        .select(
            F.col("doc_id").alias("id"),
            "term",
            (
                F.col("tf")
                * (
                    F.log(
                        (F.col("n") + F.lit(1.0))
                        / (F.col("df") + F.lit(1.0))
                    )
                    + F.lit(1.0)
                )
            ).alias("w"),
        )
    )
    # the weight table feeds three consumers: materialize once
    w = w.localCheckpoint()
    nrm = w.groupBy("id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("__n")
    )
    a, b = w.alias("a"), w.alias("b")
    dots = (
        a.join(
            b,
            on=[
                F.col("a.term") == F.col("b.term"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .groupBy(F.col("a.id").alias("a"), F.col("b.id").alias("b"))
        .agg(F.sum(F.col("a.w") * F.col("b.w")).alias("__dot"))
    )
    na = nrm.select(F.col("id").alias("a"), F.col("__n").alias("__na"))
    nb = nrm.select(F.col("id").alias("b"), F.col("__n").alias("__nb"))
    cos = F.col("__dot") / (F.col("__na") * F.col("__nb"))
    return (
        dots.join(na, on="a")
        .join(nb, on="b")
        .filter(F.round(cos, 6) >= threshold)
        .select("a", "b", F.round(cos, 6).alias("cosine"))
    )
