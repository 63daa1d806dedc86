"""Rule-based document quality filtering (Gopher-style) and vocabulary
coverage curves — the cheap columnar gates that run BEFORE any expensive
model scoring in a training-data pipeline.

``gopher_rules`` applies the classic heuristic battery from the public
Gopher paper's data pipeline (Rae et al. 2021, appendix A — word-count
bounds, mean word length, symbol-to-word ratio, alphabetic-word fraction,
stopword evidence), re-expressed as pure ``pyspark.sql.functions``
expressions: one projection, no UDFs, whole-stage-codegen friendly, and
every ratio is a single division of exact integers so an external SQL
oracle reproduces it bit-for-bit.

``vocab_coverage`` computes the top-k vocabulary coverage curve (what
fraction of all token occurrences the k most frequent terms cover) — the
standard diagnostic before choosing tokenizer vocab sizes.  One explode +
one hash aggregate + a rank window over the (small) vocabulary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pyspark_graph_spark.functions.text import tokens

# compact stopword-evidence set (Gopher uses a similar small list)
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

MIN_WORDS = 50
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
MAX_SYMBOL_RATIO = 0.1
MIN_ALPHA_FRACTION = 0.8
MIN_STOPWORD_HITS = 2


def gopher_rules(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc quality metrics + per-rule booleans + overall ``keep``.

    Columns: (id, n_words, mean_word_len, symbol_ratio, alpha_fraction,
    stopword_hits, r_word_count, r_word_len, r_symbol, r_alpha,
    r_stopwords, keep).  All metrics are exact-integer numerators and
    denominators divided once (rounded to 6), so the whole frame is
    SQL-oracle reproducible.
    """
    t = tokens(F.col(text_col))
    n = F.size(t).cast("long")
    # total characters across tokens (whitespace excluded by construction)
    chars = F.aggregate(
        t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    sym = F.aggregate(
        t,
        F.lit(0).cast("long"),
        lambda acc, x: acc
        + F.when(x.startswith("#") | x.contains("..."), F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    alpha = F.size(t) - F.size(F.filter(t, lambda x: x.rlike("^[^a-z]*$")))
    sw = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    hits = F.size(F.filter(t, lambda x: F.array_contains(sw, x)))

    mean_len = F.when(n > 0, F.round(chars / n, 6)).otherwise(F.lit(0.0))
    sym_ratio = F.when(n > 0, F.round(sym / n, 6)).otherwise(F.lit(0.0))
    alpha_frac = F.when(n > 0, F.round(alpha / n, 6)).otherwise(F.lit(0.0))

    out = df.select(
        F.col(id_col),
        n.alias("n_words"),
        mean_len.alias("mean_word_len"),
        sym_ratio.alias("symbol_ratio"),
        alpha_frac.alias("alpha_fraction"),
        hits.cast("long").alias("stopword_hits"),
    )
    r_wc = (F.col("n_words") >= MIN_WORDS) & (F.col("n_words") <= MAX_WORDS)
    r_wl = (F.col("mean_word_len") >= MIN_MEAN_WORD_LEN) & (
        F.col("mean_word_len") <= MAX_MEAN_WORD_LEN
    )
    r_sym = F.col("symbol_ratio") <= MAX_SYMBOL_RATIO
    r_alpha = F.col("alpha_fraction") >= MIN_ALPHA_FRACTION
    r_sw = F.col("stopword_hits") >= MIN_STOPWORD_HITS
    return out.select(
        "*",
        r_wc.alias("r_word_count"),
        r_wl.alias("r_word_len"),
        r_sym.alias("r_symbol"),
        r_alpha.alias("r_alpha"),
        r_sw.alias("r_stopwords"),
        (r_wc & r_wl & r_sym & r_alpha & r_sw).alias("keep"),
    )


def vocab_coverage(
    df: DataFrame,
    ks: list[int],
    text_col: str = "text",
) -> DataFrame:
    """(k, vocab_size, covered, total, coverage) per requested k.

    ``coverage`` = occurrences of the k most frequent terms / all
    occurrences (ties broken by term for determinism).  The vocabulary
    aggregate is the only shuffle; only ranks <= max(ks) matter for
    coverage, so the rank window runs over a TakeOrdered top-max(k)
    slice (k rows in one partition), never the full vocabulary — at
    corpus scale the vocab itself can be billions of junk tokens.
    """
    if not ks or any(k < 1 for k in ks):
        raise ValueError("ks must be positive")
    tf = (
        df.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("term"))
    ranked = (
        tf.orderBy(F.desc("cnt"), F.asc("term"))
        .limit(max(ks))
        .select("term", "cnt", F.row_number().over(w).alias("rank"))
    )
    totals = tf.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("vocab_size")
    )
    out = None
    for k in ks:
        cov = (
            ranked.filter(F.col("rank") <= k)
            .agg(F.sum("cnt").alias("covered"))
            .crossJoin(F.broadcast(totals))
            .select(
                F.lit(k).cast("long").alias("k"),
                "vocab_size",
                F.col("covered").cast("long").alias("covered"),
                "total",
                F.round(F.col("covered") / F.col("total"), 6).alias(
                    "coverage"
                ),
            )
        )
        out = cov if out is None else out.unionByName(cov)
    return out
