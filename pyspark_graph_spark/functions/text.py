"""Text-analysis column functions for training-data pipelines.

All pure built-in Column expressions (JVM-side, whole-stage-codegen
friendly) — no UDFs anywhere. Each function is deliberately expressible in
ANSI SQL so the DuckDB oracle can mirror it exactly; keep regexes to simple
character classes for cross-engine semantics.

These are the text primitives behind the dedup/ and quality-scoring queries
(absent from the graph reference — engine extensions per SURVEY.md §2
"planned extension operators").
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from pyspark_graph_spark.session import (
    default_parallelism as _default_parallelism,
)

# tiny per-language function-word lists for the n-gram/stopword heuristic
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "los", "y", "de", "es"],
}

ENGLISH_STOPWORDS = LANG_STOPWORDS["en"]


def normalized_text(c: Column) -> Column:
    """Lowercase, trim, collapse runs of whitespace to single spaces."""
    return F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")


def tokens(c: Column) -> Column:
    """Whitespace tokens of the lowercased text, empties dropped."""
    return F.filter(
        F.split(F.lower(c), r"\s+"), lambda t: t != F.lit("")
    )


def token_count(c: Column) -> Column:
    return F.size(tokens(c)).cast("long")


def word_shingles(c: Column, n: int = 3) -> Column:
    """Distinct word n-grams (space-joined) — the MinHash/Jaccard unit.

    Built by zipping the token array with its own shifted slices
    (``zip_with`` pads the shorter side with nulls; ``concat`` propagates
    them, and the final filter drops the ragged tail). ~2.5× faster than the
    index-lookup formulation (`transform` + `get` per position): one pass
    per gram order, no per-index element lookups.

    Docs with fewer than n tokens yield an empty array.
    """
    t = tokens(c)
    grams = t
    for j in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(t, j + 1, F.size(t)),
            lambda acc, nxt: F.concat(acc, F.lit(" "), nxt),
        )
    return F.array_distinct(F.filter(grams, lambda g: g.isNotNull()))


def content_fingerprint(c: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.

    md5 is available with identical semantics in Spark and DuckDB, so
    fingerprints are directly oracle-comparable (unlike xxhash64).
    """
    return F.md5(normalized_text(c))


# BPE-ish piece pattern: letter runs, single digits, single non-space
# symbols — the common shape LLM tokenizers produce. Kept to the
# Java-regex/RE2 common subset so the SQL oracle matches byte-for-byte.
BPE_PIECE_PATTERN = r"[a-z]+|[0-9]|[^a-z0-9\s]"


def subword_token_count(c: Column) -> Column:
    """BPE-ish token count (the LLM-budget estimate, vs whitespace words):
    letter runs cost ceil(len/4) tokens (~4 chars per merged subword),
    digits and symbols one each. Pure built-in expressions."""
    pieces = F.regexp_extract_all(
        F.lower(c), F.lit(BPE_PIECE_PATTERN), F.lit(0)
    )
    return F.aggregate(
        pieces,
        F.lit(0).cast("long"),
        lambda acc, p: acc
        + F.when(
            p.rlike("^[a-z]"), F.ceil(F.length(p) / F.lit(4.0))
        ).otherwise(F.lit(1)),
    )


def winnow_fingerprint(
    c: Column, k: int = 8, max_chars: int = 512, stride: int = 2
) -> Column:
    """Rolling-hash document fingerprint: the minimum md5-60-bit hash over
    ``k``-char windows of the normalized text (min-sampling as in
    winnowing — robust to content reordering/insertion at the edges, and
    exactly reproducible in SQL). Documents shorter than ``k`` hash their
    whole text.

    Cost control for the hot path: only the first ``max_chars`` chars are
    fingerprinted (prefix fingerprinting, standard practice) and windows
    start every ``stride`` positions — per-doc work is bounded by
    ``max_chars/stride`` hashes regardless of document length. The
    fingerprint is the lexicographic-min md5 hex string (identical
    ordering in Spark and SQL; cheaper than folding hex to an integer
    inside the per-window loop)."""
    t = F.substring(normalized_text(c), 1, max_chars)
    idx = F.sequence(
        F.lit(1),
        F.greatest(F.length(t) - F.lit(k - 1), F.lit(1)),
        F.lit(stride),
    )
    return F.array_min(
        F.transform(idx, lambda i: F.md5(F.substring(t, i, F.lit(k))))
    )


def winnow_fingerprints(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    max_chars: int = 512,
    stride: int = 2,
):
    """Frame-level ``winnow_fingerprint`` for the hot path: explode the
    window positions to rows so the per-window md5 runs inside
    whole-stage codegen, then min-aggregate per document (map-side
    partial min, one skinny shuffle). ~3× the row-local HOF version,
    which evaluates its lambda interpreted (same explode-vs-HOF trade as
    the MinHash signatures — see dedup/minhash.py)."""
    t = F.substring(normalized_text(F.col(text_col)), 1, max_chars)
    idx = F.sequence(
        F.lit(1),
        F.greatest(F.length(t) - F.lit(k - 1), F.lit(1)),
        F.lit(stride),
    )
    # spread the rows first: a small documents table often arrives as ONE
    # parquet split, which would serialize the ~max_chars/stride md5 calls
    # per doc onto a single core. A FIXED partition count is load-bearing:
    # repartition(col) leaves AQE free to coalesce these few KB of input
    # back into one partition, re-serializing the expensive projection
    # that follows
    return (
        df.repartition(_default_parallelism(df.sparkSession))
        .select(F.col(id_col), t.alias("__t"), F.explode(idx).alias("__i"))
        .select(
            id_col,
            F.md5(F.substring(F.col("__t"), F.col("__i"), F.lit(k))).alias(
                "__h"
            ),
        )
        .groupBy(id_col)
        .agg(F.min("__h").alias("winnow_fp"))
    )


def punct_ratio(c: Column) -> Column:
    """Punctuation chars / total chars (0 for empty strings)."""
    total = F.length(c)
    punct = total - F.length(F.regexp_replace(c, r"[.,;:!?]", ""))
    return F.when(total > 0, punct / total).otherwise(F.lit(0.0))


def stopword_ratio(c: Column, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are (English, by default) stopwords."""
    sw = F.array(*[F.lit(w) for w in (stopwords or ENGLISH_STOPWORDS)])
    t = tokens(c)
    hits = F.size(F.filter(t, lambda tok: F.array_contains(sw, tok)))
    return F.when(F.size(t) > 0, hits / F.size(t)).otherwise(F.lit(0.0))


def quality_score(c: Column) -> Column:
    """Crude [0,1] quality heuristic: rewards mid-length docs and a sane
    stopword presence, penalizes heavy punctuation. Deterministic,
    SQL-mirrorable; a placeholder for model-based scoring at the same
    pipeline position."""
    n = token_count(c)
    length_term = F.least(n / F.lit(100.0), F.lit(1.0))
    sw_term = F.least(stopword_ratio(c) * 5.0, F.lit(1.0))
    penalty = punct_ratio(c)
    score = (length_term + sw_term) / 2.0 - penalty
    return F.greatest(F.least(score, F.lit(1.0)), F.lit(0.0))


def language_guess(c: Column) -> Column:
    """Heuristic language id: highest stopword-hit count wins; ties resolve
    in fixed language order (en, de, fr, es); no hits -> 'und' (undetermined).

    A real pipeline swaps this for a model; the pipeline position (cheap
    columnar scoring before expensive downstream steps) is the point.
    """
    t = tokens(c)
    result = F.lit("und")
    best = F.lit(0)
    # iterate in reverse so earlier languages win ties via > comparison
    for lang in reversed(list(LANG_STOPWORDS)):
        sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
        hits = F.size(F.filter(t, lambda tok: F.array_contains(sw, tok)))
        result = F.when(hits >= best, F.lit(lang)).otherwise(result)
        best = F.greatest(hits, best)
    return F.when(best > 0, result).otherwise(F.lit("und"))


def all_word_shingles(c: Column, n: int = 2) -> Column:
    """Word n-grams WITH multiplicity (``word_shingles`` dedups) — the unit
    for repetition metrics, where duplicates are the signal."""
    t = tokens(c)
    grams = t
    for j in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(t, j + 1, F.size(t)),
            lambda acc, nxt: F.concat(acc, F.lit(" "), nxt),
        )
    return F.filter(grams, lambda g: g.isNotNull())


def dup_ngram_fraction(c: Column, n: int = 2) -> Column:
    """Fraction of n-gram occurrences that are repeats of an earlier one:
    ``1 - distinct/total`` (0 for docs shorter than n tokens). The
    Gopher-style repetition signal — high values mean boilerplate/spam."""
    grams = all_word_shingles(c, n)
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    return F.when(
        total > 0, (total - distinct) / total
    ).otherwise(F.lit(0.0))


# PII patterns kept to the Java-regex/RE2 common subset so the SQL oracle
# matches byte-for-byte; these are deliberately the standard simple shapes
# (emails, NANP-style phones, dotted-quad IPs) — a production pipeline
# swaps in a vetted detector at the same pipeline position.
PII_EMAIL_PATTERN = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PII_PHONE_PATTERN = r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b"
PII_IP_PATTERN = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def pii_counts(c: Column) -> tuple[Column, Column, Column]:
    """(n_emails, n_phones, n_ips) match counts."""
    return (
        F.regexp_count(c, F.lit(PII_EMAIL_PATTERN)),
        F.regexp_count(c, F.lit(PII_PHONE_PATTERN)),
        F.regexp_count(c, F.lit(PII_IP_PATTERN)),
    )


def redact_pii(c: Column) -> Column:
    """Replace emails/phones/IPs with fixed tokens (order matters: emails
    first so their digit runs can't half-match the phone pattern)."""
    out = F.regexp_replace(c, PII_EMAIL_PATTERN, "<EMAIL>")
    out = F.regexp_replace(out, PII_PHONE_PATTERN, "<PHONE>")
    return F.regexp_replace(out, PII_IP_PATTERN, "<IP>")
