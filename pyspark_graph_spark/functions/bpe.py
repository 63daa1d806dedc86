"""Distributed BPE merge learning (byte-pair encoding, word-level).

The tokenizer-training step of an LLM data pipeline, expressed as pure
DataFrame rounds (Sennrich et al. 2016): words are reduced to their
corpus frequencies once, then each round counts adjacent symbol pairs
(weighted by word frequency), picks the most frequent pair, and merges
its occurrences greedily left-to-right.

Determinism & cross-engine parity: the symbol sequence is carried as a
DOUBLE-SPACE-joined string with double-space edge guards
(``"  h  e  y  "``), and a merge of (l, r) is ONE literal string
replacement ``" l  r " -> " lr "`` — leftmost non-overlapping scan, the
exact greedy BPE application, and the identical primitive exists in SQL,
so the oracle replays the same rounds byte-for-byte. Ties break on
(count DESC, left ASC, right ASC).

Scale: the working set after the first aggregate is the word-frequency
table (vocabulary-sized — millions of rows at 100 TB, not the corpus).
Each round is one explode+sum over that table (map-side combined), a
1-row argmax broadcast, and a row-local replacement; the corpus itself is
touched exactly once. ``localCheckpoint`` per round caps lineage like
every other iterative operator here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_graph_spark.functions.text import tokens

SEP = "  "


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — the only corpus-wide pass."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """Symbol string = double-space-joined characters with edge guards."""
    return words.select(
        F.concat(
            F.lit(SEP), F.array_join(F.split("word", ""), SEP), F.lit(SEP)
        ).alias("s"),
        "freq",
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    toks = F.split(F.trim(F.col("s")), SEP)
    pairs = syms.select(
        "freq",
        F.explode(
            F.arrays_zip(
                F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
                F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            )
        ).alias("p"),
    )
    return pairs.select(
        F.col("p.0").alias("left"), F.col("p.1").alias("right"), "freq"
    ).groupBy("left", "right").agg(F.sum("freq").alias("pair_count"))


def learn_bpe_merges(
    docs: DataFrame, n_merges: int = 5, text_col: str = "text"
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges; returns
    ``(step, left, right, pair_count)`` with ``step`` starting at 1.
    """
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    spark = docs.sparkSession
    syms = _initial_symbols(word_frequencies(docs, text_col)).localCheckpoint()
    out_rows: list[DataFrame] = []
    for step in range(1, n_merges + 1):
        best = (
            _pair_counts(syms)
            .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
            .limit(1)
            .withColumn("step", F.lit(step))
        ).localCheckpoint()
        out_rows.append(
            best.select("step", "left", "right", "pair_count")
        )
        syms = (
            syms.crossJoin(F.broadcast(best.select("left", "right")))
            .select(
                F.replace(
                    F.col("s"),
                    F.concat(
                        F.lit(" "), F.col("left"), F.lit(SEP), F.col("right"), F.lit(" ")
                    ),
                    F.concat(
                        F.lit(" "), F.col("left"), F.col("right"), F.lit(" ")
                    ),
                ).alias("s"),
                "freq",
            )
            .localCheckpoint()
        )
    out = out_rows[0]
    for df in out_rows[1:]:
        out = out.unionByName(df)
    return out


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize with a learned merge list: ``(id, n_words, n_subwords)``.

    ``merges`` is ordinary planning-time metadata (the learned tokenizer,
    typically a few thousand pairs) compiled into a chain of literal
    replacements — row-local whole-stage-codegen expressions, zero
    shuffles before the final per-doc aggregate. Application order is the
    learned order, same greedy left-to-right semantics as learning.
    """
    word = F.explode(tokens(F.col(text_col))).alias("word")
    base = docs.select(F.col(id_col), word)
    s = F.concat(
        F.lit(SEP), F.array_join(F.split("word", ""), SEP), F.lit(SEP)
    )
    for left, right in merges:
        s = F.replace(
            s,
            F.lit(f" {left}{SEP}{right} "),
            F.lit(f" {left}{right} "),
        )
    return (
        base.select(F.col(id_col), s.alias("s"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.size(F.split(F.trim(F.col("s")), SEP))).alias(
                "n_subwords"
            ),
        )
    )
