"""Cross-document duplicate-span detection and removal.

Document-level near-dedup (MinHash/SimHash/SemDeDup, siblings in this
package) misses the pervasive *partial* duplication in web corpora: boiler-
plate headers, license blocks, quoted passages repeated across otherwise
distinct pages. The remedy popularized by "Deduplicating Training Data
Makes Language Models Better" (Lee et al., 2022) is span-level: find every
n-token window whose hash occurs in more than one document and strip the
covered tokens.

Pipeline (all built-in expressions, no UDFs):

1. tokenize (lowercase, whitespace) and build every n-gram window's 60-bit
   md5 hash with its start position — one ``transform(sequence(...))`` per
   document, token stream never leaves the executors;
2. hash → count distinct documents; hashes seen in ≥ ``min_docs`` docs form
   the (small — only genuinely repeated text) duplicate vocabulary, which
   the optimizer broadcasts back onto the occurrence stream;
3. occurrences expand to covered token positions (``sequence`` + explode,
   bounded by n per occurrence, deduplicated);
4. per document: covered-token count, duplication ratio, and the md5
   fingerprint of the cleaned text (covered tokens removed, order kept).

Scale: the only corpus-sized shuffles are the n-gram hash aggregation and
the per-document regroup — both key-hashed, no all-pairs stage anywhere;
the duplicate vocabulary is output-sized (repeated spans only), the classic
broadcast side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_graph_spark.functions.hashing import md5_hash60


def duplicate_spans(
    docs: DataFrame,
    n: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document duplicated-span stats + cleaned-text fingerprint.

    Returns ``(doc_id, n_tokens, dup_tokens, dup_ratio, clean_fingerprint)``
    where ``dup_tokens`` counts tokens covered by at least one n-gram whose
    hash appears in ≥ ``min_docs`` distinct documents, and
    ``clean_fingerprint`` is the md5 of the document with those tokens
    removed (token order preserved).
    """
    from pyspark_graph_spark.functions.widen import widen_for_python

    # tokenization + per-window hashing fuse into the scan stage; widen
    # few-split inputs so they run at thread width (functions/widen.py)
    docs = widen_for_python(docs)
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
        ).alias("t"),
    )

    # n-gram hash + 0-based start position; short docs yield no windows
    grams = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("t") >= n,
                F.transform(
                    F.sequence(F.lit(0), F.size("t") - n),
                    lambda i: F.struct(
                        i.alias("start"),
                        md5_hash60(
                            F.array_join(F.slice("t", i + 1, n), " ")
                        ).alias("h"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<start:int,h:long>>"))
        ).alias("g"),
    ).select("doc_id", "g.start", "g.h")

    dup_hashes = (
        grams.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("h")
    )
    covered = (
        grams.join(dup_hashes, on="h")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("start"), F.col("start") + (n - 1))
            ).alias("pos"),
        )
        .distinct()
    )

    tokpos = toks.select(
        "doc_id", F.posexplode("t").alias("pos", "tok")
    )
    kept = tokpos.join(covered, on=["doc_id", "pos"], how="anti")
    clean = kept.groupBy("doc_id").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "tok"))
                    ),
                    lambda s: s["tok"],
                ),
                " ",
            )
        ).alias("clean_fingerprint")
    )
    dup_counts = covered.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dup_tokens")
    )

    base = toks.select("doc_id", F.size("t").alias("n_tokens"))
    return (
        base.join(dup_counts, on="doc_id", how="left")
        .join(clean, on="doc_id", how="left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias(
                "dup_tokens"
            ),
            F.when(
                F.col("n_tokens") > 0,
                F.round(
                    F.coalesce("dup_tokens", F.lit(0))
                    / F.col("n_tokens"),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_ratio"),
            # a fully-covered doc has no kept rows → empty-string cleaning
            F.coalesce("clean_fingerprint", F.md5(F.lit("")))
            .alias("clean_fingerprint"),
        )
    )
