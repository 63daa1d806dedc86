"""Benchmark decontamination: flag training documents that share n-gram
content with a held-out evaluation set.

Engine extension (no analogue in the graph reference): the standard
pre-training hygiene step — evaluation contamination is measured as word
n-gram overlap between each training document and each benchmark document
(the n-gram-collision method popularized by the GPT-3/PaLM data cards;
production uses n=8..13, the gate uses n=3 so the tiny synthetic corpus
actually collides).

100 TB design: the benchmark side is small by definition (benchmarks are
thousands of documents, not billions) — its distinct-gram set BROADCASTS,
so the only wide operation is the training corpus's explode→aggregate:
filter the exploded gram stream against the broadcast set FIRST, then one
(doc, bench) aggregate over the survivors (a tiny stream — most grams
match nothing). Never join two exploded corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_graph_spark.functions.text import word_shingles


def benchmark_overlap(
    docs: DataFrame,
    benchmarks: DataFrame,
    n: int = 3,
    min_frac: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """(doc_id, bench_id, n_overlap, overlap_frac): distinct word-n-gram
    collisions per (training doc, benchmark doc) pair, with
    ``overlap_frac`` = collisions / |benchmark grams| (the fraction of the
    BENCHMARK that leaks — the decontamination decision variable). Pairs
    with no collision are not emitted; ``min_frac`` filters further.
    """
    doc_grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("gram"),
    )
    bench_grams = benchmarks.select(
        F.col(bench_id_col).alias("bench_id"),
        F.explode(word_shingles(F.col(bench_text_col), n)).alias("gram"),
    )
    bench_sizes = bench_grams.groupBy("bench_id").agg(
        F.count(F.lit(1)).alias("bench_n")
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        hits.join(F.broadcast(bench_sizes), "bench_id")
        .select(
            "doc_id",
            "bench_id",
            "n_overlap",
            F.round(F.col("n_overlap") / F.col("bench_n"), 6).alias(
                "overlap_frac"
            ),
        )
        .filter(F.col("overlap_frac") >= min_frac)
    )


def contaminated_docs(
    docs: DataFrame,
    benchmarks: DataFrame,
    n: int = 3,
    min_frac: float = 0.5,
    **kwargs,
) -> DataFrame:
    """doc_ids leaking ≥ ``min_frac`` of ANY benchmark — the drop list a
    corpus-selection pipeline anti-joins against."""
    return (
        benchmark_overlap(docs, benchmarks, n, min_frac, **kwargs)
        .select("doc_id")
        .distinct()
    )
