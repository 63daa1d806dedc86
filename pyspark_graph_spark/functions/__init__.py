from pyspark_graph_spark.functions.text import (
    content_fingerprint,
    language_guess,
    normalized_text,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
    word_shingles,
)
from pyspark_graph_spark.functions.vectors import cosine_similarity, dot, l2_norm
from pyspark_graph_spark.functions.lm import unigram_scores
from pyspark_graph_spark.functions.sampling import (
    deterministic_sample,
    quota_sample,
    stratified_sample,
)
from pyspark_graph_spark.functions.shuffle import assign_shards, write_shards
from pyspark_graph_spark.functions.sketch import (
    cms_estimate,
    cms_sketch,
    histogram_quantiles,
    hll_estimate,
    kmv_distinct,
)
from pyspark_graph_spark.functions.dsir import dsir_weights
from pyspark_graph_spark.functions.bpe import apply_bpe, learn_bpe_merges
from pyspark_graph_spark.functions.layout import zorder_write, zvalue
from pyspark_graph_spark.functions.lm import unigram_counts
from pyspark_graph_spark.functions.mixture import mixture_plan, skew_report

from pyspark_graph_spark.functions.itemsets import frequent_pairs, frequent_triples
from pyspark_graph_spark.functions.layout import hilbert_sql_ctes, with_hilbert_key
from pyspark_graph_spark.functions.sketch import bloom_build, bloom_positions, bloom_probe
__all__ = [
    "bloom_probe",
    "bloom_positions",
    "bloom_build",
    "with_hilbert_key",
    "hilbert_sql_ctes",
    "frequent_triples",
    "frequent_pairs",
    "content_fingerprint",
    "unigram_scores",
    "deterministic_sample",
    "quota_sample",
    "stratified_sample",
    "assign_shards",
    "write_shards",
    "kmv_distinct",
    "hll_estimate",
    "dsir_weights",
    "cms_estimate",
    "cms_sketch",
    "histogram_quantiles",
    "apply_bpe",
    "learn_bpe_merges",
    "zorder_write",
    "zvalue",
    "unigram_counts",
    "mixture_plan",
    "skew_report",
    "cosine_similarity",
    "dot",
    "l2_norm",
    "language_guess",
    "normalized_text",
    "punct_ratio",
    "quality_score",
    "stopword_ratio",
    "token_count",
    "tokens",
    "word_shingles",
]
