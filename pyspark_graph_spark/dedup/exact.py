"""Exact deduplication: hash-groupBy on a normalized content fingerprint.

The canonical first pass of any dedup pipeline: one shuffle on the md5 of
normalized text. Fingerprints use md5 (not xxhash64) so the oracle can
reproduce them byte-for-byte.

Scale: the fingerprint groupBy is a single hash aggregation with map-side
partial combine; duplicate groups are tiny relative to the corpus, so the
keeper anti-join broadcasts. 100 TB-safe as-is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyspark_graph_spark.functions.text import content_fingerprint

FINGERPRINT = "fingerprint"
DUP_COUNT = "dup_count"


class ExactDedup:
    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col

    def fingerprints(self, docs: DataFrame) -> DataFrame:
        """(id, fingerprint, dup_count) — every doc with its content hash and
        the number of docs sharing it."""
        fp = docs.select(
            self.id_col,
            content_fingerprint(F.col(self.text_col)).alias(FINGERPRINT),
        )
        counts = fp.groupBy(FINGERPRINT).agg(
            F.count(F.lit(1)).alias(DUP_COUNT)
        )
        return fp.join(counts, on=FINGERPRINT).select(
            self.id_col, FINGERPRINT, DUP_COUNT
        )

    def duplicate_groups(self, docs: DataFrame) -> DataFrame:
        """(fingerprint, dup_count, doc_ids sorted) for groups of size > 1."""
        return (
            self.fingerprints(docs)
            .filter(F.col(DUP_COUNT) > 1)
            .groupBy(FINGERPRINT)
            .agg(
                F.first(DUP_COUNT).alias(DUP_COUNT),
                F.array_sort(F.collect_list(self.id_col)).alias("doc_ids"),
            )
        )

    def deduplicate(self, docs: DataFrame) -> DataFrame:
        """Keep exactly one doc (lowest id) per fingerprint."""
        w = Window.partitionBy(content_fingerprint(F.col(self.text_col))).orderBy(
            F.col(self.id_col)
        )
        return (
            docs.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
