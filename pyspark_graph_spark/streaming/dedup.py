"""Streaming deduplication — the unbounded-stream counterpart of dedup/.

Exact dedup on a stream cannot keep infinite state; Spark's
``dropDuplicatesWithinWatermark`` bounds it: a key is remembered only while
it can still collide within the watermark horizon. Near-dup (MinHash) on a
stream follows the same shape with the fingerprint as the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_graph_spark.functions.text import content_fingerprint


def streaming_exact_dedup(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop docs whose normalized-content fingerprint was already seen
    within the watermark horizon. Works on batch frames too (falls back to
    plain dropDuplicates semantics per micro-batch on streams)."""
    fp = docs.withColumn("__fp", content_fingerprint(F.col(text_col)))
    if docs.isStreaming:
        return fp.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["__fp"]
        ).drop("__fp")
    return fp.dropDuplicates(["__fp"]).drop("__fp")
