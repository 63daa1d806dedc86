"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, MOSS).

Local document fingerprinting for substring-level duplicate detection:

1. normalize text (lowercase, collapse whitespace),
2. hash every k-char window (md5 — engine-portable),
3. slide a window of ``w`` consecutive k-gram hashes and keep the minimum
   of each window — the winnowing guarantee is that any shared substring
   of length >= k + w - 1 contributes at least one *identical* selected
   fingerprint to both documents,
4. match documents through an inverted index on the selected
   fingerprints — a bucketed equi-join keyed on the fingerprint hash,
   never an all-pairs comparison.

Implementation note (measured): the tempting all-array form
``transform(windows, i -> array_min(slice(hashes, i, w)))`` re-evaluates
the entire ``hashes`` subexpression per window element — Catalyst does
no common-subexpression elimination inside lambda bodies — turning an
O(n) hash pass into O(n²) (63 s for 50 docs). The shipped shape explodes
gram positions to rows, hashes each gram ONCE, and takes the window
minimum with a ROWS BETWEEN frame — one md5 per gram, one partition-by-id
window pass, all JVM-side.

Scale: the explode is O(chars) rows; the window partitions by doc id, so
state is bounded by ``prefix_chars`` per task; the match join shuffles on
the fingerprint value, so skew tracks the most-duplicated substring (cap
bucket size as the relief valve at corpus scale, same pattern as the
MinHash LSH band join in dedup/minhash.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def winnow_select(
    docs: DataFrame,
    k: int = 8,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_chars: int = 512,
) -> DataFrame:
    """(id, fp) — distinct winnowed fingerprints per document.

    ``fp`` is the md5 hex digest of the selected k-char window.
    Documents with fewer than k + w - 1 normalized chars produce no rows.
    """
    if k < 2 or w < 1:
        raise ValueError("need k >= 2 and w >= 1")
    # per-gram md5s fuse into the scan stage; widen few-split inputs so
    # they run at thread width (winnow_matches 13.2 s → 5.1 s at sf0.1)
    from pyspark_graph_spark.functions.widen import widen_for_python

    docs = widen_for_python(docs)
    t = F.substring(
        F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " "),
        1,
        prefix_chars,
    )
    n_grams = F.greatest(F.length(t) - (k - 1), F.lit(0))
    base = docs.select(
        F.col(id_col).alias("id"),
        t.alias("__t"),
        n_grams.alias("__n"),
    ).filter(F.col("__n") >= w)
    grams = base.select(
        "id",
        "__n",
        F.explode(F.sequence(F.lit(1), F.col("__n"))).alias("__i"),
        "__t",
    ).select(
        "id",
        "__n",
        "__i",
        # one md5 per gram — the whole point (see module docstring)
        F.md5(F.col("__t").substr(F.col("__i"), F.lit(k))).alias("__h"),
    )
    win = (
        Window.partitionBy("id").orderBy("__i").rowsBetween(0, w - 1)
    )
    return (
        grams.select(
            "id",
            "__i",
            "__n",
            F.min("__h").over(win).alias("fp"),
        )
        .filter(F.col("__i") <= F.col("__n") - (w - 1))
        .select("id", "fp")
        .distinct()
    )


def winnow_matches(
    docs: DataFrame,
    k: int = 8,
    w: int = 4,
    min_shared: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_chars: int = 512,
) -> DataFrame:
    """(a, b, shared_fps) doc pairs sharing >= min_shared fingerprints,
    a < b. Pairs are generated inside fingerprint buckets (inverted
    index), so cost tracks actual duplication, not corpus size squared."""
    fps = winnow_select(
        docs, k=k, w=w, id_col=id_col, text_col=text_col,
        prefix_chars=prefix_chars,
    )
    a = fps.alias("a")
    b = fps.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.fp") == F.col("b.fp"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .groupBy(F.col("a.id").alias("a"), F.col("b.id").alias("b"))
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )
