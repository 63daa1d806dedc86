"""Chunk-level (CDC) dedup clustering with a fingerprint stop-list.

Pipeline: content-defined chunks (functions/packing.py:cdc_chunks) ->
documents sharing a chunk fingerprint become edges -> connected
components label each near-dup cluster by its minimum doc id.

The fingerprint self-join is the scale hazard (r9 verdict #2): a
ubiquitous chunk — a license header, a boilerplate footer — shared by k
documents emits C(k,2) candidate pairs BEFORE the distinct, so one
fingerprint with df = 10^6 at 100 TB is 5·10^11 pre-distinct rows in a
single join bucket. AQE skew-splitting rebalances the shuffle but cannot
reduce the pair count. The standard fix is the same one inverted-index
text search uses for stop words: a DOCUMENT-FREQUENCY STOP-LIST —
fingerprints shared by more than ``max_fingerprint_df`` distinct
documents carry no near-duplication signal (they are corpus boilerplate,
not copied content) and are excluded from pair generation entirely.
This bounds every join bucket at ``max_fingerprint_df`` members, i.e.
C(cap,2) pairs, making the join's output linear in the corpus.

The stop-list is a pure function of the corpus (one map-side-combined
``groupBy(fingerprint).count`` on the join's own key), so an external
SQL oracle replays it exactly with a ``HAVING COUNT(*) <= cap`` — the
``cdc_dedup_capped`` gate query verifies the capped path while it FIRES,
the same contract as ``dedup_simhash_capped`` (dedup/capping.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_graph_spark.constants import DST, ID, SRC

# Boilerplate threshold: a chunk shared verbatim by more than this many
# distinct documents is treated as corpus boilerplate, not duplication
# signal. Non-firing on the gate corpora (measured max df ~ tens at
# sf0.1), so the capped plan is value-identical there; at 100 TB it is
# the knob that keeps the self-join linear.
DEFAULT_MAX_FINGERPRINT_DF = 1024


def fingerprint_doc_pairs(
    chunks: DataFrame,
    max_fingerprint_df: int | None = DEFAULT_MAX_FINGERPRINT_DF,
    doc_col: str = "doc_id",
    fp_col: str = "fingerprint",
) -> DataFrame:
    """Distinct ``(src, dst)`` doc pairs (src < dst) sharing a chunk
    fingerprint, with fingerprints above the df stop-list threshold
    excluded BEFORE the self-join.

    The df count and the semi-join run on ``fp_col`` — the same key the
    pair join shuffles on — so the stop-list adds one map-side-combined
    aggregate and no extra shuffle stage beyond it.

    ``max_fingerprint_df`` must be >= 2 (a pair needs df 2) or ``None``
    to disable the stop-list entirely; values below 2 would silently
    drop EVERY fingerprint and return an empty pair set —
    indistinguishable from a genuinely duplicate-free corpus (r10
    ADVICE #3), so they raise instead.
    """
    if max_fingerprint_df is not None and max_fingerprint_df < 2:
        raise ValueError(
            "max_fingerprint_df must be >= 2 (a candidate pair needs a "
            f"fingerprint shared by 2 documents); got {max_fingerprint_df}. "
            "Pass None to disable the stop-list."
        )
    # materialize the (doc, fingerprint) membership ONCE: it feeds the df
    # aggregate, the stop-list semi-join, and BOTH sides of the pair
    # join — without the checkpoint the upstream chunking expression
    # (CDC hashing over full documents) re-executes per consumer, which
    # measured 4x the whole query's cost at sf0.1
    membership = chunks.select(doc_col, fp_col).distinct().localCheckpoint()
    if max_fingerprint_df is not None:
        keep = (
            membership.groupBy(fp_col)
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= F.lit(max_fingerprint_df))
            .select(fp_col)
        )
        membership = membership.join(keep, on=fp_col, how="semi")
    a = membership.select(F.col(doc_col).alias(SRC), fp_col)
    b = membership.select(F.col(doc_col).alias(DST), fp_col)
    return (
        a.join(b, on=fp_col)
        .filter(F.col(SRC) < F.col(DST))
        .select(SRC, DST)
        .distinct()
    )


def cdc_cluster_labels(
    docs: DataFrame,
    chunks: DataFrame,
    max_fingerprint_df: int | None = DEFAULT_MAX_FINGERPRINT_DF,
    doc_col: str = "doc_id",
) -> DataFrame:
    """``(doc_id, component)`` near-dup cluster labels, component = min
    doc id, every document labelled (singletons are their own cluster).

    Components run through AlternatingConnectedComponents: its O(log n)
    large-star/small-star fixpoint is diameter-INDEPENDENT, so a
    chain-shaped cluster (A~B, B~C, ... — each link a different shared
    chunk) can never be silently split by an iteration budget, the
    latent wrong-answer class Pregel min-label has (r9 verdict #4;
    ConnectedComponents now raises on truncation instead).
    """
    from pyspark_graph_spark.graph import Graph
    from pyspark_graph_spark.operators.connected_components import (
        AlternatingConnectedComponents,
    )

    pairs = fingerprint_doc_pairs(
        chunks, max_fingerprint_df=max_fingerprint_df, doc_col=doc_col
    ).localCheckpoint()
    g = Graph(
        docs.select(F.col(doc_col).alias(ID)),
        pairs,
        directed=False,
        indexed=True,
    )
    out = AlternatingConnectedComponents().run(g)
    return out.select(F.col(ID).alias(doc_col), "component")
