"""Incremental deduplication: admit a new batch against an existing corpus.

The production shape of dedup at 100 TB is not "dedup the whole corpus
every day" — it is "dedup today's crawl against the already-clean corpus".
This module expresses that as two bounded passes over the (small) batch:

1. **Exact pass**: md5 content fingerprints; a batch doc whose fingerprint
   already exists in the corpus is dropped (anti-join on the fingerprint).
2. **Near-dup pass**: MinHash band buckets of the batch joined against the
   corpus's band buckets — only bucket collisions become candidates, never
   the batch x corpus product — then exact shingle-Jaccard verification
   (no false positives survive; recall is the standard LSH S-curve at the
   configured bands/rows).

Scale notes: both passes shuffle on content-derived keys (fingerprint,
(band, bucket)) whose cardinality scales with the corpus, not with V^2.
In production the corpus side is a *precomputed index* — fingerprints and
band buckets stored as tables bucketed by their join key (sources/io.py
bucketed catalog tables), so admitting a batch shuffles ONLY the batch:
corpus-side shuffle is eliminated by bucketing, and the batch side is
broadcast when small enough. Signatures/buckets for admitted docs are
appended to the index; nothing is ever recomputed for the standing corpus.
Here both sides are computed inline (the synthetic tables carry no index),
which is the same logical plan with the index build inlined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_graph_spark.dedup.exact import FINGERPRINT, ExactDedup
from pyspark_graph_spark.dedup.minhash import JACCARD, MinHashLSH


class IncrementalDedup:
    """Admission filter for a new document batch against a standing corpus.

    A batch doc is admitted iff it is neither an exact duplicate
    (identical normalized-content fingerprint) nor a near-duplicate
    (verified shingle Jaccard >= ``threshold``) of ANY corpus doc.
    Batch-internal duplicates are deliberately out of scope — run the
    batch through :class:`ExactDedup` / :class:`MinHashLSH` first; this
    operator answers only "is it new relative to the corpus".
    """

    def __init__(
        self,
        threshold: float | None = None,
        id_col: str = "doc_id",
        text_col: str = "text",
        minhash: MinHashLSH | None = None,
    ):
        if threshold is not None and minhash is not None:
            raise ValueError(
                "pass either threshold (to build the default MinHashLSH) or "
                "a pre-configured minhash, not both — near_matches verifies "
                "against minhash.threshold, so a separate threshold would "
                "be silently ignored"
            )
        self.id_col = id_col
        self.text_col = text_col
        self.exact = ExactDedup(id_col=id_col, text_col=text_col)
        self.minhash = minhash or MinHashLSH(
            threshold=0.5 if threshold is None else threshold,
            id_col=id_col,
            text_col=text_col,
        )

    def exact_hits(self, corpus: DataFrame, batch: DataFrame) -> DataFrame:
        """Batch ids whose exact fingerprint already exists in the corpus."""
        bfp = self.exact.fingerprints(batch).select(self.id_col, FINGERPRINT)
        cfp = (
            self.exact.fingerprints(corpus)
            .select(FINGERPRINT)
            .distinct()
        )
        return bfp.join(cfp, on=FINGERPRINT).select(self.id_col).distinct()

    def near_matches(self, corpus: DataFrame, batch: DataFrame) -> DataFrame:
        """(batch_id, corpus_id, jaccard) verified near-dup cross matches."""
        mh = self.minhash
        cols = [self.id_col, self.text_col]
        bsig = mh.signatures(batch.select(*cols)).localCheckpoint()
        csig = mh.signatures(corpus.select(*cols)).localCheckpoint()
        bb = mh.band_buckets(bsig).alias("a")
        cb = mh.band_buckets(csig).alias("b")
        cand = (
            bb.join(
                cb,
                on=[
                    F.col("a.band") == F.col("b.band"),
                    F.col("a.bucket") == F.col("b.bucket"),
                ],
            )
            .select(
                F.col("a.id").alias("batch_id"),
                F.col("b.id").alias("corpus_id"),
            )
            .distinct()
        )
        bsh = bsig.select(F.col("id").alias("batch_id"), F.col("shingles").alias("__sa"))
        csh = csig.select(F.col("id").alias("corpus_id"), F.col("shingles").alias("__sb"))
        verified = (
            cand.join(bsh, on="batch_id")
            .join(csh, on="corpus_id")
            .select(
                "batch_id",
                "corpus_id",
                (
                    F.size(F.array_intersect("__sa", "__sb"))
                    / F.size(F.array_union("__sa", "__sb"))
                ).alias(JACCARD),
            )
        )
        return verified.filter(F.col(JACCARD) >= mh.threshold)

    def admitted(self, corpus: DataFrame, batch: DataFrame) -> DataFrame:
        """Batch docs that are new relative to the corpus (all batch
        columns preserved)."""
        drop_exact = self.exact_hits(corpus, batch)
        drop_near = (
            self.near_matches(corpus, batch)
            .select(F.col("batch_id").alias(self.id_col))
            .distinct()
        )
        return (
            batch.join(drop_exact, on=self.id_col, how="anti")
            .join(drop_near, on=self.id_col, how="anti")
        )
