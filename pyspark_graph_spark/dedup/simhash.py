"""SimHash near-duplicate detection (Charikar fingerprints).

A 64-bit fingerprint per document: each token hashes to 64 bits; per bit
position the fingerprint takes the sign of Σ(±1) across tokens. Hamming
distance between fingerprints approximates token-multiset dissimilarity.

Everything up to the fingerprint is **row-local** built-in expressions
(``aggregate`` over the token array folding a 64-counter array). Candidate
pairs use the pigeonhole block trick: fingerprints within Hamming distance
``max_hamming`` must agree on at least one of ``max_hamming + 1`` equal-width
bit blocks, so a self-equi-join on (block_idx, block_value) finds all of
them; a ``bit_count(xor)`` filter verifies exactly.

Scale: one shuffle for the block join; block keys are 16-bit values so
buckets stay shallow unless the corpus is pathologically uniform — but a
mass-boilerplate cluster (identical fingerprints) IS that pathology, and
its block bucket would emit O(n²) candidate pairs. ``max_block_size``
(default 4096) deterministically hash-thins any block bucket above the
cap before the join (see :mod:`pyspark_graph_spark.dedup.capping` for the
mechanism and recall contract; measured gate-corpus max block size is 170
at sf0.1, so oracle parity is unaffected).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyspark_graph_spark.functions.text import tokens

SIMHASH = "simhash"
HAMMING = "hamming"


def simhash64(text: Column, token_hash=None) -> Column:
    """64-bit SimHash of the whitespace tokens of ``text``.

    Bit positions are unrolled with literal shift counts (Spark's
    shiftright takes a Python int, not a Column), so the per-token inner
    array is a fixed 64-element expression — still fully JVM-side.

    ``token_hash`` (Column -> Column, default ``xxhash64``) supplies the
    per-token 64-bit hash; pass ``functions.hashing.md5_hash60`` for a
    fingerprint an external SQL engine can reproduce exactly (bits 60-63
    are then always 0 — harmless: the per-bit vote sums go negative and
    those fingerprint bits stay 0 on both sides).
    """
    # note: F.xxhash64 itself can't be the HOF lambda (varargs signature
    # rejected by transform's arity inspection) — wrap it
    token_hash = token_hash or (lambda t: F.xxhash64(t))
    th = F.transform(tokens(text), token_hash)
    bitsum = F.aggregate(
        th,
        F.array_repeat(F.lit(0), 64),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.shiftright(h, i).bitwiseAND(F.lit(1)).cast("int")
                    for i in range(64)
                ]
            ),
            lambda a, bit: a + bit * 2 - 1,
        ),
    )
    # bit weights; the sign bit's weight is long-min (1<<63 overflows signed)
    weights = [1 << i for i in range(63)] + [-(1 << 63)]
    packed = F.zip_with(
        bitsum,
        F.array(*[F.lit(w).cast("long") for w in weights]),
        lambda c, w: F.when(c > 0, w).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(
        packed, F.lit(0).cast("long"), lambda acc, v: acc.bitwiseOR(v)
    )


class SimHashDedup:
    def __init__(
        self,
        max_hamming: int = 3,
        id_col: str = "doc_id",
        text_col: str = "text",
        token_hash=None,
        max_block_size: int | None = 4096,
        thin_hash: str = "xxhash64",
    ):
        if max_block_size is not None and max_block_size < 2:
            raise ValueError("max_block_size must be >= 2 (or None)")
        self.max_hamming = max_hamming
        self.id_col = id_col
        self.text_col = text_col
        self.token_hash = token_hash
        self.blocks = max_hamming + 1
        self.max_block_size = max_block_size
        # 'md5' makes the thinning itself replayable by an external SQL
        # oracle (capping.py); the default stays the faster xxhash64
        self.thin_hash = thin_hash

    def fingerprints(self, docs: DataFrame) -> DataFrame:
        # per-token hashing fuses into the scan stage; widen few-split
        # inputs so it runs at thread width (2.6 s → 1.1 s at sf0.1)
        from pyspark_graph_spark.functions.widen import widen_for_python

        docs = widen_for_python(docs)
        return docs.select(
            F.col(self.id_col).alias("id"),
            simhash64(F.col(self.text_col), self.token_hash).alias(SIMHASH),
        )

    def pairs(self, docs: DataFrame) -> DataFrame:
        """(src, dst, hamming) for pairs within max_hamming, src < dst."""
        fp = self.fingerprints(docs).localCheckpoint()
        width = 64 // self.blocks
        blocked = fp.select(
            "id",
            SIMHASH,
            F.posexplode(
                F.array(
                    *[
                        F.shiftrightunsigned(
                            F.col(SIMHASH), b * width
                        ).bitwiseAND(F.lit((1 << width) - 1))
                        for b in range(self.blocks)
                    ]
                )
            ).alias("block", "block_val"),
        )
        from pyspark_graph_spark.dedup.capping import cap_buckets

        blocked = cap_buckets(
            blocked,
            keys=("block", "block_val"),
            member_col="id",
            cap=self.max_block_size,
            thin_hash=self.thin_hash,
        )
        a = blocked.alias("a")
        b = blocked.alias("b")
        return (
            a.join(
                b,
                on=[
                    F.col("a.block") == F.col("b.block"),
                    F.col("a.block_val") == F.col("b.block_val"),
                    F.col("a.id") < F.col("b.id"),
                ],
            )
            .select(
                F.col("a.id").alias("src"),
                F.col("b.id").alias("dst"),
                F.bit_count(
                    F.col(f"a.{SIMHASH}").bitwiseXOR(F.col(f"b.{SIMHASH}"))
                ).alias(HAMMING),
            )
            .distinct()
            .filter(F.col(HAMMING) <= self.max_hamming)
        )
