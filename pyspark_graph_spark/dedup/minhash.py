"""MinHash + LSH banding near-duplicate detection.

Pipeline (all built-in expressions; signatures are computed **row-locally**
with higher-order functions — zero shuffles until the band join):

1. shingle: distinct word n-grams per doc (``word_shingles``)
2. sign: signature[i] = min over shingles of ``xxhash64(shingle, seed_i)``
   — a ``transform`` over seeds nesting a ``transform`` + ``array_min``
   over shingles; O(num_hashes × shingles) JVM ops per row, no explode
3. band: the signature is sliced into ``bands`` bands of ``rows_per_band``;
   each band hashes to a bucket key
4. candidates: docs sharing any band bucket (self-equi-join on the bucket
   key — the only shuffle in the pipeline)
5. verify: exact Jaccard over the docs' distinct-shingle arrays
   (``array_intersect``/``array_union``, row-local) filtered by ``threshold``

With b bands of r rows, the candidate probability for a pair with Jaccard s
is 1-(1-s^r)^b (the classic S-curve); the default 16×4 targets s ≈ 0.5.

Scale: the band join shuffles (bucket, doc) pairs — sublinear in corpus
pairs. Hot buckets (a viral-boilerplate cluster of n docs sharing a band
value) would emit O(n²) candidate pairs, which AQE skew-splitting balances
but cannot shrink; ``max_bucket_size`` (default 1024) deterministically
hash-thins any bucket above the cap down to ~cap members *before* the
self-join, bounding per-bucket output at ~cap²/2 pairs. Recall contract:
a true near-dup pair is lost only if it is thinned out of **every** band
it collides in — with b=16 bands and per-band survival (cap/n)², a pair
of identical docs in an n-doc bucket is still found w.p.
1-(1-(cap/n)²)¹⁶; more importantly, members of such mega-clusters are
interchangeable (they all exceeded the same bucket), so downstream
connected-components clustering loses only pair edges, not cluster
membership of the surviving representatives. The cap is far above any
gate-corpus bucket (measured max 4 at sf0.1), so exact-oracle parity is
unaffected; at 100 TB it is the difference between a bounded job and a
quadratic one. This is the 100 TB path; the exact ``NgramJaccardDedup``
is its small-scale oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_graph_spark.functions.text import word_shingles

JACCARD = "jaccard"


class MinHashLSH:
    def __init__(
        self,
        n: int = 3,
        num_hashes: int = 64,
        bands: int = 16,
        threshold: float = 0.5,
        id_col: str = "doc_id",
        text_col: str = "text",
        max_bucket_size: int | None = 1024,
    ):
        if num_hashes % bands != 0:
            raise ValueError("num_hashes must be divisible by bands")
        if max_bucket_size is not None and max_bucket_size < 2:
            raise ValueError("max_bucket_size must be >= 2 (or None)")
        self.n = n
        self.num_hashes = num_hashes
        self.bands = bands
        self.rows_per_band = num_hashes // bands
        self.threshold = threshold
        self.id_col = id_col
        self.text_col = text_col
        self.max_bucket_size = max_bucket_size

    def signatures(self, docs: DataFrame) -> DataFrame:
        """(id, shingles, signature array<long>).

        Signatures via explode + 64 codegen'd ``min(xxhash64(sh, seed))``
        aggregates rather than nested HOF lambdas: higher-order-function
        lambdas run interpreted (~µs/element), which measured 30 s at
        sf0.1 vs ~4 s for the whole-stage-codegen aggregate path. Costs
        one shuffle on the doc id (combine-heavy: 64 longs per doc).
        The input is widened first: shingling+explode fuse into the scan
        stage, and a single-split parquet would pin them to one task
        (functions/widen.py; 2.9 s → 2.2 s warm at sf0.1).
        """
        from pyspark_graph_spark.functions.widen import widen_for_python

        docs = widen_for_python(docs)
        base = (
            docs.select(
                F.col(self.id_col).alias("id"),
                word_shingles(F.col(self.text_col), self.n).alias("shingles"),
            )
            .filter(F.size("shingles") > 0)
            .localCheckpoint()  # shingling feeds two branches; compute once
        )
        ex = base.select("id", F.explode("shingles").alias("__sh"))
        sig = ex.groupBy("id").agg(
            *[
                F.min(F.xxhash64("__sh", F.lit(s))).alias(f"__m{s}")
                for s in range(self.num_hashes)
            ]
        )
        sig = sig.select(
            "id",
            F.array(*[f"__m{s}" for s in range(self.num_hashes)]).alias(
                "signature"
            ),
        )
        return base.join(sig, on="id")

    def band_buckets(self, signed: DataFrame) -> DataFrame:
        """(id, band, bucket) — one row per band per doc."""
        r = self.rows_per_band
        return signed.select(
            "id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(self.bands - 1)),
                    lambda b: F.xxhash64(
                        b,
                        F.concat_ws(
                            ",",
                            F.slice(F.col("signature"), b * r + 1, r).cast(
                                "array<string>"
                            ),
                        ),
                    ),
                )
            ).alias("band", "bucket"),
        )

    def pairs(self, docs: DataFrame) -> DataFrame:
        """(src, dst, jaccard) LSH candidates passing the exact-Jaccard
        verification, canonical src < dst."""
        from pyspark_graph_spark.dedup.capping import cap_buckets

        signed = self.signatures(docs).localCheckpoint()
        buckets = cap_buckets(
            self.band_buckets(signed),
            keys=("band", "bucket"),
            member_col="id",
            cap=self.max_bucket_size,
        )

        a = buckets.alias("a")
        b = buckets.alias("b")
        cand = (
            a.join(
                b,
                on=[
                    F.col("a.band") == F.col("b.band"),
                    F.col("a.bucket") == F.col("b.bucket"),
                    F.col("a.id") < F.col("b.id"),
                ],
            )
            .select(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
            .distinct()
        )
        sh = signed.select("id", "shingles")
        verified = (
            cand.join(
                sh.withColumnsRenamed({"id": "src", "shingles": "__sa"}), "src"
            )
            .join(
                sh.withColumnsRenamed({"id": "dst", "shingles": "__sb"}), "dst"
            )
            .select(
                "src",
                "dst",
                (
                    F.size(F.array_intersect("__sa", "__sb"))
                    / F.size(F.array_union("__sa", "__sb"))
                ).alias(JACCARD),
            )
        )
        return verified.filter(F.col(JACCARD) >= self.threshold)

    def deduplicate(self, docs: DataFrame) -> DataFrame:
        """Drop the higher-id doc of every near-duplicate pair."""
        drop = self.pairs(docs).select(
            F.col("dst").alias(self.id_col)
        ).distinct()
        return docs.join(drop, on=self.id_col, how="anti")


def scurve_catch_micro(s_col, bands: int, rows: int):
    """Per-pair LSH catch probability 1 - (1 - s^rows)^bands in exact
    1e-6 units — the S-curve behind choosing a (bands, rows) split.

    Both exponents must be powers of two so the whole expression is a
    SQUARING LADDER of IEEE multiplications: unlike pow(), every step is
    correctly rounded on every engine, so Spark and an external SQL
    oracle produce bit-identical doubles and the rounded micro-units
    hash-match exactly (the same determinism discipline as the md5
    matching priorities)."""
    for e, nm in ((rows, "rows"), (bands, "bands")):
        if e < 1 or e & (e - 1):
            raise ValueError(f"{nm} must be a power of two, got {e}")
    sr = s_col
    e = rows
    while e > 1:
        sr = sr * sr
        e //= 2
    t = F.lit(1.0) - sr
    e = bands
    while e > 1:
        t = t * t
        e //= 2
    p = F.lit(1.0) - t
    return F.round(p * F.lit(1000000.0), 0).cast("long")


def scurve_catch_micro_sql(s_expr: str, bands: int, rows: int) -> str:
    """The SQL twin of ``scurve_catch_micro`` — the identical squaring
    ladder as nested subqueries (no textual blowup, no pow())."""
    for e, nm in ((rows, "rows"), (bands, "bands")):
        if e < 1 or e & (e - 1):
            raise ValueError(f"{nm} must be a power of two, got {e}")
    inner = f"SELECT CAST({s_expr} AS DOUBLE) AS x"
    e = rows
    while e > 1:
        inner = f"SELECT x * x AS x FROM ({inner})"
        e //= 2
    inner = f"SELECT CAST(1.0 AS DOUBLE) - x AS x FROM ({inner})"
    e = bands
    while e > 1:
        inner = f"SELECT x * x AS x FROM ({inner})"
        e //= 2
    return (
        f"(SELECT CAST(ROUND((CAST(1.0 AS DOUBLE) - x) "
        f"* CAST(1000000.0 AS DOUBLE), 0) AS BIGINT) FROM ({inner}))"
    )
