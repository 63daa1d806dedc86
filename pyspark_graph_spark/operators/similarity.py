"""Neighborhood-similarity operators: Jaccard and overlap coefficient.

Semantics of reference jaccard_similarity.py:8-18 / overlap_coefficient.py:8-25
(|A∩B| over adjacency sets), with the physical plan redesigned for scale:

The reference theta-joins every vertex pair (``a.id != b.id``), which plans as
a BroadcastNestedLoopJoin producing O(V²) rows — fatal beyond toy scale. We
instead enumerate only pairs that share at least one neighbor: explode the
adjacency list to (vertex, neighbor) pairs and self-equi-join on the
*neighbor* key. Output size is Σ_w deg(w)² over the common-neighbor vertices
— the true candidate set — and the join is a shuffled hash join on a single
key, AQE-skew-splittable.

Deviations from the reference (documented, intentional):
- Pairs with zero common neighbors (similarity 0) are not emitted.
- Each unordered pair is emitted once, canonically ``src < dst`` (the
  reference emits both directions).
- The similarity column is DOUBLE (the reference declared LongType by
  mistake, overlap_coefficient.py:13-15).

Skew note: a vertex of degree d contributes d² candidate pairs. For power-law
graphs cap the hub fan-out with ``max_degree`` (drops hubs from the common-
neighbor expansion — standard practice in MinHash/similarity pipelines) or
rely on AQE skew splitting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyspark_graph_spark.constants import ADJ, DST, ID, SRC
from pyspark_graph_spark.graph import Graph


def _pair_common_counts_allpairs(g: Graph) -> DataFrame:
    """Dense-graph path: all vertex pairs scored row-locally with
    ``array_intersect`` over the (sorted) adjacency arrays.

    Measured tradeoff (sf0.1 supplier graph, V=1000 near-complete): the
    index path pushes Σ_w deg(w)² ≈ 1e9 rows through a codegen'd join in
    ~36 s; this path's 500k ``array_intersect`` calls over ~1000-element
    arrays took ~170 s — per-row hash-set construction loses to raw codegen
    row throughput well before V² row counts win. So ``auto`` only picks
    this path for very small V, where the broadcast no-shuffle plan wins
    outright; it remains available explicitly for moderate-V sparse-ish
    graphs with short adjacency arrays.
    """
    adj = g.adjacency.localCheckpoint()
    a = adj.select(F.col(ID).alias(SRC), F.col(ADJ).alias("__aa"))
    b = adj.select(F.col(ID).alias(DST), F.col(ADJ).alias("__ab"))
    return (
        a.join(F.broadcast(b), on=F.col(SRC) < F.col(DST))
        .select(
            SRC,
            DST,
            F.size(F.array_intersect("__aa", "__ab")).alias("common"),
            F.size("__aa").alias("src_degree"),
            F.size("__ab").alias("dst_degree"),
        )
        .filter(F.col("common") > 0)
    )


def _pair_common_counts_complement(g: Graph) -> DataFrame:
    """Dense-graph path via the complement: for near-complete graphs the
    *missing* edges are the small object, so count shared NON-neighbors and
    invert with inclusion-exclusion:

        |N(a)∩N(b)| = n − (|M(a)| + |M(b)| − |M(a)∩M(b)| + extra)

    where M(x) = non-neighbors of x (excluding x), |M(x)| = n−1−deg(x), and
    ``extra`` counts the members of {a,b} not already inside M(a)∪M(b) —
    2 when a,b are adjacent, 0 otherwise. |M(a)∩M(b)| comes from an
    inverted-index join over the complement edge list, whose volume is
    Σ_w (n−1−deg(w))² — negligible exactly when the graph is dense.

    Measured on the sf0.1 near-complete supplier graph (V=1000, ~500k
    edges): the direct index path pushes ~1e9 join rows (~40 s); here the
    complement has only ~500 pairs and the whole query is a V²/2 id-only
    cross join plus tiny joins (~3 s). Exact for ANY graph — only the cost
    profile is density-dependent.
    """
    ids = g.vertices.select(ID).localCheckpoint()
    n = ids.count()
    # neighbor sets follow the graph's own semantics: out-neighbors for
    # directed graphs, all neighbors for undirected (same as the index path)
    nbr = (
        g.symmetric_edges.select(SRC, DST)
        .filter(F.col(SRC) != F.col(DST))
        .distinct()
        .localCheckpoint()
    )
    deg = nbr.groupBy(SRC).agg(F.count(F.lit(1)).alias("__deg"))
    a = ids.select(F.col(ID).alias(SRC))
    b = ids.select(F.col(ID).alias(DST))
    ordered = a.join(F.broadcast(b), on=F.col(SRC) != F.col(DST))
    # directed complement: ordered pairs with no edge src->dst
    comp = ordered.join(nbr, on=[SRC, DST], how="anti").localCheckpoint()
    ca = comp.alias("ca")
    cb = comp.alias("cb")
    mm = (
        ca.join(
            cb,
            on=[
                F.col(f"ca.{DST}") == F.col(f"cb.{DST}"),
                F.col(f"ca.{SRC}") < F.col(f"cb.{SRC}"),
            ],
        )
        .groupBy(
            F.col(f"ca.{SRC}").alias(SRC), F.col(f"cb.{SRC}").alias(DST)
        )
        .agg(F.count(F.lit(1)).alias("__mm"))
    )
    fwd = nbr.withColumn("__fwd", F.lit(1))
    bwd = nbr.select(
        F.col(DST).alias(SRC), F.col(SRC).alias(DST)
    ).withColumn("__bwd", F.lit(1))
    pairs = a.join(F.broadcast(b), on=F.col(SRC) < F.col(DST))
    out = (
        pairs.join(mm, on=[SRC, DST], how="left")
        .join(fwd, on=[SRC, DST], how="left")
        .join(bwd, on=[SRC, DST], how="left")
        .join(
            deg.withColumnsRenamed({SRC: SRC, "__deg": "src_degree"}),
            on=SRC, how="left",
        )
        .join(
            deg.withColumnsRenamed({SRC: DST, "__deg": "dst_degree"}),
            on=DST, how="left",
        )
        .withColumn("src_degree", F.coalesce("src_degree", F.lit(0)))
        .withColumn("dst_degree", F.coalesce("dst_degree", F.lit(0)))
    )
    m_a = F.lit(n - 1) - F.col("src_degree")
    m_b = F.lit(n - 1) - F.col("dst_degree")
    # a is outside M(a)∪M(b) iff edge b->a exists (mirror for b): those
    # members of {a,b} must be added to the excluded-union size
    extra = (
        F.when(F.col("__bwd").isNotNull(), F.lit(1)).otherwise(F.lit(0))
        + F.when(F.col("__fwd").isNotNull(), F.lit(1)).otherwise(F.lit(0))
    )
    common = (
        F.lit(n) - (m_a + m_b - F.coalesce("__mm", F.lit(0)) + extra)
    )
    return out.select(
        SRC,
        DST,
        common.alias("common"),
        "src_degree",
        "dst_degree",
    ).filter(F.col("common") > 0)


def _pair_common_counts(g: Graph, max_degree: int | None) -> DataFrame:
    """(src, dst, common, src_degree, dst_degree) for pairs sharing ≥1 neighbor.

    Neighbor pairs come straight from the (deduped) symmetric edge list —
    building the adjacency arrays only to explode them again would add a
    collect_set shuffle and an isolated-vertex branch for nothing.
    """
    nbrs = (
        g.symmetric_edges.select(F.col(SRC).alias(ID), F.col(DST).alias("__nb"))
        .distinct()
        .localCheckpoint()  # feeds deg, both join sides
    )
    deg = nbrs.groupBy(ID).agg(F.count(F.lit(1)).alias("__deg"))
    if max_degree is not None:
        hubs = deg.filter(F.col("__deg") > max_degree).select(
            F.col(ID).alias("__nb")
        )
        nbrs = nbrs.join(F.broadcast(hubs), on="__nb", how="anti")
    a = nbrs.alias("a")
    b = nbrs.alias("b")
    common = (
        a.join(
            b,
            on=[
                F.col("a.__nb") == F.col("b.__nb"),
                F.col(f"a.{ID}") < F.col(f"b.{ID}"),
            ],
        )
        .groupBy(
            F.col(f"a.{ID}").alias(SRC),
            F.col(f"b.{ID}").alias(DST),
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        common.join(deg.withColumnsRenamed({ID: SRC, "__deg": "src_degree"}), SRC)
        .join(deg.withColumnsRenamed({ID: DST, "__deg": "dst_degree"}), DST)
    )


_ALLPAIRS_MAX_VERTICES = 512  # V²/2 ≈ 130k row-local pairs


def _choose_pairs(
    g: Graph, max_degree: int | None, strategy: str
) -> DataFrame:
    """Pick the candidate-pair plan.

    ``index``: inverted-index join (sparse graphs — output Σ deg² bounded).
    ``allpairs``: broadcast self-join + array_intersect (dense small-V).
    ``auto``: allpairs when the vertex count (one cheap count) is small.
    """
    if strategy == "auto":
        if max_degree is not None:
            strategy = "index"
        else:
            n = g.vertices.count()
            if n <= _ALLPAIRS_MAX_VERTICES:
                strategy = "allpairs"
            else:
                # dense regime: complement beats the index once the graph
                # holds a large fraction of all possible edges (and the V²/2
                # pair cross-join stays tractable)
                n_edges = g.symmetric_edges.select(SRC, DST).distinct().count()
                density = n_edges / max(n * (n - 1), 1)
                strategy = (
                    "complement" if density > 0.25 and n <= 200_000 else "index"
                )
    if strategy == "allpairs":
        return _pair_common_counts_allpairs(g)
    if strategy == "complement":
        return _pair_common_counts_complement(g)
    if strategy == "index":
        return _pair_common_counts(g, max_degree)
    raise ValueError(f"unknown strategy {strategy!r}")


class JaccardSimilarity:
    """|A∩B| / |A∪B| over neighbor sets, for pairs with ≥1 common neighbor.

    Result: (src, dst, jaccard double), src < dst.
    """

    def __init__(
        self,
        min_similarity: float = 0.0,
        max_degree: int | None = None,
        strategy: str = "auto",
    ):
        self.min_similarity = min_similarity
        self.max_degree = max_degree
        self.strategy = strategy

    def run(self, g: Graph) -> DataFrame:
        pairs = _choose_pairs(g, self.max_degree, self.strategy)
        sim = (
            F.col("common")
            / (F.col("src_degree") + F.col("dst_degree") - F.col("common"))
        ).alias("jaccard")
        out = pairs.select(SRC, DST, sim)
        if self.min_similarity > 0.0:
            out = out.filter(F.col("jaccard") >= self.min_similarity)
        return out


class NeighborhoodContainment:
    """|A∩B| / |A| — the asymmetric containment of src's neighborhood in
    dst's. Emitted in **both directions** for every unordered pair with a
    common neighbor (containment is direction-dependent). Useful for
    sub/superset structure that symmetric Jaccard hides.

    Result: (src, dst, containment double).
    """

    def __init__(
        self,
        min_similarity: float = 0.0,
        max_degree: int | None = None,
        strategy: str = "auto",
    ):
        self.min_similarity = min_similarity
        self.max_degree = max_degree
        self.strategy = strategy

    def run(self, g: Graph) -> DataFrame:
        pairs = _choose_pairs(g, self.max_degree, self.strategy)
        fwd = pairs.select(
            SRC, DST, (F.col("common") / F.col("src_degree")).alias("containment")
        )
        rev = pairs.select(
            F.col(DST).alias(SRC),
            F.col(SRC).alias(DST),
            (F.col("common") / F.col("dst_degree")).alias("containment"),
        )
        out = fwd.unionByName(rev)
        if self.min_similarity > 0.0:
            out = out.filter(F.col("containment") >= self.min_similarity)
        return out


class OverlapCoefficient:
    """|A∩B| / min(|A|, |B|) over neighbor sets, pairs with ≥1 common neighbor.

    Result: (src, dst, overlap double), src < dst.
    """

    def __init__(
        self,
        min_similarity: float = 0.0,
        max_degree: int | None = None,
        strategy: str = "auto",
    ):
        self.min_similarity = min_similarity
        self.max_degree = max_degree
        self.strategy = strategy

    def run(self, g: Graph) -> DataFrame:
        pairs = _choose_pairs(g, self.max_degree, self.strategy)
        sim = (
            F.col("common") / F.least("src_degree", "dst_degree")
        ).alias("overlap")
        out = pairs.select(SRC, DST, sim)
        if self.min_similarity > 0.0:
            out = out.filter(F.col("overlap") >= self.min_similarity)
        return out
