"""Triangle counting via canonicalized motif join (reference triangle_count.py:6-9).

Edges are canonicalized (self-loops dropped, endpoints ordered ascending,
deduped) so each undirected triangle ``a<b<c`` is matched exactly once by the
pattern ``(a,b),(b,c),(a,c)``.

Physical plan: two shuffled equi-joins over the canonical edge list — the
standard distributed triangle enumeration. At 100 TB scale the dominant cost
is the join on high-degree vertices; AQE skew-join splitting handles moderate
skew, and a degree-ordered orientation (each edge stored from the
lower-degree endpoint) is the classic further optimization if needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_graph_spark.constants import DST, ID, SRC
from pyspark_graph_spark.graph import Graph
from pyspark_graph_spark.util import match_structure, order_edges


class TriangleCount:
    """Count (or enumerate) triangles in the undirected view of a graph.

    ``run`` picks between two exact counting strategies:

    - ``motif``: the canonical two-join wedge enumeration (cost Ω(wedges)).
    - ``complement``: inclusion-exclusion over the complement graph —

          T(G) = C(n,3) − |Ē|·(n−2) + Σ_v C(deḡ(v), 2) − T(Ḡ)

      (triples minus triples containing ≥1 non-edge, corrected for pairs of
      non-edges sharing a vertex and for complement triangles). Every term
      is an aggregate over the complement edge list, which is the *small*
      object exactly when the graph is dense and the motif join is at its
      worst. ``auto`` switches on measured density.

    Enumeration (``triangles``) always uses the motif join — the row set
    itself is Ω(T(G)).
    """

    def __init__(self, strategy: str = "auto"):
        self.strategy = strategy

    def triangles(self, g: Graph) -> DataFrame:
        """DataFrame of one row per triangle, columns (a, b, c) with a<b<c."""
        return match_structure(
            order_edges(g.edges), [("a", "b"), ("b", "c"), ("a", "c")]
        )

    def _count_complement(self, g: Graph) -> int:
        ids = g.vertices.select(ID).localCheckpoint()
        n = ids.count()
        canon = order_edges(g.edges).localCheckpoint()
        n_edges = canon.count()
        a = ids.select(F.col(ID).alias(SRC))
        b = ids.select(F.col(ID).alias(DST))
        pairs = a.join(F.broadcast(b), on=F.col(SRC) < F.col(DST))
        comp = pairs.join(canon, on=[SRC, DST], how="anti").localCheckpoint()
        comp_edges = comp.count()
        comp_deg = (
            comp.select(F.col(SRC).alias(ID))
            .unionByName(comp.select(F.col(DST).alias(ID)))
            .groupBy(ID)
            .agg(F.count(F.lit(1)).alias("d"))
        )
        s2_row = comp_deg.agg(
            F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("s2")
        ).first()
        s2 = int(s2_row["s2"] or 0)
        comp_triangles = (
            match_structure(comp, [("a", "b"), ("b", "c"), ("a", "c")]).count()
        )
        c_n3 = n * (n - 1) * (n - 2) // 6
        return c_n3 - comp_edges * (n - 2) + s2 - comp_triangles

    def run(self, g: Graph) -> int:
        strategy = self.strategy
        if strategy == "auto":
            n = g.vertices.count()
            if 2 < n <= 200_000:
                n_edges = order_edges(g.edges).count()
                density = 2 * n_edges / (n * (n - 1))
                strategy = "complement" if density > 0.5 else "motif"
            else:
                strategy = "motif"
        if strategy == "complement":
            return self._count_complement(g)
        if strategy == "motif":
            return self.triangles(g).count()
        raise ValueError(f"unknown strategy {strategy!r}")
