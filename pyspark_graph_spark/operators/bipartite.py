"""Bipartiteness test + 2-coloring via the double-cover trick.

No odd-cycle search, no BFS parity propagation: build the *bipartite double
cover* — each vertex u becomes (u,0)=2u and (u,1)=2u+1, each edge (u,v)
becomes the pair (2u, 2v+1), (2v, 2u+1) — and run plain connected
components on it. A component of G is bipartite **iff** its two copies stay
in separate cover components; if any odd cycle exists the copies merge.
Self-loops are odd cycles of length 1 and fall out correctly (the loop edge
joins 2u with 2u+1 directly).

This reduction turns "is it 2-colorable" into the already-scale-proven
O(log n) star-contraction CC — one extra projection, zero new iterative
machinery. The 2-coloring itself is read off the component labels: inside a
bipartite component, color 0 is the side whose even-copy landed in the
smaller-labeled cover component, which both engines derive identically
because CC labels are the minimum member id.

Returns one row per vertex: ``(id, component, bipartite, color)`` where
``component`` is G's component label (minimum vertex id), ``bipartite``
whether that whole component is 2-colorable, and ``color`` ∈ {0,1} a
consistent proper 2-coloring (NULL when not bipartite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_graph_spark.constants import DST, ID, SRC
from pyspark_graph_spark.graph import Graph
from pyspark_graph_spark.operators.connected_components import (
    COMPONENT,
    AlternatingConnectedComponents,
)


class BipartiteCheck:
    """Per-component bipartiteness + proper 2-coloring (double cover).

    ``batch_finish`` is stated in INPUT edges: the reduction emits
    exactly 2 cover edges per input edge, so the CC stage is allowed
    2x the bound (same Arrow-task memory object — the doubled rows are
    mechanical copies of the same input; 1M input edges ≈ 32 MB of
    cover pairs in one task). The distributed alternating-star fixpoint
    remains the only path above the bound."""

    def __init__(self, max_iterations: int = 20, batch_finish: int = 1_000_000):
        self.max_iterations = max_iterations
        self.batch_finish = batch_finish

    def run(self, g: Graph) -> DataFrame:
        e = g.edges.select(SRC, DST)
        cover_edges = e.select(
            (F.col(SRC) * 2).alias(SRC), (F.col(DST) * 2 + 1).alias(DST)
        ).unionByName(
            e.select(
                (F.col(DST) * 2).alias(SRC), (F.col(SRC) * 2 + 1).alias(DST)
            )
        )
        v = g.vertices.select(ID)
        cover_vertices = v.select((F.col(ID) * 2).alias(ID)).unionByName(
            v.select((F.col(ID) * 2 + 1).alias(ID))
        )
        cc = AlternatingConnectedComponents(
            max_iterations=self.max_iterations,
            batch_finish=2 * self.batch_finish,
        ).run(Graph(cover_vertices, cover_edges, directed=False, indexed=True))

        # shiftright decodes: the double `/ 2` silently lost low bits
        # past 2^53, wrong labels on xxhash64-range vertex ids; an
        # arithmetic shift is floor-division, exact on even values for
        # the whole int64 range including negatives (r10 verdict #1)
        even = cc.filter(F.col(ID) % 2 == 0).select(
            F.shiftright(F.col(ID), 1).alias(ID),
            F.col(COMPONENT).alias("__ce"),
        )
        odd = cc.filter(F.col(ID) % 2 != 0).select(
            F.shiftright(F.col(ID) - 1, 1).alias(ID),
            F.col(COMPONENT).alias("__co"),
        )
        both = even.join(odd, on=ID)
        bipartite = F.col("__ce") != F.col("__co")
        return both.select(
            ID,
            # min cover label in the pair is 2*(min G vertex in component)
            F.shiftright(F.least("__ce", "__co"), 1).alias(COMPONENT),
            bipartite.alias("bipartite"),
            F.when(
                bipartite,
                F.when(F.col("__ce") < F.col("__co"), F.lit(0)).otherwise(
                    F.lit(1)
                ),
            ).alias("color"),
        )
