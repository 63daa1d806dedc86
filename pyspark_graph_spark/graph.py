"""Core property-graph data model: a pair of DataFrames.

Semantics follow reference graph.py:20-133 (see SURVEY.md §1) with the known
bugs fixed and the physical hazards removed:

- **Deterministic surrogate ids.** The reference assigns LONG ids with
  ``monotonically_increasing_id()`` (reference graph.py:54-63), which is
  nondeterministic across recomputation — a re-evaluated lineage can reassign
  different ids to the same vertex. We derive ids with ``xxhash64`` over the
  original key, which is a pure function of the data: stable under retries,
  partition loss, and re-execution, and needs **no shuffle and no join** to
  resolve edge endpoints (endpoints are hashed directly, not looked up).
- **Undirected adjacency union fixed.** Reference graph.py:89 unions a
  2-column frame with an all-columns frame (arity mismatch, throws). We
  project both sides to (src, dst) first.
- **Deterministic adjacency arrays.** ``collect_set`` order is
  partition-dependent; we ``array_sort`` so results are stable and
  oracle-comparable.

Scale notes (100 TB design): hash-based indexing turns the reference's two
indexing equi-joins (reference graph.py:60-63) into pure narrow projections —
zero shuffles to build the graph. Degree/adjacency aggregations shuffle once on
the vertex id, which is the unavoidable minimum. All derived views are lazy
plans; callers decide what to persist.
"""

from __future__ import annotations

from functools import cached_property

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyspark_graph_spark.constants import (
    ADJ,
    DEGREE,
    DST,
    EDGE_ID,
    ID,
    IN_DEGREE,
    OLD_DST,
    OLD_ID,
    OLD_SRC,
    OUT_DEGREE,
    SRC,
)


class Graph:
    """A property graph as a (vertices, edges) DataFrame pair.

    ``vertices`` must contain column ``id`` (any type pre-indexing) plus
    arbitrary attribute columns; ``edges`` must contain ``src``/``dst`` plus
    arbitrary attribute columns (reference graph.py:20-37). ``directed`` is a
    graph-level flag; undirected semantics are applied per-operator by
    symmetrizing edges / messaging both directions.

    Unless ``indexed=True``, construction rewrites both tables: rows are
    deduplicated, the original keys are kept as ``old_id``/``old_src``/
    ``old_dst``, and LONG surrogate ``id``/``edge_id`` columns are derived
    with ``xxhash64`` (deterministic; see module docstring).
    """

    def __init__(
        self,
        vertices: DataFrame,
        edges: DataFrame,
        directed: bool = True,
        indexed: bool = False,
    ) -> None:
        if ID not in vertices.columns:
            raise ValueError(f"vertices must contain column '{ID}'")
        if SRC not in edges.columns or DST not in edges.columns:
            raise ValueError(f"edges must contain columns '{SRC}' and '{DST}'")
        self.directed = directed
        if indexed:
            self.vertices = vertices
            self.edges = edges
        else:
            for col in (OLD_ID,):
                if col in vertices.columns:
                    raise ValueError(f"vertices already contain '{col}'")
            for col in (OLD_SRC, OLD_DST):
                if col in edges.columns:
                    raise ValueError(f"edges already contain '{col}'")
            self.vertices, self.edges = self._index(vertices, edges)

    @staticmethod
    def _index(
        vertices: DataFrame, edges: DataFrame
    ) -> tuple[DataFrame, DataFrame]:
        """Assign deterministic LONG surrogate keys (no joins, no shuffles).

        ``xxhash64`` is a pure function of the original key, so edge endpoints
        are re-keyed by hashing them directly instead of the reference's two
        equi-joins against the vertex table (reference graph.py:60-63). The
        64-bit space makes collisions negligible below ~10^8 vertices; callers
        at extreme scale can verify with ``validate_index()``.
        """
        v = (
            vertices.distinct()
            .withColumnRenamed(ID, OLD_ID)
            .withColumn(ID, F.xxhash64(F.col(OLD_ID)))
        )
        e = (
            edges.distinct()
            .withColumnRenamed(SRC, OLD_SRC)
            .withColumnRenamed(DST, OLD_DST)
            .withColumn(SRC, F.xxhash64(F.col(OLD_SRC)))
            .withColumn(DST, F.xxhash64(F.col(OLD_DST)))
        )
        e = e.withColumn(EDGE_ID, F.xxhash64(*[F.col(c) for c in e.columns]))
        return v, e

    def validate_index(self) -> None:
        """Assert the hash-id mapping is collision-free (one action).

        O(V) with a single shuffle; intended for one-off validation at extreme
        vertex counts, not per-query use.
        """
        v = self.vertices
        counts = v.agg(
            F.countDistinct(OLD_ID).alias("k"),
            F.countDistinct(ID).alias("h"),
        ).first()
        if counts["k"] != counts["h"]:
            raise ValueError(
                f"xxhash64 id collision: {counts['k']} keys -> {counts['h']} ids"
            )

    # ---------------------------------------------------------------- views

    @property
    def symmetric_edges(self) -> DataFrame:
        """Edges plus their reversals (all edge columns kept). For directed
        graphs this is just ``edges``. Used by undirected algorithms."""
        if self.directed:
            return self.edges
        reverse = self.edges.withColumnRenamed(SRC, "__tmp_src").withColumnRenamed(
            DST, SRC
        ).withColumnRenamed("__tmp_src", DST)
        return self.edges.unionByName(reverse)

    @cached_property
    def adjacency(self) -> DataFrame:
        """Per-vertex neighbor array ``(id, adjacent: array<long>)``.

        Out-neighbors for directed graphs, all neighbors for undirected;
        isolated vertices get an empty array (reference graph.py:81-93, with
        the undirected arity bug fixed by projecting to (src, dst) before the
        union, and ``array_sort`` added for determinism).

        One shuffle (groupBy id); the isolated-vertex anti-join is on the same
        key, so AQE coalesces it into the existing exchange.
        """
        pairs = self.symmetric_edges.select(SRC, DST)
        connected = pairs.groupBy(SRC).agg(
            F.array_sort(F.collect_set(DST)).alias(ADJ)
        ).withColumnRenamed(SRC, ID)
        isolated = (
            self.vertices.select(ID)
            .join(connected.select(ID), on=ID, how="anti")
            .withColumn(ADJ, F.array().cast(connected.schema[ADJ].dataType))
        )
        return connected.unionByName(isolated)

    @cached_property
    def out_degrees(self) -> DataFrame:
        """``(id, out_degree)`` — vertices with ≥1 outgoing edge
        (reference graph.py:95-97). Map-side partial aggregation applies."""
        return (
            self.edges.groupBy(SRC)
            .agg(F.count(F.lit(1)).alias(OUT_DEGREE))
            .withColumnRenamed(SRC, ID)
        )

    @cached_property
    def in_degrees(self) -> DataFrame:
        """``(id, in_degree)`` — vertices with ≥1 incoming edge
        (reference graph.py:99-101)."""
        return (
            self.edges.groupBy(DST)
            .agg(F.count(F.lit(1)).alias(IN_DEGREE))
            .withColumnRenamed(DST, ID)
        )

    @cached_property
    def degrees(self) -> DataFrame:
        """``(id, degree)``. Directed: out-degree (reference graph.py:103-108).
        Undirected: number of **distinct neighbors** (size of adjacency —
        collect_set dedups; reference semantics), isolated vertices included
        with 0."""
        if self.directed:
            return self.out_degrees.withColumnRenamed(OUT_DEGREE, DEGREE)
        return self.adjacency.select(
            ID, F.size(ADJ).cast("long").alias(DEGREE)
        )

    def triplets(
        self, src_prefix: str = "src_", dst_prefix: str = "dst_"
    ) -> DataFrame:
        """Edge rows enriched with source- and destination-vertex attributes,
        vertex columns prefixed to avoid collisions (reference graph.py:110-122).

        Two equi-joins on vertex id. At scale, if the vertex table (projected
        to the attributes actually used) is small, wrap it in
        ``F.broadcast`` before calling, or rely on AQE's runtime broadcast.
        """
        src_v = self.vertices.select(
            [F.col(c).alias(f"{src_prefix}{c}") for c in self.vertices.columns]
        )
        dst_v = self.vertices.select(
            [F.col(c).alias(f"{dst_prefix}{c}") for c in self.vertices.columns]
        )
        return self.edges.join(
            src_v, on=F.col(SRC) == F.col(f"{src_prefix}{ID}"), how="inner"
        ).join(dst_v, on=F.col(DST) == F.col(f"{dst_prefix}{ID}"), how="inner")

    def find(self, pattern: str) -> DataFrame:
        """GraphFrames-style motif search — see ``pyspark_graph_spark.motif``."""
        from pyspark_graph_spark.motif import find

        return find(self, pattern)

    def with_vertex_column(self, name: str, col: Column) -> "Graph":
        """Return a new Graph whose vertices carry an extra computed column
        (reference graph.py:124-133; ours is immutable rather than mutating)."""
        return Graph(
            self.vertices.withColumn(name, col),
            self.edges,
            directed=self.directed,
            indexed=True,
        )

    def filter_edges(self, condition: Column) -> "Graph":
        """Subgraph keeping every vertex and only edges matching
        ``condition`` (GraphFrames ``filterEdges``; no reference analogue —
        the reference has no subgraph operators). Pure narrow filter: zero
        shuffles, and an attribute predicate pushes into the edge scan."""
        return Graph(
            self.vertices,
            self.edges.filter(condition),
            directed=self.directed,
            indexed=True,
        )

    def filter_vertices(self, condition: Column) -> "Graph":
        """Vertex-induced subgraph: vertices matching ``condition`` and the
        edges with BOTH endpoints kept (GraphFrames ``filterVertices``).

        Two semi-joins of the edge table against the surviving vertex ids —
        at scale the id set is a projected single column, so AQE broadcasts
        it when small; otherwise both joins shuffle on the edge endpoint
        already used by neighboring stages."""
        v = self.vertices.filter(condition)
        ids = v.select(ID)
        e = (
            self.edges.join(ids.withColumnRenamed(ID, SRC), on=SRC, how="semi")
            .join(ids.withColumnRenamed(ID, DST), on=DST, how="semi")
            .select(*self.edges.columns)  # joins move keys first; restore order
        )
        return Graph(v, e, directed=self.directed, indexed=True)

    def subgraph(
        self,
        vertex_condition: Column | None = None,
        edge_condition: Column | None = None,
    ) -> "Graph":
        """Apply an edge predicate, then induce on a vertex predicate."""
        g = self
        if edge_condition is not None:
            g = g.filter_edges(edge_condition)
        if vertex_condition is not None:
            g = g.filter_vertices(vertex_condition)
        return g
