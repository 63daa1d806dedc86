"""Breadth-first search with full path tracking (reference bfs.py:14-69).

Level-synchronous frontier expansion from vertices matching ``start_expr``
toward vertices matching ``end_expr``, over edges passing ``edge_expr``.
Tracks the edge-id and vertex-id arrays of each path; an edge is never
reused within a path (trail semantics, reference bfs.py:57-58); undirected
graphs may traverse edges in either direction (shared edge id still blocks
reuse). The search stops at the first depth where any path reaches an end
vertex and returns **all** end-reaching paths of that depth; start vertices
that already satisfy ``end_expr`` are returned as zero-length paths.

Result schema: ``(start, end, edges array<long>, vertices array<long>)``.

Scale notes: each level is one equi-join of the checkpointed frontier with
the edge table on the frontier-head key (the ``NOT array_contains`` edge
filter stays a post-join predicate, so the join itself is a plain shuffled
hash join, not a nested loop). Lineage is truncated per level. Path
enumeration is inherently exponential in dense graphs — bound depth with
``max_iterations``; use ShortestPaths for distances-only workloads.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

from pyspark_graph_spark.constants import DST, EDGE_ID, ID, SRC
from pyspark_graph_spark.graph import Graph
from pyspark_graph_spark.util import checkpoint_observed

START = "start"
END = "end"
EDGES = "edges"
VERTICES = "vertices"

RESULT_SCHEMA = StructType(
    [
        StructField(START, LongType()),
        StructField(END, LongType()),
        StructField(EDGES, ArrayType(LongType())),
        StructField(VERTICES, ArrayType(LongType())),
    ]
)


class BreadthFirstSearch:
    def __init__(
        self,
        start_expr: Column | str,
        end_expr: Column | str,
        edge_expr: Column | str = "true",
        max_iterations: int = 10,
    ):
        self.start_expr = start_expr
        self.end_expr = end_expr
        self.edge_expr = edge_expr
        self.max_iterations = max_iterations

    def run(self, g: Graph) -> DataFrame:
        spark = g.vertices.sparkSession
        empty = spark.createDataFrame([], RESULT_SCHEMA)

        edges = g.symmetric_edges.filter(self.edge_expr)
        if EDGE_ID not in edges.columns:
            # graphs built indexed=True may lack edge ids; derive a
            # deterministic one (same for both directions of a symmetric pair)
            edges = edges.withColumn(
                EDGE_ID, F.xxhash64(F.least(SRC, DST), F.greatest(SRC, DST))
            )
        edges = edges.select(SRC, DST, EDGE_ID)

        start = g.vertices.filter(self.start_expr)
        end_ids = g.vertices.filter(self.end_expr).select(ID).localCheckpoint()
        if start.isEmpty() or end_ids.isEmpty():
            return empty

        # zero-length paths: start vertices that are already end vertices
        trivial = (
            start.join(end_ids, on=ID, how="semi")
            .select(
                F.col(ID).alias(START),
                F.col(ID).alias(END),
                F.array().cast(ArrayType(LongType())).alias(EDGES),
                F.array(ID).alias(VERTICES),
            )
            .localCheckpoint()
        )
        if not trivial.isEmpty():
            return trivial

        frontier = start.select(
            F.col(ID).alias(START),
            F.col(ID).alias("__head"),
            F.array().cast(ArrayType(LongType())).alias(EDGES),
            F.array(ID).alias(VERTICES),
        ).localCheckpoint()

        end_marked = end_ids.select(
            F.col(ID).alias("__head"), F.lit(1).alias("__end")
        )
        for _ in range(self.max_iterations):
            # both per-level probes (frontier emptiness, endpoint hits)
            # ride the checkpoint job itself (round 12,
            # checkpoint_observed): the end-vertex marker left-joins into
            # the expansion, so the previous separate isEmpty action and
            # semi-join probe job disappear; the hit filter reads the
            # same marker, and the output projection is unchanged.
            expanded, m = checkpoint_observed(
                frontier.join(edges, on=frontier["__head"] == edges[SRC])
                .filter(~F.array_contains(F.col(EDGES), F.col(EDGE_ID)))
                .select(
                    START,
                    edges[DST].alias("__head"),
                    F.array_append(F.col(EDGES), F.col(EDGE_ID)).alias(EDGES),
                    F.array_append(F.col(VERTICES), edges[DST]).alias(VERTICES),
                )
                .join(end_marked, on="__head", how="left"),
                __n=F.count(F.lit(1)),
                __hits=F.sum(F.col("__end").cast("long")),
            )
            if not m["__n"]:
                return empty
            if m["__hits"]:
                return expanded.filter(F.col("__end").isNotNull()).select(
                    START, F.col("__head").alias(END), EDGES, VERTICES
                )
            frontier = expanded.drop("__end")
        return empty
