"""General source/sink helpers beyond the testdata loaders.

The reference has no I/O layer at all (callers hand it DataFrames —
reference graph.py:21-22); an engine meant for 100 TB needs opinionated
edges-of-the-system defaults:

- **Columnar in, columnar out.** Parquet first; CSV/JSON accepted for
  ingest with explicit schemas (never inference at scale — a schema scan
  of 100 TB is a full read).
- **Partitioned writes** on coarse keys (date, tenant) for pruning;
  **bucketed saves** on join keys so repeated graph loads skip the shuffle
  (bucket joins need the saveAsTable catalog path, not bare files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from pyspark_graph_spark.constants import DST, ID, SRC
from pyspark_graph_spark.graph import Graph


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession, path: str, schema: StructType | str, header: bool = True
) -> DataFrame:
    """CSV with a mandatory schema — inference is a second full scan."""
    return spark.read.csv(path, schema=schema, header=header)


def read_json(
    spark: SparkSession, path: str, schema: StructType | str
) -> DataFrame:
    """JSON-lines with a mandatory schema (same rationale as CSV)."""
    return spark.read.json(path, schema=schema)


def read_graph(
    spark: SparkSession, vertices_path: str, edges_path: str, directed: bool = True
) -> Graph:
    """Load a previously saved graph (parquet pair) without re-indexing."""
    return Graph(
        spark.read.parquet(vertices_path),
        spark.read.parquet(edges_path),
        directed=directed,
        indexed=True,
    )


def write_graph(
    g: Graph,
    vertices_path: str,
    edges_path: str,
    mode: str = "error",
    edge_partitions: list[str] | None = None,
) -> None:
    """Persist a graph as a parquet pair; optionally partition edges by
    coarse pruning columns."""
    g.vertices.write.mode(mode).parquet(vertices_path)
    w = g.edges.write.mode(mode)
    if edge_partitions:
        w = w.partitionBy(*edge_partitions)
    w.parquet(edges_path)


def save_graph_bucketed(
    g: Graph, name: str, buckets: int = 64, mode: str = "error"
) -> None:
    """Save vertices bucketed by id and edges bucketed by src into the
    session catalog. Subsequent loads join/aggregate on those keys without
    a shuffle — the persistent co-partitioning story for iterative
    algorithms at scale."""
    (
        g.vertices.write.mode(mode)
        .bucketBy(buckets, ID)
        .sortBy(ID)
        .saveAsTable(f"{name}_vertices")
    )
    (
        g.edges.write.mode(mode)
        .bucketBy(buckets, SRC)
        .sortBy(SRC)
        .saveAsTable(f"{name}_edges")
    )


def load_graph_bucketed(
    spark: SparkSession, name: str, directed: bool = True
) -> Graph:
    return Graph(
        spark.table(f"{name}_vertices"),
        spark.table(f"{name}_edges"),
        directed=directed,
        indexed=True,
    )


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same columnar/pushdown properties as parquet (built-in
    Spark source, vectorized reader, predicate pushdown, column pruning)."""
    return spark.read.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "error",
    partition_by: list[str] | None = None,
) -> None:
    """ORC sink with optional coarse-key partitioning (date/tenant
    pruning), mirroring the parquet conventions."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_csv(
    df: DataFrame, path: str, mode: str = "error", header: bool = True
) -> None:
    """CSV export for interchange with non-columnar consumers. Not a
    100 TB format — no pushdown, no types — use for bounded result sets."""
    df.write.mode(mode).csv(path, header=header)
