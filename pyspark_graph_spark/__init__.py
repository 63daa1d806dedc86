"""pyspark_graph_spark — a PySpark-native property-graph + data-pipeline engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference library ``aktungmak/pyspark-graph`` (see
``SURVEY.md``), extended with the operators a large-scale training-data
pipeline needs (dedup, similarity search, text analysis, sessionization).

Design principles (SURVEY.md §7):

- **DataFrame-only.** Every operator builds a Catalyst logical plan with the
  public DataFrame API; Spark picks physical strategies. No RDDs, no
  row-at-a-time Python UDFs in the hot path.
- **Deterministic.** Surrogate ids come from ``xxhash64`` (not
  ``monotonically_increasing_id``), collected lists are ``array_sort``-ed
  before hashing, aggregation ties are broken explicitly — results are stable
  under retries/recomputation and comparable to a SQL oracle.
- **Iteration-safe.** Every iterative algorithm (Pregel family, BFS,
  alternating CC, Katz) checkpoints per round, so superstep *i* does not
  re-execute supersteps *1..i-1* (the reference's O(rounds²) flaw,
  reference pregel.py:49-73).
- **Scale-aware.** Broadcast hints on small dimension tables, blocking/LSH
  instead of all-pairs theta joins, AQE-friendly shuffle sizing.
"""

from pyspark_graph_spark.constants import (
    ADJ,
    DEGREE,
    DST,
    EDGE_ID,
    ID,
    IN_DEGREE,
    MSG,
    OLD_DST,
    OLD_ID,
    OLD_SRC,
    OLD_STATE,
    OUT_DEGREE,
    SRC,
    STATE,
)
from pyspark_graph_spark.graph import Graph
from pyspark_graph_spark.motif import find
from pyspark_graph_spark.util import (
    match_structure,
    multiple_join,
    multiple_union,
    ne_null_safe,
    order_edges,
)

__version__ = "0.1.0"

__all__ = [
    "Graph",
    "find",
    "match_structure",
    "multiple_join",
    "multiple_union",
    "ne_null_safe",
    "order_edges",
    "ID",
    "SRC",
    "DST",
    "EDGE_ID",
    "OLD_ID",
    "OLD_SRC",
    "OLD_DST",
    "ADJ",
    "DEGREE",
    "IN_DEGREE",
    "OUT_DEGREE",
    "STATE",
    "OLD_STATE",
    "MSG",
]
