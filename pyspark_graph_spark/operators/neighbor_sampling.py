"""GraphSAGE-style k-hop neighbor sampling with deterministic fanout caps.

Not in the reference (aktungmak/pyspark-graph has full-neighborhood
operators only); bounded-fanout sampling is the operation that makes GNN
training and neighborhood feature extraction tractable on power-law graphs:
instead of a hub exploding a frontier to millions of rows, every frontier
vertex contributes at most ``fanouts[hop]`` sampled neighbors per hop
(Hamilton et al. 2017, "Inductive Representation Learning on Large Graphs").

Determinism: neighbors are ranked by a 60-bit md5 hash of
``(src, dst, salt, hop)`` and the top-``fanout`` kept — a pure function of
the data, so the sample is reproducible across runs, partitionings, and
engines (the DuckDB oracle recomputes the identical ranking; see
functions/hashing.py). Changing ``salt`` redraws the sample.

Scale (100 TB): per hop, ONE shuffled hash join (frontier ids against the
edge table on ``src``) and one per-src top-k window. The window partitions
by the frontier vertex, so state is O(degree) per key and the output is
capped at ``|frontier| * fanout`` rows before the next hop — the frontier
cannot explode. A hub vertex's window is the only skew point; AQE skew
splitting plus the fanout cap bound it. No driver-side state, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyspark_graph_spark.constants import DST, ID, SRC
from pyspark_graph_spark.functions.hashing import md5_hash60_concat
from pyspark_graph_spark.graph import Graph


class NeighborSampler:
    """Sample a bounded k-hop neighborhood around seed vertices.

    Returns the sampled edge blocks ``(hop, src, dst)`` with ``hop``
    numbered from 1: hop 1 edges leave the seeds, hop 2 edges leave hop 1's
    sampled neighbors, and so on. The hop-``i`` frontier is the distinct
    set of hop-``i`` destinations (revisits to earlier vertices are
    allowed, as in standard GraphSAGE samplers).
    """

    def __init__(
        self,
        fanouts: list[int],
        salt: str = "",
        undirected: bool | None = None,
        checkpoint: bool | None = None,
    ):
        if not fanouts or any(f < 1 for f in fanouts):
            raise ValueError("fanouts must be non-empty positive ints")
        self.fanouts = list(fanouts)
        self.salt = salt
        self.undirected = undirected
        # shallow samples stay fully lazy (plan depth = #hops is fine);
        # deep walks opt into per-hop materialization to cap lineage
        self.checkpoint = len(fanouts) > 3 if checkpoint is None else checkpoint

    def run(self, g: Graph, seeds: DataFrame) -> DataFrame:
        undirected = (
            (not g.directed) if self.undirected is None else self.undirected
        )
        edges = g.edges.select(SRC, DST)
        if undirected:
            edges = edges.unionByName(
                g.edges.select(
                    F.col(DST).alias(SRC), F.col(SRC).alias(DST)
                )
            ).distinct()
        frontier = seeds.select(F.col(ID).alias(SRC)).distinct()
        blocks: list[DataFrame] = []
        for hop, fanout in enumerate(self.fanouts, start=1):
            ranked = (
                edges.join(frontier, on=SRC)
                .withColumn(
                    "__rk",
                    md5_hash60_concat(
                        F.col(SRC),
                        F.col(DST),
                        F.lit(self.salt),
                        F.lit(hop),
                    ),
                )
                .withColumn(
                    "__rn",
                    F.row_number().over(
                        Window.partitionBy(SRC).orderBy("__rk", DST)
                    ),
                )
                .filter(F.col("__rn") <= fanout)
                .select(F.lit(hop).alias("hop"), SRC, DST)
            )
            if self.checkpoint:
                ranked = ranked.localCheckpoint()
            blocks.append(ranked)
            frontier = ranked.select(
                F.col(DST).alias(SRC)
            ).distinct()
        out = blocks[0]
        for b in blocks[1:]:
            out = out.unionByName(b)
        return out
