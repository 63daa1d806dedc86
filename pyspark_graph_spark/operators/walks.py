"""Deterministic random walks — the corpus generator for node2vec/DeepWalk
embedding pipelines.

Each (start vertex, walk index) pair yields one walk: at step t the next
vertex is ``adjacent[xxhash64(walk_id, t, seed) mod degree]`` — a pure
function of (graph, seed), so corpora are reproducible across runs,
retries, and cluster layouts (a property actual randomness loses the moment
a task retries). Walks that reach a vertex with no out-neighbors end early.

Per step: one join of the active walks against the checkpointed adjacency
table + row-local next-vertex selection. State is (walk_id, current, path);
paths grow to ``length`` entries, so memory is O(active walks × length).

Scale: the step join shuffles active walks on the current vertex; adjacency
is checkpointed once. Hub-heavy graphs skew the join — AQE handles moderate
skew; for power-law graphs cap stored adjacency (sample neighbors) as in
any industrial node2vec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_graph_spark.constants import ADJ, ID
from pyspark_graph_spark.functions.hashing import md5_hash60_concat
from pyspark_graph_spark.graph import Graph


class RandomWalks:
    def __init__(
        self,
        length: int = 10,
        walks_per_vertex: int = 1,
        seed: int = 42,
        hash_mode: str = "xxhash64",
    ):
        if length < 1:
            raise ValueError("length must be >= 1")
        if hash_mode not in ("xxhash64", "md5"):
            raise ValueError("hash_mode must be 'xxhash64' or 'md5'")
        self.length = length
        self.walks_per_vertex = walks_per_vertex
        self.seed = seed
        # "md5" swaps the step-selection hash for the cross-engine
        # md5-60-bit variant so an external SQL oracle can replay the
        # exact same walks; xxhash64 stays the (faster) default.
        self.hash_mode = hash_mode

    def _h(self, *cols):
        cols = [F.col(c) if isinstance(c, str) else c for c in cols]
        if self.hash_mode == "xxhash64":
            return F.xxhash64(*cols)
        return md5_hash60_concat(*cols)

    def run(self, g: Graph) -> DataFrame:
        """(walk_id, start, path array<long>) — one row per walk."""
        adj = g.adjacency.filter(F.size(ADJ) > 0).localCheckpoint()

        starts = g.vertices.select(ID)
        idx = F.explode(
            F.sequence(F.lit(0), F.lit(self.walks_per_vertex - 1))
        ).alias("__w")
        active = starts.select(ID, idx).select(
            self._h(ID, F.col("__w"), F.lit(self.seed)).alias("walk_id"),
            F.col(ID).alias("start"),
            F.col(ID).alias("__cur"),
            F.array(ID).alias("path"),
        ).localCheckpoint()
        finished = []

        for step in range(1, self.length):
            joined = active.join(
                adj.withColumnsRenamed({ID: "__cur", ADJ: "__nbrs"}),
                on="__cur",
                how="left",
            )
            ended = joined.filter(F.col("__nbrs").isNull()).select(
                "walk_id", "start", "path"
            )
            finished.append(ended.localCheckpoint())
            nxt = F.get(
                F.col("__nbrs"),
                F.pmod(
                    self._h("walk_id", F.lit(step), F.lit(self.seed)),
                    F.size("__nbrs"),
                ).cast("int"),
            )
            active = (
                joined.filter(F.col("__nbrs").isNotNull())
                .select(
                    "walk_id",
                    "start",
                    nxt.alias("__cur"),
                    F.array_append("path", nxt).alias("path"),
                )
                .localCheckpoint()
            )
            if active.isEmpty():
                break
        out = active.select("walk_id", "start", "path")
        for f in finished:
            out = out.unionByName(f)
        return out
