"""Maximal independent set — Luby's algorithm with deterministic priorities.

Each round every undecided vertex draws a priority (``xxhash64(id, round)``
— deterministic, so runs are reproducible); a vertex joins the set if its
priority beats every undecided neighbor's, then it and its neighbors leave
the game. Expected O(log n) rounds (Luby 1986).

Per round: one priority projection (no shuffle), one neighbor-max
aggregation (one shuffle), two anti-joins on checkpointed frames. The
result is an *independent* set (no two members adjacent) that is *maximal*
(every non-member has a member neighbor) — both invariants are
property-tested.

MIS is the standard building block for distributed coloring/scheduling and
a good stress of the peel-and-repeat pattern at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_graph_spark.constants import DST, ID, SRC
from pyspark_graph_spark.graph import Graph


class MaximalIndependentSet:
    def __init__(
        self,
        max_iterations: int = 50,
        seed: int = 0,
        batch_finish: int = 1_000_000,
        edges_symmetric: bool = False,
    ):
        self.max_iterations = max_iterations
        self.seed = seed
        # caller guarantees g.edges is ALREADY symmetric, self-loop-free
        # and distinct (e.g. greedy_coloring's maintained residual list):
        # skips the per-run symmetrize + distinct + checkpoint. The edge
        # SET is identical, so the result is bit-identical; this only
        # removes redundant jobs from per-round callers.
        self.edges_symmetric = edges_symmetric
        # once BOTH the undecided vertex list and the residual edge list
        # fit this bound, the remaining Luby rounds run inside one
        # cogrouped Arrow batch — BIT-IDENTICAL to the distributed
        # continuation because the batch consumes the same Spark-computed
        # xxhash64(id, seed, round) priorities (shipped as columns) and
        # applies the same strict-majority rule per round. The peel's
        # tail rounds each decide a handful of vertices yet cost several
        # fixed-overhead jobs. 0 disables the batch finish. 1M rows is
        # ~16 MB of (id, hash) / (src, dst) columns in one Arrow batch on
        # one executor — bounded by construction; dense graphs (where
        # Luby finishes in O(1) rounds anyway) skip the distributed peel
        # entirely below the bound, sparse billion-edge graphs still
        # take the distributed path.
        self.batch_finish = batch_finish

    # how many rounds one batch simulates before handing leftovers back
    # to the distributed loop (Luby clears a 100k residual in well under
    # this w.h.p.; leftovers are correct, just slower)
    _LOCAL_ROUNDS = 32

    def run(self, g: Graph) -> DataFrame:
        """Vertex ids of the set (single ``id`` column)."""
        # independence is an undirected property: symmetrize regardless of
        # the graph's directed flag (symmetric_edges is a no-op for directed
        # graphs by design)
        base = g.edges.select(SRC, DST)
        if self.edges_symmetric:
            sym = base
        else:
            sym = (
                base.unionByName(
                    base.select(
                        F.col(DST).alias(SRC), F.col(SRC).alias(DST)
                    )
                )
                .filter(F.col(SRC) != F.col(DST))
                .distinct()
                .localCheckpoint()
            )
        undecided = g.vertices.select(ID).localCheckpoint()
        edges = sym
        spark = undecided.sparkSession
        chosen = spark.createDataFrame([], f"{ID} long")

        rnd = 0
        while rnd < self.max_iterations:
            n_und = undecided.count()
            if n_und == 0:
                break
            if (
                self.batch_finish
                and n_und <= self.batch_finish
                and edges.count() <= self.batch_finish
            ):
                res = self._batch_rounds(undecided, edges, rnd)
                chosen = chosen.unionByName(
                    res.filter(F.col("chosen")).select(ID)
                ).localCheckpoint()
                undecided = (
                    res.filter(~F.col("chosen"))
                    .select(ID)
                    .localCheckpoint()
                )
                rnd += self._LOCAL_ROUNDS
                if undecided.isEmpty():
                    break
                edges = (
                    edges.join(
                        undecided.withColumnRenamed(ID, SRC),
                        on=SRC,
                        how="semi",
                    )
                    .join(
                        undecided.withColumnRenamed(ID, DST),
                        on=DST,
                        how="semi",
                    )
                    .select(SRC, DST)
                    .localCheckpoint()
                )
                continue
            pri = undecided.withColumn(
                "__p", F.xxhash64(F.col(ID), F.lit(self.seed), F.lit(rnd))
            )
            nbr_max = (
                edges.join(
                    pri.withColumnsRenamed({ID: DST, "__p": "__np"}), on=DST
                )
                .groupBy(SRC)
                .agg(F.max("__np").alias("__maxn"))
                .withColumnRenamed(SRC, ID)
            )
            winners = (
                pri.join(nbr_max, on=ID, how="left")
                .filter(
                    F.col("__maxn").isNull() | (F.col("__p") > F.col("__maxn"))
                )
                .select(ID)
                .localCheckpoint()
            )
            chosen = chosen.unionByName(winners).localCheckpoint()
            # winners and their neighbors leave the game
            removed = winners.unionByName(
                edges.join(winners.withColumnRenamed(ID, SRC), on=SRC, how="semi")
                .select(F.col(DST).alias(ID))
            ).distinct()
            undecided = undecided.join(removed, on=ID, how="anti").localCheckpoint()
            edges = (
                edges.join(
                    undecided.withColumnRenamed(ID, SRC), on=SRC, how="semi"
                )
                .join(undecided.withColumnRenamed(ID, DST), on=DST, how="semi")
                .select(SRC, DST)
                .localCheckpoint()
            )
            rnd += 1
        # Mirror MaximalMatching's contract: returning with undecided
        # vertices would silently yield a non-maximal set (round-5 ADVICE).
        # The batch finish charges _LOCAL_ROUNDS against the budget, so a
        # leftover-heavy batch can overshoot max_iterations — fail loudly
        # rather than hand back a set that violates the documented
        # maximality invariant.
        if not undecided.isEmpty():
            raise ValueError(
                "MaximalIndependentSet did not decide every vertex within "
                f"max_iterations={self.max_iterations}; Luby rounds are "
                "O(log n) w.h.p. — raise the budget for adversarial graphs"
            )
        return chosen

    def _batch_rounds(
        self, undecided: DataFrame, edges: DataFrame, rnd: int
    ) -> DataFrame:
        """Simulate up to ``_LOCAL_ROUNDS`` Luby rounds in one cogrouped
        Arrow batch. Priorities are the SAME Spark expressions the
        distributed rounds would use, projected as columns before the
        batch, so the result is bit-identical to continuing the loop.
        Returns (id, chosen) covering chosen winners AND any vertices
        still undecided after the local budget (handed back to the
        distributed loop)."""
        n_rounds = self._LOCAL_ROUNDS

        vb = undecided.select(
            ID,
            *[
                F.xxhash64(
                    F.col(ID), F.lit(self.seed), F.lit(rnd + j)
                ).alias(f"__p{j}")
                for j in range(n_rounds)
            ],
        ).withColumn("__g", F.lit(0))
        eb = edges.select(SRC, DST).withColumn("__g", F.lit(0))

        def local_luby(vp, ep):
            import numpy as np
            import pandas as pd

            ids = vp[ID].to_numpy()
            n = len(ids)
            idx = {v: i for i, v in enumerate(ids)}
            s = np.fromiter(
                (idx[v] for v in ep[SRC]), dtype=np.int64, count=len(ep)
            )
            d = np.fromiter(
                (idx[v] for v in ep[DST]), dtype=np.int64, count=len(ep)
            )
            pri = np.stack(
                [vp[f"__p{j}"].to_numpy() for j in range(n_rounds)], axis=1
            )
            alive = np.ones(n, dtype=bool)
            chosen = np.zeros(n, dtype=bool)
            for j in range(n_rounds):
                if not alive.any():
                    break
                live = alive[s] & alive[d]
                ls, ld = s[live], d[live]
                p = pri[:, j]
                # max undecided-neighbor priority; isolated vertices win
                nbr = np.full(n, np.iinfo(np.int64).min, dtype=np.int64)
                np.maximum.at(nbr, ls, p[ld])
                win = alive & (p > nbr)
                if not win.any():
                    continue  # all-tie round: same as the distributed rule
                chosen |= win
                dead = win.copy()
                # neighbors of winners leave the game too
                wd = win[ld]
                dead[ls[wd]] = True
                wl = win[ls]
                dead[ld[wl]] = True
                alive &= ~dead
                keep = alive[s] & alive[d]
                s, d = s[keep], d[keep]
            return pd.DataFrame(
                {
                    ID: np.concatenate([ids[chosen], ids[alive]]),
                    "chosen": np.concatenate(
                        [
                            np.ones(int(chosen.sum()), dtype=bool),
                            np.zeros(int(alive.sum()), dtype=bool),
                        ]
                    ),
                }
            )

        def wrapped(key, vp, ep):
            return local_luby(vp, ep)

        return (
            vb.groupBy("__g")
            .cogroup(eb.groupBy("__g"))
            .applyInPandas(wrapped, f"{ID} long, chosen boolean")
            .localCheckpoint()
        )


def greedy_coloring(g: Graph, max_colors: int = 64) -> DataFrame:
    """(id, color) proper coloring: repeatedly take an MIS of the remaining
    subgraph and give it the next color (Luby-MIS coloring — expected
    O(log n) rounds per color, colors ≤ degeneracy-ish in practice).

    Proper by construction: each color class is an independent set.
    """
    remaining_v = g.vertices.select(ID).localCheckpoint()
    base = g.edges.select(SRC, DST)
    remaining_e = (
        base.unionByName(
            base.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
        )
        .filter(F.col(SRC) != F.col(DST))
        .distinct()
        .localCheckpoint()
    )
    spark = remaining_v.sparkSession
    result = spark.createDataFrame([], f"{ID} long, color int")
    for color in range(max_colors):
        if remaining_v.isEmpty():
            return result
        sub = Graph(remaining_v, remaining_e, directed=True, indexed=True)
        # remaining_e is maintained symmetric/distinct/checkpointed by
        # this loop — skip MIS's per-run re-symmetrization jobs
        mis = (
            MaximalIndependentSet(seed=color, edges_symmetric=True)
            .run(sub)
            .localCheckpoint()
        )
        result = result.unionByName(
            mis.withColumn("color", F.lit(color))
        ).localCheckpoint()
        remaining_v = remaining_v.join(mis, on=ID, how="anti").localCheckpoint()
        remaining_e = (
            remaining_e.join(
                remaining_v.withColumnRenamed(ID, SRC), on=SRC, how="semi"
            )
            .join(remaining_v.withColumnRenamed(ID, DST), on=DST, how="semi")
            .localCheckpoint()
        )
    raise RuntimeError(f"graph not colored within {max_colors} colors")
