"""Weisfeiler-Lehman graph kernel / isomorphism hash (reference wl_kernel.py:8-32).

State = label (user column, else degree). Each of k rounds re-labels every
vertex with ``hash(own label ‖ sorted multiset of neighbor labels)``; the
graph hash is ``hash(sorted multiset of final labels)``.

Determinism fix over the reference: ``collect_list`` order is
partition-dependent, and the reference hashes the unsorted concatenation
(reference wl_kernel.py:27,32) — stable only on a single partition. True WL
uses sorted multisets; we ``array_sort`` before hashing, so the result is
identical on any cluster layout (and matches across runs/retries).

Rounds are fixed-count (labels churn every round), so the Pregel change
detector is bypassed with an always-true comparison.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_graph_spark.constants import DEGREE, ID, MSG, STATE
from pyspark_graph_spark.graph import Graph
from pyspark_graph_spark.operators.pregel import Pregel

WL_LABEL = "wl_label"


class WLKernel:
    """k-round WL relabeling; ``run`` returns the graph hash string,
    ``labels`` the per-vertex final labels.

    ``hashfunc`` is a pluggable ``Column -> Column`` hash (reference
    wl_kernel.py:14 parity); default sha1."""

    def __init__(
        self,
        hashfunc=None,
        label_column: str | None = None,
        max_iterations: int = 3,
    ):
        self.hashfunc = hashfunc or (lambda c: F.sha1(F.encode(c, "UTF-8")))
        self.label_column = label_column
        self.max_iterations = max_iterations

    def labels(self, g: Graph):
        if self.label_column:
            seeded = g.vertices.select(
                ID, F.col(self.label_column).cast("string").alias(WL_LABEL)
            )
        else:
            seeded = (
                g.vertices.select(ID)
                .join(g.degrees.withColumnRenamed(DEGREE, "out_degree__"), ID, "left")
                .select(
                    ID,
                    F.coalesce(F.col("out_degree__"), F.lit(0))
                    .cast("string")
                    .alias(WL_LABEL),
                )
            )
        seeded_graph = Graph(
            seeded, g.edges, directed=g.directed, indexed=True
        )
        pregel = Pregel(
            initial_state=F.col(WL_LABEL),
            agg_expr=self.hashfunc(
                F.array_join(F.array_sort(F.collect_list(MSG)), ",")
            ),
            msg_to_dst=F.col(STATE),
            msg_to_src=F.col(STATE),
            update_expr=self.hashfunc(
                F.concat_ws("|", F.col(STATE), F.col(MSG))
            ),
            comparison=lambda old, new: F.lit(True),  # fixed round count
            max_iterations=self.max_iterations,
            carry_columns=[],  # seed label only feeds initial_state
        )
        return pregel.run(seeded_graph).select(ID, F.col(STATE).alias(WL_LABEL))

    def run(self, g: Graph) -> str:
        final = self.labels(g)
        row = final.agg(
            self.hashfunc(
                F.array_join(F.array_sort(F.collect_list(WL_LABEL)), ",")
            ).alias("graph_hash")
        ).first()
        return row["graph_hash"]
