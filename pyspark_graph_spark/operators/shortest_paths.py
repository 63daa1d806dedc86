"""Landmark shortest paths — per-vertex ``map<landmark, distance>`` state.

The reference's shortest_paths.py is pseudocode (string expressions, missing
imports — reference shortest_paths.py:7-26); this implements the documented
intent for real, GraphFrames-``shortestPaths``-style: for every vertex, the
hop distance to each landmark it can reach, following edge direction (plus
the reverse direction for undirected graphs).

State is a ``map<long,int>`` of known distances. Each round, senders
increment every entry (``transform_values``) and receivers element-wise-min
merge the incoming maps and their own state (``map_zip_with`` + ``least`` —
``least`` ignores nulls, giving union-with-min semantics). All map algebra is
built-in JVM higher-order functions — no UDFs. Map columns aren't
order-comparable in Spark, so the Pregel change detector compares
``array_sort(map_entries(...))``.

Scale: state size is O(|landmarks|) per vertex — pick landmark sets, not
all-pairs. Rounds = graph diameter (capped by ``max_iterations``).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyspark_graph_spark.constants import ID, MSG, STATE
from pyspark_graph_spark.graph import Graph
from pyspark_graph_spark.operators.pregel import Pregel

DISTANCES = "distances"
LANDMARK = "landmark"
DISTANCE = "distance"

def _empty_map() -> Column:
    return F.map_from_arrays(
        F.array().cast("array<long>"), F.array().cast("array<int>")
    )


def _merge_maps(acc: Column, m: Column) -> Column:
    """Union-of-keys, element-wise minimum of two distance maps."""
    return F.map_zip_with(acc, m, lambda _, v1, v2: F.least(v1, v2))


def _maps_differ(old: Column, new: Column) -> Column:
    return ~F.array_sort(F.map_entries(old)).eqNullSafe(
        F.array_sort(F.map_entries(new))
    )


class ShortestPaths:
    """Hop distances from every vertex to each landmark.

    ``landmarks``: vertex ids (sequence) or a single-column DataFrame of ids.
    ``run`` returns ``(id, distances map<long,int>)``; ``run_exploded``
    returns ``(id, landmark, distance)`` rows (SQL/oracle-friendly).
    """

    def __init__(
        self,
        landmarks: Sequence[int] | DataFrame,
        max_iterations: int = 10,
    ):
        self.landmarks = landmarks
        self.max_iterations = max_iterations

    def _landmark_df(self, g: Graph) -> DataFrame:
        if isinstance(self.landmarks, DataFrame):
            return self.landmarks.select(
                F.col(self.landmarks.columns[0]).cast("long").alias("__lm")
            )
        spark = g.vertices.sparkSession
        return spark.createDataFrame(
            [(int(x),) for x in self.landmarks], "__lm long"
        )

    def run(self, g: Graph) -> DataFrame:
        lm = F.broadcast(self._landmark_df(g))
        seeded = g.vertices.select(ID).join(
            lm, on=F.col(ID) == F.col("__lm"), how="left"
        ).select(
            ID,
            F.when(
                F.col("__lm").isNotNull(),
                F.map_from_arrays(
                    F.array(F.col(ID)), F.array(F.lit(0).cast("int"))
                ),
            )
            .otherwise(_empty_map())
            .alias("__seed"),
        )
        seeded_graph = Graph(seeded, g.edges, directed=g.directed, indexed=True)

        # distances flow *against* edge direction: if dst knows d(dst, L),
        # then src knows d(src, L) <= d + 1
        msg = F.transform_values(F.col(STATE), lambda _, v: v + F.lit(1))
        pregel = Pregel(
            initial_state=F.col("__seed"),
            agg_expr=F.aggregate(
                F.collect_list(MSG), _empty_map(), _merge_maps
            ),
            msg_to_src=msg,
            msg_to_dst=msg if not g.directed else None,
            update_expr=_merge_maps(F.col(STATE), F.col(MSG)),
            comparison=_maps_differ,
            max_iterations=self.max_iterations,
            carry_columns=[],  # shed the seed map after initialization
        )
        return pregel.run(seeded_graph).select(
            ID, F.col(STATE).alias(DISTANCES)
        )

    def run_exploded(self, g: Graph) -> DataFrame:
        return self.run(g).select(
            ID, F.explode(DISTANCES).alias(LANDMARK, DISTANCE)
        )
