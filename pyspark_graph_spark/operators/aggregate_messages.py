"""One-round triplet messaging — GraphFrames-style ``aggregateMessages``.

The reference's implementation (aggregate_messages.py:14-45) is unimportable
(undefined names in the class-level schema, module constants accessed as
instance attributes, and the ``to_dst`` branch addressing the *source* id —
reference aggregate_messages.py:44); this is the documented intent,
implemented correctly.

Message expressions are evaluated over the **triplet** frame: edge columns
plus source-vertex columns prefixed ``src_`` and destination-vertex columns
prefixed ``dst_``. ``to_dst`` is delivered to the edge's destination,
``to_src`` to its source; all messages are unioned and aggregated per
receiving vertex with ``agg`` (an aggregate over the ``msg`` column).

Physically: two vertex joins (the triplet build), a union, one shuffle for
the aggregation. Broadcast the vertex side if small.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyspark_graph_spark.constants import DST, ID, MSG, SRC
from pyspark_graph_spark.graph import Graph


class AggregateMessages:
    def __init__(
        self,
        agg: Column,
        to_src: Column | None = None,
        to_dst: Column | None = None,
    ):
        if to_src is None and to_dst is None:
            raise ValueError("at least one of to_src/to_dst required")
        self.agg = agg
        self.to_src = to_src
        self.to_dst = to_dst

    def run(self, g: Graph) -> DataFrame:
        """Returns ``(id, msg)`` with ``msg`` = ``agg`` over received messages."""
        triplets = g.triplets(src_prefix="src_", dst_prefix="dst_")
        msgs = []
        if self.to_dst is not None:
            msgs.append(
                triplets.select(F.col(DST).alias(ID), self.to_dst.alias(MSG))
            )
        if self.to_src is not None:
            msgs.append(
                triplets.select(F.col(SRC).alias(ID), self.to_src.alias(MSG))
            )
        out = msgs[0]
        for m in msgs[1:]:
            out = out.unionByName(m)
        return out.groupBy(ID).agg(self.agg.alias(MSG))
