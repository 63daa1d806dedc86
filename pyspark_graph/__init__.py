"""Drop-in compatibility package for users of ``aktungmak/pyspark-graph``.

Every public name of the reference library resolves here to the
``pyspark_graph_spark`` engine — same import paths, same constructor
signatures, same result column names — so existing code switches by
swapping the dependency, nothing else. Differences are strictly
bug-fixes/upgrades documented in SURVEY.md (deterministic ids, checkpointed
iteration, working shortest-paths/Katz/aggregate-messages, fixed datalog
negation and undirected adjacency).

The reference's own ``__init__`` is empty; ours additionally re-exports the
public surface for convenience.
"""

from pyspark_graph.graph import (
    ADJ,
    DEGREE,
    DST,
    EDGE_ID,
    Graph,
    ID,
    IN_DEGREE,
    OLD_DST,
    OLD_ID,
    OLD_SRC,
    OUT_DEGREE,
    SRC,
)
from pyspark_graph.util import (
    match_structure,
    multiple_join,
    multiple_union,
    ne_null_safe,
    order_edges,
)

__all__ = [
    "ADJ",
    "DEGREE",
    "DST",
    "EDGE_ID",
    "Graph",
    "ID",
    "IN_DEGREE",
    "OLD_DST",
    "OLD_ID",
    "OLD_SRC",
    "OUT_DEGREE",
    "SRC",
    "match_structure",
    "multiple_join",
    "multiple_union",
    "ne_null_safe",
    "order_edges",
]
