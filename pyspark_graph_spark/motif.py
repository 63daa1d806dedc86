"""GraphFrames-style motif finding: ``find("(a)-[e]->(b); !(b)-[]->(a)")``.

A string front-end over the same conjunctive-join machinery as
``match_structure``/Datalog (the reference's motif surface, util.py:28-32),
with the pattern language of GraphFrames' public ``find`` API:

- ``(a)-[e]->(b)`` — an edge; ``a``/``b`` bind vertices, ``e`` the edge
- anonymous elements: ``()`` or ``[]`` match without binding
- ``!(a)-[]->(b)`` — negation: no such edge exists (anti join); negated
  terms cannot name edges and cannot introduce new vertices
- result: one struct column per named vertex/edge variable carrying the
  full vertex/edge row (filter on fields like ``F.col("a.id")``)

Everything compiles to joins/anti-joins over the edge and vertex tables —
Catalyst reorders the join tree; no interpretation at runtime.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_graph_spark.constants import DST, ID, SRC
from pyspark_graph_spark.graph import Graph

_TERM = re.compile(
    r"^\s*(!?)\s*\(([A-Za-z_][A-Za-z0-9_]*)?\)\s*-\s*"
    r"\[([A-Za-z_][A-Za-z0-9_]*)?\]\s*->\s*\(([A-Za-z_][A-Za-z0-9_]*)?\)\s*$"
)


def _parse(pattern: str):
    terms = []
    for raw in pattern.split(";"):
        if not raw.strip():
            continue
        m = _TERM.match(raw)
        if not m:
            raise ValueError(f"unparseable motif term: {raw.strip()!r}")
        neg, src_v, edge_v, dst_v = m.groups()
        terms.append((bool(neg), src_v, edge_v, dst_v))
    if not terms:
        raise ValueError("empty motif pattern")
    return terms


def find(g: Graph, pattern: str) -> DataFrame:
    """Match the motif ``pattern``; returns one struct column per named
    variable."""
    terms = _parse(pattern)

    edge_struct = F.struct(*[F.col(c) for c in g.edges.columns])
    anon = 0
    pos_frames = []
    vertex_vars: list[str] = []
    edge_vars: list[str] = []
    negatives = []

    for neg, src_v, edge_v, dst_v in terms:
        if neg:
            if edge_v:
                raise ValueError("negated terms cannot bind an edge variable")
            if not src_v or not dst_v:
                raise ValueError("negated terms need named endpoints")
            negatives.append((src_v, dst_v))
            continue
        if not src_v:
            anon += 1
            src_v = f"__anon{anon}"
        if not dst_v:
            anon += 1
            dst_v = f"__anon{anon}"
        cols = [
            F.col(SRC).alias(f"__v_{src_v}"),
            F.col(DST).alias(f"__v_{dst_v}"),
        ]
        if edge_v:
            if edge_v in edge_vars:
                raise ValueError(f"edge variable {edge_v!r} bound twice")
            edge_vars.append(edge_v)
            cols.append(edge_struct.alias(edge_v))
        pos_frames.append(g.edges.select(cols))
        for v in (src_v, dst_v):
            if v not in vertex_vars:
                vertex_vars.append(v)

    if not pos_frames:
        raise ValueError("motif needs at least one positive term")

    result = pos_frames[0]
    for frame in pos_frames[1:]:
        shared = [c for c in result.columns if c in frame.columns]
        result = result.join(frame, on=shared) if shared else result.crossJoin(frame)

    bound = {v for v in vertex_vars if not v.startswith("__anon")}
    for src_v, dst_v in negatives:
        missing = {src_v, dst_v} - bound
        if missing:
            raise ValueError(
                f"negated term introduces unbound variables: {sorted(missing)}"
            )
        neg_df = g.edges.select(
            F.col(SRC).alias(f"__v_{src_v}"), F.col(DST).alias(f"__v_{dst_v}")
        )
        result = result.join(
            neg_df, on=[f"__v_{src_v}", f"__v_{dst_v}"], how="anti"
        )

    # attach full vertex rows as structs for named vertex variables
    vertex_struct = F.struct(*[F.col(c) for c in g.vertices.columns])
    out_cols = []
    for v in vertex_vars:
        if v.startswith("__anon"):
            continue
        vs = g.vertices.select(
            F.col(ID).alias(f"__v_{v}"), vertex_struct.alias(v)
        )
        result = result.join(vs, on=f"__v_{v}")
        out_cols.append(v)
    out_cols.extend(edge_vars)
    return result.select(out_cols)
