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
- ``vertex_filters={"a": predicate}`` — per-variable vertex predicates
  applied BEFORE the edge joins (semi-joins on the edge legs), not after
  the full motif is enumerated. Selective vertex predicates filtered
  post-``find`` otherwise sit above the wedge/path joins — Catalyst pushes
  them into the vertex *scan* but does not reorder them below the motif's
  self-joins, so the join still enumerates every candidate first.

Everything compiles to joins/anti-joins over the edge and vertex tables —
Catalyst reorders the join tree; no interpretation at runtime.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
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


def find(
    g: Graph,
    pattern: str,
    vertex_filters: dict[str, Column] | None = None,
) -> DataFrame:
    """Match the motif ``pattern``; returns one struct column per named
    variable. ``vertex_filters`` maps vertex variable names to predicates
    over the vertex columns, enforced *before* the motif joins."""
    terms = _parse(pattern)
    vertex_filters = vertex_filters or {}
    allowed = {
        v: g.vertices.filter(pred).select(ID)
        for v, pred in vertex_filters.items()
    }

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
        frame = g.edges.select(cols)
        # pushdown: shrink this edge leg to filtered endpoints before any
        # motif join (the allowed set is usually small -> AQE broadcasts)
        for v in (src_v, dst_v):
            if v in allowed:
                frame = frame.join(
                    allowed[v].withColumnRenamed(ID, f"__v_{v}"),
                    on=f"__v_{v}",
                    how="semi",
                )
        pos_frames.append(frame)
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

    unknown = set(vertex_filters) - {
        v for v in vertex_vars if not v.startswith("__anon")
    }
    if unknown:
        raise ValueError(
            f"vertex_filters name unbound variables: {sorted(unknown)}"
        )

    # attach full vertex rows as structs for named vertex variables
    vertex_struct = F.struct(*[F.col(c) for c in g.vertices.columns])
    out_cols = []
    for v in vertex_vars:
        if v.startswith("__anon"):
            continue
        base = g.vertices
        if v in vertex_filters:
            base = base.filter(vertex_filters[v])
        vs = base.select(F.col(ID).alias(f"__v_{v}"), vertex_struct.alias(v))
        result = result.join(vs, on=f"__v_{v}")
        out_cols.append(v)
    out_cols.extend(edge_vars)
    return result.select(out_cols)
