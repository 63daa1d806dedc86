"""Join/union/motif helpers (semantics of reference util.py:9-39, fixed).

All helpers are pure plan builders — no actions, no caching. They compose with
Catalyst optimization (join reordering, pushdown) because they only use the
public DataFrame API.
"""

from __future__ import annotations

from functools import reduce
from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyspark_graph_spark.constants import DST, SRC


def common_columns(left: DataFrame, right: DataFrame) -> list[str]:
    """Shared column names, in left-DataFrame order (deterministic)."""
    right_cols = set(right.columns)
    return [c for c in left.columns if c in right_cols]


def multiple_join(dfs: Sequence[DataFrame]) -> DataFrame:
    """Natural-join a list of DataFrames on their shared column names.

    Semantics of reference util.py:9-14. Each pairwise join is an inner
    equi-join on the columns the two frames share at that point in the
    reduction; Catalyst reorders/plans the join tree (AQE may broadcast small
    sides at runtime).

    Raises ``ValueError`` on an empty list or when a pair shares no columns
    (which would otherwise silently produce a cross join).
    """
    if not dfs:
        raise ValueError("multiple_join requires at least one DataFrame")

    def join2(left: DataFrame, right: DataFrame) -> DataFrame:
        on = common_columns(left, right)
        if not on:
            raise ValueError(
                "multiple_join: no shared columns between "
                f"{left.columns} and {right.columns}"
            )
        return left.join(right, on=on)

    return reduce(join2, dfs)


def multiple_union(dfs: Sequence[DataFrame]) -> DataFrame:
    """Union a list of DataFrames **by name** (reference util.py:17-21 used
    positional ``union``, which hides column-misalignment bugs; we don't)."""
    if not dfs:
        raise ValueError("multiple_union requires at least one DataFrame")
    return reduce(DataFrame.unionByName, dfs)


def ne_null_safe(x: Column, y: Column) -> Column:
    """Null-safe inequality (reference util.py:24-25): NULL <=> NULL is False."""
    return ~x.eqNullSafe(y)


def match_structure(
    edges: DataFrame, match: Iterable[tuple[str, str]]
) -> DataFrame:
    """Conjunctive edge-pattern (motif) match — GraphFrames ``find()`` lite.

    Each ``(s, d)`` variable pair aliases the edge table as columns ``s``/``d``;
    the natural join unifies shared variables (reference util.py:28-32).
    E.g. ``match_structure(e, [("a","b"), ("b","c"), ("a","c")])`` matches
    triangles. Returns one column per distinct variable.

    Scale note: this is an N-way self-equi-join; Catalyst plans shuffled hash /
    sort-merge joins on the unified variables. Canonicalize edges first
    (``order_edges``) to cut the candidate space for undirected motifs.
    """
    match = list(match)
    frames = [
        edges.select(F.col(SRC).alias(s), F.col(DST).alias(d))
        for s, d in match
    ]
    variables = list(dict.fromkeys(v for pair in match for v in pair))
    return multiple_join(frames).select(variables)


def order_edges(edges: DataFrame) -> DataFrame:
    """Canonicalize an edge list: drop self-loops, order endpoints ascending,
    dedup (reference util.py:35-39). Keeps only (src, dst)."""
    return (
        edges.filter(F.col(SRC) != F.col(DST))
        .select(
            F.least(SRC, DST).alias(SRC),
            F.greatest(SRC, DST).alias(DST),
        )
        .dropDuplicates()
    )


def checkpoint_observed(
    df: DataFrame, **metrics: Column
) -> tuple[DataFrame, dict]:
    """``localCheckpoint`` a frame and collect aggregate metrics about it
    IN THE SAME JOB (round 12, guide §2.4).

    Every iterative operator used to pay one extra action per round for
    its convergence probe (``isEmpty``/``count``/fingerprint ``first``)
    on the frame it had just checkpointed — at gate scale that is one
    ~90 ms fixed-overhead job per round per operator, and at 100 TB one
    full cluster job launch per round. ``DataFrame.observe`` attaches
    the aggregates to the checkpoint's own materialization, so the probe
    rides the job that must run anyway. The checkpointed ROWS are
    byte-identical (observe is a pass-through metrics node); only the
    probe's packaging changes.

    Returns ``(checkpointed_df, {name: value})``. The metric values are
    what the same aggregate expressions would return over the frame
    (``sum`` over no rows is None, like any Spark aggregate).
    """
    from pyspark.sql import Observation

    obs = Observation()
    out = df.observe(
        obs, *[m.alias(n) for n, m in metrics.items()]
    ).localCheckpoint()
    return out, obs.get
