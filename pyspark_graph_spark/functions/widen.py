"""Widen few-split scans before per-row CPU-heavy stages.

Single-row-group parquet (all of the driver's testdata, and any small
warehouse table) scans as ONE split, which pins every fused downstream
stage — shingling, per-char hashing, Arrow codec hops, explode fan-outs —
to one task while the other 31 threads idle. ``widen_for_python``
round-robins such inputs to full thread width, gated on plan shape so it
never eagerly executes a derived frame's exchanges.

Measured at sf0.1 (warm, 32 threads): cdc_chunks 43.9 s → 2.5 s,
winnow_matches 13.2 s → 5.1 s, SimHash pairs 2.6 s → 1.1 s, MinHash
pairs 2.9 s → 2.2 s. At warehouse scale inputs arrive in many files and
every guard below makes this a no-op.

Home of the implementation; ``multimodal.binary_ops`` re-exports it for
backward compatibility (it started life gating the media codec hop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# optimized-logical-plan node names that cannot hide an exchange: a plan
# made ONLY of these is a bare file scan (plus row/column pruning), so an
# rdd partition probe on it schedules zero jobs
_BARE_SCAN_NODES = frozenset(
    {"Relation", "Project", "Filter", "LocalRelation"}
)


def _is_bare_scan(df: DataFrame) -> bool:
    """True iff the optimized logical plan contains only
    Relation/Project/Filter/LocalRelation nodes — the structural check
    behind widen_for_python's 'pass bare scans only' contract. Under Spark
    Connect there is no ``_jdf`` and the probe returns False, which makes
    widen_for_python a documented no-op there (at warehouse scale inputs
    arrive in many files and it is a no-op anyway)."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:
        return False
    for line in plan.splitlines():
        node = line.lstrip(" +-:").split(" ", 1)[0].split("[", 1)[0]
        if node and node not in _BARE_SCAN_NODES:
            return False
    return True


def widen_for_python(df: DataFrame) -> DataFrame:
    """Round-robin a few-file bare scan to full thread width.

    Guard order matters. ``inputFiles()`` (a plan walk, never a job)
    gates first: inputs with no discoverable files are left untouched.
    But leaf-scan files surface through joins/filters/aggregates too, so
    a few-file count alone does not prove scan-only lineage — and
    materializing the RDD of an arbitrary AQE plan eagerly executes
    every upstream exchange as a throwaway job. The plan-shape gate
    ``_is_bare_scan`` therefore enforces the contract structurally: only
    when the optimized logical plan is pure Relation/Project/Filter
    lineage does the split-count rdd probe run (scan-only lineage
    schedules no jobs); any other shape — join, aggregate, repartition —
    owns its partitioning and is returned untouched. The probe itself
    still decides the final step: a handful of huge splittable files
    already scans as many partitions and must NOT be collapsed to
    thread width."""
    from pyspark_graph_spark.session import default_parallelism

    target = default_parallelism(df.sparkSession)
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files == 0 or n_files >= target:
        return df
    if not _is_bare_scan(df):
        return df
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
