"""Deterministic corpus sampling / data-mixing primitives.

Engine extension (no analogue in the graph reference): the selection step
of a training-data pipeline — "keep 30% of English, all of the low-resource
languages, 10% of crawl dupes" — expressed as a *pure map-side filter*.

Why hash-based and not ``df.sample()``: Spark's ``sample`` is seeded
per-partition, so the selected set changes with partitioning, retries, and
cluster size. A content-keyed hash threshold is (a) reproducible bit-for-bit
across runs/engines — the DuckDB oracle recomputes the identical decision —
(b) stable under re-partitioning, and (c) consistent across tables: every
derived table sampled on the same key keeps the same rows (the standard
"hash-mod sampling" used for coordinated dataset cuts).

100 TB design: this is the cheapest possible operator — zero shuffles, zero
joins; the per-stratum rate lookup is a literal CASE expression (or a
broadcast join for thousands of strata), the hash is one md5 per row, and
the filter evaluates inside whole-stage codegen straight on top of the
parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyspark_graph_spark.functions.hashing import md5_hash60, md5_hash60_sql

# md5_hash60 is uniform on [0, 2^60); rate r keeps hash < r * 2^60
_HASH_SPACE = float(1 << 60)


def sample_hash(key: Column, salt: str = "") -> Column:
    """Uniform [0, 2^60) sampling hash of a key column (+ optional salt so
    independent sampling decisions can reuse one key)."""
    return md5_hash60(F.concat(key.cast("string"), F.lit(salt)))


def deterministic_sample(
    df: DataFrame, rate: float, key_col: str, salt: str = ""
) -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows keyed by ``key_col``."""
    return df.filter(
        sample_hash(F.col(key_col), salt) < F.lit(int(rate * _HASH_SPACE))
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str,
    key_col: str,
    default_rate: float = 1.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (data mixing).

    ``rates`` maps stratum values to keep-fractions; unlisted strata keep
    ``default_rate``. The thresholds are folded into one literal CASE
    expression — evaluated row-local, no join, no shuffle.
    """
    threshold: Column = F.lit(int(default_rate * _HASH_SPACE))
    for stratum, rate in sorted(rates.items()):
        threshold = F.when(
            F.col(stratum_col) == stratum, F.lit(int(rate * _HASH_SPACE))
        ).otherwise(threshold)
    return df.filter(sample_hash(F.col(key_col), salt) < threshold)


def stratified_sample_sql(
    rates: dict[str, float],
    stratum_col: str,
    key_expr: str,
    default_rate: float = 1.0,
    salt: str = "",
) -> str:
    """DuckDB WHERE-clause predicate making the identical per-row decision
    as :func:`stratified_sample` (for external oracles / audits)."""
    hash_expr = md5_hash60_sql(
        f"CAST({key_expr} AS VARCHAR) || '{salt}'"
        if salt
        else f"CAST({key_expr} AS VARCHAR)"
    )
    cases = " ".join(
        f"WHEN {stratum_col} = '{s}' THEN {int(r * _HASH_SPACE)}"
        for s, r in sorted(rates.items())
    )
    return (
        f"{hash_expr} < (CASE {cases} "
        f"ELSE {int(default_rate * _HASH_SPACE)} END)"
    )


def quota_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    quota: int,
    salt: str = "",
) -> DataFrame:
    """Keep at most ``quota`` rows per group, chosen deterministically.

    Source quota enforcement ("at most N docs per domain"): rows are ranked
    inside each group by the content hash (+ salt) and the top ``quota``
    kept — a reproducible uniform draw, independent of partitioning, that
    an external engine can recompute. One shuffle on the group column; the
    per-group window keeps O(group size) state and AQE skew-splitting
    handles a dominant group. Change ``salt`` to redraw.
    """
    if quota < 1:
        raise ValueError("quota must be >= 1")
    from pyspark.sql import Window

    win = Window.partitionBy(group_col).orderBy("__qh", key_col)
    return (
        df.withColumn("__qh", sample_hash(F.col(key_col), salt))
        .withColumn("__qrn", F.row_number().over(win))
        .filter(F.col("__qrn") <= quota)
        .drop("__qh", "__qrn")
    )
