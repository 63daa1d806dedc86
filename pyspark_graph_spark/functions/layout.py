"""Z-order (Morton) keys for multi-dimensional data layout.

The lakehouse layout trick: sorting a table by the bit-interleaved
z-value of two (or more) columns clusters rows so that a range predicate
on EITHER column touches a contiguous-ish subset of files — min/max file
statistics then skip most of the scan. This is how you make "WHERE
custkey BETWEEN ..." AND "WHERE suppkey BETWEEN ..." both prunable from
one physical ordering at 100 TB.

The z-value is pure integer arithmetic (shift/mask/or per bit), built as
a fixed expression tree that whole-stage-codegen compiles flat — no UDF,
no shuffle; the only shuffle in a re-layout job is the final range
repartition by the z-key that the writer needs anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` of two non-negative ints:
    bit i of ``a`` lands at position 2i+1, bit i of ``b`` at 2i."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    a = a.cast("long")
    b = b.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b, i).bitwiseAND(F.lit(1))
        z = z + F.shiftleft(abit, 2 * i + 1) + F.shiftleft(bbit, 2 * i)
    return z


def zvalue_sql(a_expr: str, b_expr: str, bits: int = 16) -> str:
    """The identical arithmetic as a SQL expression (for oracles/audits)."""
    terms = []
    for i in range(bits):
        terms.append(
            f"(((CAST({a_expr} AS BIGINT) >> {i}) & 1) << {2 * i + 1})"
        )
        terms.append(f"(((CAST({b_expr} AS BIGINT) >> {i}) & 1) << {2 * i})")
    return "(" + " + ".join(terms) + ")"


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 64,
    bits: int = 16,
) -> None:
    """Re-layout a table z-ordered: range-repartition on the z-key into
    ``n_files`` z-contiguous partitions (a sampled range shuffle — no
    global sort, no single-task window) and sort within each, so every
    output file's (min, max) footer stats are tight on BOTH columns."""
    z = zvalue(F.col(col_a), F.col(col_b), bits)
    (
        df.withColumn("zval", z)
        .repartitionByRange(n_files, "zval")
        .sortWithinPartitions("zval")
        .write.mode("overwrite")
        .parquet(path)
    )


def with_hilbert_key(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 8,
    out: str = "hilbert",
) -> DataFrame:
    """Append the Hilbert-curve index of (x_col, y_col) on the
    2^bits × 2^bits grid.

    The better locality curve: unlike Morton order, consecutive Hilbert
    indices are ALWAYS grid-adjacent, so a range of the sort key maps to
    a compact 2-D region — tighter min/max file skipping than Z-order for
    the same two-column layout (the Z-order upgrade lakehouse engines
    offer as Hilbert clustering).

    Standard xy2d construction, one chained projection per level (state
    columns x, y, d) — a projection boundary per level keeps the
    expression tree linear in ``bits`` (a single nested expression would
    grow exponentially through the rotate/reflect CASEs), and Catalyst
    collapses the chain into one whole-stage-codegen pass. Identical
    arithmetic is emitted for SQL oracles by ``hilbert_sql_ctes``.
    """
    if not 1 <= bits <= 15:
        raise ValueError("bits must be in [1, 15]")
    others = df.columns
    cur = df.select(
        *others,
        F.col(x_col).cast("long").alias("__hx"),
        F.col(y_col).cast("long").alias("__hy"),
        F.lit(0).cast("long").alias("__hd"),
    )
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        rx = F.shiftright(F.col("__hx"), level).bitwiseAND(F.lit(1))
        ry = F.shiftright(F.col("__hy"), level).bitwiseAND(F.lit(1))
        d = F.col("__hd") + F.lit(s) * F.lit(s) * (
            (F.lit(3) * rx).bitwiseXOR(ry)
        )
        flip = (ry == F.lit(0)) & (rx == F.lit(1))
        fx = F.when(flip, F.lit(s - 1) - F.col("__hx")).otherwise(
            F.col("__hx")
        )
        fy = F.when(flip, F.lit(s - 1) - F.col("__hy")).otherwise(
            F.col("__hy")
        )
        nx = F.when(ry == F.lit(0), fy).otherwise(F.col("__hx"))
        ny = F.when(ry == F.lit(0), fx).otherwise(F.col("__hy"))
        if level > 0:
            nx = nx.bitwiseAND(F.lit(s - 1))
            ny = ny.bitwiseAND(F.lit(s - 1))
        cur = cur.select(
            *others,
            nx.alias("__hx"),
            ny.alias("__hy"),
            d.alias("__hd"),
        )
    return cur.select(*others, F.col("__hd").alias(out))


def hilbert_sql_ctes(
    base: str, x_expr: str, y_expr: str, bits: int = 8
) -> str:
    """Chained-CTE SQL computing the identical Hilbert index.

    ``base`` is a relation (table or CTE name) whose rows carry the
    coordinates; returns text of the form ``h0 AS (...), ..., hN AS
    (SELECT *, d AS hilbert FROM ...)`` — splice into a WITH clause and
    select from ``hN``. Base columns are carried through every level.
    """
    ctes = [
        f"h0 AS (SELECT *, CAST({x_expr} AS BIGINT) AS hx, "
        f"CAST({y_expr} AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd "
        f"FROM {base})"
    ]
    step = 0
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        rx = f"((hx >> {level}) & 1)"
        ry = f"((hy >> {level}) & 1)"
        fx = f"CASE WHEN {ry} = 0 AND {rx} = 1 THEN {s - 1} - hx ELSE hx END"
        fy = f"CASE WHEN {ry} = 0 AND {rx} = 1 THEN {s - 1} - hy ELSE hy END"
        nx = f"CASE WHEN {ry} = 0 THEN ({fy}) ELSE hx END"
        ny = f"CASE WHEN {ry} = 0 THEN ({fx}) ELSE hy END"
        if level > 0:
            # bitwise AND, NOT modulo: the flip step can go negative and
            # %'s negative remainder would diverge from the AND mask
            nx = f"(({nx}) & {s - 1})"
            ny = f"(({ny}) & {s - 1})"
        step += 1
        ctes.append(
            f"h{step} AS (SELECT * EXCLUDE (hx, hy, hd), "
            f"{nx} AS hx, {ny} AS hy, "
            f"hd + {s * s} * xor(3 * {rx}, {ry}) AS hd FROM h{step - 1})"
        )
    return ",\n".join(ctes)


def compaction_groups(
    files: DataFrame,
    partition_by: list[str],
    order_by: str,
    size_col: str,
    target: int,
) -> DataFrame:
    """Small-file compaction planning — assign per-partition file metadata
    rows to output groups of ~``target`` total size, preserving the sort
    order (the OPTIMIZE/compaction primitive of every lakehouse format).

    Greedy-by-running-total: a file joins group ``floor(exclusive_prefix_
    sum(size) / target)``, so groups are contiguous runs in ``order_by``
    order, every group except possibly the last per partition reaches the
    target, and an oversize file gets (at least) its own group. One
    window per TABLE PARTITION (``partition_by``), never a global sort:
    state is bounded by files-per-partition — compaction plans operate on
    file METADATA (one row per file), so even a million-file table is a
    metadata-scale frame.
    """
    from pyspark.sql import Window

    if target < 1:
        raise ValueError("target must be positive")
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(order_by)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    excl = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    return files.withColumn(
        "group_id", F.floor(excl / F.lit(float(target))).cast("long")
    )
