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
