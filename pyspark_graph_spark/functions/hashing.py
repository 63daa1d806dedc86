"""Cross-engine deterministic hash helpers.

The engine's default 64-bit hash is ``xxhash64`` (fastest JVM-side option),
but xxhash64 does not exist in ANSI SQL / DuckDB, so operators that want an
*exact external oracle* can switch to these md5-derived variants: the first
15 hex chars (60 bits) of ``md5`` folded to a BIGINT. Both Spark
(``conv(substr(md5(x),1,15),16,10)``) and DuckDB (digit fold over the same
substring) produce the identical integer, verified in tests.

60 bits (not 64) so the value always fits a signed long in both engines —
no overflow-to-null on the Spark cast, no UBIGINT/BIGINT mismatch in SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_hash60(c: Column) -> Column:
    """60-bit integer hash of a string column via md5 (cross-engine)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_hash60_concat(*cols: Column) -> Column:
    """md5_hash60 over the comma-joined string forms of ``cols`` — the
    cross-engine stand-in for multi-argument ``xxhash64(a, b, ...)``."""
    return md5_hash60(F.concat_ws(",", *[c.cast("string") for c in cols]))


def md5_hash60_sql(expr: str) -> str:
    """The DuckDB expression computing the same value as ``md5_hash60``.

    ``expr`` must be a SQL string expression. The fold runs over BIGINTs
    (a 32-bit accumulator would overflow at 60 bits).
    """
    return (
        "list_reduce(list_transform(range(1,16), "
        f"i -> CAST(strpos('0123456789abcdef', substr(md5({expr}),i,1)) - 1 "
        "AS BIGINT)), (a,b) -> a*16+b)"
    )
