#!/usr/bin/env python
"""Local approximation of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 in Spark AND its ``oracle_sql()``
in DuckDB over the same parquet views, then compares row count, column
names, and an order-insensitive multiset of canonicalized values.

Usage: python tools/check_oracle.py [query ...]   (default: all)

Set SPARK_GRAFT_ORACLE_JSON=<path> to also write a machine-readable record
({name: {"ok": bool, "rows": n, "spark_sec": s, "duck_sec": s,
"problems": [...]}, ...}) — the per-round full-suite sweep committed as
ORACLE_FULL_r{N}.json (round-6 verdict item 1: the driver window verifies
50/round, so the committed sweep is the regression backstop for the other
~200 while shared scan-stage code keeps moving).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(v):
    """Canonicalize a value for order-insensitive comparison."""
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round so Spark-vs-DuckDB summation-order noise doesn't flip hashes
        return f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def df_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(
        tuple(canon(r[i]) for i in order) for r in rows
    )


def duck_type_to_spark(t: str) -> str:
    """Normalize a DuckDB column type to Spark's simpleString vocabulary."""
    t = t.strip().upper()
    if t.endswith("[]"):
        return f"array<{duck_type_to_spark(t[:-2])}>"
    base = {
        "BIGINT": "bigint",
        "INTEGER": "int",
        "SMALLINT": "smallint",
        "TINYINT": "tinyint",
        "HUGEINT": "decimal(38,0)",
        "DOUBLE": "double",
        "FLOAT": "float",
        "REAL": "float",
        "VARCHAR": "string",
        "BOOLEAN": "boolean",
        "TIMESTAMP": "timestamp",
        "DATE": "date",
        "BLOB": "binary",
    }
    if t.startswith("DECIMAL"):
        return t.lower().replace(" ", "")
    return base.get(t, t.lower())


def main(names: list[str] | None = None) -> int:
    import __spark_entry__ as entrymod
    from pyspark_graph_spark.session import get_spark

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    targets = names or list(qs)
    unknown = [n for n in targets if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}; available: {sorted(qs)}")
        return 2

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    failures = []
    record: dict[str, dict] = {}
    for name in targets:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # keep checking the remaining queries
            print(f"  {name}: ERROR {type(e).__name__}: {str(e)[:200]}")
            failures.append((name, f"exception: {e}"))
            record[name] = {
                "ok": False,
                "problems": [f"exception: {type(e).__name__}: {str(e)[:200]}"],
            }
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"  {name}: rows-only ({len(srows)} rows, spark {t_spark:.1f}s)")
            record[name] = {
                "ok": bool(srows),
                "rows": len(srows),
                "spark_sec": round(t_spark, 2),
                "problems": [] if srows else ["rows-only query returned 0 rows"],
            }
            if not srows:
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        t0 = time.time()
        cur = con.execute(oracles[name])
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()  # drain before reusing the connection cursor
        otypes = {
            r[0]: duck_type_to_spark(r[1])
            for r in con.execute(
                f"DESCRIBE {oracles[name]}"
            ).fetchall()
        }
        t_duck = time.time() - t0

        problems = []
        # The driver's canonicalizer pandas-sorts every column; list/dict
        # values raise "unhashable type" there, so flag them here first.
        for f in sdf.schema.fields:
            if f.dataType.typeName() in ("array", "map", "struct"):
                problems.append(
                    f"driver-unsafe column {f.name!r}: "
                    f"{f.dataType.simpleString()} cannot be pandas-sorted; "
                    "serialize with array_join or explode to rows"
                )
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
        else:
            stypes = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
            for c in scols:
                if stypes[c] != otypes.get(c, stypes[c]):
                    problems.append(
                        f"dtype[{c}]: spark={stypes[c]} oracle={otypes[c]}"
                    )
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if not problems:
            sm, om = df_multiset(scols, srows), df_multiset(ocols, orows)
            if sm != om:
                only_s = list((sm - om).items())[:3]
                only_o = list((om - sm).items())[:3]
                problems.append(
                    f"value mismatch: spark-only={only_s} oracle-only={only_o}"
                )
        status = "OK" if not problems else "FAIL"
        print(
            f"  {name}: {status} ({len(srows)} rows, "
            f"spark {t_spark:.1f}s, duckdb {t_duck:.1f}s)"
        )
        for p in problems:
            print(f"      {p}")
            failures.append((name, p))
        record[name] = {
            "ok": not problems,
            "rows": len(srows),
            "spark_sec": round(t_spark, 2),
            "duck_sec": round(t_duck, 2),
            "problems": problems,
        }
    out_path = os.environ.get("SPARK_GRAFT_ORACLE_JSON")
    if out_path:
        ok = sum(1 for r in record.values() if r["ok"])
        with open(out_path, "w") as fh:
            json.dump(
                {
                    "sf_dir": SF_DIR,
                    "n_queries": len(record),
                    "n_ok": ok,
                    "queries": record,
                },
                fh,
                indent=1,
            )
        print(f"wrote {out_path} ({ok}/{len(record)} ok)")
    print()
    if failures:
        print(f"{len(failures)} problem(s)")
        return 1
    print(f"all {len(targets)} queries consistent with oracle")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or None))
