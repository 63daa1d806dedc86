#!/usr/bin/env python
"""Regenerate pyspark_graph_spark/ann/frozen_planes.py from the shipping
RandomHyperplaneLSH generator.

The frozen constants exist so the xlingual gate oracles verify a FIXED
forest instead of self-reproducing the implementation under test; run this
only when the forest geometry is changed deliberately, and re-validate the
recall floor (tests/test_round7_fixes.py) before committing the output.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark_graph_spark.ann.lsh import RandomHyperplaneLSH  # noqa: E402

DIM, NUM_TABLES, PLANES_PER_TABLE, SEED = 64, 16, 6, 42
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "pyspark_graph_spark",
    "ann",
    "frozen_planes.py",
)


def values_literal() -> str:
    planes = RandomHyperplaneLSH(
        dim=DIM,
        num_tables=NUM_TABLES,
        planes_per_table=PLANES_PER_TABLE,
        seed=SEED,
    ).planes
    rows = []
    for t in range(NUM_TABLES):
        for p in range(PLANES_PER_TABLE):
            w = planes[t * PLANES_PER_TABLE + p]
            lit = "[" + ", ".join(repr(x) for x in w) + "]"
            rows.append(f"({t}, {p}, {lit})")
    return ",\n".join(rows)


HEADER = '''"""FROZEN hyperplane weights for the cross-lingual mining gate oracles.

These are the dim=64, 16-table x 6-plane, seed=42 Gaussian hyperplanes that
``RandomHyperplaneLSH`` derived from its seeded generator at the moment this
file was generated — checked in as CONSTANTS so the DuckDB oracles for
``xlingual_mining``/``xlingual_margin`` verify against a fixed forest rather
than whatever the shipping generator currently produces (round-6 advice: an
oracle regenerated from the implementation under test can only ever prove
self-reproduction). If ``RandomHyperplaneLSH``'s RNG, plane count, or bucket
formula changes, the gate DIVERGES loudly; regenerate deliberately with
``python tools/freeze_planes.py`` and re-validate the recall floor in
tests/test_round7_fixes.py before committing the new constants.

Format: DuckDB ``VALUES`` rows ``(tbl, plane, [w1, ..., w64])``; repr()
round-trips each double exactly and DuckDB parses to the identical bits.
"""

XLINGUAL_DIM = 64
XLINGUAL_NUM_TABLES = 16
XLINGUAL_PLANES_PER_TABLE = 6
XLINGUAL_SEED = 42

XLINGUAL_PLANES_VALUES = """\\
'''


def main() -> None:
    with open(OUT, "w") as f:
        f.write(HEADER + values_literal() + '"""\n')
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
