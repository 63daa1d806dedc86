"""PMI co-occurrence, char entropy, and the integrity audit: planted-value
semantics plus the null-padding regression the oracle caught."""

import math

import pytest
from pyspark.sql import functions as F

from pyspark_graph_spark.functions.cooccurrence import (
    adjacent_pairs,
    doc_char_entropy,
    pmi_pairs,
)


def test_adjacent_pairs_no_padding_selfpair(spark):
    # regression: zip_with pads the shifted slice with NULL; least/greatest
    # skip nulls, so canonicalize-then-filter fabricated (last, last) pairs
    df = spark.createDataFrame([(0, "alpha beta"), (1, "solo")], ["doc_id", "text"])
    got = [(r.w1, r.w2) for r in adjacent_pairs(df).collect()]
    assert got == [("alpha", "beta")]  # no ('beta','beta'), nothing for 'solo'


def test_adjacent_pairs_canonical_order_and_counts(spark):
    df = spark.createDataFrame([(0, "b a b a b")], ["doc_id", "text"])
    got = [(r.w1, r.w2) for r in adjacent_pairs(df).collect()]
    assert got == [("a", "b")] * 4  # all 4 adjacent pairs canonicalize


def test_pmi_matches_python(spark):
    # 'x y' always adjacent; 'z' independent filler
    rows = [(i, "x y z z z z") for i in range(6)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r.w1, r.w2): (r.n_pair, r.pmi) for r in pmi_pairs(df, min_count=5).collect()}
    # per doc pairs: (x,y),(y,z),(z,z),(z,z),(z,z) -> totals over 6 docs
    n_pairs = 30.0
    n_uni = 36.0
    c = {"x": 6, "y": 6, "z": 24}
    def pmi(a, b, nab):
        return round(math.log((nab / n_pairs) / ((c[a] / n_uni) * (c[b] / n_uni))), 6)
    assert got[("x", "y")] == (6, pmi("x", "y", 6))
    assert got[("y", "z")] == (6, pmi("y", "z", 6))
    assert got[("z", "z")] == (18, pmi("z", "z", 18))
    assert set(got) == {("x", "y"), ("y", "z"), ("z", "z")}


def test_char_entropy_known_values(spark):
    rows = [
        (0, "aaaa"),       # single symbol -> 0
        (1, "ab"),         # uniform over 2 -> ln 2
        (2, ""),           # empty -> 0
        (3, "aabb"),       # uniform over 2 -> ln 2
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: (r.n_chars, r.entropy) for r in doc_char_entropy(df).collect()}
    assert got[0] == (4, 0.0)
    assert got[1] == (2, round(math.log(2), 6))
    assert got[2] == (0, 0.0)
    assert got[3] == (4, round(math.log(2), 6))


def test_integrity_audit_counts_planted_orphans(spark, sf_dir):
    # the synthetic schema is referentially clean: all-zero audit row
    from pyspark_graph_spark.queries import QUERIES

    row = QUERIES["integrity_audit"](spark, sf_dir).collect()[0]
    assert (
        row.orphan_lineitems,
        row.orphan_orders,
        row.unknown_suppliers,
        row.unknown_nations,
    ) == (0, 0, 0, 0)
