"""Round-7 hardening: frozen-plane gate oracles, LSH recall floor,
attach_vectors fast path, margin mining, and the value-level matching gate.

Covers the round-6 ADVICE items:
- the xlingual oracles verify FROZEN plane constants, not generator output
  (self-reproduction would mask a generator regression);
- per-plane dots are rounded before the sign test in both engines;
- RandomHyperplaneLSH.sketch(attach_vectors=False) skips the vector re-join;
- a recall floor vs the brute twin is pinned at gate scale.
"""

from __future__ import annotations

import pytest

SF001_DIR = "/root/testdata/sf0.01"


def test_frozen_planes_match_shipping_generator():
    """The checked-in oracle constants must equal what the shipping
    generator produces for the frozen hyperparameters. If this fails, the
    forest geometry changed: that is allowed, but it is a DELIBERATE act —
    regenerate with tools/freeze_planes.py, re-run the xlingual gate
    oracles, and re-validate the recall floor below before committing."""
    from pyspark_graph_spark.ann import frozen_planes as fp
    from tools.freeze_planes import (
        DIM,
        NUM_TABLES,
        PLANES_PER_TABLE,
        SEED,
        values_literal,
    )

    assert (DIM, NUM_TABLES, PLANES_PER_TABLE, SEED) == (
        fp.XLINGUAL_DIM,
        fp.XLINGUAL_NUM_TABLES,
        fp.XLINGUAL_PLANES_PER_TABLE,
        fp.XLINGUAL_SEED,
    )
    assert values_literal() == fp.XLINGUAL_PLANES_VALUES


def test_sketch_attach_vectors_false_schema(spark):
    from pyspark_graph_spark.ann import RandomHyperplaneLSH

    df = spark.createDataFrame(
        [(i, [float(i), float(-i), 1.0, 0.5]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    lsh = RandomHyperplaneLSH(dim=4, num_tables=2, planes_per_table=3)
    slim = lsh.sketch(df, attach_vectors=False)
    assert slim.columns == ["id", "table", "bucket"]
    full = lsh.sketch(df)
    assert set(full.columns) == {"id", "table", "bucket", "__v"}
    # same buckets either way — the flag only drops the vector re-join
    a = {(r.id, r.table, r.bucket) for r in slim.collect()}
    b = {(r.id, r.table, r.bucket) for r in full.collect()}
    assert a == b


def test_lsh_recall_floor_vs_brute_at_gate_scale(spark):
    """Pin the forest's candidate recall against the exact brute twin on
    the GATE corpus (sf0.01, threshold 0.35 — the weak-threshold regime
    where pairs sit near the decision boundary). Measured 0.627 with the
    frozen seed-42 forest; the 0.55 floor catches a bucket-geometry
    regression (e.g. a z-scoring or RNG change that collapses buckets or
    scatters true neighbors) while tolerating testdata drift. Precision
    is 1.0 by construction (every emitted pair is exactly verified)."""
    from pyspark_graph_spark.dedup import EmbeddingDedup

    emb = spark.read.parquet(f"{SF001_DIR}/embeddings.parquet")
    brute = {
        (r.src, r.dst)
        for r in EmbeddingDedup(threshold=0.35, strategy="brute")
        .pairs(emb)
        .collect()
    }
    lsh = {
        (r.src, r.dst)
        for r in EmbeddingDedup(threshold=0.35, strategy="lsh", dim=64)
        .pairs(emb)
        .collect()
    }
    assert lsh <= brute  # precision 1.0: verified pairs only
    assert len(brute) > 0
    recall = len(brute & lsh) / len(brute)
    assert recall >= 0.55, f"LSH candidate recall regressed: {recall:.3f}"


def test_scored_pairs_requires_lsh():
    from pyspark_graph_spark.dedup import EmbeddingDedup

    with pytest.raises(ValueError, match="lsh"):
        EmbeddingDedup(strategy="brute").scored_pairs(None)


def test_xlingual_margin_properties(spark):
    """Margin-mining invariants on the gate corpus: one row per query doc,
    margin in [0, best_sim-(-1)] and best_sim >= margin when a runner-up
    exists, best neighbor is always a different-language document."""
    from pyspark_graph_spark.queries import QUERIES

    out = QUERIES["xlingual_margin"](spark, SF001_DIR)
    rows = out.collect()
    assert len(rows) == len({r.query_id for r in rows})
    docs = {
        r.doc_id: r.lang
        for r in spark.read.parquet(f"{SF001_DIR}/documents.parquet")
        .select("doc_id", "lang")
        .collect()
    }
    for r in rows:
        assert r.margin >= 0.0  # rank-1 sim >= rank-2 sim by definition
        assert r.best_sim >= r.margin - 1.0 - 1e-9
        assert docs[r.query_id] != docs[r.best_id]


def test_maximal_matching_gate_is_value_level(spark):
    """The gate query now emits the matched edge set itself; its rows must
    be exactly the cached matching's rows (disjointness/maximality stay
    covered by test_matching.py's edge-for-edge greedy equivalence)."""
    from pyspark_graph_spark.queries import QUERIES, _supplier_matching

    got = {
        (r.src, r.dst)
        for r in QUERIES["maximal_matching"](spark, SF001_DIR).collect()
    }
    want = {
        (r.src, r.dst)
        for r in _supplier_matching(spark, SF001_DIR).collect()
    }
    assert got == want
    assert len(got) > 0


def test_shared_families_members_registered():
    """bench.py's family subtotals read this mapping; a renamed query must
    not silently drop out of its family."""
    from pyspark_graph_spark.queries import QUERIES, SHARED_FAMILIES

    for fam, members in SHARED_FAMILIES.items():
        assert len(members) >= 2, fam
        for m in members:
            assert m in QUERIES, f"{fam}: {m} not registered"
