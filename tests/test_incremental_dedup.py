"""Incremental batch-vs-corpus dedup (dedup/incremental.py)."""

from pyspark.sql import functions as F

from pyspark_graph_spark.dedup.incremental import IncrementalDedup


CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "completely unrelated corpus text about spark physical planning"),
    (4, "short doc"),
]
BATCH = [
    # exact dup of 0 modulo whitespace/case
    (1, "  The quick   brown fox jumps over the lazy dog near the river bank "),
    # near dup of 2 (one word changed)
    (3, "completely unrelated corpus text about spark logical planning"),
    # genuinely new
    (5, "a brand new document that shares nothing with the standing corpus"),
    # too short to shingle, not an exact dup -> admitted
    (7, "tiny new"),
]


def frames(spark):
    c = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    b = spark.createDataFrame(BATCH, ["doc_id", "text"])
    return c, b


def test_exact_hits_catch_normalized_duplicates(spark):
    c, b = frames(spark)
    hits = {r.doc_id for r in IncrementalDedup().exact_hits(c, b).collect()}
    assert hits == {1}


def test_near_matches_cross_set_only(spark):
    c, b = frames(spark)
    m = IncrementalDedup(threshold=0.5).near_matches(c, b).collect()
    pairs = {(r.batch_id, r.corpus_id) for r in m}
    assert (3, 2) in pairs
    for r in m:
        assert r.batch_id % 2 == 1 and r.corpus_id % 2 == 0
        assert r.jaccard >= 0.5


def test_admitted_filters_both_kinds(spark):
    c, b = frames(spark)
    out = {r.doc_id for r in IncrementalDedup(threshold=0.5).admitted(c, b).collect()}
    assert out == {5, 7}


def test_admitted_preserves_batch_columns(spark):
    c, b = frames(spark)
    b2 = b.withColumn("lang", F.lit("en"))
    out = IncrementalDedup(threshold=0.5).admitted(c, b2)
    assert set(out.columns) == {"doc_id", "text", "lang"}


def test_empty_corpus_admits_everything(spark):
    c, b = frames(spark)
    empty = c.filter(F.lit(False))
    out = {r.doc_id for r in IncrementalDedup().admitted(empty, b).collect()}
    assert out == {1, 3, 5, 7}


def test_idempotent_readmission(spark):
    """Admitting the already-admitted batch against corpus+batch finds
    every doc a duplicate of itself -> nothing admitted twice."""
    c, b = frames(spark)
    dd = IncrementalDedup(threshold=0.5)
    admitted = dd.admitted(c, b)
    grown = c.unionByName(admitted.select("doc_id", "text"))
    again = dd.admitted(grown, admitted.select("doc_id", "text"))
    # every admitted doc is now an exact dup of itself in the corpus...
    # except ids sharing parity can't collide here; re-check via count
    assert again.count() == 0


def test_threshold_and_custom_minhash_conflict(spark):
    """threshold= alongside a pre-configured minhash is rejected instead of
    silently ignored (ADVICE r2)."""
    import pytest

    from pyspark_graph_spark.dedup.minhash import MinHashLSH

    with pytest.raises(ValueError, match="not both"):
        IncrementalDedup(threshold=0.9, minhash=MinHashLSH(threshold=0.3))
    # either alone still works
    assert IncrementalDedup(threshold=0.7).minhash.threshold == 0.7
    assert (
        IncrementalDedup(minhash=MinHashLSH(threshold=0.3)).minhash.threshold
        == 0.3
    )
