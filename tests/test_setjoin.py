"""Prefix-filtered set-similarity join vs brute-force Python (dedup/setjoin.py)."""

import itertools

import pytest

from pyspark_graph_spark.dedup.setjoin import PrefixFilterSetJoin

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy cat",   # near-dup of 0
    "pack my box with five dozen liquor jugs",
    "pack my box with five dozen liquor jugs",        # exact dup of 2
    "completely different content about spark engines",
    "the quick brown fox naps beside the lazy dog",   # medium overlap w/ 0
]


def _brute(texts, n, t):
    def shingles(s):
        toks = [w for w in s.lower().split() if w]
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
    sets = [shingles(s) for s in texts]
    out = {}
    for a, b in itertools.combinations(range(len(texts)), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union and inter / union >= t:
            out[(a, b)] = inter / union
    return out


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.8])
def test_prefix_filter_matches_brute(spark, threshold):
    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), ["doc_id", "text"]
    )
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in PrefixFilterSetJoin(threshold=threshold, n=2)
        .run(docs)
        .collect()
    }
    want = _brute(TEXTS, 2, threshold)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-6)


def test_exact_dup_scores_one(spark):
    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), ["doc_id", "text"]
    )
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in PrefixFilterSetJoin(threshold=0.99, n=2)
        .run(docs)
        .collect()
    }
    assert got == {(2, 3): pytest.approx(1.0)}


def test_rejects_bad_threshold():
    with pytest.raises(ValueError):
        PrefixFilterSetJoin(threshold=0.0)
    with pytest.raises(ValueError):
        PrefixFilterSetJoin(threshold=1.5)
