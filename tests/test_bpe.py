"""Distributed BPE merge learning (functions/bpe.py)."""

import pytest

from pyspark_graph_spark.functions.bpe import learn_bpe_merges


def test_bpe_learns_canonical_sennrich_merges(spark):
    """The classic low/lower/newest/widest corpus: 'es' then 'est' then
    'lo'/'low' must emerge (Sennrich et al. 2016, section 3 example)."""
    text = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    merges = [
        (r.left, r.right)
        for r in sorted(
            learn_bpe_merges(docs, n_merges=4).collect(),
            key=lambda r: r.step,
        )
    ]
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("l", "o")
    assert merges[3] == ("lo", "w")


def test_bpe_greedy_overlap_semantics(spark):
    """'aaaa' merges (a,a) left-to-right greedily: pairs counted per word
    occurrence and the merged token is not re-merged within the round."""
    docs = spark.createDataFrame([(1, "aaaa aaaa")], ["doc_id", "text"])
    out = sorted(learn_bpe_merges(docs, n_merges=2).collect(), key=lambda r: r.step)
    # round 1: (a,a) appears 3 times per word x 2 words
    assert (out[0].left, out[0].right, out[0].pair_count) == ("a", "a", 6)
    # after greedy merge 'aaaa' -> ['aa','aa']; round 2 merges (aa,aa)
    assert (out[1].left, out[1].right, out[1].pair_count) == ("aa", "aa", 2)


def test_bpe_tie_breaks_lexicographically(spark):
    docs = spark.createDataFrame([(1, "ba dc ba dc")], ["doc_id", "text"])
    r1 = next(
        r for r in learn_bpe_merges(docs, n_merges=1).collect() if r.step == 1
    )
    # (b,a) and (d,c) both count 2 -> smallest (left, right) wins
    assert (r1.left, r1.right) == ("b", "a")


def test_bpe_frequency_weighting(spark):
    """A pair inside a frequent word beats a pair in many distinct rare
    words' characters only if its weighted count is higher."""
    docs = spark.createDataFrame(
        [(1, "zz zz zz qx")], ["doc_id", "text"]
    )
    r1 = learn_bpe_merges(docs, n_merges=1).first()
    assert (r1.left, r1.right, r1.pair_count) == ("z", "z", 3)


def test_bpe_invalid_rounds(spark):
    docs = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        learn_bpe_merges(docs, n_merges=0)
