"""Winnowing fingerprint selection + matching (dedup/winnow.py)."""

import pytest

from pyspark_graph_spark.dedup.winnow import winnow_matches, winnow_select

K, W = 8, 4


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"]
    )


def test_guarantee_shared_substring_matches(spark):
    # winnowing guarantee: a shared substring of length >= k + w - 1
    # yields at least one identical selected fingerprint in both docs
    shared = "zqxwvutsrqponmlk"  # length 16 > 8 + 4 - 1
    docs = _docs(
        spark,
        [
            "aaaa bbbb cccc " + shared + " dddd eeee",
            "1111 2222 " + shared + " 3333 4444 5555",
        ],
    )
    pairs = winnow_matches(docs, k=K, w=W, min_shared=1).collect()
    assert len(pairs) == 1
    assert (pairs[0]["a"], pairs[0]["b"]) == (0, 1)


def test_disjoint_texts_do_not_match(spark):
    docs = _docs(
        spark,
        ["abcdefghijklmnopqrstuvwxy", "0123456789 0123456789 012345"],
    )
    assert winnow_matches(docs, k=K, w=W, min_shared=1).count() == 0


def test_short_docs_produce_no_fingerprints(spark):
    docs = _docs(spark, ["tiny", ""])
    assert winnow_select(docs, k=K, w=W).count() == 0


def test_selection_is_position_robust(spark):
    # prepending a prefix shifts every gram position but the selected
    # fingerprint VALUES for the shared tail must still overlap
    tail = "the quick brown fox jumps over the lazy dog"
    docs = _docs(spark, [tail, "PREFIX-PREFIX " + tail])
    sel = winnow_select(docs, k=K, w=W)
    fps = {
        r["id"]: set()
        for r in sel.select("id").distinct().collect()
    }
    for r in sel.collect():
        fps[r["id"]].add(r["fp"])
    assert fps[0] & fps[1], "shifted copies must share fingerprints"


def test_rejects_bad_params(spark):
    docs = _docs(spark, ["whatever text"])
    with pytest.raises(ValueError):
        winnow_select(docs, k=1, w=4)
    with pytest.raises(ValueError):
        winnow_select(docs, k=8, w=0)
