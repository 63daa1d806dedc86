"""CDC fingerprint-join stop-list + CC convergence guard (r9 verdict #2/#4).

The fingerprint self-join was the suite's one banded self-join without a
hot-bucket treatment: a boilerplate chunk shared by k docs emits C(k,2)
pairs before the distinct. dedup/cdc.py bounds it with a document-
frequency stop-list; these tests plant a ubiquitous chunk (one
fingerprint at ~100x the median df) and pin (a) the pair-count bound,
(b) the non-firing default's value identity, and (c) the chain-shaped
cluster class that motivated the diameter-independent CC switch.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_graph_spark.constants import DST, ID, SRC
from pyspark_graph_spark.dedup.cdc import (
    cdc_cluster_labels,
    fingerprint_doc_pairs,
)
from pyspark_graph_spark.graph import Graph


def _planted_chunks(spark, n_docs=120, hot_docs=100):
    """Per-doc unique fingerprints + pair links + ONE boilerplate
    fingerprint shared by ``hot_docs`` docs (~100x the median df of 1)."""
    rows = []
    for d in range(n_docs):
        rows.append((d, f"uniq-{d}"))  # df = 1 (the median)
    # genuine near-dup pairs: (0,1), (2,3) share a content chunk
    rows += [(0, "pair-a"), (1, "pair-a"), (2, "pair-b"), (3, "pair-b")]
    # the ubiquitous boilerplate chunk
    rows += [(d, "LICENSE-HEADER") for d in range(hot_docs)]
    return spark.createDataFrame(rows, "doc_id long, fingerprint string")


def test_stoplist_bounds_hot_fingerprint_pairs(spark):
    ch = _planted_chunks(spark)
    # uncapped: the hot fingerprint alone emits C(100,2) = 4950 pairs
    # (which subsume the two genuine pair links — docs 0..3 all carry
    # the boilerplate chunk too)
    uncapped = fingerprint_doc_pairs(ch, max_fingerprint_df=None)
    assert uncapped.count() == 4950
    # stop-listed: the boilerplate fingerprint (df=100 > 4) emits none;
    # the genuine pair links (df=2) survive untouched
    capped = fingerprint_doc_pairs(ch, max_fingerprint_df=4)
    got = {(r[SRC], r[DST]) for r in capped.collect()}
    assert got == {(0, 1), (2, 3)}


def test_default_cap_value_identical_when_not_firing(spark):
    """Buckets at or under the threshold pass through untouched — on a
    corpus with no hot fingerprint the capped plan is value-identical
    to the uncapped one (the contract that keeps the committed
    cdc_dedup_clusters oracle valid with the default cap in place)."""
    ch = _planted_chunks(spark, hot_docs=3)  # max df 3 <= 4
    a = {(r[SRC], r[DST]) for r in
         fingerprint_doc_pairs(ch, max_fingerprint_df=4).collect()}
    b = {(r[SRC], r[DST]) for r in
         fingerprint_doc_pairs(ch, max_fingerprint_df=None).collect()}
    assert a == b


def test_cluster_labels_chain_shaped_cluster(spark):
    """A chain A~B~C~...~Z (each link a DIFFERENT shared chunk, diameter
    = n-1) must come out as ONE cluster labelled by the min id — the
    latent wrong-answer class a truncated Pregel min-label run would
    silently split (r9 verdict #4). cdc_cluster_labels routes through
    AlternatingCC, whose O(log n) fixpoint is diameter-independent."""
    n = 40  # diameter 39 >> any reasonable Pregel iteration budget
    rows = []
    for d in range(n - 1):
        rows += [(d, f"link-{d}"), (d + 1, f"link-{d}")]
    ch = spark.createDataFrame(rows, "doc_id long, fingerprint string")
    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    out = cdc_cluster_labels(docs, ch)
    comps = {r["component"] for r in out.collect()}
    assert comps == {0}


def test_pregel_cc_raises_on_truncation(spark):
    """ConnectedComponents now fails LOUDLY when the min-label flood hits
    max_iterations unconverged instead of handing back silently split
    labels (same contract as SCC's floods, operators/scc.py)."""
    from pyspark_graph_spark.operators.connected_components import (
        ConnectedComponents,
    )

    n = 12  # path graph, diameter 11 > 3 iterations
    v = spark.range(n).select(F.col("id").alias(ID))
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], f"{SRC} long, {DST} long"
    )
    g = Graph(v, e, directed=False, indexed=True)
    with pytest.raises(RuntimeError, match="max_iterations"):
        ConnectedComponents(max_iterations=3).run(g)
    # opt-out keeps the old truncation behavior for callers that want it
    out = ConnectedComponents(
        max_iterations=3, require_convergence=False
    ).run(g)
    assert out.count() == n
    # converged run passes the guard and labels the path as one component
    ok = ConnectedComponents(max_iterations=n + 1).run(g)
    assert {r["component"] for r in ok.collect()} == {0}


def test_acc_raises_on_truncation(spark):
    """AlternatingCC's distributed loop now also fails LOUDLY when the
    star fixpoint isn't reached: pre-fixpoint the edge list is not a
    star forest, so reading it as a membership table returns garbage
    labels — the same silent-wrong-answer class as truncated Pregel CC
    (round 10 extension of the r9 #4 fix)."""
    from pyspark_graph_spark.operators.connected_components import (
        AlternatingConnectedComponents,
    )

    n = 64  # path graph: needs a few alternating rounds
    v = spark.range(n).select(F.col("id").alias(ID))
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], f"{SRC} long, {DST} long"
    )
    g = Graph(v, e, directed=False, indexed=True)
    with pytest.raises(RuntimeError, match="star fixpoint"):
        AlternatingConnectedComponents(
            max_iterations=1, batch_finish=0
        ).run(g)
    out = AlternatingConnectedComponents(
        max_iterations=1, batch_finish=0, require_convergence=False
    ).run(g)
    assert out.count() == n  # truncated labels, by explicit request
    ok = AlternatingConnectedComponents(batch_finish=0).run(g)
    assert {r["component"] for r in ok.collect()} == {0}


def test_stop_list_cap_below_two_raises(spark):
    """r10 ADVICE #3: max_fingerprint_df < 2 silently drops every
    fingerprint (a pair needs df 2) — indistinguishable from a
    duplicate-free corpus, so it must raise instead."""
    import pytest

    from pyspark_graph_spark.dedup.cdc import fingerprint_doc_pairs

    ch = spark.createDataFrame(
        [(1, "fp"), (2, "fp")], "doc_id long, fingerprint string"
    )
    for bad in (0, 1, -5):
        with pytest.raises(ValueError, match="max_fingerprint_df"):
            fingerprint_doc_pairs(ch, max_fingerprint_df=bad)
    # None disables the stop-list; 2 is the smallest meaningful cap
    assert fingerprint_doc_pairs(ch, max_fingerprint_df=None).count() == 1
    assert fingerprint_doc_pairs(ch, max_fingerprint_df=2).count() == 1
