"""clear_shared_caches: the bench pass-reset hook must evict + unpersist
every per-application artifact cache and leave the queries able to
repopulate cleanly (bench.py calls it between alternating passes so
min-of-passes measures the query, not a persisted-cache scan)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark_graph_spark.queries as Q


def test_clear_shared_caches_evicts_and_repopulates(spark, sf_dir):
    if not os.path.isdir(sf_dir):
        pytest.skip("driver testdata not present")
    n1 = Q.QUERIES["maximal_matching"](spark, sf_dir).count()
    assert len(Q._MATCHING_CACHE) == 1
    Q.clear_shared_caches()
    for cache in (
        Q._NGRAM_PAIRS_CACHE,
        Q._SP_CACHE,
        Q._CDC_CACHE,
        Q._MATCHING_CACHE,
        Q._PARTITION_CACHE,
    ):
        assert not cache
    n2 = Q.QUERIES["maximal_matching"](spark, sf_dir).count()
    assert len(Q._MATCHING_CACHE) == 1
    assert n1 == n2


def test_clear_shared_caches_idempotent_when_empty(spark):
    Q.clear_shared_caches()
    Q.clear_shared_caches()  # no caches populated: must not raise
