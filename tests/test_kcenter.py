"""Greedy k-center selection (ann/kcenter.py)."""

import pytest

from pyspark_graph_spark.ann.kcenter import KCenterSelection


def _pts(spark, rows):
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_greedy_picks_farthest_with_deterministic_ties(spark):
    df = _pts(
        spark,
        [
            (0, [0.0, 0.0]),
            (1, [10.0, 0.0]),
            (2, [0.0, 10.0]),
            (3, [1.0, 1.0]),
        ],
    )
    out = {r["step"]: r for r in KCenterSelection(k=3).run(df).collect()}
    assert (out[0]["vec_id"], out[0]["dist"]) == (0, 0.0)
    # ids 1 and 2 are both at d²=100 from the seed; tie breaks to id 1
    assert (out[1]["vec_id"], out[1]["dist"]) == (1, 100.0)
    assert (out[2]["vec_id"], out[2]["dist"]) == (2, 100.0)


def test_k_equals_one_returns_seed_only(spark):
    df = _pts(spark, [(7, [1.0]), (9, [5.0])])
    rows = KCenterSelection(k=1).run(df).collect()
    assert len(rows) == 1 and rows[0]["vec_id"] == 7


def test_rejects_bad_k():
    with pytest.raises(ValueError):
        KCenterSelection(k=0)


def test_k_exceeding_corpus_returns_each_point_once(spark):
    df = _pts(spark, [(1, [0.0, 1.0]), (2, [5.0, 5.0])])
    rows = KCenterSelection(k=4).run(df).collect()
    assert sorted(r["vec_id"] for r in rows) == [1, 2]
    assert len(rows) == 2  # min(k, n), no repeated centers
