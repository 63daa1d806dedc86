"""LinkPrediction scores + community quality metrics (conductance,
attribute assortativity) on golden fixture graphs."""

import pytest
from pyspark.sql import functions as F

from pyspark_graph_spark import Graph
from pyspark_graph_spark.operators.communities import (
    attribute_assortativity,
    conductance,
)
from pyspark_graph_spark.operators.link_prediction import LinkPrediction

from tests.fixtures import labelled


def _chain(spark, labels):
    """Path 0-1-2-3 with a per-vertex label column."""
    v = spark.createDataFrame(
        list(zip(range(4), labels)), ["id", "label"]
    )
    e = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], ["src", "dst"])
    return Graph(v, e, directed=False, indexed=True)


def test_link_prediction_star_pair(spark):
    # triangle {0,1,2} is complete -> no missing 2-hop pairs there;
    # leaves 4-5 (common neighbor 3) as the only predicted link
    g = labelled(spark, directed=False)
    rows = LinkPrediction().run(g).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["u"], r["v"]) == (4, 5)
    assert r["common_neighbors"] == 1
    assert r["preferential_attachment"] == 1  # deg(4)*deg(5) = 1*1
    assert r["resource_allocation"] == pytest.approx(0.5)  # 1/deg(3)
    assert r["jaccard"] == pytest.approx(1.0)  # 1 / (1+1-1)


def test_link_prediction_min_common_prunes(spark):
    g = labelled(spark, directed=False)
    assert LinkPrediction(min_common=2).run(g).count() == 0


def test_link_prediction_rejects_bad_min_common():
    with pytest.raises(ValueError):
        LinkPrediction(min_common=0)


def test_conductance_separated_communities(spark):
    g = labelled(spark, directed=False)
    labels = g.vertices.select(
        "id", F.when(F.col("id") < 3, "t").otherwise("s").alias("c")
    )
    out = {r["label"]: r for r in conductance(g, labels).collect()}
    # no cross-community edges at all
    assert out["t"]["cut"] == 0 and out["s"]["cut"] == 0
    assert out["t"]["volume"] == 6  # triangle degrees 2+2+2
    assert out["s"]["volume"] == 4  # star degrees 2+1+1
    assert out["t"]["conductance"] == 0.0
    assert out["s"]["conductance"] == 0.0


def test_conductance_split_chain(spark):
    g = _chain(spark, "AABB")
    labels = g.vertices.select("id", "label")
    out = {r["label"]: r for r in conductance(g, labels).collect()}
    # one cut edge (1-2); vol(A) = vol(B) = 3 of total 6
    for c in "AB":
        assert out[c]["volume"] == 3
        assert out[c]["cut"] == 1
        assert out[c]["conductance"] == pytest.approx(1 / 3, abs=1e-6)


def test_assortativity_perfect(spark):
    g = labelled(spark, directed=False)
    labels = g.vertices.select(
        "id", F.when(F.col("id") < 3, "t").otherwise("s").alias("c")
    )
    r = attribute_assortativity(g, labels).first()["assortativity"]
    assert r == pytest.approx(1.0)


def test_assortativity_perfectly_disassortative(spark):
    # alternating labels on a path: every edge crosses -> r = -1
    g = _chain(spark, "ABAB")
    labels = g.vertices.select("id", "label")
    r = attribute_assortativity(g, labels).first()["assortativity"]
    assert r == pytest.approx(-1.0)
