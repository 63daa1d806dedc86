"""kNN majority-vote classification composition (gate: knn_classifier)."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from pyspark_graph_spark.ann.brute import BruteForceKNN


def test_knn_vote_recovers_planted_clusters(spark):
    """Two well-separated clusters: leave-one-out 3-NN vote must classify
    every point correctly."""
    import numpy as np

    rng = np.random.default_rng(3)
    rows = []
    for i in range(10):
        rows.append((i, [float(x) for x in rng.normal([10, 0, 0], 0.1)], "a"))
    for i in range(10, 20):
        rows.append((i, [float(x) for x in rng.normal([0, 10, 0], 0.1)], "b"))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    topk = BruteForceKNN(k=3).topk(emb, emb)
    labeled = topk.join(
        emb.select(
            F.col("vec_id").alias("neighbor_id"), F.col("label").alias("nl")
        ),
        on="neighbor_id",
    )
    vote = (
        labeled.groupBy("query_id", "nl")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "vr",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("n"), F.asc("nl"))
            ),
        )
        .filter(F.col("vr") == 1)
    )
    pred = {r.query_id: r.nl for r in vote.collect()}
    for i in range(20):
        assert pred[i] == ("a" if i < 10 else "b")


def test_pq_codes_properties(spark):
    import numpy as np

    from pyspark_graph_spark.ann.pq import ProductQuantizer

    rng = np.random.default_rng(11)
    rows = [
        (i, [float(x) for x in rng.normal(size=16)]) for i in range(60)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = ProductQuantizer(m=4, k=8, n_iter=2, dim=16).encode(emb)
    got = out.collect()
    assert len(got) == 60
    for r in got:
        for s in range(4):
            assert 0 <= r[f"code_{s}"] < 8
        assert r.distortion >= 0
    # finer codebooks quantize better: k=8 beats k=2 in total distortion
    coarse = ProductQuantizer(m=4, k=2, n_iter=2, dim=16).encode(emb)
    fine_d = sum(r.distortion for r in got)
    coarse_d = sum(r.distortion for r in coarse.collect())
    assert fine_d < coarse_d


def test_pq_requires_divisible_dim(spark):
    import pytest as _pytest

    from pyspark_graph_spark.ann.pq import ProductQuantizer

    with _pytest.raises(ValueError):
        ProductQuantizer(m=3, dim=64)


def test_pq_adc_search_finds_near_neighbors(spark):
    """On well-separated clusters, ADC top-1 must land in the query's own
    cluster (quantized distances preserve coarse geometry)."""
    import numpy as np

    from pyspark_graph_spark.ann.pq import ProductQuantizer

    rng = np.random.default_rng(5)
    centers = np.eye(4) * 20
    rows = []
    for i in range(40):
        c = centers[i % 4]
        rows.append((i, [float(x) for x in rng.normal(c, 0.2)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pq = ProductQuantizer(m=2, k=8, n_iter=2, dim=4)
    codes, books = pq.fit(emb)
    queries = emb.filter(F.col("vec_id") < 4)
    out = pq.adc_topk(codes, books, queries, topk=3).collect()
    for r in out:
        if r.rank == 1:
            assert r.neighbor_id % 4 == r.query_id % 4
