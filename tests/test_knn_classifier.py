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
