from pyspark.sql import functions as F

from pyspark_graph_spark.sources.io import (
    load_graph_bucketed,
    read_csv,
    read_graph,
    read_json,
    save_graph_bucketed,
    write_graph,
)
from tests.fixtures import labelled


def test_graph_roundtrip_parquet(spark, tmp_path):
    g = labelled(spark)
    vp, ep = str(tmp_path / "v"), str(tmp_path / "e")
    write_graph(g, vp, ep)
    g2 = read_graph(spark, vp, ep)
    assert sorted(tuple(r) for r in g2.vertices.collect()) == sorted(
        tuple(r) for r in g.vertices.collect()
    )
    assert g2.edges.count() == g.edges.count()


def test_csv_json_with_schema(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    cp, jp = str(tmp_path / "c"), str(tmp_path / "j")
    df.write.csv(cp, header=True)
    df.write.json(jp)
    got_c = read_csv(spark, cp, "k long, v string")
    got_j = read_json(spark, jp, "k long, v string")
    assert sorted(tuple(r) for r in got_c.collect()) == [(1, "a"), (2, "b")]
    assert sorted(tuple(r) for r in got_j.select("k", "v").collect()) == [
        (1, "a"),
        (2, "b"),
    ]


def test_bucketed_graph_join_has_no_shuffle(spark):
    import uuid

    # unique name: the warehouse dir outlives the in-memory catalog, so a
    # reused name can collide with a stale location
    name = f"t_bucketed_{uuid.uuid4().hex[:8]}"
    g = labelled(spark)
    try:
        save_graph_bucketed(g, name, buckets=4)
        g2 = load_graph_bucketed(spark, name)
        assert g2.vertices.count() == 6 and g2.edges.count() == 5
        # degree aggregation on the bucket key should not add an Exchange
        plan = (
            g2.edges.groupBy("src")
            .count()
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}_vertices")
        spark.sql(f"DROP TABLE IF EXISTS {name}_edges")


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    from pyspark_graph_spark.sources.io import read_orc, write_orc

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]
    )
    path = str(tmp_path / "t.orc")
    write_orc(df, path)
    back = read_orc(spark, path)
    assert {(r.k, r.v) for r in back.collect()} == {(1, "a"), (2, "b"), (3, "c")}
    plan = (
        back.filter("k = 2")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan  # filter reached the ORC scan


def test_csv_export(spark, tmp_path):
    from pyspark_graph_spark.sources.io import read_csv, write_csv

    df = spark.createDataFrame([(1, "x")], ["k", "v"])
    path = str(tmp_path / "out_csv")
    write_csv(df, path)
    back = read_csv(spark, path, schema="k long, v string")
    assert back.collect()[0].v == "x"
