"""LIVE Spark Connect round-trip for the core operator surface.

The reference's one stated design commitment is "pure DataFrame API for
Spark Connect compatibility" (reference README.md:17-19). The degraded-mode
shims are proxy-tested in test_connect_compat.py; THIS module is the
end-to-end proof: it starts a real local Spark Connect server
(``SparkSession.builder.remote("local[4]")`` auto-launches one in pyspark
4.x), verifies the session is genuinely Connect (``sparkContext`` raises),
and runs the core operator surface over gRPC.

Requires grpcio + grpcio-status + googleapis-common-protos, which this
build container cannot install (no network: ``pip install grpcio`` →
"No matching distribution found"). Where those wheels exist, run:

    pip install "pyspark[connect]==4.1.2"   # or just grpcio grpcio-status \
                                            #   googleapis-common-protos
    python -m pytest tests/test_connect_live.py -v

The module skips with the precise missing dependency otherwise, so the
suite stays green in both environments and the skip reason documents the
blocker rather than hiding it.
"""

from __future__ import annotations

import pytest

_MISSING = None
try:
    import grpc  # noqa: F401
    import google.protobuf  # noqa: F401
except ImportError as e:  # pragma: no cover - container lacks grpcio
    _MISSING = str(e)

pytestmark = pytest.mark.skipif(
    _MISSING is not None,
    reason=f"Spark Connect client deps unavailable in this container "
    f"({_MISSING}); install grpcio/grpcio-status/googleapis-common-protos "
    f"and rerun — see module docstring",
)


@pytest.fixture(scope="module")
def connect_spark():
    from pyspark.sql import SparkSession

    try:
        spark = (
            SparkSession.builder.remote("local[4]")
            .appName("pyspark_graph_spark-connect-live")
            .config("spark.sql.shuffle.partitions", "4")
            .getOrCreate()
        )
    except Exception as e:  # pragma: no cover - server startup env issues
        pytest.skip(f"could not launch local Spark Connect server: {e}")
    yield spark
    spark.stop()


def test_session_is_really_connect(connect_spark):
    from pyspark_graph_spark.session import (
        app_key,
        default_parallelism,
        supports_jvm_internals,
    )

    assert supports_jvm_internals(connect_spark) is False
    # shims degrade as documented instead of raising
    assert default_parallelism(connect_spark) >= 1
    assert app_key(connect_spark)  # non-empty, stable
    assert app_key(connect_spark) == app_key(connect_spark)


def _toy_graph(spark):
    from pyspark_graph_spark.graph import DST, ID, SRC, Graph

    v = spark.createDataFrame([(i,) for i in range(6)], [ID])
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (3, 4)], [SRC, DST]
    )
    return Graph(v, e, directed=False)


def test_core_graph_ops_over_grpc(connect_spark):
    g = _toy_graph(connect_spark)
    degs = {r["id"]: r["degree"] for r in g.degrees.collect()}
    assert degs == {0: 2, 1: 2, 2: 2, 3: 1, 4: 1, 5: 0}
    assert g.triplets.count() == 4


def test_iterative_cc_over_grpc(connect_spark):
    # Pregel/alternating CC exercise localCheckpoint over Connect
    from pyspark_graph_spark.operators import AlternatingConnectedComponents

    comp = AlternatingConnectedComponents().run(_toy_graph(connect_spark))
    groups = {}
    for r in comp.collect():
        groups.setdefault(r["component"], set()).add(r["id"])
    assert sorted(map(sorted, groups.values())) == [[0, 1, 2], [3, 4], [5]]


def test_dedup_over_grpc(connect_spark):
    from pyspark_graph_spark.dedup import MinHashLSH

    docs = connect_spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog tonight"),
            (3, "an entirely different document about spark physical plans"),
        ],
        ["doc_id", "text"],
    )
    pairs = MinHashLSH(n=3, threshold=0.3).pairs(docs).collect()
    assert [(r["src"], r["dst"]) for r in pairs] == [(1, 2)]
