"""Temporal joins (as-of, binned range), sequence packing/chunking, k-means.

Each operator is checked against an independent naive formulation on
hand-built or loaded data — the gate oracle does the same cross-engine in
SQL; these tests pin edge cases (ties, tolerance cutoffs, empty docs,
interval/bin misalignment, empty clusters)."""

from __future__ import annotations

import datetime as dt

import numpy as np
from pyspark.sql import functions as F

from pyspark_graph_spark.ann.kmeans import KMeans
from pyspark_graph_spark.functions.packing import (
    chunk_documents,
    concat_chunk_pack,
)
from pyspark_graph_spark.operators.temporal import (
    as_of_join,
    range_join_points_intervals,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


class TestAsOfJoin:
    def _frames(self, spark):
        left = spark.createDataFrame(
            [(1, 100, _ts(10)), (1, 101, _ts(30)), (2, 102, _ts(5)),
             (3, 103, _ts(50))],
            "key long, lid long, ts timestamp",
        )
        right = spark.createDataFrame(
            [(1, 900, _ts(9)), (1, 901, _ts(10)), (1, 902, _ts(29)),
             (2, 903, _ts(6)), (3, 904, _ts(1))],
            "key long, rid long, ts timestamp",
        )
        return left, right

    def test_backward_inclusive(self, spark):
        left, right = self._frames(spark)
        out = {
            r["lid"]: r["r_rid"]
            for r in as_of_join(left, right, on="key").collect()
        }
        # lid 100 at t=10: right 901 is at exactly t=10 -> inclusive tie
        assert out == {100: 901, 101: 902, 102: None, 103: 904}

    def test_tolerance_nulls_stale_matches(self, spark):
        left, right = self._frames(spark)
        out = {
            r["lid"]: r["r_rid"]
            for r in as_of_join(
                left, right, on="key", tolerance="10 MINUTES"
            ).collect()
        }
        # lid 103 at t=50: only match is t=1, 49 min stale -> nulled
        assert out == {100: 901, 101: 902, 102: None, 103: None}

    def test_timestamp_collision_deterministic(self, spark):
        left = spark.createDataFrame(
            [(1, 100, _ts(10))], "key long, lid long, ts timestamp"
        )
        right = spark.createDataFrame(
            [(1, 7, _ts(5)), (1, 9, _ts(5)), (1, 8, _ts(5))],
            "key long, rid long, ts timestamp",
        )
        rows = as_of_join(left, right, on="key").collect()
        # duplicate right timestamps dedupe to the greatest payload tuple
        assert rows[0]["r_rid"] == 9

    def test_matches_naive_join_on_events(self, spark, sf_dir):
        from pyspark_graph_spark.sources.tables import load_table

        ev = load_table(spark, sf_dir, "events")
        left = ev.filter(F.col("event_type") == "signup").select(
            "event_id", "user_id", "ts"
        ).limit(200)
        right = ev.filter(F.col("event_type") == "view").select(
            "user_id", "ts", "event_id"
        )
        got = {
            r["event_id"]: r["r_event_id"]
            for r in as_of_join(left, right, on="user_id").collect()
        }
        naive = (
            left.alias("l")
            .join(right.alias("r"), "user_id", "left")
            .filter(F.col("r.ts") <= F.col("l.ts"))
            .groupBy("l.event_id")
            .agg(F.max_by(F.col("r.event_id"), F.col("r.ts")).alias("rid"))
            .collect()
        )
        naive_map = {r["event_id"]: r["rid"] for r in naive}
        for eid, rid in naive_map.items():
            assert got[eid] == rid
        # lefts with no match at all must still appear, as None
        assert set(got) >= set(naive_map)


class TestRangeJoin:
    def test_matches_theta_join(self, spark):
        pts = spark.createDataFrame(
            [(i, _ts(i * 7)) for i in range(100)], "pid long, ts timestamp"
        )
        ivs = spark.createDataFrame(
            [
                (0, _ts(3), _ts(45)),      # spans several 10-min bins
                (1, _ts(44), _ts(46)),     # sub-bin interval
                (2, _ts(200), _ts(700)),   # long interval, overlaps nothing late
                (3, _ts(45), _ts(45)),     # empty [s, s)
            ],
            "iid long, s timestamp, e timestamp",
        )
        got = sorted(
            (r["pid"], r["iid"])
            for r in range_join_points_intervals(
                pts, ivs, "ts", "s", "e", bin_seconds=600
            ).collect()
        )
        want = sorted(
            (r["pid"], r["iid"])
            for r in pts.join(ivs)
            .filter((F.col("ts") >= F.col("s")) & (F.col("ts") < F.col("e")))
            .collect()
        )
        assert got == want and len(got) > 0

    def test_no_duplicate_pairs(self, spark):
        pts = spark.createDataFrame(
            [(0, _ts(10))], "pid long, ts timestamp"
        )
        # interval spans 5 bins; the single contained point must appear once
        ivs = spark.createDataFrame(
            [(0, _ts(0), _ts(50))], "iid long, s timestamp, e timestamp"
        )
        rows = range_join_points_intervals(
            pts, ivs, "ts", "s", "e", bin_seconds=600
        ).collect()
        assert len(rows) == 1


class TestPacking:
    def test_concat_chunk_spans(self, spark):
        docs = spark.createDataFrame(
            [
                (0, "a", "w " * 100),   # 100 tokens
                (1, "a", "w " * 200),   # 200 tokens
                (2, "a", ""),           # 0 tokens
                (3, "a", "w " * 60),    # 60 tokens
                (4, "b", "w " * 300),   # separate group restarts offsets
            ],
            "doc_id long, source string, text string",
        )
        out = {
            r["doc_id"]: r.asDict()
            for r in concat_chunk_pack(docs, ctx=128).collect()
        }
        assert out[0]["start_off"] == 0
        assert (out[0]["first_chunk"], out[0]["last_chunk"]) == (0, 0)
        # doc 1: offsets [100, 300) -> chunks 0..2
        assert (out[1]["first_chunk"], out[1]["last_chunk"]) == (0, 2)
        assert out[2]["n_chunks"] == 0 and out[2]["first_chunk"] is None
        # doc 3: offsets [300, 360) -> chunk 2 only
        assert (out[3]["first_chunk"], out[3]["last_chunk"]) == (2, 2)
        # group b restarts at offset 0
        assert out[4]["start_off"] == 0 and out[4]["first_chunk"] == 0

    def test_chunks_cover_and_overlap(self, spark):
        docs = spark.createDataFrame(
            [(0, "x" * 1000), (1, "y" * 250), (2, "z" * 400), (3, "")],
            "doc_id long, text string",
        )
        rows = chunk_documents(docs, size=400, stride=300).collect()
        by_doc: dict[int, list] = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        # 1000 chars -> starts 0,300,600: the start-600 window reaches the
        # end, so no redundant suffix chunk is emitted
        lens = [r["chunk_len"] for r in sorted(by_doc[0], key=lambda r: r["chunk_id"])]
        assert lens == [400, 400, 400]
        # shorter than size -> single full-doc chunk
        assert [r["chunk_len"] for r in by_doc[1]] == [250]
        # exactly size -> one chunk, not an empty trailing one
        assert [r["chunk_len"] for r in by_doc[2]] == [400]
        assert 3 not in by_doc

    def test_chunk_reconstruction_hashes(self, spark):
        import hashlib

        text = "abcdefghij" * 50  # 500 chars
        docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
        rows = sorted(
            chunk_documents(docs, size=200, stride=100).collect(),
            key=lambda r: r["chunk_id"],
        )
        for r in rows:
            want = text[r["chunk_start"]: r["chunk_start"] + 200]
            assert r["chunk_md5"] == hashlib.md5(want.encode()).hexdigest()
            assert r["chunk_len"] == len(want)


class TestKMeans:
    def _numpy_lloyd(self, X, k, n_iter):
        cents = X[:k].copy()
        for it in range(n_iter):
            d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            sq = d[np.arange(len(X)), assign]
            if it < n_iter - 1:
                cents = np.stack(
                    [
                        X[assign == c].mean(axis=0) if (assign == c).any()
                        else cents[c]
                        for c in range(k)
                    ]
                )
        return assign, sq

    def test_matches_numpy_lloyd(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        rows = emb.orderBy("vec_id").collect()
        X = np.array([r["embedding"] for r in rows], dtype=np.float64)
        want_assign, want_sq = self._numpy_lloyd(X, k=8, n_iter=3)

        got = {
            r["vec_id"]: (r["cluster"], r["sq_dist"])
            for r in KMeans(k=8, n_iter=3).fit(emb).collect()
        }
        # empty-cluster keep-previous semantics only kicks in if a cluster
        # empties; either way assignments must match the replay exactly
        for i, r in enumerate(rows):
            c, sq = got[r["vec_id"]]
            assert c == want_assign[i]
            assert abs(sq - want_sq[i]) < 1e-9

    def test_all_clusters_used(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        out = KMeans(k=8, n_iter=2).fit(emb)
        assert out.select("cluster").distinct().count() == 8


# ------------------------------------------------------- temporal snapshots


def test_graph_at_half_open_window(spark):
    from datetime import datetime

    from pyspark_graph_spark.operators.temporal import graph_at

    e = spark.createDataFrame(
        [
            (1, 2, datetime(2024, 1, 1)),
            (2, 3, datetime(2024, 2, 1)),
            (3, 4, datetime(2024, 3, 1)),
        ],
        ["src", "dst", "ts"],
    )
    out = graph_at(e, datetime(2024, 1, 1), datetime(2024, 3, 1))
    assert {(r.src, r.dst) for r in out.collect()} == {(1, 2), (2, 3)}


def test_windowed_graph_metrics_counts_and_density(spark):
    from datetime import datetime

    from pyspark_graph_spark.operators.temporal import windowed_graph_metrics

    e = spark.createDataFrame(
        [
            # 2023: triangle 1-2-3 (dense)
            (1, 2, datetime(2023, 5, 1)),
            (2, 3, datetime(2023, 6, 1)),
            (3, 1, datetime(2023, 7, 1)),
            (2, 1, datetime(2023, 8, 1)),  # reverse dup merges
            # 2024: single edge
            (5, 6, datetime(2024, 1, 15)),
        ],
        ["src", "dst", "ts"],
    )
    rows = {
        r.bucket.year: (r.n_edges, r.n_vertices, r.density)
        for r in windowed_graph_metrics(e, bucket="year").collect()
    }
    assert rows[2023] == (3, 3, 1.0)
    assert rows[2024] == (1, 2, 1.0)


def test_windowed_graph_metrics_isolated_bucket_density_zero(spark):
    from datetime import datetime

    from pyspark_graph_spark.operators.temporal import windowed_graph_metrics

    e = spark.createDataFrame(
        [(7, 7, datetime(2022, 1, 1))], ["src", "dst", "ts"]
    )  # self-loop only: one vertex
    r = windowed_graph_metrics(e, bucket="year").first()
    assert r.n_vertices == 1 and r.density == 0.0


# --------------------------------------------------------------------------
# Temporal earliest-arrival reachability
# --------------------------------------------------------------------------


def test_earliest_arrival_respects_time_ordering(spark):
    from pyspark_graph_spark.operators.temporal import earliest_arrival

    # 0 -(t=10)-> 1 -(t=5)-> 2 : the 1->2 edge fired BEFORE arrival at 1,
    # so 2 is unreachable; 1 -(t=20)-> 3 is fine.
    e = spark.createDataFrame(
        [(0, 1, 10), (1, 2, 5), (1, 3, 20)], ["src", "dst", "ts"]
    )
    seeds = spark.createDataFrame([(0, 0)], "id long, t0 long")
    got = {
        r["id"]: r["arrival"]
        for r in earliest_arrival(e, seeds).collect()
    }
    assert got == {0: 0, 1: 10, 3: 20}


def test_earliest_arrival_takes_min_over_paths(spark):
    from pyspark_graph_spark.operators.temporal import earliest_arrival

    # two time-respecting routes to 3: via 1 (arrive 30) or via 2
    # (arrive 25) — keep the earlier one
    e = spark.createDataFrame(
        [(0, 1, 10), (1, 3, 30), (0, 2, 20), (2, 3, 25)],
        ["src", "dst", "ts"],
    )
    seeds = spark.createDataFrame([(0, 0)], "id long, t0 long")
    got = {
        r["id"]: r["arrival"]
        for r in earliest_arrival(e, seeds).collect()
    }
    assert got[3] == 25


def test_earliest_arrival_batch_equals_distributed(spark):
    """Round 9: the Arrow temporal-Dijkstra front-path and the
    distributed label-correcting rounds must agree row-for-row — the
    earliest-arrival table is a unique least fixpoint. Includes
    equal-timestamp chains (non-decreasing, not strictly increasing) and
    unreachable-by-time edges."""
    import random
    from pyspark_graph_spark.operators.temporal import earliest_arrival

    rng = random.Random(41)
    rows = [
        (rng.randrange(20), rng.randrange(20), rng.randrange(10))
        for _ in range(70)
    ]
    rows += [(0, 1, 3), (1, 2, 3), (2, 3, 3)]  # same-ts chain
    rows += [(5, 6, 0)]  # fires before any arrival at 5 unless seeded
    edges = spark.createDataFrame(rows, ["src", "dst", "ts"])
    seeds = spark.createDataFrame([(0, 2), (7, 1)], ["id", "t0"])
    batch = {
        (r["id"], r["arrival"])
        for r in earliest_arrival(edges, seeds).collect()
    }
    dist = {
        (r["id"], r["arrival"])
        for r in earliest_arrival(edges, seeds, batch_finish=0).collect()
    }
    assert batch == dist and len(batch) >= 2
