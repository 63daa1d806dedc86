import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from pyspark_graph_spark.ann import BruteForceKNN, IVFFlat, RandomHyperplaneLSH
from pyspark_graph_spark.dedup import (
    ExactDedup,
    MinHashLSH,
    NgramJaccardDedup,
    SimHashDedup,
)
from pyspark_graph_spark.functions.text import (
    content_fingerprint,
    language_guess,
    token_count,
    word_shingles,
)
from pyspark_graph_spark.functions.vectors import cosine_similarity
from pyspark_graph_spark.multimodal import (
    attach_fake_media,
    decode_images,
    frame_sample,
    image_stats,
    resize_images,
)
from pyspark_graph_spark.streaming import sessionize, session_stats


# ---------------------------------------------------------------- text fns


def test_token_count_and_shingles(spark):
    df = spark.createDataFrame([("  The  quick brown fox jumps  ",)], ["text"])
    row = df.select(
        token_count(F.col("text")).alias("n"),
        word_shingles(F.col("text"), 3).alias("sh"),
    ).first()
    assert row["n"] == 5
    assert row["sh"] == ["the quick brown", "quick brown fox", "brown fox jumps"]


def test_shingles_short_doc_empty(spark):
    df = spark.createDataFrame([("one two",)], ["text"])
    assert df.select(word_shingles(F.col("text"), 3).alias("s")).first()["s"] == []


def test_content_fingerprint_normalizes(spark):
    df = spark.createDataFrame(
        [("Hello  World",), ("  hello world ",), ("other",)], ["text"]
    )
    fps = [r["fp"] for r in df.select(content_fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1] != fps[2]


def test_language_guess(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog of a house",),
            ("der hund und die katze ist gut",),
            ("xyzzy plugh",),
        ],
        ["text"],
    )
    langs = [r["l"] for r in df.select(language_guess(F.col("text")).alias("l")).collect()]
    assert langs == ["en", "de", "und"]


def test_cosine_similarity_known_values(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 2.0], [2.0, 4.0]), ([0.0, 0.0], [1.0, 1.0])],
        ["a", "b"],
    )
    out = [
        r["c"]
        for r in df.select(
            cosine_similarity(F.col("a"), F.col("b")).alias("c")
        ).collect()
    ]
    assert out[0] == pytest.approx(0.0)
    assert out[1] == pytest.approx(1.0)
    assert out[2] == 0.0  # zero-norm guard


# ------------------------------------------------------------------ dedup

DOCS = [
    (1, "alpha beta gamma delta epsilon zeta eta theta"),
    (2, "alpha beta gamma delta epsilon zeta eta theta"),  # exact dup of 1
    (3, "alpha beta gamma delta epsilon zeta eta iota"),  # near dup of 1
    (4, "completely different words entirely unrelated text here now"),
]


def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_exact_dedup(spark):
    d = ExactDedup()
    groups = d.duplicate_groups(docs_df(spark)).collect()
    assert len(groups) == 1
    assert groups[0]["doc_ids"] == [1, 2]
    kept = {r["doc_id"] for r in d.deduplicate(docs_df(spark)).collect()}
    assert kept == {1, 3, 4}


def test_ngram_jaccard_pairs(spark):
    pairs = {
        (r["src"], r["dst"]): r["jaccard"]
        for r in NgramJaccardDedup(n=3, threshold=0.3).pairs(docs_df(spark)).collect()
    }
    assert pairs[(1, 2)] == pytest.approx(1.0)
    assert 0.3 <= pairs[(1, 3)] < 1.0
    assert (1, 4) not in pairs


def test_minhash_lsh_finds_planted_dups(spark):
    pairs = {
        (r["src"], r["dst"]): r["jaccard"]
        for r in MinHashLSH(n=3, threshold=0.3).pairs(docs_df(spark)).collect()
    }
    assert pairs[(1, 2)] == pytest.approx(1.0)
    assert (1, 3) in pairs
    assert all(dst != 4 and src != 4 for src, dst in pairs)


def test_minhash_dedup_drops_duplicates(spark):
    kept = {
        r["doc_id"]
        for r in MinHashLSH(n=3, threshold=0.9).deduplicate(docs_df(spark)).collect()
    }
    assert 1 in kept and 4 in kept and 2 not in kept


def test_minhash_validates_band_config():
    with pytest.raises(ValueError):
        MinHashLSH(num_hashes=64, bands=7)


def test_simhash_identical_is_zero(spark):
    pairs = {
        (r["src"], r["dst"]): r["hamming"]
        for r in SimHashDedup(max_hamming=3).pairs(docs_df(spark)).collect()
    }
    assert pairs[(1, 2)] == 0  # identical text -> identical fingerprint


def test_simhash_block_join_is_complete(spark):
    """The pigeonhole block join must find exactly the pairs a brute-force
    hamming filter finds (no candidates lost to blocking)."""
    from itertools import combinations

    d = SimHashDedup(max_hamming=16)
    fps = {r["id"]: r["simhash"] for r in d.fingerprints(docs_df(spark)).collect()}
    brute = {
        (a, b)
        for a, b in combinations(sorted(fps), 2)
        if bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1") <= 16
    }
    got = {(r["src"], r["dst"]) for r in d.pairs(docs_df(spark)).collect()}
    assert got == brute


# -------------------------------------------------------------------- ANN


def embeddings_df(spark, n=60, dim=8):
    import math

    rows = []
    for i in range(n):
        # points on a circle in 2 of the dims -> known neighbor structure
        ang = 2 * math.pi * i / n
        v = [0.0] * dim
        v[0], v[1] = math.cos(ang), math.sin(ang)
        rows.append((i, v))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_brute_force_topk_structure(spark):
    emb = embeddings_df(spark)
    out = BruteForceKNN(k=2).topk(emb, emb.filter(F.col("vec_id") == 0))
    rows = sorted((r["rank"], r["neighbor_id"]) for r in out.collect())
    # nearest neighbors of angle 0 are its angular neighbors 1 and 59
    assert len(rows) == 2
    assert {r[1] for r in rows} == {1, 59}
    assert all(r["query_id"] == 0 for r in out.collect())


def test_brute_force_excludes_self(spark):
    emb = embeddings_df(spark, n=10)
    out = BruteForceKNN(k=3).topk(emb, emb)
    assert out.filter(F.col("query_id") == F.col("neighbor_id")).count() == 0


def test_lsh_recall_against_brute(spark):
    emb = embeddings_df(spark)
    q = emb.filter(F.col("vec_id") < 10)
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in BruteForceKNN(k=3).topk(emb, q).collect()
    }
    lsh = {
        (r["query_id"], r["neighbor_id"])
        for r in RandomHyperplaneLSH(dim=8, num_tables=8, planes_per_table=4, k=3).topk(emb, q).collect()
    }
    recall = len(brute & lsh) / len(brute)
    assert recall >= 0.5  # multi-probe hyperplane LSH on smooth data


def test_ivf_topk_probes_cells(spark):
    emb = embeddings_df(spark)
    q = emb.filter(F.col("vec_id") < 5)
    out = IVFFlat(num_cells=8, nprobe=4, k=3).topk(emb, q)
    per_q = out.groupBy("query_id").count().collect()
    assert all(r["count"] <= 3 for r in per_q)
    assert out.count() > 0


# ------------------------------------------------------------------ events


def events_df(spark):
    rows = [
        # user 1: two sessions separated by 2 hours
        Row(event_id=1, ts="2024-01-01 10:00:00", user_id=1, value=1.0),
        Row(event_id=2, ts="2024-01-01 10:10:00", user_id=1, value=2.0),
        Row(event_id=3, ts="2024-01-01 12:30:00", user_id=1, value=3.0),
        # user 2: single session
        Row(event_id=4, ts="2024-01-01 09:00:00", user_id=2, value=4.0),
    ]
    return spark.createDataFrame(rows).withColumn(
        "ts", F.to_timestamp("ts")
    )


def test_sessionize_gap_splits(spark):
    out = sessionize(events_df(spark), gap_minutes=30)
    sids = {r["event_id"]: r["session_id"] for r in out.collect()}
    assert sids[1] == sids[2] == 1
    assert sids[3] == 2
    assert sids[4] == 1


def test_session_stats_aggregates(spark):
    out = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["total_value"])
        for r in session_stats(events_df(spark)).collect()
    }
    assert out[(1, 1)] == (2, 3.0)
    assert out[(1, 2)] == (1, 3.0)
    assert out[(2, 1)] == (1, 4.0)


def test_streaming_session_stats_availablenow(spark, sf_dir, tmp_path):
    """True Structured Streaming run: parquet source -> session_window ->
    memory sink, drained with availableNow."""
    from pyspark_graph_spark.sources.tables import load_table
    from pyspark_graph_spark.streaming import (
        read_events_stream,
        streaming_session_stats,
    )

    # write a micro events dir (the testdata single file streams fine too,
    # but keep the test hermetic and fast)
    load_table(spark, sf_dir, "events").limit(500).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))

    stream = read_events_stream(spark, str(tmp_path))
    assert stream.isStreaming
    q = (
        streaming_session_stats(stream, gap_minutes=30)
        .writeStream.format("memory")
        .queryName("t_sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT COUNT(*) AS n FROM t_sessions").first()["n"]
    assert got > 0


# -------------------------------------------------------------- multimodal


def media_df(spark):
    base = spark.createDataFrame([(i,) for i in range(8)], ["doc_id"])
    return attach_fake_media(base, "doc_id")


def test_media_schema_contract(spark):
    m = media_df(spark)
    assert [f.name for f in m.schema.fields] == ["media_id", "media", "meta"]
    assert m.schema["media"].dataType.typeName() == "binary"


def test_decode_images_deterministic(spark):
    a = sorted(tuple(r) for r in decode_images(media_df(spark)).collect())
    b = sorted(tuple(r) for r in decode_images(media_df(spark)).collect())
    assert a == b
    assert len(a) == 8
    w = {r[0]: (r[1], r[2]) for r in a}
    assert w[0] == (16, 16)  # width/height from meta modulo rule
    assert all(0 <= r[3] <= 255 for r in a)


def test_image_stats_no_python(spark):
    out = {r["media_id"]: r["n_pixels"] for r in image_stats(media_df(spark)).collect()}
    assert out[0] == 16 * 16 and out[5] == 21 * 21


def test_resize_images(spark):
    out = decode_images(media_df(spark)).collect()
    resized = resize_images(media_df(spark), target=8).collect()
    assert {r["media_id"] for r in resized} == {r["media_id"] for r in out}
    assert all(r["width"] == 8 and r["height"] == 8 for r in resized)


def test_frame_sample(spark):
    out = frame_sample(media_df(spark), every_n=1).collect()
    assert len(out) == 8  # n_frames=1 each
    assert all(r["frame_idx"] == 0 for r in out)


def test_embedding_dedup_brute_finds_planted_pair(spark):
    from pyspark_graph_spark.dedup import EmbeddingDedup

    import random

    rng = random.Random(7)
    base = [rng.gauss(0, 1) for _ in range(16)]
    near = [x + rng.gauss(0, 0.01) for x in base]  # cosine ~ 1
    rows = [(0, base), (1, near)] + [
        (i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(2, 30)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = EmbeddingDedup(threshold=0.95, strategy="brute").pairs(df).collect()
    assert [(r["src"], r["dst"]) for r in out] == [(0, 1)]
    assert out[0]["cosine_sim"] > 0.99


def test_embedding_dedup_lsh_matches_brute(spark):
    """The LSH path must emit a SUBSET of the brute pairs (exact verify ->
    precision 1.0) and, at a high threshold where collisions are near
    certain, the same set."""
    from pyspark_graph_spark.dedup import EmbeddingDedup

    import random

    rng = random.Random(11)
    rows = []
    for i in range(20):
        base = [rng.gauss(0, 1) for _ in range(16)]
        rows.append((2 * i, base))
        rows.append((2 * i + 1, [x + rng.gauss(0, 0.01) for x in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    brute = {
        (r["src"], r["dst"])
        for r in EmbeddingDedup(threshold=0.95, strategy="brute")
        .pairs(df)
        .collect()
    }
    lsh = {
        (r["src"], r["dst"])
        for r in EmbeddingDedup(threshold=0.95, strategy="lsh", dim=16)
        .pairs(df)
        .collect()
    }
    assert lsh <= brute
    assert lsh == brute  # near-identical vectors collide in every table


def test_embedding_dedup_validation(spark):
    from pyspark_graph_spark.dedup import EmbeddingDedup

    with pytest.raises(ValueError):
        EmbeddingDedup(strategy="nope")
    with pytest.raises(ValueError):
        EmbeddingDedup(strategy="lsh")  # dim required


def test_decode_pnm_real_bytes():
    from pyspark_graph_spark.multimodal.binary_ops import _decode_pnm

    p5 = b"P5\n3 2\n255\n" + bytes([10, 20, 30, 40, 50, 60])
    px = _decode_pnm(p5)
    assert px.shape == (2, 3)
    assert px.tolist() == [[10, 20, 30], [40, 50, 60]]

    p6 = b"P6\n2 1\n255\n" + bytes([255, 0, 0, 0, 0, 255])
    px = _decode_pnm(p6)
    assert px.shape == (1, 2)
    assert px.tolist() == [[85, 85]]  # integer mean of RGB

    with pytest.raises(ValueError):
        _decode_pnm(b"JFIF not a pnm")
    with pytest.raises(ValueError):
        _decode_pnm(b"P5\n4 4\n255\n" + bytes(3))  # truncated


def test_decode_bmp_real_bytes():
    import struct

    from pyspark_graph_spark.multimodal.binary_ops import _decode_bmp

    w, h, stride = 2, 2, 8  # stride = 2*3 rounded up to 4 bytes
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + stride * h, 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 0, 0, 0, 0)
    # bottom-up storage: first stored row is the BOTTOM image row
    bottom = bytes([0, 0, 0, 0, 0, 0, 0, 0])
    top = bytes([255, 255, 255, 0, 0, 0, 0, 0])
    px = _decode_bmp(header + bottom + top)
    assert px.shape == (2, 2)
    assert px.tolist() == [[255, 0], [0, 0]]  # top-left white, rest black

    with pytest.raises(ValueError):
        _decode_bmp(b"XX junk")


def test_attach_pgm_media_decode_end_to_end(spark):
    from pyspark_graph_spark.multimodal import attach_pgm_media

    ids = [0, 1, 5]
    base = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    out = {
        r["media_id"]: r
        for r in decode_images(attach_pgm_media(base, "doc_id")).collect()
    }
    for i in ids:
        w, h = i % 48 + 16, i % 32 + 16
        n = w * h
        expect_mean = sum((i + k) % 256 for k in range(n)) // n
        assert out[i]["width"] == w and out[i]["height"] == h
        assert out[i]["mean_intensity"] == expect_mean


def test_streaming_exact_dedup_batch_and_stream(spark, sf_dir, tmp_path):
    from pyspark_graph_spark.streaming import streaming_exact_dedup

    batch = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "same text"),
         (2, "2024-01-01 10:05:00", "same  TEXT "),
         (3, "2024-01-01 10:06:00", "different")],
        ["doc_id", "ts", "text"],
    ).withColumn("ts", F.to_timestamp("ts"))
    assert streaming_exact_dedup(batch).count() == 2

    batch.write.mode("overwrite").parquet(str(tmp_path / "docs"))
    stream = (
        spark.readStream.schema(batch.schema).parquet(str(tmp_path / "docs"))
    )
    q = (
        streaming_exact_dedup(stream)
        .writeStream.format("memory")
        .queryName("t_sdedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.sql("SELECT COUNT(*) n FROM t_sdedup").first()["n"] == 2


def test_subword_token_count(spark):
    from pyspark_graph_spark.functions.text import subword_token_count

    df = spark.createDataFrame(
        [("Hello, world 42!",), ("",), ("internationalization",)], ["text"]
    )
    out = [
        r["n"]
        for r in df.select(subword_token_count(F.col("text")).alias("n"))
        .collect()
    ]
    # "hello"(2) + ","(1) + "world"(2) + "4"(1) + "2"(1) + "!"(1) = 8
    # ""            -> 0
    # 20 letters    -> ceil(20/4) = 5
    assert out == [8, 0, 5]


def test_winnow_fingerprint_column_vs_frame(spark):
    from pyspark_graph_spark.functions.text import (
        winnow_fingerprint,
        winnow_fingerprints,
    )

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "tiny"),  # shorter than the window
         (3, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    col_fp = {
        r["doc_id"]: r["fp"]
        for r in df.select(
            "doc_id", winnow_fingerprint(F.col("text")).alias("fp")
        ).collect()
    }
    frame_fp = {
        r["doc_id"]: r["winnow_fp"]
        for r in winnow_fingerprints(df).collect()
    }
    assert col_fp == frame_fp  # explode formulation == HOF formulation
    assert col_fp[1] == col_fp[3]  # identical docs -> identical fp
    assert col_fp[1] != col_fp[2]
