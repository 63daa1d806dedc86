"""Round-3 LLM-pipeline operators: gopher_rules, vocab_coverage,
cdc_chunks, SemDeDup."""

import pytest
from pyspark.sql import functions as F

from pyspark_graph_spark.functions.packing import cdc_chunks
from pyspark_graph_spark.functions.quality import (
    GOPHER_STOPWORDS,
    gopher_rules,
    vocab_coverage,
)


def test_gopher_rules_metrics(spark):
    good = "the quick brown fox and the lazy dog have fun with that stick " * 5
    short = "tiny doc"
    symbols = " ".join(["#tag"] * 60)
    df = spark.createDataFrame(
        [(1, good), (2, short), (3, symbols)], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in gopher_rules(df).collect()}
    assert out[1].keep is True
    assert out[1].n_words == 65
    assert out[1].stopword_hits >= 2
    # short doc fails the word-count rule only by count
    assert out[2].keep is False and out[2].r_word_count is False
    # symbol doc: 60 words, all '#'-prefixed -> symbol_ratio 1.0
    assert out[3].symbol_ratio == 1.0 and out[3].r_symbol is False
    assert out[3].keep is False


def test_gopher_rules_empty_text(spark):
    df = spark.createDataFrame([(1, "")], ["doc_id", "text"])
    r = gopher_rules(df).first()
    assert r.n_words == 0 and r.keep is False
    assert r.mean_word_len == 0.0 and r.alpha_fraction == 0.0


def test_vocab_coverage_exact(spark):
    # a a a b b c -> top-1 covers 3/6, top-2 covers 5/6, top-3 covers 6/6
    df = spark.createDataFrame([(1, "a a a b b c")], ["doc_id", "text"])
    out = {r.k: r for r in vocab_coverage(df, [1, 2, 3, 10]).collect()}
    assert out[1].covered == 3 and out[1].coverage == 0.5
    assert out[2].covered == 5
    assert out[3].coverage == 1.0
    assert out[10].coverage == 1.0  # k beyond vocab covers everything
    assert out[1].vocab_size == 3 and out[1].total == 6


def test_vocab_coverage_validation(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        vocab_coverage(df, [])
    with pytest.raises(ValueError):
        vocab_coverage(df, [0])


def test_cdc_chunks_partition_and_coverage(spark):
    text = " ".join(f"w{j % 13} x{j % 5} y{j}" for j in range(60))
    df = spark.createDataFrame([(1, text), (2, "a b"), (3, "")],
                               ["doc_id", "text"])
    out = cdc_chunks(df, window=3, divisor=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # every token of doc 1 lands in exactly one chunk
    assert sum(r.n_tokens for r in by_doc[1]) == 180
    # chunk ids are dense 0..n-1
    assert sorted(r.chunk_id for r in by_doc[1]) == list(
        range(len(by_doc[1]))
    )
    # short doc -> one chunk of 2 tokens; empty doc -> no rows
    assert len(by_doc[2]) == 1 and by_doc[2][0].n_tokens == 2
    assert 3 not in by_doc


def test_cdc_chunks_boundary_locality(spark):
    """Content-defined property: editing the FIRST token leaves all chunks
    after the first boundary identical (fixed-width chunking would shift
    every fingerprint)."""
    base = " ".join(f"t{j % 17} u{j % 3} v{j}" for j in range(80))
    edited = "EDITED " + base
    df = spark.createDataFrame(
        [(1, base), (2, edited)], ["doc_id", "text"]
    )
    out = cdc_chunks(df, window=3, divisor=4).collect()
    fps = {
        d: [r.fingerprint for r in sorted(g, key=lambda r: r.chunk_id)]
        for d, g in [
            (doc, [r for r in out if r.doc_id == doc]) for doc in (1, 2)
        ]
    }
    # suffix chunks (everything after each doc's first chunk) coincide
    assert fps[1][1:] == fps[2][1:]


def test_semdedup_drops_planted_duplicate(spark):
    import numpy as np

    from pyspark_graph_spark.dedup.semdedup import SemDeDup

    rng = np.random.default_rng(4)
    base = rng.normal(size=(20, 8))
    rows = [(i, [float(x) for x in base[i]]) for i in range(20)]
    # vec 100 = near-copy of vec 0 (tiny perturbation)
    rows.append((100, [float(x) for x in base[0] + 1e-4]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    sd = SemDeDup(k=3, n_iter=2, threshold=0.95)
    out = {r.vec_id: r for r in sd.run(df).collect()}
    assert len(out) == 21
    pair = {out[0].kept, out[100].kept}
    assert pair == {True, False}  # exactly one of the twins survives
    # everything else is far from everything -> kept
    dropped = [v for v, r in out.items() if not r.kept]
    assert len(dropped) == 1
    # the oracle-twin pair-join strategy makes identical decisions
    pairs = {
        r.vec_id: r for r in sd.run(df, strategy="pairs").collect()
    }
    assert {v: r.kept for v, r in out.items()} == {
        v: r.kept for v, r in pairs.items()
    }


def test_semdedup_threshold_validation(spark):
    from pyspark_graph_spark.dedup.semdedup import SemDeDup

    with pytest.raises(ValueError):
        SemDeDup(threshold=0.0)
    with pytest.raises(ValueError):
        SemDeDup(threshold=1.5)


def test_scc_directed_trade_graph_gate(spark):
    """Directed trade graph: SCC labels agree with weak components where
    mutual reachability holds, and every vertex is labeled exactly once."""
    from pyspark_graph_spark.operators.scc import (
        StronglyConnectedComponents,
    )
    from pyspark_graph_spark.sources.tables import directed_trade_graph

    g = directed_trade_graph(spark, "/root/testdata/sf0.001")
    out = StronglyConnectedComponents(
        max_outer_iterations=20, max_flood_iterations=40
    ).run(g)
    rows = out.collect()
    n_verts = g.vertices.count()
    assert len(rows) == n_verts
    assert len({r.id for r in rows}) == n_verts
    # the return edges close cycles: at least one SCC has >= 2 members
    from collections import Counter

    sizes = Counter(r.component for r in rows)
    assert max(sizes.values()) >= 2


def test_embedding_pca_matches_numpy(spark):
    """Top principal direction matches numpy's eigendecomposition of the
    same covariance (up to the tolerance of 3 power iterations)."""
    import numpy as np

    rng = np.random.default_rng(11)
    # anisotropic cloud: dominant axis along a fixed direction
    base = rng.normal(size=(300, 6))
    base[:, 2] *= 6.0
    rows = [(i, [float(x) for x in base[i]]) for i in range(300)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    from pyspark_graph_spark.functions.pca import embedding_pca

    out = embedding_pca(df, dim=6, n_iter=8).collect()
    v = np.zeros(6)
    for r in out:
        v[r.i - 1] = r.loading
    C = np.cov(base.T, bias=True)
    evals, evecs = np.linalg.eigh(C)
    top = evecs[:, -1]
    # sign-align then compare
    if np.dot(v, top) < 0:
        top = -top
    assert np.abs(np.dot(v, top)) > 0.999
    assert out[0].eigenvalue == pytest.approx(evals[-1], rel=1e-3)


def test_embedding_pca_validation(spark):
    from pyspark_graph_spark.functions.pca import embedding_pca

    df = spark.createDataFrame([(1, [1.0, 2.0])], ["vec_id", "embedding"])
    with pytest.raises(ValueError):
        embedding_pca(df, dim=2, n_iter=0)


def test_feature_propagation_path_graph(spark):
    """Hand-checkable 3-vertex path: one mean round, isolated keeps value."""
    from pyspark_graph_spark.graph import Graph
    from pyspark_graph_spark.operators.aggregate_messages import (
        AggregateMessages,
    )

    verts = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 60.0), (9, 5.0)], ["id", "f"]
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2)], ["src", "dst"]
    )
    g = Graph(verts, edges, directed=True, indexed=True)
    from pyspark.sql import functions as FF

    msgs = AggregateMessages(agg=FF.avg("msg"), to_dst=FF.col("src_f")).run(g)
    f1 = {
        r.id: r.f
        for r in verts.join(
            msgs.withColumnRenamed("msg", "nf"), on="id", how="left"
        )
        .selectExpr("id", "coalesce(nf, f) AS f")
        .collect()
    }
    assert f1[1] == 20.0          # neighbor 2
    assert f1[2] == 35.0          # mean(10, 60)
    assert f1[3] == 20.0          # neighbor 2
    assert f1[9] == 5.0           # isolated keeps value


def test_powerlaw_fit_exact_line(spark):
    """A degree histogram that IS a power law fits exactly:
    count(k) = 64 * k^-2 -> slope -2, intercept ln 64."""
    import math

    # build synthetic points directly through the same OLS arithmetic
    rows = []
    vid = 0
    for k in (1, 2, 4, 8):
        cnt = 64 // (k * k)
        for _ in range(cnt):
            rows.append((vid, k))
            vid += 1
    df = spark.createDataFrame(rows, ["v", "k"])
    from pyspark.sql import functions as FF

    hist = df.groupBy("k").agg(FF.count(FF.lit(1)).alias("cnt"))
    pts = hist.select(
        FF.log(FF.col("k").cast("double")).alias("x"),
        FF.log(FF.col("cnt").cast("double")).alias("y"),
    )
    s = pts.agg(
        FF.count(FF.lit(1)).alias("n"),
        FF.sum("x").alias("sx"),
        FF.sum("y").alias("sy"),
        FF.sum(FF.col("x") * FF.col("y")).alias("sxy"),
        FF.sum(FF.col("x") * FF.col("x")).alias("sxx"),
    ).first()
    slope = (s.n * s.sxy - s.sx * s.sy) / (s.n * s.sxx - s.sx * s.sx)
    assert slope == pytest.approx(-2.0, abs=1e-9)
    intercept = (s.sy - slope * s.sx) / s.n
    assert intercept == pytest.approx(math.log(64), abs=1e-9)


def test_bigram_scores_exact(spark):
    """Hand-checked add-one bigram model on a 2-doc corpus."""
    import math

    from pyspark_graph_spark.functions.lm import bigram_scores

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], ["doc_id", "text"]
    )
    # corpus bigrams: (a,b)x3, (b,a)x1, (b,c)x1; unigrams a:3 b:3 c:1; V=3
    out = {r.doc_id: r for r in bigram_scores(df).collect()}
    p_ab = (3 + 1) / (3 + 3)   # c(a,b)+1 / c(a)+V
    p_ba = (1 + 1) / (3 + 3)
    p_bc = (1 + 1) / (3 + 3)
    exp1 = -(2 * math.log2(p_ab) + math.log2(p_ba)) / 3
    exp2 = -(math.log2(p_ab) + math.log2(p_bc)) / 2
    assert out[1].n_bigrams == 3
    assert out[1].neg_log2_p == pytest.approx(exp1, abs=1e-6)
    assert out[2].n_bigrams == 2
    assert out[2].neg_log2_p == pytest.approx(exp2, abs=1e-6)
    # single-token doc has no bigrams -> omitted
    df2 = spark.createDataFrame([(9, "solo")], ["doc_id", "text"])
    assert bigram_scores(df2).count() == 0


def test_leakage_safe_split_cluster_atomic(spark):
    """Every member of a dedup cluster lands on the same side of the
    split — the property doc-level hashing cannot give."""
    from pyspark_graph_spark.queries import QUERIES

    out = QUERIES["leakage_safe_split"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_component = {}
    for r in out:
        by_component.setdefault(r.component, set()).add(r.split)
    assert all(len(s) == 1 for s in by_component.values())
    splits = {r.split for r in out}
    assert splits <= {"train", "val"}
