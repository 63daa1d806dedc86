"""Sketches (KMV/CMS/HLL/Bloom), sampling, shuffling, space-filling keys."""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark_graph_spark.constants import ID

from pyspark_graph_spark.queries._registry import query
from pyspark_graph_spark.queries._shared import (
    BIPARTITE_EDGES_CTE,
    _TOKS_CTE,
)


#: corpus-mixing rates for the sampling gate: downsample dominant English,
#: keep low-resource languages whole
_MIX_RATES = {"en": 0.3, "zh": 1.0, "es": 0.8, "de": 0.8, "fr": 1.0}

def _corpus_sample_oracle() -> str:
    from pyspark_graph_spark.functions.sampling import stratified_sample_sql

    pred = stratified_sample_sql(
        _MIX_RATES, "lang", "doc_id", default_rate=0.5, salt="mix1"
    )
    return f"""
WITH kept AS (SELECT doc_id, lang FROM documents WHERE {pred})
SELECT lang, COUNT(*) AS n_kept, MIN(doc_id) AS min_id,
       MAX(doc_id) AS max_id,
       CAST(SUM(doc_id) AS BIGINT) AS sum_id
FROM kept GROUP BY lang
"""

# ---------------------------------------------------------------------------
# GraphSAGE-style k-hop neighbor sampling (operators/neighbor_sampling.py)
# ---------------------------------------------------------------------------
def _neighbor_sample_sql(fanouts: list[int], seed_max_custkey: int) -> str:
    """Unrolled hop-by-hop sampling mirroring NeighborSampler exactly:
    per hop, frontier-incident edges ranked by the cross-engine 60-bit md5
    of (src, dst, salt, hop) and the per-src top-fanout kept."""
    from pyspark_graph_spark.functions.hashing import md5_hash60_sql

    def rank(hop: int) -> str:
        return md5_hash60_sql(
            "CAST(e.src AS VARCHAR) || ',' || CAST(e.dst AS VARCHAR) "
            f"|| ',' || '' || ',' || '{hop}'"
        )

    ctes = [
        "sym AS (SELECT src, dst FROM bipartite_edges "
        "UNION SELECT dst AS src, src AS dst FROM bipartite_edges)",
        "f0 AS (SELECT DISTINCT CAST(c_custkey * 2 AS BIGINT) AS src "
        f"FROM customer WHERE c_custkey <= {seed_max_custkey})",
    ]
    selects = []
    for hop, fanout in enumerate(fanouts, start=1):
        prev = f"f{hop - 1}"
        ctes.append(
            f"h{hop} AS MATERIALIZED (SELECT CAST({hop} AS INT) AS hop, "
            "src, dst FROM ("
            "SELECT e.src, e.dst, ROW_NUMBER() OVER "
            f"(PARTITION BY e.src ORDER BY {rank(hop)}, e.dst) AS rn "
            f"FROM sym e JOIN {prev} f ON e.src = f.src"
            f") WHERE rn <= {fanout})"
        )
        ctes.append(
            f"f{hop} AS (SELECT DISTINCT dst AS src FROM h{hop})"
        )
        selects.append(f"SELECT hop, src, dst FROM h{hop}")
    return (
        f"WITH {BIPARTITE_EDGES_CTE.strip()},\n"
        + ",\n".join(ctes)
        + "\n"
        + "\nUNION ALL\n".join(selects)
    )

# ---------------------------------------------------------------------------
# Deterministic training shuffle / shard assignment (functions/shuffle.py)
# ---------------------------------------------------------------------------
def _training_shuffle_sql(n_shards: int, seed: str) -> str:
    from pyspark_graph_spark.functions.hashing import md5_hash60_sql

    h = md5_hash60_sql(f"CAST(doc_id AS VARCHAR) || '|' || '{seed}'")
    return f"""
WITH h AS (
    SELECT doc_id, lang, source, {h} AS hh FROM documents
),
s AS (
    SELECT doc_id, lang, source, hh,
           CAST(hh % {n_shards} AS INT) AS shard FROM h
)
SELECT doc_id, lang, source, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY hh, doc_id) - 1
            AS INT) AS pos
FROM s
"""

# ---------------------------------------------------------------------------
# Source quotas, unigram LM scoring, KMV sketch (functions/)
# ---------------------------------------------------------------------------
def _source_quota_sql(quota: int) -> str:
    from pyspark_graph_spark.functions.hashing import md5_hash60_sql

    h = md5_hash60_sql("CAST(doc_id AS VARCHAR) || ''")
    return f"""
SELECT doc_id, source FROM (
    SELECT doc_id, source,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY {h}, doc_id) AS rn
    FROM documents
) WHERE rn <= {quota}
"""

def _kmv_sql(k: int) -> str:
    from pyspark_graph_spark.functions.hashing import md5_hash60_sql

    h = md5_hash60_sql("CAST(token AS VARCHAR)")
    return rf"""
WITH {_TOKS_CTE.strip()},
tok AS (SELECT DISTINCT source, token FROM (
    SELECT d.source, unnest(t.t) AS token
    FROM toks t JOIN documents d USING (doc_id))),
hashed AS (SELECT DISTINCT source AS grp, {h} AS h FROM tok),
topk AS (
    SELECT grp, h, ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS rn
    FROM hashed
),
agg AS (
    SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_kept, MAX(h) AS kth_hash
    FROM topk WHERE rn <= {k} GROUP BY grp
)
SELECT grp AS source, n_kept, kth_hash,
       ROUND(CASE WHEN n_kept < {k} THEN n_kept * 1.0
                  ELSE ({k} - 1) * 1152921504606846976.0 / kth_hash
             END, 3) AS estimate
FROM agg
"""

# ---------------------------------------------------------------------------
# Z-order layout keys + R-MAT synthetic graphs
# ---------------------------------------------------------------------------
def _zorder_oracle() -> str:
    from pyspark_graph_spark.functions.layout import zvalue_sql

    z = zvalue_sql("l_orderkey % 1024", "l_suppkey % 1024", bits=10)
    return f"""
SELECT l_orderkey, l_suppkey, {z} AS zval
FROM lineitem
WHERE l_orderkey % 97 = 0
"""

def _rmat_oracle() -> str:
    from pyspark_graph_spark.sources.generators import rmat_edges_sql

    return f"""
WITH edges AS ({rmat_edges_sql(scale=8, n_edges=4096)}),
deg AS (
    SELECT v, CAST(COUNT(*) AS BIGINT) AS degree FROM (
        SELECT src AS v FROM edges UNION ALL SELECT dst FROM edges
    ) GROUP BY v
)
SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_vertices
FROM deg GROUP BY degree
"""

# ---------------------------------------------------------------------------
# Count-min sketch frequency estimation (functions/sketch.py)
# ---------------------------------------------------------------------------
def _cms_sql(width: int, depth: int, topn: int) -> str:
    from pyspark_graph_spark.functions.hashing import md5_hash60_sql

    def bucket(d: int, expr: str) -> str:
        h = md5_hash60_sql(f"'cms{d}' || ',' || CAST({expr} AS VARCHAR)")
        return f"(({h}) % {width})"

    sketch_rows = "\nUNION ALL\n".join(
        f"SELECT {d} AS row, {bucket(d, 'token')} AS bucket FROM tok"
        for d in range(depth)
    )
    probe_rows = "\nUNION ALL\n".join(
        f"SELECT item, {d} AS row, {bucket(d, 'item')} AS bucket FROM items"
        for d in range(depth)
    )
    return rf"""
WITH {_TOKS_CTE.strip()},
tok AS (SELECT unnest(t) AS token FROM toks),
exact AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY token),
items AS (
    SELECT token AS item FROM exact ORDER BY cnt DESC, token LIMIT {topn}
),
grid AS (
    SELECT row, bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM ({sketch_rows})
    GROUP BY row, bucket
),
probes AS ({probe_rows})
SELECT p.item, CAST(MIN(COALESCE(g.cnt, 0)) AS BIGINT) AS estimate,
       CAST(MIN(e.cnt) AS BIGINT) AS exact
FROM probes p
LEFT JOIN grid g ON p.row = g.row AND p.bucket = g.bucket
JOIN exact e ON e.token = p.item
GROUP BY p.item
"""

# ---------------------------------------------------------------------------
# Histogram quantile estimation (functions/sketch.py)
# ---------------------------------------------------------------------------
def _hist_quantile_sql(quantiles: list[float], bins: int) -> str:
    qsel = []
    for q in quantiles:
        qsel.append(f"""
SELECT CAST({q!r} AS DOUBLE) AS q,
       ROUND(lo + ((hi - lo) / {bins}) *
             (bin + (({q!r} * n - (cum - cnt)) * 1.0 / cnt)), 6) AS estimate
FROM cum WHERE cum >= {q!r} * n ORDER BY bin LIMIT 1""")
    return f"""
WITH b AS (
    SELECT MIN(CAST(l_extendedprice AS DOUBLE)) AS lo,
           MAX(CAST(l_extendedprice AS DOUBLE)) AS hi,
           COUNT(*) AS n
    FROM lineitem
),
binned AS (
    -- hi = lo guard mirrors sketch.py: constant column pins to bin 0
    SELECT CASE WHEN b.hi = b.lo THEN 0
           ELSE LEAST({bins} - 1, CAST(floor(
               (CAST(l_extendedprice AS DOUBLE) - b.lo)
               / ((b.hi - b.lo) / {bins})) AS INT)) END AS bin,
           b.lo, b.hi, b.n
    FROM lineitem, b
),
hist AS (
    SELECT bin, lo, hi, n, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM binned GROUP BY bin, lo, hi, n
),
cum AS (
    SELECT *, SUM(cnt) OVER (ORDER BY bin
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM hist
)
{"UNION ALL".join("(" + s + ")" for s in qsel)}
"""

def _hll_sql(b: int) -> str:
    from pyspark_graph_spark.functions.hashing import md5_hash60_sql

    m = 1 << b
    width = 60 - b
    alpha = 0.7213 / (1 + 1.079 / m)
    h = md5_hash60_sql("CAST(l_partkey * 100000 + l_suppkey AS VARCHAR)")
    return f"""
WITH hashes AS (SELECT ({h}) AS h FROM lineitem),
rr AS (
    SELECT h % {m} AS reg,
           CASE WHEN (h >> {b}) = 0 THEN {width + 1}
                ELSE {width + 1} - LENGTH(bin(h >> {b})) END AS rank
    FROM hashes
),
regs AS (SELECT reg, MAX(rank) AS mx FROM rr GROUP BY reg),
agg AS (
    SELECT COUNT(*) AS nz, SUM(POWER(2.0, -mx)) AS s FROM regs
)
SELECT CAST({m} AS INT) AS m,
       CAST(nz AS BIGINT) AS nonzero_registers,
       ROUND(CASE WHEN CAST({alpha!r} AS DOUBLE) * {m} * {m} / (s + ({m} - nz))
                        <= 2.5 * {m}
                   AND nz < {m}
                  THEN {m}.0 * ln({m}.0 / ({m} - nz))
                  ELSE CAST({alpha!r} AS DOUBLE) * {m} * {m}
                       / (s + ({m} - nz)) END,
             4) AS estimate
FROM agg
"""

_BLOOM_FOLD = (
    "list_reduce(list_transform(range(1,16), "
    "i -> CAST(strpos('0123456789abcdef', "
    "substr(md5(CAST(j AS VARCHAR) || ':' || f), i, 1)) - 1 AS BIGINT)), "
    "(a,b) -> a*16+b)"
)

def _hilbert_oracle() -> str:
    from pyspark_graph_spark.functions.layout import hilbert_sql_ctes

    ctes = hilbert_sql_ctes(
        "(SELECT event_id, user_id % 256 AS x, event_id % 256 AS y "
        "FROM events WHERE event_id < 2000)",
        "x",
        "y",
        bits=8,
    )
    return f"WITH {ctes}\nSELECT event_id, x, y, hd AS hilbert FROM h8"

def _kmv_pairwise_sql(k: int, groups: list[str]) -> str:
    from pyspark_graph_spark.functions.hashing import md5_hash60_sql

    h = md5_hash60_sql("CAST(user_id AS VARCHAR)")
    glist = ", ".join(f"'{g}'" for g in groups)
    return rf"""
WITH hashed AS (
    SELECT DISTINCT event_type AS t, {h} AS h FROM events
    WHERE event_type IN ({glist})
),
sk AS MATERIALIZED (
    SELECT t, h FROM (
        SELECT t, h, ROW_NUMBER() OVER (PARTITION BY t ORDER BY h) AS rn
        FROM hashed
    ) WHERE rn <= {k}
),
pu AS (
    SELECT DISTINCT LEAST(t, t2) AS ta, GREATEST(t, t2) AS tb, h
    FROM (SELECT t, h, UNNEST([{glist}]) AS t2 FROM sk)
    WHERE t <> t2
),
kept AS (
    SELECT ta, tb, h FROM (
        SELECT ta, tb, h,
               ROW_NUMBER() OVER (PARTITION BY ta, tb ORDER BY h) AS rn
        FROM pu
    ) WHERE rn <= {k}
),
mem AS (
    SELECT k.ta, k.tb, CAST(COUNT(*) AS BIGINT) AS k_eff, MAX(k.h) AS kth,
           CAST(SUM(CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS common
    FROM kept k
    LEFT JOIN sk a ON a.t = k.ta AND a.h = k.h
    LEFT JOIN sk b ON b.t = k.tb AND b.h = k.h
    GROUP BY k.ta, k.tb
)
SELECT ta AS type_a, tb AS type_b, k_eff, common,
       ROUND(common * 1.0 / k_eff, 6) AS jaccard_est,
       ROUND(CASE WHEN k_eff < {k} THEN k_eff * 1.0
                  ELSE ({k} - 1) * 1152921504606846976.0 / kth END, 3)
         AS union_est,
       ROUND(common * 1.0 / k_eff
             * CASE WHEN k_eff < {k} THEN k_eff * 1.0
                    ELSE ({k} - 1) * 1152921504606846976.0 / kth END, 3)
         AS inter_est
FROM mem
"""

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

@query("corpus_sample", oracle=_corpus_sample_oracle())
def q_corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified corpus sampling (data mixing): keep an
    exact, reproducible per-language fraction via an md5-threshold on
    doc_id — a pure map-side filter (zero shuffles before the readout
    aggregate), stable under repartitioning/retries, recomputed row-for-row
    by the SQL oracle. Emits per-language membership digests (count, min,
    max, sum of kept ids) so the gate pins the exact selected SET, not
    just its size."""
    from pyspark_graph_spark.functions.sampling import stratified_sample
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    kept = stratified_sample(
        docs, _MIX_RATES, "lang", "doc_id", default_rate=0.5, salt="mix1"
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
        F.sum("doc_id").alias("sum_id"),
    )

@query("neighbor_sample", oracle=_neighbor_sample_sql([3, 2], 5))
def q_neighbor_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded 2-hop GraphSAGE-style sample (fanouts 3 then 2) around the
    first five customers of the bipartite customer-supplier graph,
    traversed undirected. Per hop: one frontier-edge hash join + a per-src
    top-k window — frontier growth is capped at fanout^hops regardless of
    hub degrees. The md5 ranking makes the sample a pure function of the
    data, so the oracle unrolls the identical hops."""
    from pyspark_graph_spark.operators.neighbor_sampling import NeighborSampler
    from pyspark_graph_spark.queries._shared import _cust_supp_graph

    g = _cust_supp_graph(spark, sf_dir)
    seeds = g.vertices.filter(
        (F.col("kind") == "customer") & (F.col(ID) <= 10)
    )
    return NeighborSampler(fanouts=[3, 2], undirected=True).run(g, seeds)

@query("training_shuffle", oracle=_training_shuffle_sql(8, "epoch0"))
def q_training_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch-0 global shuffle of the document corpus into 8
    shards: shard = content-hash mod shards (row-local, zero shuffle),
    position = per-shard rank over the hash (one shuffle on the shard id).
    Content-keyed, not rand(): identical layout on any cluster/partitioning
    and recomputable by the oracle."""
    from pyspark_graph_spark.functions.shuffle import assign_shards
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source"
    )
    out = assign_shards(docs, "doc_id", 8, seed="epoch0")
    return out.select("doc_id", "lang", "source", "shard", F.col("pos").cast("int"))

@query("source_quota", oracle=_source_quota_sql(20))
def q_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quota enforcement: at most 20 documents per source, drawn
    deterministically by content-hash rank (reproducible on any cluster
    or partitioning; redrawable by salt). One shuffle on source; AQE
    skew-splits a dominant source."""
    from pyspark_graph_spark.functions.sampling import quota_sample
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return quota_sample(docs, "source", "doc_id", quota=20)

@query("kmv_sketch", oracle=_kmv_sql(64))
def q_kmv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count sketch: per source, estimate the distinct-token
    cardinality from the 64 smallest content hashes. Deterministic (unlike
    HLL) so the ESTIMATE itself is oracle-checked; sketches merge
    associatively across shards/days without touching raw data."""
    from pyspark_graph_spark.functions.sketch import kmv_distinct
    from pyspark_graph_spark.functions.text import tokens as tok_fn
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    pairs = docs.select(
        "source", F.explode(tok_fn(F.col("text"))).alias("token")
    )
    return kmv_distinct(pairs, "source", "token", k=64)

@query(
    "mixture_plan",
    oracle="""
WITH inv AS (
    SELECT lang AS grp, CAST(SUM(len(list_filter(
        string_split_regex(lower(text), '\\s+'), t -> t <> ''))) AS BIGINT)
        AS tokens
    FROM documents GROUP BY lang
),
w AS (
    SELECT grp, tokens,
           CAST(CASE grp WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.2
                    WHEN 'fr' THEN 0.2 ELSE 0.0 END AS DOUBLE) AS weight
    FROM inv
)
SELECT grp AS lang, tokens, weight,
       CAST(ROUND(weight * 50000.0, 3) AS DOUBLE) AS target,
       ROUND(LEAST(1.0, weight * 50000.0 / tokens), 9) AS rate,
       ROUND(LEAST(weight * 50000.0, CAST(tokens AS DOUBLE)), 3)
           AS achievable
FROM w
""",
)
def q_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture planning: per-language token inventory -> deterministic
    sampling rates for a 50k-token budget at 50/20/20 en/de/fr weights.
    Arithmetic over a groups-sized table; rates feed stratified_sample
    directly."""
    from pyspark_graph_spark.functions.mixture import mixture_plan
    from pyspark_graph_spark.functions.text import token_count
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    inv = docs.groupBy(F.col("lang").alias("lang")).agg(
        F.sum(token_count(F.col("text"))).alias("tokens")
    )
    return mixture_plan(
        inv,
        {"en": 0.5, "de": 0.2, "fr": 0.2},
        budget=50_000.0,
        group_col="lang",
        tokens_col="tokens",
    )

@query("zorder_key", oracle=_zorder_oracle())
def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton z-values interleaving (orderkey, suppkey) bits — the sort
    key that makes range predicates on EITHER column file-prunable from
    one physical ordering. Pure integer expression tree in codegen; zero
    shuffles."""
    from pyspark_graph_spark.functions.layout import zvalue
    from pyspark_graph_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 97 == 0
    )
    return li.select(
        "l_orderkey",
        "l_suppkey",
        zvalue(
            F.col("l_orderkey") % 1024, F.col("l_suppkey") % 1024, bits=10
        ).alias("zval"),
    )

@query(
    "compaction_plan",
    oracle="""
WITH files AS (
    SELECT l_returnflag AS returnflag,
           CAST(EXTRACT(year FROM l_shipdate) * 100
                + EXTRACT(month FROM l_shipdate) AS BIGINT) AS ym,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem GROUP BY 1, 2
)
SELECT returnflag, ym, n_rows,
       CAST(FLOOR(COALESCE(SUM(n_rows) OVER (
           PARTITION BY returnflag ORDER BY ym
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
       ), 0) / 1000.0) AS BIGINT) AS group_id
FROM files
""",
)
def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lakehouse small-file compaction plan (functions/layout.py
    compaction_groups): per (returnflag, month) "file" of lineitem rows,
    assign output groups of ~1000 rows by exclusive running total within
    each returnflag partition — contiguous in time order, so compacted
    outputs preserve clustering. The plan operates on file METADATA (one
    row per file), so the window state is bounded by files-per-partition
    at any corpus size; the oracle replays the identical integer window
    arithmetic."""
    from pyspark_graph_spark.functions.layout import compaction_groups
    from pyspark_graph_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_shipdate"
    )
    files = li.groupBy(
        F.col("l_returnflag").alias("returnflag"),
        (
            F.year("l_shipdate") * 100 + F.month("l_shipdate")
        )
        .cast("long")
        .alias("ym"),
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    return compaction_groups(
        files,
        partition_by=["returnflag"],
        order_by="ym",
        size_col="n_rows",
        target=1000,
    )


@query("rmat_graph", oracle=_rmat_oracle())
def q_rmat_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of a hash-deterministic R-MAT graph (2^8 vertices,
    4096 edges, a=0.57): synthetic power-law graphs generated from pure
    expressions — same graph on any cluster or engine, zero storage, zero
    shuffles to generate. The benchmarking workhorse for iterative
    operators at arbitrary scale."""
    from pyspark_graph_spark.sources.generators import rmat_edges

    e = rmat_edges(spark, scale=8, n_edges=4096)
    deg = (
        e.select(F.col("src").alias("v"))
        .unionByName(e.select(F.col("dst").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.groupBy("degree").agg(
        F.count(F.lit(1)).alias("n_vertices")
    )

@query("cms_frequencies", oracle=_cms_sql(width=256, depth=4, topn=5))
def q_cms_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the corpus token stream: the 5 most frequent
    tokens probed against a 4x256 deterministic sketch grid, estimate vs
    exact side by side. The sketch is constant-size, cell-wise mergeable
    across shards, and never underestimates; one map-side-combined
    aggregate builds it."""
    from pyspark_graph_spark.functions.sketch import cms_estimate, cms_sketch
    from pyspark_graph_spark.functions.text import tokens as tok_fn
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(tok_fn(F.col("text"))).alias("token"))
    exact = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    items = (
        exact.orderBy(F.desc("cnt"), F.asc("token"))
        .limit(5)
        .select(F.col("token").alias("item"), "cnt")
        .localCheckpoint()
    )
    sk = cms_sketch(tok, "token", width=256, depth=4)
    est = cms_estimate(sk, items, "item", width=256, depth=4)
    return est.join(items, on="item").select(
        "item", "estimate", F.col("cnt").alias("exact")
    )

@query(
    "histogram_quantiles",
    oracle=_hist_quantile_sql([0.5, 0.9, 0.99], bins=1024),
)
def q_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of lineitem extended price from a 1024-bin fixed-width
    histogram: one min/max pass + one tiny aggregate instead of a global
    sort; error bounded by bin width, histogram mergeable across shards,
    and — unlike sampling-based approx_percentile — a pure function of
    the data, so the estimate itself is oracle-checked."""
    from pyspark_graph_spark.functions.sketch import histogram_quantiles
    from pyspark_graph_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    return histogram_quantiles(
        li, "l_extendedprice", [0.5, 0.9, 0.99], bins=1024
    )

@query("hll_distinct", oracle=_hll_sql(b=6))
def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog estimate of distinct (partkey, suppkey) pairs in
    lineitem — 64 integer registers, map-side-combinable, mergeable by
    element-wise max. Register ranks use bin()-length bit arithmetic (no
    float log2), so the oracle rebuilds the identical registers and the
    estimate matches to rounding."""
    from pyspark_graph_spark.functions.sketch import hll_estimate
    from pyspark_graph_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") * 100000 + F.col("l_suppkey")).alias("key")
    )
    return hll_estimate(li, "key", b=6)

@query(
    "bloom_membership",
    oracle=rf"""
WITH fp AS (
    SELECT doc_id, source,
           md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS f
    FROM documents
),
pos AS (
    SELECT DISTINCT source, {_BLOOM_FOLD} % 1024 AS p
    FROM fp CROSS JOIN UNNEST([0, 1, 2]) AS t(j)
),
probes AS (SELECT DISTINCT f FROM fp WHERE doc_id < 40),
ppos AS (
    SELECT f, j, {_BLOOM_FOLD} % 1024 AS p
    FROM probes CROSS JOIN UNNEST([0, 1, 2]) AS t(j)
),
srcs AS (SELECT DISTINCT source FROM documents),
hits AS (
    SELECT pp.f, s.source,
           COUNT(DISTINCT CASE WHEN pos.p IS NOT NULL THEN pp.j END)
               AS matched
    FROM ppos pp
    CROSS JOIN srcs s
    LEFT JOIN pos ON pos.source = s.source AND pos.p = pp.p
    GROUP BY 1, 2
)
SELECT h.f AS probe, h.source, h.matched = 3 AS bloom_hit,
       EXISTS(SELECT 1 FROM fp
              WHERE fp.f = h.f AND fp.source = h.source) AS present
FROM hits h
""",
)
def q_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership sketch: per-source Bloom filters (m=1024,
    k=3 salted md5 positions, represented as the sorted set-bit array —
    mergeable, bounded by m regardless of corpus size) probed with the
    fingerprints of the first 40 docs against EVERY source. bloom_hit
    vs present exhibits the no-false-negative guarantee and the
    false-positive trade-off in one gate; the oracle replays every bit
    position."""
    from pyspark_graph_spark.functions.sketch import bloom_build, bloom_probe
    from pyspark_graph_spark.functions.text import content_fingerprint
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id", "source", content_fingerprint(F.col("text")).alias("f")
    )
    bloom = bloom_build(fp, "f", ["source"], m=1024, k=3)
    probes = fp.filter(F.col("doc_id") < 40).select("f").distinct()
    probed = bloom_probe(bloom, probes, "f", m=1024, k=3)
    truth = (
        fp.select("source", "f")
        .distinct()
        .withColumn("__present", F.lit(True))
    )
    return (
        probed.join(
            truth,
            on=[
                probed.probe == truth.f,
                probed.source == truth.source,
            ],
            how="left",
        )
        .select(
            "probe",
            probed.source.alias("source"),
            "bloom_hit",
            F.coalesce("__present", F.lit(False)).alias("present"),
        )
    )

@query(
    "weighted_sample",
    oracle=r"""
WITH keyed AS (
    SELECT doc_id, n_chars,
           ROUND(
             -ln(
                (list_reduce(list_transform(range(1,16),
                    i -> CAST(strpos('0123456789abcdef',
                              substr(md5(CAST(doc_id AS VARCHAR)||':ws'),
                                     i, 1)) - 1 AS BIGINT)),
                    (a,b) -> a*16+b) + 1.0)
                / 1152921504606846977.0
             ) / n_chars, 9) AS k
    FROM documents
    WHERE n_chars > 0
)
SELECT doc_id, n_chars, k
FROM keyed
ORDER BY k, doc_id
LIMIT 50
""",
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis A-ES): per-doc exponential key
    -ln(u)/w with u hash-uniform from md5(doc_id) and w = n_chars; the 50
    smallest keys ARE the weighted sample. Fully distributed top-k (no
    collect, map-side combinable), reproducible on any engine — the
    quality-weighted corpus subsampling primitive. Keys rounded to 9
    decimals so libm ulp differences cannot reorder the cut."""
    from pyspark_graph_spark.functions.hashing import md5_hash60
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars") > 0
    )
    u = (
        md5_hash60(F.concat(F.col("doc_id").cast("string"), F.lit(":ws")))
        + 1.0
    ) / float((1 << 60) + 1)
    key = F.round(-F.log(u) / F.col("n_chars"), 9)
    return (
        docs.select("doc_id", "n_chars", key.alias("k"))
        .orderBy("k", "doc_id")
        .limit(50)
    )

@query("hilbert_key", oracle=_hilbert_oracle())
def q_hilbert_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve layout keys on the (user % 256, event % 256) grid —
    the Z-order upgrade (consecutive indices are always grid-adjacent,
    so range reads touch compact 2-D regions and min/max file skipping
    tightens). One chained projection per level, collapsed by Catalyst
    into a single codegen pass; the oracle replays every rotate/reflect
    level in chained CTEs."""
    from pyspark_graph_spark.functions.layout import with_hilbert_key
    from pyspark_graph_spark.sources.tables import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 2000)
        .select(
            "event_id",
            (F.col("user_id") % 256).alias("x"),
            (F.col("event_id") % 256).alias("y"),
        )
    )
    out = with_hilbert_key(ev, "x", "y", bits=8)
    return out.select("event_id", "x", "y", "hilbert")

@query(
    "kmv_intersection",
    oracle=_kmv_pairwise_sql(64, _EVENT_TYPES),
)
def q_kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimation from sketches alone: pairwise Jaccard /
    union / intersection estimates of the user sets behind each event
    type, computed from their 64-value KMV sketches (Beyer et al. 2007
    merge) — the raw user sets are never joined. Sketches are k rows per
    group; every downstream operation touches only sketch rows."""
    from pyspark_graph_spark.functions.sketch import kmv_pairwise
    from pyspark_graph_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    return kmv_pairwise(ev, "event_type", "user_id", _EVENT_TYPES, k=64)

@query(
    "stratified_sample",
    oracle=r"""
WITH k AS (
    SELECT lang,
           CAST(CASE lang WHEN 'en' THEN 0.1
                          WHEN 'zh' THEN 0.4
                          WHEN 'es' THEN 0.4
                          WHEN 'de' THEN 0.4
                          WHEN 'fr' THEN 0.4
                          ELSE 0.25 END AS DOUBLE) AS rate,
           (list_reduce(list_transform(range(1,16),
                i -> CAST(strpos('0123456789abcdef',
                          substr(md5(CAST(doc_id AS VARCHAR)||':strat'),
                                 i, 1)) - 1 AS BIGINT)),
                (a,b) -> a*16+b) + 1.0)
           / 1152921504606846977.0 AS u
    FROM documents
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN u <= rate THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       ROUND(SUM(CASE WHEN u <= rate THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS kept_frac,
       rate AS target_rate
FROM k GROUP BY lang, rate
""",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-stratified deterministic sampling — the corpus-rebalance
    primitive (downsample the dominant language, keep more of the rest).
    Keep decisions are pure per-row expressions (md5-uniform vs the
    stratum's target rate): zero shuffles besides the per-language
    summary aggregate, reproducible on any engine and any partitioning,
    and the same doc survives in every rerun — the property a resumable
    100 TB pipeline needs from its sampler."""
    from pyspark_graph_spark.functions.hashing import md5_hash60
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    rate = (
        F.when(F.col("lang") == "en", 0.1)
        .when(F.col("lang").isin("zh", "es", "de", "fr"), 0.4)
        .otherwise(0.25)
    )
    u = (
        md5_hash60(
            F.concat(F.col("doc_id").cast("string"), F.lit(":strat"))
        )
        + F.lit(1.0)
    ) / float((1 << 60) + 1)
    keyed = docs.select(
        "lang",
        rate.alias("rate"),
        (u <= rate).cast("long").alias("kept"),
    )
    return keyed.groupBy("lang", "rate").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("kept").alias("n_kept"),
        F.round(F.sum("kept") / F.count(F.lit(1)), 6).alias("kept_frac"),
    ).select(
        "lang",
        "n_docs",
        "n_kept",
        "kept_frac",
        F.col("rate").alias("target_rate"),
    )
