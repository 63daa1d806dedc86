"""Text quality, tokenization, TF-IDF/BM25, corpus statistics."""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark_graph_spark.session import (
    default_parallelism as _default_parallelism,
)
from pyspark_graph_spark.queries._shared import _cust_supp_graph

from pyspark_graph_spark.queries._registry import query
from pyspark_graph_spark.queries._shared import (
    BIPARTITE_EDGES_CTE,
    _TOKS_CTE,
    _walks_ctes,
)


#: fixed bag-of-terms query for the BM25 gate — common enough to hit many
#: docs, mixed document frequencies so idf actually differentiates
_BM25_QUERY_TERMS = ["data", "model", "training", "quality", "language"]

_UNIGRAM_ORACLE = rf"""
WITH {_TOKS_CTE.strip()},
tok AS (SELECT doc_id, unnest(t) AS token FROM toks),
terms AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
tot AS (SELECT SUM(cnt) AS total, COUNT(*) AS vocab FROM terms)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(-AVG(log2((cnt + 1) / (total + vocab))), 6) AS neg_log2_p
FROM tok JOIN terms USING (token) CROSS JOIN tot
GROUP BY doc_id
"""

# ---------------------------------------------------------------------------
# Distributed BPE merge learning (functions/bpe.py)
# ---------------------------------------------------------------------------
def _bpe_sql(n_merges: int) -> str:
    """Unrolled BPE rounds: identical pair counting (freq-weighted), the
    identical (count DESC, left, right) argmax, and the identical
    single-replace greedy merge on the double-space symbol string."""
    ctes = [
        "wf AS MATERIALIZED (SELECT token AS word, COUNT(*) AS freq "
        "FROM (SELECT unnest(t) AS token FROM toks) GROUP BY token)",
        "s1 AS MATERIALIZED (SELECT '  ' || array_to_string("
        "list_transform(range(1, len(word)+1), "
        "i -> substr(word, CAST(i AS INT), 1)), '  ') || '  ' AS s, freq "
        "FROM wf)",
    ]
    for step in range(1, n_merges + 1):
        ctes.append(
            f"p{step} AS (SELECT tk[CAST(i AS INT)] AS lft, "
            "tk[CAST(i AS INT) + 1] AS rgt, SUM(freq) AS pair_count "
            f"FROM (SELECT string_split(trim(s), '  ') AS tk, freq FROM s{step}) "
            "CROSS JOIN UNNEST(range(1, len(tk))) AS g(i) "
            "GROUP BY 1, 2)"
        )
        ctes.append(
            f"b{step} AS MATERIALIZED (SELECT CAST({step} AS INT) AS step, "
            "lft, rgt, CAST(pair_count AS BIGINT) AS pair_count "
            f"FROM p{step} ORDER BY pair_count DESC, lft, rgt LIMIT 1)"
        )
        if step < n_merges:
            ctes.append(
                f"s{step + 1} AS MATERIALIZED (SELECT "
                "replace(s, ' ' || b.lft || '  ' || b.rgt || ' ', "
                "' ' || b.lft || b.rgt || ' ') AS s, freq "
                f"FROM s{step} CROSS JOIN b{step} b)"
            )
    selects = "\nUNION ALL\n".join(
        f"SELECT step, lft AS left, rgt AS right, pair_count FROM b{s}"
        for s in range(1, n_merges + 1)
    )
    return (
        f"WITH {_TOKS_CTE.strip()},\n" + ",\n".join(ctes) + "\n" + selects
    )

# ---------------------------------------------------------------------------
# Tokenizer application, mixture planning, skew diagnostics
# ---------------------------------------------------------------------------
def _apply_bpe_sql(n_merges: int) -> str:
    """Recompute the learned merges (same unrolled rounds as bpe_merges),
    then replay them over every (doc, word) symbol string."""
    learn = _bpe_sql(n_merges)
    # reuse the CTE block of the learn oracle, drop its final SELECT
    ctes = learn.split("\nSELECT step,")[0]
    apply_ctes = [
        "dw AS (SELECT doc_id, unnest(t) AS word FROM toks)",
        "a0 AS (SELECT doc_id, '  ' || array_to_string("
        "list_transform(range(1, len(word)+1), "
        "i -> substr(word, CAST(i AS INT), 1)), '  ') || '  ' AS s FROM dw)",
    ]
    for step in range(1, n_merges + 1):
        apply_ctes.append(
            f"a{step} AS (SELECT doc_id, "
            "replace(s, ' ' || b.lft || '  ' || b.rgt || ' ', "
            "' ' || b.lft || b.rgt || ' ') AS s "
            f"FROM a{step - 1} CROSS JOIN b{step} b)"
        )
    return (
        ctes
        + ",\n"
        + ",\n".join(apply_ctes)
        + f"""
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(len(string_split(trim(s), '  '))) AS BIGINT) AS n_subwords
FROM a{n_merges}
GROUP BY doc_id
"""
    )

# ---------------------------------------------------------------------------
# Walk skip-gram co-occurrence + PMI (DeepWalk preprocessing)
# ---------------------------------------------------------------------------
def _walk_pmi_sql(length: int, seed: int, window: int, topn: int) -> str:
    """Replays the walks (shared CTEs), explodes skip-gram pairs within
    the window, and scores unordered pairs by PMI."""
    ctes = _walks_ctes(length, seed)
    ctes.append(
        f"wp AS (SELECT walk_id, string_split(path, ',') AS p FROM s{length})"
    )
    ctes.append(
        "occ AS (SELECT CAST(x AS BIGINT) AS v, COUNT(*) AS n FROM "
        "(SELECT unnest(p) AS x FROM wp) GROUP BY 1)"
    )
    ctes.append(
        "pairs AS (SELECT LEAST(CAST(p[CAST(i AS INT)] AS BIGINT), "
        "CAST(p[CAST(j AS INT)] AS BIGINT)) AS a, "
        "GREATEST(CAST(p[CAST(i AS INT)] AS BIGINT), "
        "CAST(p[CAST(j AS INT)] AS BIGINT)) AS b "
        "FROM wp CROSS JOIN UNNEST(range(1, len(p)+1)) AS g(i) "
        "CROSS JOIN UNNEST(range(1, len(p)+1)) AS h(j) "
        f"WHERE j > i AND j <= i + {window})"
    )
    ctes.append(
        "pc AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_pairs "
        "FROM pairs GROUP BY a, b)"
    )
    ctes.append("tot AS (SELECT SUM(n_pairs) AS t FROM pc)")
    ctes.append("occ_tot AS (SELECT SUM(n) AS ot FROM occ)")
    return (
        f"WITH {BIPARTITE_EDGES_CTE.strip()},\n"
        + ",\n".join(ctes)
        + f"""
SELECT a, b, n_pairs,
       ROUND(log2((n_pairs * 1.0 / tot.t)
             / ((oa.n * 1.0 / occ_tot.ot) * (ob.n * 1.0 / occ_tot.ot))), 6)
           AS pmi
FROM pc
JOIN occ oa ON pc.a = oa.v
JOIN occ ob ON pc.b = ob.v
CROSS JOIN tot CROSS JOIN occ_tot
ORDER BY n_pairs DESC, a, b LIMIT {topn}
"""
    )

_BIGRAM_SQL = f"""
WITH {_TOKS_CTE.strip()},
big AS (
    SELECT doc_id, t[g.i] AS w1, t[g.i + 1] AS w2
    FROM toks CROSS JOIN UNNEST(range(1, len(t))) AS g(i)
),
bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM big GROUP BY 1, 2),
uc AS (
    SELECT u.tok AS w1, CAST(COUNT(*) AS BIGINT) AS c1
    FROM toks CROSS JOIN UNNEST(t) AS u(tok) GROUP BY 1
),
v AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM uc)
SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(AVG(-log2((bc.c2 + 1.0) / (uc.c1 + v.v))), 6) AS neg_log2_p
FROM big b
JOIN bc ON b.w1 = bc.w1 AND b.w2 = bc.w2
JOIN uc ON b.w1 = uc.w1
CROSS JOIN v
GROUP BY b.doc_id
"""

def _dsir_sql(buckets: int, target_pred: str) -> str:
    from pyspark_graph_spark.functions.hashing import md5_hash60_sql

    h = md5_hash60_sql("token")
    return rf"""
WITH {_TOKS_CTE.strip()},
tokb AS (
    SELECT tok.doc_id, ({h}) % {buckets} AS bucket, d.lang
    FROM (SELECT doc_id, unnest(t) AS token FROM toks) tok
    JOIN documents d USING (doc_id)
),
corpus AS (SELECT bucket, COUNT(*) AS c_raw FROM tokb GROUP BY bucket),
tgt AS (
    SELECT bucket, COUNT(*) AS c_tgt FROM tokb
    WHERE {target_pred} GROUP BY bucket
),
model AS (
    SELECT c.bucket, c.c_raw, COALESCE(t.c_tgt, 0) AS c_tgt
    FROM corpus c LEFT JOIN tgt t USING (bucket)
),
tot AS (SELECT SUM(c_raw) AS t_raw, SUM(c_tgt) AS t_tgt FROM model)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(AVG(log2(((c_tgt + 1) / (t_tgt + {buckets}))
                    / ((c_raw + 1) / (t_raw + {buckets})))), 6)
         AS dsir_weight
FROM tokb JOIN model USING (bucket) CROSS JOIN tot
GROUP BY doc_id
"""

@query(
    "text_stats",
    oracle=rf"""
WITH {_TOKS_CTE.strip()},
scored AS (
    SELECT d.doc_id,
           len(t) AS n_tokens,
           len(list_filter(t, x -> list_contains(['the','a','of','and','to'], x))) AS h_en,
           len(list_filter(t, x -> list_contains(['der','die','das','und','ist'], x))) AS h_de,
           len(list_filter(t, x -> list_contains(['le','la','les','et','est'], x))) AS h_fr,
           len(list_filter(t, x -> list_contains(['el','los','y','de','es'], x))) AS h_es,
           d.lang
    FROM documents d JOIN toks ON d.doc_id = toks.doc_id
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CASE WHEN h_en = 0 AND h_de = 0 AND h_fr = 0 AND h_es = 0 THEN 'und'
            WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es THEN 'en'
            WHEN h_de >= h_fr AND h_de >= h_es THEN 'de'
            WHEN h_fr >= h_es THEN 'fr'
            ELSE 'es' END AS lang_guess,
       lang
FROM scored
""",
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token count + heuristic language id next to the true lang."""
    from pyspark_graph_spark.functions.text import language_guess, token_count
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        language_guess(F.col("text")).alias("lang_guess"),
        "lang",
    )

@query(
    "doc_tokenize_fingerprint",
    oracle=r"""
WITH norm AS (
    SELECT doc_id,
           substr(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'),
                  1, 512) AS t,
           regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\s]') AS p
    FROM documents
)
SELECT doc_id,
       CAST(COALESCE(list_sum(list_transform(p,
            x -> CASE WHEN regexp_matches(x, '^[a-z]')
                      THEN CAST(ceil(length(x) / 4.0) AS BIGINT)
                      ELSE 1 END)), 0) AS BIGINT) AS n_subwords,
       list_min(list_transform(
           range(1, greatest(length(t) - 7, 1) + 1, 2),
           i -> md5(substr(t, CAST(i AS INT), 8)))) AS winnow_fp
FROM norm
""",
)
def q_doc_tokenize_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-pipeline text primitives: BPE-ish subword token counting (letter
    runs cost ceil(len/4), digits/symbols one each) and the winnowing
    rolling-hash fingerprint (min md5-60-bit hash over all 8-char windows
    of the normalized text). Both recomputed verbatim by the SQL oracle."""
    from pyspark_graph_spark.functions.text import (
        subword_token_count,
        winnow_fingerprints,
    )
    from pyspark_graph_spark.sources.tables import load_table

    # single-file parquet -> 1 split; spread before the per-char regex work
    docs = load_table(spark, sf_dir, "documents").repartition(
        _default_parallelism(spark)
    )
    counts = docs.select(
        "doc_id", subword_token_count(F.col("text")).alias("n_subwords")
    )
    return counts.join(winnow_fingerprints(docs), on="doc_id")

@query(
    "corpus_selection",
    oracle=rf"""
WITH {_TOKS_CTE.strip()},
quality AS (
    SELECT d.doc_id FROM documents d JOIN toks ON d.doc_id = toks.doc_id
    WHERE len(t) >= 20
),
fp AS (
    SELECT doc_id,
           md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS f
    FROM documents
),
exact_kept AS (
    SELECT doc_id FROM (
        SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY f ORDER BY doc_id) AS rn
        FROM fp
    ) WHERE rn = 1
),
shingles AS (
    SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
    FROM toks CROSS JOIN UNNEST(range(1, len(t)-1)) AS g(i)
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
near_pairs AS (
    SELECT a.doc_id AS src, b.doc_id AS dst
    FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id,
             (SELECT n FROM sizes WHERE doc_id = a.doc_id),
             (SELECT n FROM sizes WHERE doc_id = b.doc_id)
    HAVING COUNT(*) * 1.0 /
           ((SELECT n FROM sizes WHERE doc_id = a.doc_id)
            + (SELECT n FROM sizes WHERE doc_id = b.doc_id) - COUNT(*)) >= 0.5
),
near_dropped AS (SELECT DISTINCT dst AS doc_id FROM near_pairs)
SELECT q.doc_id FROM quality q
JOIN exact_kept e ON q.doc_id = e.doc_id
WHERE q.doc_id NOT IN (SELECT doc_id FROM near_dropped)
""",
)
def q_corpus_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north-star pipeline end-to-end: quality gate (>= 20 tokens) →
    exact dedup (md5 fingerprint, keep lowest id) → near-dedup (MinHash-LSH
    at jaccard 0.5, drop the higher id of each pair) → surviving doc ids.
    Composes text functions + ExactDedup + MinHashLSH in one plan."""
    from pyspark_graph_spark.dedup import ExactDedup, MinHashLSH
    from pyspark_graph_spark.functions.text import token_count
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    quality = docs.filter(token_count(F.col("text")) >= 20)
    exact_kept = ExactDedup().deduplicate(docs).select("doc_id")
    near_dropped = (
        MinHashLSH(n=3, threshold=0.5)
        .pairs(docs)
        .select(F.col("dst").alias("doc_id"))
        .distinct()
    )
    return (
        quality.select("doc_id")
        .join(exact_kept, on="doc_id", how="semi")
        .join(near_dropped, on="doc_id", how="anti")
    )

@query(
    "lang_confusion",
    oracle=rf"""
WITH {_TOKS_CTE.strip()},
scored AS (
    SELECT d.doc_id, d.lang,
           len(list_filter(t, x -> list_contains(['the','a','of','and','to'], x))) AS h_en,
           len(list_filter(t, x -> list_contains(['der','die','das','und','ist'], x))) AS h_de,
           len(list_filter(t, x -> list_contains(['le','la','les','et','est'], x))) AS h_fr,
           len(list_filter(t, x -> list_contains(['el','los','y','de','es'], x))) AS h_es
    FROM documents d JOIN toks ON d.doc_id = toks.doc_id
)
SELECT lang,
       CASE WHEN h_en = 0 AND h_de = 0 AND h_fr = 0 AND h_es = 0 THEN 'und'
            WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es THEN 'en'
            WHEN h_de >= h_fr AND h_de >= h_es THEN 'de'
            WHEN h_fr >= h_es THEN 'fr'
            ELSE 'es' END AS lang_guess,
       COUNT(*) AS n_docs
FROM scored GROUP BY 1, 2
""",
)
def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-id confusion matrix: actual lang × heuristic guess with
    counts — the quality readout for the cheap pre-filter."""
    from pyspark_graph_spark.functions.text import language_guess
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(
        "lang", language_guess(F.col("text")).alias("lang_guess")
    ).agg(F.count(F.lit(1)).alias("n_docs"))

@query(
    "tfidf_topk_terms",
    oracle=r"""
WITH toks AS (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\s+'),
                              t -> t <> '')) AS term
    FROM documents
),
tf AS (
    SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n FROM documents),
scored AS (
    SELECT tf.doc_id, tf.term, tf.tf,
           tf.tf * (ln((n.n + 1.0) / (dfreq.df + 1.0)) + 1.0) AS score
    FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n
),
ranked AS (
    SELECT doc_id, term, tf, score,
           ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY score DESC, term
           ) AS rk
    FROM scored
)
SELECT doc_id, term, tf, ROUND(score, 6) AS tfidf
FROM ranked WHERE rk <= 5
""",
)
def q_tfidf_topk_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 smooth-TF-IDF keyword terms per document (sklearn idf form:
    ln((N+1)/(df+1)) + 1). One (doc,term) shuffle for tf, one skinny
    shuffle for df, AQE-skew-safe tf⋈df join on term; ties broken by term
    so the cut is deterministic in both engines."""
    from pyspark_graph_spark.functions.tfidf import tfidf_topk
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return tfidf_topk(docs, k=5)

@query(
    "bm25_search",
    oracle=r"""
WITH toks AS (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\s+'),
                              t -> t <> '')) AS term
    FROM documents
),
tf AS (
    SELECT doc_id, term, COUNT(*) AS tf FROM toks
    WHERE term IN ('data', 'model', 'training', 'quality', 'language')
    GROUP BY doc_id, term
),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
doclen AS (
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                                t -> t <> '')) AS DOUBLE) AS dl
    FROM documents
),
stats AS (
    SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) AS n,
           (SELECT AVG(dl) FROM doclen) AS avgdl
),
scored AS (
    SELECT tf.doc_id,
           SUM(
             ln(1.0 + (s.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
             * tf.tf * 2.2
             / (tf.tf + 1.2 * (0.25 + 0.75 * doclen.dl / s.avgdl))
           ) AS score
    FROM tf
    JOIN dfreq ON tf.term = dfreq.term
    JOIN doclen ON tf.doc_id = doclen.doc_id
    CROSS JOIN stats s
    GROUP BY tf.doc_id
)
SELECT doc_id, ROUND(score, 6) AS bm25
FROM scored
ORDER BY ROUND(score, 6) DESC, doc_id
LIMIT 10
""",
)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 documents for a fixed bag-of-terms query
    (k1=1.2, b=0.75). The term IN (...) predicate prunes the exploded
    token stream before any join — the 100 TB story is posting-list
    retrieval, not corpus-wide scoring; df/doclen sides broadcast."""
    from pyspark_graph_spark.functions.tfidf import bm25_topk
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, _BM25_QUERY_TERMS, k=10)

@query(
    "repetition_pii",
    oracle=rf"""
WITH {_TOKS_CTE.strip()},
bigrams AS (
    SELECT doc_id,
           CASE WHEN len(t) >= 2 THEN len(t) - 1 ELSE 0 END AS total,
           CASE WHEN len(t) >= 2 THEN
             len(list_distinct(list_transform(range(1, len(t)),
                               i -> t[i] || ' ' || t[i+1])))
           ELSE 0 END AS n_distinct
    FROM toks
)
SELECT d.doc_id,
       ROUND(CASE WHEN b.total > 0
                  THEN (b.total - b.n_distinct) * 1.0 / b.total
                  ELSE 0.0 END, 6) AS dup_bigram_frac,
       CAST(len(regexp_extract_all(d.text,
            '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{{2,}}')) AS INT)
         AS n_emails,
       CAST(len(regexp_extract_all(d.text,
            '\b[0-9]{{3}}[-. ][0-9]{{3}}[-. ][0-9]{{4}}\b')) AS INT)
         AS n_phones,
       CAST(len(regexp_extract_all(d.text,
            '\b[0-9]{{1,3}}\.[0-9]{{1,3}}\.[0-9]{{1,3}}\.[0-9]{{1,3}}\b')) AS INT)
         AS n_ips,
       md5(regexp_replace(regexp_replace(regexp_replace(d.text,
            '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{{2,}}', '<EMAIL>', 'g'),
            '\b[0-9]{{3}}[-. ][0-9]{{3}}[-. ][0-9]{{4}}\b', '<PHONE>', 'g'),
            '\b[0-9]{{1,3}}\.[0-9]{{1,3}}\.[0-9]{{1,3}}\.[0-9]{{1,3}}\b', '<IP>', 'g'))
         AS redacted_fp
FROM documents d JOIN bigrams b ON d.doc_id = b.doc_id
""",
)
def q_repetition_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality + compliance column pass in one scan: Gopher-style duplicate
    bigram fraction (boilerplate/spam signal), PII match counts, and the
    md5 of the PII-redacted text (so the oracle verifies the actual
    redaction output, not just counts). All built-in expressions."""
    from pyspark_graph_spark.functions.text import (
        dup_ngram_fraction,
        pii_counts,
        redact_pii,
    )
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_emails, n_phones, n_ips = pii_counts(F.col("text"))
    return docs.select(
        "doc_id",
        F.round(dup_ngram_fraction(F.col("text"), 2), 6).alias(
            "dup_bigram_frac"
        ),
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        n_ips.alias("n_ips"),
        F.md5(redact_pii(F.col("text"))).alias("redacted_fp"),
    )

@query(
    "pmi_pairs",
    oracle=r"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS t
    FROM documents
),
pairs AS (
    SELECT least(t[i], t[i+1]) AS w1, greatest(t[i], t[i+1]) AS w2
    FROM toks CROSS JOIN UNNEST(range(1, len(t))) AS g(i)
),
pc AS (
    SELECT w1, w2, COUNT(*) AS n_pair FROM pairs GROUP BY w1, w2
    HAVING COUNT(*) >= 5
),
uni AS (
    SELECT u.w, COUNT(*) AS c
    FROM (SELECT unnest(t) AS w FROM toks) u GROUP BY u.w
),
tot AS (
    SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM pairs) AS n_pairs,
           (SELECT CAST(SUM(c) AS DOUBLE) FROM uni) AS n_uni
)
SELECT pc.w1, pc.w2, pc.n_pair,
       ROUND(ln((pc.n_pair / t.n_pairs)
              / ((u1.c / t.n_uni) * (u2.c / t.n_uni))), 6) AS pmi
FROM pc
JOIN uni u1 ON pc.w1 = u1.w
JOIN uni u2 ON pc.w2 = u2.w
CROSS JOIN tot t
""",
)
def q_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: PMI over adjacent-token pairs (canonical string
    order) seen >= 5 times — the count-based-embedding signal. Two
    explode->aggregate shuffles with map-side partials; the vocabulary
    side broadcasts into the scoring joins; min_count prunes before any
    join."""
    from pyspark_graph_spark.functions.cooccurrence import pmi_pairs
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return pmi_pairs(docs, min_count=5)

@query(
    "char_entropy",
    oracle=r"""
WITH chars AS (
    SELECT doc_id, unnest(list_filter(string_split(lower(text), ''),
                                      ch -> ch <> '')) AS ch
    FROM documents
),
counts AS (
    SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY doc_id, ch
),
per_doc AS (
    SELECT doc_id, SUM(c) AS n_chars, SUM(c * ln(c)) AS clogc
    FROM counts GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_chars, 0) AS BIGINT) AS n_chars,
       ROUND(COALESCE(ln(p.n_chars) - p.clogc / p.n_chars, 0.0), 6)
         AS entropy
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
""",
)
def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc character-distribution Shannon entropy (nats) — the cheap
    gibberish/boilerplate quality signal, computed as codegen aggregates
    (ln n - Σ c·ln c / n) over an exploded (doc, char) stream."""
    from pyspark_graph_spark.functions.cooccurrence import doc_char_entropy
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return doc_char_entropy(docs)

@query(
    "doc_chunks",
    oracle="""
WITH starts AS (
    SELECT doc_id, text,
           unnest(range(0,
               CAST(greatest(ceil((length(text) - 400) / 300.0), 0)
                    AS BIGINT) * 300 + 1,
               300)) AS chunk_start
    FROM documents WHERE length(text) > 0
),
subs AS (
    SELECT doc_id, chunk_start,
           substr(text, CAST(chunk_start + 1 AS INT), 400) AS sub
    FROM starts
)
SELECT doc_id,
       CAST(chunk_start // 300 AS BIGINT) AS chunk_id,
       CAST(chunk_start AS BIGINT) AS chunk_start,
       CAST(length(sub) AS BIGINT) AS chunk_len,
       md5(sub) AS chunk_md5
FROM subs
""",
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (400-char windows, stride 300):
    pure codegen explode, zero shuffles — the RAG/pretraining chunker."""
    from pyspark_graph_spark.functions.packing import chunk_documents
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, size=400, stride=300)

@query("unigram_scores", oracle=_UNIGRAM_ORACLE)
def q_unigram_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality scores: mean -log2 P(token) per document
    under the corpus's own add-one-smoothed unigram model. Term table ~
    vocabulary size (AQE broadcasts it); token stream never leaves the
    executors."""
    from pyspark_graph_spark.functions.lm import unigram_scores
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return unigram_scores(docs)

@query("bpe_merges", oracle=_bpe_sql(6))
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 6 BPE merges learned on the document corpus. After one
    corpus-wide word-count pass, every round runs on the vocabulary-sized
    frequency table: one explode+sum (map-side combined), a 1-row argmax
    broadcast, and a row-local greedy merge via literal string
    replacement — a primitive both engines share byte-for-byte, so the
    oracle replays the identical rounds."""
    from pyspark_graph_spark.functions.bpe import learn_bpe_merges
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return learn_bpe_merges(docs, n_merges=6)

@query("bpe_tokenize", oracle=_apply_bpe_sql(6))
def q_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the 6 learned BPE merges to the corpus and report per-doc
    word and subword counts. The merge list is planning-time metadata (a
    6-row collect of the learned tokenizer) compiled into a chain of
    literal replacements — row-local codegen, zero shuffles before the
    per-doc aggregate."""
    from pyspark_graph_spark.functions.bpe import apply_bpe, learn_bpe_merges
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    learned = sorted(
        ((r["step"], r["left"], r["right"])
         for r in learn_bpe_merges(docs, n_merges=6).collect())
    )
    merges = [(l, r) for _, l, r in learned]
    return apply_bpe(docs, merges)

def _walk_pmi_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full PMI-scored skip-gram pair table (a, b, n_pairs, pmi) over
    the deterministic walk corpus — shared by the walk_pmi gate readout
    and the netmf_embeddings factorization (queries/ann.py), which must
    see the identical trajectory the oracle replays. Round 12: the
    table is built once per (application, sf_dir) and persisted
    (_shared._shared_walk_pmi, bench family "walk_corpus") — the two
    consumers previously each reran the walk loop AND the positional
    pair self-join; the arithmetic is byte-moved, not changed."""
    from pyspark_graph_spark.queries._shared import _shared_walk_pmi

    return _shared_walk_pmi(spark, sf_dir)


@query("walk_pmi", oracle=_walk_pmi_sql(length=8, seed=42, window=2, topn=100))
def q_walk_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeepWalk preprocessing: skip-gram co-occurrence pairs (window 2)
    over the deterministic walk corpus, scored by PMI — the statistics a
    word2vec-style embedding trains on. Pair explosion is a bounded
    within-walk positional self-join (length x window fan-out per walk);
    counts are map-side combined; one exact division chain into log2,
    rounded. Top-100 by count for a stable gate surface."""
    scored = _walk_pmi_scored(spark, sf_dir)
    return scored.orderBy(F.desc("n_pairs"), "a", "b").limit(100)

@query(
    "gopher_quality",
    oracle=f"""
WITH {_TOKS_CTE.strip()},
m AS (
    SELECT doc_id,
           CAST(len(t) AS BIGINT) AS n_words,
           CAST(COALESCE(list_sum(list_transform(t, x -> len(x))), 0)
                AS BIGINT) AS chars,
           CAST(COALESCE(list_sum(list_transform(t,
                x -> CASE WHEN x LIKE '#%' OR position('...' in x) > 0
                          THEN 1 ELSE 0 END)), 0) AS BIGINT) AS sym,
           CAST(len(t) - len(list_filter(t,
                x -> regexp_matches(x, '^[^a-z]*$'))) AS BIGINT) AS alpha,
           CAST(len(list_filter(t, x -> list_contains(
                ['the','be','to','of','and','that','have','with'], x)))
                AS BIGINT) AS hits
    FROM toks
),
r AS (
    SELECT doc_id, n_words,
           CASE WHEN n_words > 0
                THEN ROUND(chars * 1.0 / n_words, 6) ELSE 0.0 END
             AS mean_word_len,
           CASE WHEN n_words > 0
                THEN ROUND(sym * 1.0 / n_words, 6) ELSE 0.0 END
             AS symbol_ratio,
           CASE WHEN n_words > 0
                THEN ROUND(alpha * 1.0 / n_words, 6) ELSE 0.0 END
             AS alpha_fraction,
           hits AS stopword_hits
    FROM m
)
SELECT *,
       (n_words >= 50 AND n_words <= 100000) AS r_word_count,
       (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS r_word_len,
       (symbol_ratio <= 0.1) AS r_symbol,
       (alpha_fraction >= 0.8) AS r_alpha,
       (stopword_hits >= 2) AS r_stopwords,
       ((n_words >= 50 AND n_words <= 100000)
        AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
        AND (symbol_ratio <= 0.1)
        AND (alpha_fraction >= 0.8)
        AND (stopword_hits >= 2)) AS keep
FROM r
""",
)
def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-based quality gate over the documents table: word
    count bounds, mean word length, symbol ratio, alphabetic fraction,
    stopword evidence — one UDF-free projection (functions/quality.py),
    every ratio a single division of exact integers."""
    from pyspark_graph_spark.functions.quality import gopher_rules
    from pyspark_graph_spark.sources.tables import load_table

    return gopher_rules(load_table(spark, sf_dir, "documents"))

@query(
    "vocab_coverage",
    oracle=f"""
WITH {_TOKS_CTE.strip()},
tf AS (
    SELECT u.term, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM toks CROSS JOIN UNNEST(t) AS u(term)
    GROUP BY u.term
),
ranked AS (
    SELECT term, cnt,
           ROW_NUMBER() OVER (ORDER BY cnt DESC, term ASC) AS rank
    FROM tf
),
tot AS (
    SELECT CAST(SUM(cnt) AS BIGINT) AS total,
           CAST(COUNT(*) AS BIGINT) AS vocab_size
    FROM ranked
)
SELECT CAST(ks.k AS BIGINT) AS k, tot.vocab_size,
       CAST(c.covered AS BIGINT) AS covered, tot.total,
       ROUND(c.covered * 1.0 / tot.total, 6) AS coverage
FROM (VALUES (10), (100), (1000)) ks(k)
CROSS JOIN tot
CROSS JOIN LATERAL (
    SELECT SUM(cnt) AS covered FROM ranked WHERE rank <= ks.k
) c
""",
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k vocabulary coverage curve (k = 10/100/1000): fraction of all
    token occurrences covered by the k most frequent terms — the
    tokenizer-vocab-sizing diagnostic.  One explode + one hash aggregate;
    the rank window runs over vocab-sized data only."""
    from pyspark_graph_spark.functions.quality import vocab_coverage
    from pyspark_graph_spark.sources.tables import load_table

    return vocab_coverage(
        load_table(spark, sf_dir, "documents"), [10, 100, 1000]
    )

@query("bigram_scores", oracle=_BIGRAM_SQL)
def q_bigram_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-trained bigram-LM perplexity scoring (CCNet-style quality
    filter without external weights): mean -log2 P(w2|w1) per doc under
    the corpus's own add-one-smoothed bigram model.  Two term aggregates
    + one hash join of the bigram stream; nothing corpus-sized broadcast
    (functions/lm.py)."""
    from pyspark_graph_spark.functions.lm import bigram_scores
    from pyspark_graph_spark.sources.tables import load_table

    return bigram_scores(load_table(spark, sf_dir, "documents"))

@query("dsir_weights", oracle=_dsir_sql(1024, "lang = 'en'"))
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023) of every document against
    the English subset as the target distribution: hashed-unigram bag-of-
    words likelihood ratio, add-one smoothed over 1024 feature buckets.
    Two bucket-count aggregations produce broadcast-sized models; the
    token stream itself is only aggregated, never joined wide."""
    from pyspark_graph_spark.functions.dsir import dsir_weights
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return dsir_weights(docs, target=F.col("lang") == "en", buckets=1024)

@query(
    "dataset_card",
    oracle=r"""
WITH d AS (
    SELECT source, lang, n_chars,
           len(regexp_split_to_array(trim(text), '\s+')) AS toks,
           md5(text) AS fp
    FROM documents
)
SELECT source, lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(toks) AS BIGINT) AS total_tokens,
       COUNT(DISTINCT fp) AS distinct_docs,
       ROUND(1.0 - CAST(COUNT(DISTINCT fp) AS DOUBLE) / COUNT(*), 6)
           AS dup_rate,
       ROUND(AVG(CAST(n_chars AS DOUBLE)), 6) AS mean_chars
FROM d
GROUP BY source, lang
""",
)
def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card rollup per (source, lang): doc / char / whitespace-
    token counts, exact-duplicate rate via md5 content fingerprints, and
    mean length — the summary block every training-data release ships.
    One hash aggregation keyed on the (source, lang) pair; the distinct-
    fingerprint count is a partial-aggregatable approx-free two-level
    agg. All counts integer-exact across engines."""
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "source",
        "lang",
        "n_chars",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("toks"),
        F.md5(F.col("text")).alias("fp"),
    )
    return d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("toks").cast("long").alias("total_tokens"),
        F.countDistinct("fp").alias("distinct_docs"),
        F.round(
            F.lit(1.0) - F.countDistinct("fp") / F.count(F.lit(1)), 6
        ).alias("dup_rate"),
        F.round(F.avg(F.col("n_chars").cast("double")), 6).alias(
            "mean_chars"
        ),
    )

@query(
    "ctfidf_topics",
    oracle=r"""
WITH toks AS (
    SELECT source,
           unnest(list_filter(string_split_regex(lower(text), '\s+'),
                              t -> t <> '')) AS term
    FROM documents
),
tf AS (
    SELECT source, term, COUNT(*) AS tf FROM toks GROUP BY source, term
),
cdf AS (SELECT term, COUNT(*) AS cdf FROM tf GROUP BY term),
c AS (SELECT COUNT(DISTINCT source) AS c FROM documents),
scored AS (
    SELECT tf.source, tf.term, tf.tf,
           tf.tf * (ln((c.c + 1.0) / (cdf.cdf + 1.0)) + 1.0) AS score
    FROM tf JOIN cdf ON tf.term = cdf.term CROSS JOIN c
),
ranked AS (
    SELECT source, term, tf, score,
           ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY score DESC, term
           ) AS rk
    FROM scored
)
SELECT source, term, tf, ROUND(score, 6) AS ctfidf, CAST(rk AS INT) AS rk
FROM ranked WHERE rk <= 5
""",
)
def q_ctfidf_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-based TF-IDF (the BERTopic trick): pool every source's docs
    into one super-document, score terms by in-class frequency × idf over
    CLASSES, and keep the top-5 most *distinctive* terms per source — the
    topic-labeling stage of a clustering pipeline, runnable against any
    class column (swap source for a k-means cluster id). Two skinny
    aggregations + one term join + a per-class rank whose state is the
    class vocabulary, never the corpus."""
    from pyspark_graph_spark.sources.tables import load_table
    from pyspark_graph_spark.functions.text import tokens as tok_fn

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(tok_fn(F.col("text"))).alias("term")
    )
    tf = toks.groupBy("source", "term").agg(F.count(F.lit(1)).alias("tf"))
    cdf = tf.groupBy("term").agg(F.count(F.lit(1)).alias("cdf"))
    c = docs.agg(F.countDistinct("source").alias("c"))
    scored = (
        tf.join(cdf, on="term")
        .crossJoin(F.broadcast(c))
        .select(
            "source",
            "term",
            "tf",
            (
                F.col("tf")
                * (
                    F.log((F.col("c") + 1.0) / (F.col("cdf") + 1.0))
                    + 1.0
                )
            ).alias("score"),
        )
    )
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(F.desc("score"), F.asc("term"))
    )
    return (
        scored.withColumn("rk", rk)
        .filter(F.col("rk") <= 5)
        .select(
            "source",
            "term",
            "tf",
            F.round("score", 6).alias("ctfidf"),
            F.col("rk").cast("int").alias("rk"),
        )
    )

@query(
    "tfidf_cosine_pairs",
    oracle=r"""
WITH toks AS (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\s+'),
                              t -> t <> '')) AS term
    FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n FROM documents),
w AS (
    SELECT tf.doc_id, tf.term,
           tf.tf * (ln((n.n + 1.0) / (dfq.df + 1.0)) + 1.0) AS w
    FROM tf JOIN dfq USING (term) CROSS JOIN n
    WHERE dfq.df <= n.n * 0.2 AND dfq.df <= 1000
),
nrm AS (SELECT doc_id, sqrt(SUM(w * w)) AS nn FROM w GROUP BY doc_id),
dots AS (
    SELECT a.doc_id AS a, b.doc_id AS b, SUM(a.w * b.w) AS dot
    FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT dots.a, dots.b,
       ROUND(dot / (na.nn * nb.nn), 6) AS cosine
FROM dots
JOIN nrm na ON na.doc_id = dots.a
JOIN nrm nb ON nb.doc_id = dots.b
WHERE ROUND(dot / (na.nn * nb.nn), 6) >= 0.9
""",
)
def q_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse-vector similarity join: TF-IDF cosine >= 0.9 doc pairs via
    the inverted term index — dot products accumulate only over SHARED
    terms (term-keyed join + pair-keyed agg), norms join at the end,
    and terms in >20% of the corpus or >1000 docs are dropped from the
    vectors (the two-sided stop-word contract — the absolute cap is what
    bounds the posting-list join at any corpus size). The
    sparse counterpart of dedup_embedding's dense cosine; no vectors
    ever materialize."""
    from pyspark_graph_spark.functions.tfidf import tfidf_cosine_pairs
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").repartition(
        _default_parallelism(spark)
    )
    return tfidf_cosine_pairs(docs, threshold=0.9)

@query(
    "tokenizer_fertility",
    oracle=r"""
WITH t AS (
    SELECT lang,
           len(list_filter(string_split_regex(lower(text), '\s+'),
                           x -> x <> '')) AS words,
           COALESCE(list_sum(list_transform(
               regexp_extract_all(lower(text),
                                  '[a-z]+|[0-9]|[^a-z0-9\s]'),
               x -> CASE WHEN regexp_matches(x, '^[a-z]')
                         THEN CAST(ceil(length(x) / 4.0) AS BIGINT)
                         ELSE 1 END)), 0) AS subwords
    FROM documents
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(words) AS BIGINT) AS total_words,
       CAST(SUM(subwords) AS BIGINT) AS total_subwords,
       ROUND(CAST(SUM(subwords) AS DOUBLE) / SUM(words), 4)
           AS fertility
FROM t WHERE words > 0 GROUP BY lang
""",
)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: subword-pieces-per-word (the
    standard tokenizer-quality metric — fertility far above ~1.3 for a
    language means its text is being shredded and will train poorly).
    Uses the same BPE-ish subword cost model as doc_tokenize_fingerprint;
    one aggregation keyed on lang."""
    from pyspark_graph_spark.functions.text import (
        subword_token_count,
        token_count,
    )
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "lang",
        token_count(F.col("text")).alias("words"),
        subword_token_count(F.col("text")).alias("subwords"),
    ).filter(F.col("words") > 0)
    return t.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("words").alias("total_words"),
        F.sum("subwords").alias("total_subwords"),
        F.round(
            F.sum("subwords").cast("double") / F.sum("words"), 4
        ).alias("fertility"),
    )

# ---------------------------------------------------------------------------
# Round 4 — corpus quality / novelty / entity resolution
# ---------------------------------------------------------------------------
@query(
    "ngram_novelty",
    oracle=rf"""
WITH {_TOKS_CTE.strip()},
sg AS (
    SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g3
    FROM toks CROSS JOIN UNNEST(range(1, len(t)-1)) AS g(i)
),
dfq AS (SELECT g3, CAST(COUNT(*) AS BIGINT) AS df FROM sg GROUP BY g3)
SELECT sg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
       ROUND(SUM(CASE WHEN dfq.df = 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*),
             6) AS novelty
FROM sg JOIN dfq USING (g3)
GROUP BY sg.doc_id
""",
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 3-gram novelty: the fraction of a doc's distinct word
    3-grams that occur in no other document — high novelty = unique
    content, low = boilerplate (the inverse signal of near-dup). One
    explode + two hash aggregations + one shingle-keyed join; document
    frequency is computed corpus-wide with map-side combine, never a
    pairwise comparison."""
    from pyspark_graph_spark.functions.text import word_shingles
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    sg = docs.select(
        "doc_id", F.explode(word_shingles(F.col("text"), 3)).alias("g3")
    )
    dfq = sg.groupBy("g3").agg(F.count(F.lit(1)).alias("df"))
    return (
        sg.join(dfq, on="g3")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.round(
                F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
                / F.count(F.lit(1)),
                6,
            ).alias("novelty"),
        )
    )

@query(
    "quality_blend",
    oracle=rf"""
WITH {_TOKS_CTE.strip()},
sig AS (
    SELECT doc_id,
           CAST(len(t) AS BIGINT) AS n_words,
           CASE WHEN len(t) > 0
                THEN COALESCE(list_sum(list_transform(t, x -> len(x))), 0)
                     * 1.0 / len(t) ELSE 0.0 END AS mwl,
           CASE WHEN len(t) > 0
                THEN len(list_distinct(t)) * 1.0 / len(t)
                ELSE 0.0 END AS uniq_ratio
    FROM toks
),
st AS (
    SELECT AVG(n_words) AS m1, stddev_pop(n_words) AS s1,
           AVG(mwl) AS m2, stddev_pop(mwl) AS s2,
           AVG(uniq_ratio) AS m3, stddev_pop(uniq_ratio) AS s3
    FROM sig
)
SELECT doc_id, n_words,
       ROUND((CASE WHEN s1 > 0 THEN (n_words - m1) / s1 ELSE 0 END
            + CASE WHEN s2 > 0 THEN (mwl - m2) / s2 ELSE 0 END
            + CASE WHEN s3 > 0 THEN (uniq_ratio - m3) / s3 ELSE 0 END)
             / 3, 4) AS blend_z
FROM sig CROSS JOIN st
""",
)
def q_quality_blend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score: mean z-score of word count, mean word
    length, and unique-token ratio — the rank-free way to blend
    heterogeneous quality signals at scale (no global sort / single-
    partition percentile window; corpus stats are ONE broadcast singleton
    row). Rounded to 4 like anomaly_zscore so IEEE summation-order noise
    cannot flip a value."""
    from pyspark_graph_spark.functions.text import tokens
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    nw = F.size(t)
    chars = F.coalesce(
        F.aggregate(
            F.transform(t, lambda x: F.length(x)),
            F.lit(0),
            lambda acc, x: acc + x,
        ),
        F.lit(0),
    )
    sig = docs.select(
        "doc_id",
        nw.cast("long").alias("n_words"),
        F.when(nw > 0, chars / nw).otherwise(F.lit(0.0)).alias("mwl"),
        F.when(nw > 0, F.size(F.array_distinct(t)) / nw)
        .otherwise(F.lit(0.0))
        .alias("uniq_ratio"),
    )
    st = sig.agg(
        F.avg("n_words").alias("m1"),
        F.stddev_pop("n_words").alias("s1"),
        F.avg("mwl").alias("m2"),
        F.stddev_pop("mwl").alias("s2"),
        F.avg("uniq_ratio").alias("m3"),
        F.stddev_pop("uniq_ratio").alias("s3"),
    )
    z = lambda x, m, s: F.when(
        F.col(s) > 0, (F.col(x) - F.col(m)) / F.col(s)
    ).otherwise(F.lit(0.0))
    return sig.crossJoin(F.broadcast(st)).select(
        "doc_id",
        "n_words",
        F.round(
            (
                z("n_words", "m1", "s1")
                + z("mwl", "m2", "s2")
                + z("uniq_ratio", "m3", "s3")
            )
            / 3,
            4,
        ).alias("blend_z"),
    )

@query(
    "ppl_filter_calibration",
    oracle=f"""
WITH scores AS MATERIALIZED (SELECT * FROM ({_BIGRAM_SQL})),
thr AS (SELECT quantile_cont(neg_log2_p, 0.75) AS t FROM scores)
SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN s.neg_log2_p <= thr.t THEN 1 ELSE 0 END)
            AS BIGINT) AS n_keep,
       ROUND(SUM(CASE WHEN s.neg_log2_p <= thr.t THEN 1 ELSE 0 END)
             * 1.0 / COUNT(*), 6) AS keep_rate
FROM scores s
JOIN documents d USING (doc_id)
CROSS JOIN thr
GROUP BY d.lang
""",
)
def q_ppl_filter_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-filter calibration: set the cutoff at the corpus p75 of
    the self-trained bigram score, then report per-language keep rates —
    the audit that catches a 'quality' filter silently deleting a
    language (CCNet's known failure mode). Threshold is one broadcast
    singleton; everything else reuses the bigram-score plan."""
    from pyspark_graph_spark.functions.lm import bigram_scores
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    scores = bigram_scores(docs)
    thr = scores.agg(
        F.percentile("neg_log2_p", F.lit(0.75)).alias("t")
    )
    keep = F.when(F.col("neg_log2_p") <= F.col("t"), 1).otherwise(0)
    return (
        scores.join(docs.select("doc_id", "lang"), on="doc_id")
        .crossJoin(F.broadcast(thr))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(keep).cast("long").alias("n_keep"),
            F.round(F.sum(keep) / F.count(F.lit(1)), 6).alias(
                "keep_rate"
            ),
        )
    )

@query(
    "boilerplate_chunks",
    oracle="""
WITH w AS (
    SELECT doc_id, string_split(text, ' ') AS ws
    FROM documents
),
ch AS (
    SELECT doc_id, i AS cid,
           array_to_string(ws[i*3+1 : i*3+3], ' ') AS chunk
    FROM w, UNNEST(range(0, CAST(ceil(len(ws)/3.0) AS BIGINT))) AS t(i)
),
f AS (SELECT chunk, COUNT(DISTINCT doc_id) AS nd FROM ch GROUP BY chunk)
SELECT ch.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(CASE WHEN f.nd >= 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_boilerplate,
       ROUND(SUM(CASE WHEN f.nd >= 5 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
         AS boilerplate_ratio
FROM ch JOIN f USING (chunk)
GROUP BY ch.doc_id
""",
)
def q_boilerplate_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/CCNet-style boilerplate detection: disjoint 3-token chunks
    ("lines" for a corpus without newlines) that recur in >= 5 distinct
    documents are boilerplate; each doc reports its chunk count and
    boilerplate ratio — the pre-training cleanup signal that strips
    navigation text, license headers and templated spam. Plan: one
    explode -> chunk slice (codegen'd `slice`/`array_join`, no Python),
    one distinct-count aggregate keyed by chunk, one join back. At
    corpus scale, key the frequency aggregate by xxhash64(chunk) so
    shuffle rows are 8 bytes, and broadcast the (tiny) >=threshold
    boilerplate set instead of joining the full frequency table — kept
    string-keyed here so the oracle comparison is exact."""
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    chunks = (
        docs.select("doc_id", F.split(F.col("text"), " ").alias("ws"))
        .select(
            "doc_id",
            F.explode(
                # guard: sequence(0, -1) DESCENDS in Spark, so an empty
                # token array must map to zero chunks explicitly (the
                # oracle's range(0, 0) is empty)
                F.expr(
                    "case when size(ws) = 0 then array() else "
                    "transform(sequence(0, int(ceil(size(ws)/3.0)) - 1), "
                    "i -> array_join(slice(ws, i*3+1, 3), ' ')) end"
                )
            ).alias("chunk"),
        )
    )
    freq = chunks.groupBy("chunk").agg(
        F.countDistinct("doc_id").alias("nd")
    )
    return (
        chunks.join(freq, "chunk")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum((F.col("nd") >= 5).cast("long")).alias("n_boilerplate"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_boilerplate",
            F.round(F.col("n_boilerplate") / F.col("n_chunks"), 6).alias(
                "boilerplate_ratio"
            ),
        )
    )

# ---------------------------------------------------------------------------
# Round 5 (cont.): corpus statistics — Heaps' law and Zipf fit
# ---------------------------------------------------------------------------
@query(
    "heaps_law",
    oracle="""
WITH r AS (
    SELECT doc_id, text,
           ROW_NUMBER() OVER (ORDER BY doc_id) AS rk
    FROM documents
),
n AS (SELECT COUNT(*) AS n FROM documents),
d AS (
    SELECT doc_id, text,
           1 + CAST(((rk - 1) * 10) // n.n AS INT) AS b
    FROM r CROSS JOIN n
),
tk AS (
    SELECT b, tok
    FROM (SELECT b, UNNEST(string_split(text, ' ')) AS tok FROM d)
    WHERE tok <> ''
),
occ AS (SELECT b, COUNT(*) AS nt FROM tk GROUP BY b),
nv AS (
    SELECT fb AS b, COUNT(*) AS v
    FROM (SELECT tok, MIN(b) AS fb FROM tk GROUP BY tok)
    GROUP BY fb
)
SELECT o.b AS bucket,
       CAST(SUM(o.nt) OVER (ORDER BY o.b) AS BIGINT) AS cum_tokens,
       CAST(SUM(COALESCE(nv.v, 0)) OVER (ORDER BY o.b) AS BIGINT)
         AS vocab_size
FROM occ o LEFT JOIN nv ON o.b = nv.b
""",
)
def q_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth curve: docs in doc_id order are cut
    into 10 equal prefixes; per prefix, cumulative token occurrences vs
    cumulative distinct vocabulary (a token counts for the first bucket
    it appears in). The global doc rank comes from the distributed
    per-bucket-offsets rank (dedup/blocking.py _global_rank — no
    single-partition sort of the corpus); each token is shuffled once
    for the min-first-bucket aggregate; the only unpartitioned windows
    run on the 10-row bucket table."""
    from pyspark_graph_spark.dedup.blocking import _global_rank
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.agg(F.count(F.lit(1)).alias("__n"))
    rank = _global_rank(
        docs,
        F.lpad(F.col("doc_id").cast("string"), 12, "0"),
        "doc_id",
        bucket_chars=9,
    )
    bucketed = (
        docs.join(rank, docs.doc_id == rank.id)
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "text",
            (
                F.lit(1)
                + F.expr("((__r - 1) * 10) div __n").cast("int")
            ).alias("b"),
        )
    )
    tk = bucketed.select(
        "b", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    occ = tk.groupBy("b").agg(F.count(F.lit(1)).alias("nt"))
    nv = (
        tk.groupBy("tok")
        .agg(F.min("b").alias("fb"))
        .groupBy(F.col("fb").alias("__b"))
        .agg(F.count(F.lit(1)).alias("v"))
    )
    cum = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        occ.join(nv, occ.b == nv["__b"], "left")
        .select("b", "nt", F.coalesce("v", F.lit(0)).alias("v"))
        .select(
            F.col("b").alias("bucket"),
            F.sum("nt").over(cum).cast("long").alias("cum_tokens"),
            F.sum("v").over(cum).cast("long").alias("vocab_size"),
        )
    )

@query(
    "token_zipf_fit",
    oracle="""
WITH tk AS (
    SELECT tok
    FROM (SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents)
    WHERE tok <> ''
),
freq AS (SELECT tok, COUNT(*) AS f FROM tk GROUP BY tok),
top AS (
    SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, tok ASC) AS r
    FROM freq ORDER BY f DESC, tok ASC LIMIT 500
),
pts AS (SELECT LN(CAST(r AS DOUBLE)) AS x, LN(CAST(f AS DOUBLE)) AS y
        FROM top)
SELECT CAST(COUNT(*) AS BIGINT) AS n_ranks,
       ROUND((COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))
             / (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)), 6) AS slope,
       ROUND((SUM(y) - ((COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))
                        / (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)))
                       * SUM(x)) / COUNT(*), 6) AS intercept
FROM pts
""",
)
def q_token_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: OLS slope/intercept of
    ln(frequency) against ln(rank) for the top-500 tokens (rank ties
    broken by token for determinism). The frequency aggregate is the
    only corpus-sized shuffle; the rank window runs on the 500-row
    top slice after a global limit. A healthy natural-language corpus
    fits slope near -1 — a far-off slope is a corpus-quality smell
    (templated or synthetic text)."""
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    top = freq.orderBy(F.desc("f"), F.asc("tok")).limit(500)
    pts = top.select(
        "f",
        F.row_number()
        .over(Window.orderBy(F.desc("f"), F.asc("tok")))
        .alias("r"),
    ).select(
        F.log(F.col("r").cast("double")).alias("x"),
        F.log(F.col("f").cast("double")).alias("y"),
    )
    agg = pts.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return agg.select(
        F.col("n").cast("long").alias("n_ranks"),
        F.round(slope, 6).alias("slope"),
        F.round(
            (F.col("sy") - slope * F.col("sx")) / F.col("n"), 6
        ).alias("intercept"),
    )
