"""Driver-contract queries for the corpus-curation operators
(operators/curation.py, similarity.random_projection): benchmark
decontamination, repetition filters, TF-IDF, BM25, PII scanning, and
JL random projection. Every probe here carries a DuckDB oracle — the
md5-based gram/sign derivations were chosen precisely so both engines
reproduce them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biodwh2_arcadedb_server_spark.operators import curation
from biodwh2_arcadedb_server_spark.operators.similarity import (
    random_projection,
    srp_sign_matrix,
)
from biodwh2_arcadedb_server_spark.sources.registry import load_table

DECON_K = 3
DECON_THRESHOLD = 0.5
BM25_TERMS = ["spark", "join", "window"]
SRP_OUT_DIM = 8
SRP_IN_DIM = 64

_TOKS = r"""
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
    FROM documents
"""


# --- decontamination (train = doc_id%10 < 8, eval = the rest) --------------------
def q91_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-decontamination audit: contamination fraction of each
    held-out doc's 3-grams against the train split's gram universe."""
    d = load_table(spark, sf_dir, "documents")
    train = d.where(F.col("doc_id") % 10 < 8)
    eval_df = d.where(F.col("doc_id") % 10 >= 8)
    return curation.decontaminate(
        train, eval_df, k=DECON_K, threshold=DECON_THRESHOLD
    )


# --- repetition stats ------------------------------------------------------------
def q92_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals over word 2-grams (zero-shuffle
    per-doc higher-order folds)."""
    d = load_table(spark, sf_dir, "documents")
    return curation.repetition_stats(d, k=2)


# --- TF-IDF ----------------------------------------------------------------------
def q93_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return curation.tfidf_top_terms(d, top_n=3)


# --- BM25 ------------------------------------------------------------------------
def q94_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return curation.bm25_search(d, BM25_TERMS, limit=10)


# --- PII scan --------------------------------------------------------------------
def _inject_pii(d: DataFrame) -> DataFrame:
    """Deterministic synthetic PII appended per doc (the generated
    corpus contains none) so the regex battery is exercised end-to-end
    with nonzero counts; the oracle performs the identical injection."""
    did = F.col("doc_id").cast("string")
    return d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), did, F.lit("@example.com via http://ex.io/"),
            did, F.lit(" tel 555-0199 host 10.0.0."), (F.col("doc_id") % 255).cast("string"),
        ).alias("text"),
    )


def q95_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    out = curation.pii_scan(_inject_pii(d))
    return out.select(
        "doc_id", "n_email", "n_phone", "n_url", "n_ipv4",
        F.md5("redacted").alias("redacted_md5"),
    )


# --- JL random projection --------------------------------------------------------
def q96_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return random_projection(e, out_dim=SRP_OUT_DIM, in_dim=SRP_IN_DIM)


# --- bigram LM quality scoring ----------------------------------------------------
def q98_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM filter: score each document by the average
    smoothed bigram log-probability under a model trained on the
    corpus itself."""
    d = load_table(spark, sf_dir, "documents")
    return curation.bigram_lm_score(d, k=0.5)


SOURCE_CAP = 10


def q99_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain balancing: rank documents within each source and cap
    contributions at SOURCE_CAP."""
    d = load_table(spark, sf_dir, "documents")
    return curation.source_cap(d, cap=SOURCE_CAP)


SEG_LEN = 2
SEG_MAX_DOCS = 50
CHUNK = 64
STRIDE = 48


def q109_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-segment removal (CCNet/RefinedWeb line
    dedup adapted to token streams): 2-token segments occurring in
    >= 50 distinct docs are boilerplate; audit row per doc with the
    md5 of the cleaned token stream."""
    d = load_table(spark, sf_dir, "documents")
    return curation.remove_common_segments(d, seg_len=SEG_LEN, max_docs=SEG_MAX_DOCS)


def q110_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (64-token windows, stride 48) — the
    context-length packer's upstream stage."""
    d = load_table(spark, sf_dir, "documents")
    return curation.chunk_documents(d, chunk=CHUNK, stride=STRIDE)


def q168_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition-rule composite (Rae et al. 2021 §A1.1, round
    8): per-document duplicate-LINE fraction (absent from q92's
    k-gram stats), duplicate-word and duplicate-bigram fractions, and
    the paper-threshold pass/fail flag (dup lines > 0.30 or dup
    2-grams > 0.18 → excluded from training). Zero-shuffle JVM
    higher-order folds over the documents scan — the flag is a
    pushable predicate when used as a filter."""
    from biodwh2_arcadedb_server_spark.operators import text as text_ops

    d = load_table(spark, sf_dir, "documents")
    return text_ops.repetition_metrics(d)


def q169_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation funnel (round 8): language → length →
    Gopher repetition → exact dedup → source cap, reported as the
    per-stage audit table (stage, surviving docs, surviving sources)
    every curation run publishes before training. Composes the
    tested operators (text.repetition_metrics, md5 keeper, window
    cap) into ONE chain — the probe proves the stages compose, not
    just that each works alone."""
    d = load_table(spark, sf_dir, "documents")
    return curation.curation_funnel(d)


MIX_WEIGHTS = {f"src{i}": (2.0 if i % 2 == 0 else 1.0) for i in range(20)}


def q170_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture resampling (round 8): downsample sources to hit
    target 2:1 even/odd proportions — T = min(n_s/w_s), each source
    keeps its floor(w_s*T) lowest-md5 docs (deterministic, engine-
    reproducible). One window shuffle on source; targets broadcast."""
    d = load_table(spark, sf_dir, "documents")
    return curation.domain_mixture_sample(d, MIX_WEIGHTS)


QUERIES = {
    "q91_decontamination": q91_decontamination,
    "q168_gopher_repetition": q168_gopher_repetition,
    "q169_curation_funnel": q169_curation_funnel,
    "q170_domain_mixture": q170_domain_mixture,
    "q92_repetition_stats": q92_repetition_stats,
    "q93_tfidf_topterms": q93_tfidf_topterms,
    "q94_bm25_search": q94_bm25_search,
    "q95_pii_scan": q95_pii_scan,
    "q96_random_projection": q96_random_projection,
    "q98_bigram_lm_score": q98_bigram_lm_score,
    "q99_source_cap": q99_source_cap,
    "q109_boilerplate_removal": q109_boilerplate_removal,
    "q110_chunking": q110_chunking,
}

_GRAMS3 = f"""
    SELECT doc_id,
           list_distinct(list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS g
    FROM ({_TOKS})
"""

ORACLE = {
    "q170_domain_mixture": """
        -- wt cast to DOUBLE so n/wt and wt*T use IEEE double like
        -- Spark; DuckDB's DECIMAL inference would floor() differently
        -- at representation boundaries (round-8 review finding)
        WITH w0(source, wt0) AS (VALUES ('src0', 2.0), ('src1', 1.0), ('src2', 2.0), ('src3', 1.0), ('src4', 2.0), ('src5', 1.0), ('src6', 2.0), ('src7', 1.0), ('src8', 2.0), ('src9', 1.0), ('src10', 2.0), ('src11', 1.0), ('src12', 2.0), ('src13', 1.0), ('src14', 2.0), ('src15', 1.0), ('src16', 2.0), ('src17', 1.0), ('src18', 2.0), ('src19', 1.0)),
        w AS (SELECT source, CAST(wt0 AS DOUBLE) AS wt FROM w0),
        c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
        t AS (SELECT min(n / wt) AS T FROM c JOIN w USING (source)),
        tgt AS (
            SELECT c.source, floor(wt * T) AS tgt
            FROM c JOIN w USING (source) CROSS JOIN t
        ),
        r AS (
            SELECT doc_id, source, row_number() OVER (
                PARTITION BY source
                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
            FROM documents
        )
        SELECT doc_id, source FROM r JOIN tgt USING (source)
        WHERE rk <= tgt
    """,
    "q169_curation_funnel": """
        WITH s1 AS (
            SELECT * FROM documents WHERE lang = 'en'
        ), s2 AS (
            SELECT * FROM s1 WHERE n_chars BETWEEN 100 AND 20000
        ), rep AS (
            SELECT doc_id,
                   string_split(text, chr(10)) AS lines,
                   string_split_regex(lower(trim(text)), '\\s+') AS words
            FROM s2
        ), repm AS (
            SELECT doc_id,
                   CASE WHEN len(lines) > 1
                        THEN 1.0 - len(list_distinct(lines)) / len(lines)
                        ELSE 0.0 END AS dlf,
                   CASE WHEN len(words) >= 2 THEN (
                       SELECT CASE WHEN len(b) > 1
                                   THEN 1.0 - len(list_distinct(b)) / len(b)
                                   ELSE 0.0 END
                       FROM (SELECT list_transform(range(1, len(words)),
                                  i -> words[i] || ' ' || words[i+1]) AS b)
                   ) ELSE 0.0 END AS dbf
            FROM rep
        ), s3 AS (
            SELECT s2.* FROM s2 JOIN repm USING (doc_id)
            WHERE repm.dlf <= 0.30 AND repm.dbf <= 0.18
        ), keeper AS (
            SELECT min(doc_id) AS doc_id FROM s3 GROUP BY md5(text)
        ), s4 AS (
            SELECT s3.* FROM s3 SEMI JOIN keeper USING (doc_id)
        ), s5 AS (
            SELECT * FROM (
                SELECT s4.*, row_number() OVER (
                    PARTITION BY source ORDER BY doc_id) AS rk
                FROM s4
            ) WHERE rk <= 8
        )
        SELECT '0_ingested' AS stage, count(*) AS n_docs,
               count(DISTINCT source) AS n_sources FROM documents
        UNION ALL SELECT '1_lang', count(*), count(DISTINCT source) FROM s1
        UNION ALL SELECT '2_length', count(*), count(DISTINCT source) FROM s2
        UNION ALL SELECT '3_repetition', count(*), count(DISTINCT source) FROM s3
        UNION ALL SELECT '4_exact_dedup', count(*), count(DISTINCT source) FROM s4
        UNION ALL SELECT '5_source_cap', count(*), count(DISTINCT source) FROM s5
        ORDER BY stage
    """,
    "q168_gopher_repetition": """
        WITH w AS (
            SELECT doc_id,
                   string_split(text, chr(10)) AS lines,
                   string_split_regex(lower(trim(text)), '\\s+') AS words
            FROM documents
        ), b AS (
            SELECT doc_id, lines, words,
                   CASE WHEN len(words) >= 2 THEN
                       list_transform(range(1, len(words)),
                                      i -> words[i] || ' ' || words[i+1])
                   ELSE []::VARCHAR[] END AS bigrams
            FROM w
        ), m AS (
            SELECT doc_id,
                   len(lines) AS n_lines,
                   CASE WHEN len(lines) > 1
                        THEN 1.0 - len(list_distinct(lines)) / len(lines)
                        ELSE 0.0 END AS dup_line_frac,
                   CASE WHEN len(words) > 1
                        THEN 1.0 - len(list_distinct(words)) / len(words)
                        ELSE 0.0 END AS dup_word_frac,
                   CASE WHEN len(bigrams) > 1
                        THEN 1.0 - len(list_distinct(bigrams)) / len(bigrams)
                        ELSE 0.0 END AS dup_bigram_frac
            FROM b
        )
        SELECT doc_id, n_lines, dup_line_frac, dup_word_frac,
               dup_bigram_frac,
               (dup_line_frac > 0.30 OR dup_bigram_frac > 0.18)
                   AS repetitious
        FROM m
    """,
    "q91_decontamination": f"""
        -- distinct over gram HASHES, not gram strings — the exact
        -- mirror of the Spark side's hash-inside-transform plan
        WITH gh_lists AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
                           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]),
                       x -> ('0x' || substr(md5(x), 1, 8))::BIGINT)) AS gh
            FROM ({_TOKS})
        ),
        train_g AS (
            SELECT DISTINCT g AS gh
            FROM (SELECT UNNEST(gh) AS g FROM gh_lists WHERE doc_id % 10 < 8)
        ),
        eval_g AS (
            SELECT doc_id, UNNEST(gh) AS gh FROM gh_lists WHERE doc_id % 10 >= 8
        ),
        per_doc AS (
            SELECT e.doc_id,
                   COUNT(*) AS n_grams,
                   CAST(SUM(CASE WHEN t.gh IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_matched
            FROM eval_g e LEFT JOIN train_g t ON e.gh = t.gh
            GROUP BY e.doc_id
        ),
        -- audit completeness: eval docs shorter than k tokens have no
        -- grams but must still appear with n_grams=0 (mirror of the
        -- Spark-side left join)
        filled AS (
            SELECT d.doc_id,
                   COALESCE(p.n_grams, 0) AS n_grams,
                   COALESCE(p.n_matched, 0) AS n_matched
            FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id % 10 >= 8) d
            LEFT JOIN per_doc p ON p.doc_id = d.doc_id
        )
        SELECT doc_id, n_grams, n_matched,
               ROUND(n_matched * 1.0 / greatest(n_grams, 1), 4) AS contamination,
               n_matched * 1.0 / greatest(n_grams, 1) >= {DECON_THRESHOLD} AS contaminated
        FROM filled
    """,
    "q92_repetition_stats": f"""
        WITH g AS (
            SELECT doc_id,
                   list_transform(generate_series(1, greatest(len(toks) - 1, 0)),
                       i -> toks[i] || ' ' || toks[i+1]) AS grams
            FROM ({_TOKS})
        )
        SELECT doc_id,
               CAST(len(grams) AS INTEGER) AS n_grams,
               CAST(len(list_distinct(grams)) AS INTEGER) AS n_distinct,
               ROUND(1.0 - len(list_distinct(grams)) * 1.0 / greatest(len(grams), 1), 4) AS dup_frac,
               ROUND(COALESCE(list_max(list_transform(list_distinct(grams),
                         x -> len(list_filter(grams, y -> y = x)))), 0)
                     * 1.0 / greatest(len(grams), 1), 4) AS top_frac
        FROM g
    """,
    "q93_tfidf_topterms": f"""
        WITH tf AS (
            SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
            FROM (SELECT doc_id, UNNEST(toks) AS term FROM ({_TOKS}))
            GROUP BY doc_id, term
        ),
        dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents)
        SELECT doc_id, term, tf, ROUND(raw, 4) AS score, rank
        FROM (
            SELECT tf.doc_id, tf.term, tf.tf,
                   tf.tf * (ln((1.0 + n.n) / (1.0 + dft.df)) + 1.0) AS raw,
                   CAST(ROW_NUMBER() OVER (
                        PARTITION BY tf.doc_id
                        ORDER BY tf.tf * (ln((1.0 + n.n) / (1.0 + dft.df)) + 1.0) DESC,
                                 tf.term) AS INTEGER) AS rank
            FROM tf JOIN dft ON tf.term = dft.term CROSS JOIN n
        )
        WHERE rank <= 3
    """,
    "q94_bm25_search": f"""
        WITH toked AS ({_TOKS}),
        stats AS (SELECT doc_id, len(toks) AS dl FROM toked),
        corpus AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM stats),
        tf AS (
            SELECT doc_id, term, COUNT(*) AS tf
            FROM (SELECT doc_id, UNNEST(toks) AS term FROM toked)
            WHERE term IN ({", ".join(f"'{t}'" for t in BM25_TERMS)})
            GROUP BY doc_id, term
        ),
        dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term)
        SELECT tf.doc_id AS doc_id, ROUND(SUM(
                   ln(1.0 + (corpus.n - dft.df + 0.5) / (dft.df + 0.5))
                   * tf.tf * 2.2
                   / (tf.tf + 1.2 * (0.25 + 0.75 * stats.dl / corpus.avgdl))
               ), 4) AS score
        FROM tf
        JOIN dft ON tf.term = dft.term
        JOIN stats ON tf.doc_id = stats.doc_id
        CROSS JOIN corpus
        GROUP BY tf.doc_id
        ORDER BY score DESC, doc_id
        LIMIT 10
    """,
    "q95_pii_scan": """
        WITH injected AS (
            SELECT doc_id,
                   text || ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@example.com via http://ex.io/' || CAST(doc_id AS VARCHAR)
                        || ' tel 555-0199 host 10.0.0.' || CAST(doc_id % 255 AS VARCHAR) AS text
            FROM documents
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INTEGER) AS n_email,
               CAST(len(regexp_extract_all(text, '\\b\\d{3}[-.]\\d{3,4}\\b')) AS INTEGER) AS n_phone,
               CAST(len(regexp_extract_all(text, 'https?://[^\\s]+')) AS INTEGER) AS n_url,
               CAST(len(regexp_extract_all(text, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS INTEGER) AS n_ipv4,
               md5(regexp_replace(
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(text, 'https?://[^\\s]+', '[PII]', 'g'),
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[PII]', 'g'),
                       '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '[PII]', 'g'),
                   '\\b\\d{3}[-.]\\d{3,4}\\b', '[PII]', 'g')) AS redacted_md5
        FROM injected
    """,
}


def _srp_oracle() -> str:
    """DuckDB twin of random_projection: the identical md5-derived ±1
    matrix is inlined as literals; term order inside list_transform +
    list_sum matches the Spark zip_with/aggregate fold."""
    signs = srp_sign_matrix(SRP_OUT_DIM, SRP_IN_DIM)
    cols = []
    for j in range(SRP_OUT_DIM):
        arr = "[" + ", ".join(f"{float(s):.1f}" for s in signs[j]) + "]"
        cols.append(
            f"ROUND(list_sum(list_transform(list_zip(embedding, {arr}::DOUBLE[]),"
            f" x -> CAST(x[1] AS DOUBLE) * x[2])) * (1.0 / sqrt({SRP_OUT_DIM}.0)), 4) AS p{j}"
        )
    return "SELECT vec_id, " + ", ".join(cols) + " FROM embeddings"


ORACLE["q96_random_projection"] = _srp_oracle()

# non-distinct, order-preserving bigrams — the q92 gram pattern at k=2
_GRAMS2 = f"""
    SELECT doc_id,
           list_transform(generate_series(1, greatest(len(toks) - 1, 0)),
               i -> toks[i] || ' ' || toks[i+1]) AS g
    FROM ({_TOKS})
"""

ORACLE["q98_bigram_lm_score"] = f"""
    WITH big AS MATERIALIZED (
        SELECT doc_id, gram, split_part(gram, ' ', 1) AS w1
        FROM (SELECT doc_id, UNNEST(g) AS gram FROM ({_GRAMS2}))
    ),
    c12 AS (SELECT gram, COUNT(*) AS c12 FROM big GROUP BY gram),
    c1 AS (SELECT w1, COUNT(*) AS c1 FROM big GROUP BY w1),
    v AS (
        SELECT COUNT(DISTINCT tok) AS v
        FROM (SELECT UNNEST(toks) AS tok FROM ({_TOKS}))
    ),
    scored AS (
        SELECT big.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               AVG(ln((c12.c12 + 0.5) / (c1.c1 + 0.5 * v.v))) AS lp
        FROM big JOIN c12 ON c12.gram = big.gram
                 JOIN c1 ON c1.w1 = big.w1
                 CROSS JOIN v
        GROUP BY big.doc_id
    )
    SELECT d.doc_id,
           COALESCE(s.n_bigrams, 0) AS n_bigrams,
           ROUND(COALESCE(s.lp, 0.0), 4) AS avg_logp
    FROM (SELECT DISTINCT doc_id FROM documents) d
    LEFT JOIN scored s ON s.doc_id = d.doc_id
"""

ORACLE["q109_boilerplate_removal"] = f"""
    WITH toked AS ({_TOKS}),
    ws AS (
        SELECT doc_id, toks,
               CAST(ceil(len(toks) / {float(SEG_LEN)}) AS INTEGER) AS nseg
        FROM toked
    ),
    segs AS (
        SELECT ws.doc_id, t.i - 1 AS pos,
               ('0x' || substr(md5(array_to_string(
                    ws.toks[((t.i-1)*{SEG_LEN}+1):((t.i-1)*{SEG_LEN}+{SEG_LEN})], ' ')), 1, 8))::BIGINT AS gh
        FROM ws, UNNEST(generate_series(1, ws.nseg)) AS t(i)
    ),
    common AS (
        SELECT gh FROM segs GROUP BY gh HAVING COUNT(DISTINCT doc_id) >= {SEG_MAX_DOCS}
    ),
    drops AS (
        SELECT s.doc_id, list_sort(list(s.pos)) AS drop_pos
        FROM segs s JOIN common c ON c.gh = s.gh
        GROUP BY s.doc_id
    ),
    rebuilt AS (
        SELECT w.doc_id, w.nseg,
               COALESCE(d.drop_pos, []) AS drop_pos,
               flatten(list_transform(
                   list_filter(generate_series(1, w.nseg),
                       i -> NOT list_contains(COALESCE(d.drop_pos, []), i - 1)),
                   i -> w.toks[((i-1)*{SEG_LEN}+1):((i-1)*{SEG_LEN}+{SEG_LEN})])) AS kept
        FROM ws w LEFT JOIN drops d ON d.doc_id = w.doc_id
    )
    SELECT doc_id,
           nseg AS n_segments,
           CAST(len(drop_pos) AS INTEGER) AS n_dropped,
           CAST(len(kept) AS INTEGER) AS n_tokens_kept,
           md5(COALESCE(array_to_string(kept, ' '), '')) AS cleaned_md5
    FROM rebuilt
"""

ORACLE["q110_chunking"] = f"""
    WITH toked AS ({_TOKS})
    SELECT doc_id,
           CAST(t.i AS INTEGER) - 1 AS chunk_id,
           CAST(len(toks[(1 + ({STRIDE} * (t.i - 1))):({STRIDE} * (t.i - 1) + {CHUNK})]) AS INTEGER) AS n_tokens,
           md5(array_to_string(toks[(1 + ({STRIDE} * (t.i - 1))):({STRIDE} * (t.i - 1) + {CHUNK})], ' ')) AS chunk_md5
    FROM toked, UNNEST(generate_series(1, CAST(ceil(len(toks) / {float(STRIDE)}) AS INTEGER))) AS t(i)
    WHERE len(toks) > 0
"""

ORACLE["q99_source_cap"] = f"""
    SELECT doc_id, source,
           CAST(len(toks) AS INTEGER) AS n_tokens,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY len(toks) DESC, doc_id
           ) AS INTEGER) AS rank_in_source,
           ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY len(toks) DESC, doc_id
           ) <= 10 AS kept
    FROM (SELECT doc_id, source, toks FROM ({_TOKS.replace("SELECT doc_id,", "SELECT doc_id, source,")}))
"""
