"""Text analysis for LLM data pipelines (C4): language ID, quality
scoring, token counting, document fingerprinting.

All hot paths are JVM expressions (split/filter/aggregate/regexp);
no Python UDFs. Each operator returns per-document rows keyed by
``doc_id`` so downstream filters compose relationally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biodwh2_arcadedb_server_spark.functions import bpe_ish_tokens, tokens

# Minimal stopword profiles for the n-gram/stopword-ratio language
# heuristic. (Real pipelines plug a fastText model in via pandas_udf;
# the heuristic keeps this testable without model files.)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "mit", "zu", "den"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pas", "pour", "que"],
}


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace + BPE-ish token counts and mean token length."""
    toks = tokens(F.col(text_col))
    bpe = bpe_ish_tokens(F.col(text_col))
    total_len = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(bpe).alias("n_bpe_tokens"),
        F.round(total_len / F.greatest(F.size(toks), F.lit(1)), 4).alias("avg_token_len"),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality features + composite score: length, alpha
    ratio, punctuation ratio, stopword ratio, repetition (distinct
    token fraction). Score weights mirror common C4/Gopher-style
    filters (public rules-of-thumb, recomputed relationally)."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks)
    n_chars = F.length(t)
    alpha_ratio = F.length(F.regexp_replace(t, r"[^A-Za-z]", "")) / F.greatest(n_chars, F.lit(1))
    punct_ratio = F.length(F.regexp_replace(t, r"[^.,;:!?]", "")) / F.greatest(n_chars, F.lit(1))
    en_stop = F.array([F.lit(w) for w in STOPWORDS["en"]])
    stop_ratio = F.size(F.array_intersect(F.array_distinct(toks), en_stop)) / F.lit(
        float(len(STOPWORDS["en"]))
    )
    distinct_ratio = F.size(F.array_distinct(toks)) / F.greatest(n_tok, F.lit(1))
    score = (
        F.when((n_tok >= 10) & (n_tok <= 100000), 0.25).otherwise(0.0)
        + F.when(alpha_ratio >= 0.6, 0.25).otherwise(0.0)
        + F.when(punct_ratio <= 0.1, 0.25).otherwise(0.0)
        + (F.least(distinct_ratio * 2, F.lit(1.0)) * 0.25)
    )
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(distinct_ratio, 4).alias("distinct_ratio"),
        F.round(score, 4).alias("quality_score"),
    )


def language_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-profile language heuristic: score each language by
    fraction of its stopword list present; argmax wins, 'und'
    (undetermined) when nothing matches. Deterministic tie-break by
    language code."""
    toks = F.array_distinct(tokens(F.col(text_col)))
    scores = []
    for lang in sorted(STOPWORDS):
        lst = F.array([F.lit(w) for w in STOPWORDS[lang]])
        scores.append(
            F.struct(
                (F.size(F.array_intersect(toks, lst)) / F.lit(float(len(STOPWORDS[lang]))))
                .alias("score"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    return df.select(
        F.col(id_col),
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")).alias("pred_lang"),
        F.round(best["score"], 4).alias("lang_score"),
    )


def fingerprint(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Winnowing-style document fingerprint: hash every ``window``-gram
    of tokens, keep the minimum (one representative per doc; extend to
    per-window minima for substring matching). Rolling hash choices:
    ``xxhash64`` (default — fastest, JVM-native) or ``md5_32`` (first
    8 hex chars of md5 as a bigint, reproducible verbatim in DuckDB/
    any engine with md5 — the cross-engine verification path).

    Tokens materialize as a column before the window lambda (an inline
    expression would re-tokenize per window — see
    functions.shingles_from_tokens)."""
    if hash_fn == "xxhash64":
        h = F.xxhash64
    elif hash_fn == "md5_32":
        h = lambda c: F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")  # noqa: E731
    else:
        raise ValueError(f"unknown hash_fn: {hash_fn}")
    toked = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
    tc = F.col("_toks")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(tc) - (window - 1), F.lit(1))),
        lambda i: h(F.concat_ws(" ", F.slice(tc, i, window))),
    )
    return toked.select(
        F.col(id_col),
        F.array_min(grams).alias("min_fingerprint"),
        F.size(grams).alias("n_windows"),
    )


def repetition_metrics(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dup_line_frac: float = 0.30,
    max_dup_bigram_frac: float = 0.18,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1: MassiveWeb
    repetition rules): per-document duplicate-line, duplicate-word and
    duplicate-word-bigram fractions, plus the pass/fail flag at the
    paper's thresholds (duplicate lines > 0.30 or duplicate 2-grams >
    0.18 → repetitious, excluded from training).

    Scale: one projection of JVM higher-order functions over the
    documents scan — no shuffle, no Python, whole-stage codegen; the
    flag predicate is pushable when used as a filter. The line/word
    arrays MATERIALIZE as columns in a first select before the
    fraction expressions reference them — inlining the splits into
    each fraction re-tokenizes the text per reference (measured 5x
    at sf0.1)."""
    lines = F.split(F.col(text_col), "\n")
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")

    def dup_frac(arr):
        # 1 - distinct/size; 0 for empty/singleton collections
        return F.when(
            F.size(arr) > 1,
            1.0 - F.size(F.array_distinct(arr)) / F.size(arr),
        ).otherwise(F.lit(0.0))

    # keep_cols lets composites (curation_funnel) carry their other
    # columns through the SAME scan instead of self-joining on the id
    # — a join would double-count duplicate ids and drop null ids
    # from the audit (round-8 review finding)
    keep = [c for c in keep_cols if c != id_col]
    out = df.select(
        F.col(id_col),
        *keep,
        lines.alias("_lines"),
        words.alias("_words"),
    ).select(
        F.col(id_col),
        *keep,
        F.size("_lines").alias("n_lines"),
        dup_frac(F.col("_lines")).alias("dup_line_frac"),
        dup_frac(F.col("_words")).alias("dup_word_frac"),
        dup_frac(
            # sequence over word positions 1..n-1 (1-based): bigram
            # i = words[i] + ' ' + words[i+1]. Guarded: Spark's
            # sequence(1, 0) DESCENDS ([1, 0]), so <2 words must
            # short-circuit to an empty list, not an empty sequence
            F.when(
                F.size("_words") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("_words") - 1),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at("_words", i),
                        F.element_at("_words", i + 1),
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("dup_bigram_frac"),
    )
    return out.withColumn(
        "repetitious",
        (F.col("dup_line_frac") > max_dup_line_frac)
        | (F.col("dup_bigram_frac") > max_dup_bigram_frac),
    )
