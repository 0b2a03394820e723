"""Scalar/array helper functions — JVM-side first (SURVEY.md B14-B17).

Everything here builds Column expressions from ``pyspark.sql.functions``
higher-order functions so the hot path stays inside whole-stage
codegen; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def array_dot(a: Column | str, b: Column | str) -> Column:
    """Σ a_i·b_i in double precision (zip_with + aggregate, JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def array_norm(a: Column | str) -> Column:
    """L2 norm in double precision."""
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return array_dot(a, b) / (array_norm(a) * array_norm(b))


def tokens(text: Column | str, lowercase: bool = True) -> Column:
    """Whitespace tokenization; empty tokens removed."""
    t = F.lower(text) if lowercase else F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(t, r"\s+"), lambda x: x != "")


def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """Distinct word k-grams from a **materialized token-array
    column**. ``toks`` must be a plain column reference: an expression
    here would be re-evaluated once per gram inside the lambda
    (interpreted HOFs don't CSE their lambda bodies), which measured
    ~8× slower. Use a two-step select: first project the token array,
    then build shingles from the column."""
    grams = F.transform(
        gram_start_indices(toks, k),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    return F.array_distinct(grams)


def gram_start_indices(toks: Column, k: int) -> Column:
    """1-based start positions of the k-grams of a token array — the
    SHARED guard for every gram producer: a doc shorter than k tokens
    must yield ZERO grams, but Spark's sequence(1, 0) is the
    DESCENDING [1, 0] (not empty) and the 0 then feeds slice() an
    invalid start (round-12 latent bug, hit via remove_spans)."""
    n = F.size(toks)
    return F.when(
        n >= F.lit(k), F.sequence(F.lit(1), n - (k - 1))
    ).otherwise(F.array().cast("array<int>"))


def word_shingles(text: Column | str, k: int = 3) -> Column:
    """Distinct word k-grams of a document — convenience single-expression
    form. WARNING: re-tokenizes per gram (see shingles_from_tokens);
    fine for small inputs and tests, use the two-step form in hot paths."""
    return shingles_from_tokens(tokens(text), k)


def bpe_ish_tokens(text: Column | str) -> Column:
    """BPE-ish regex tokenization (words / numbers / punctuation runs),
    the common pre-tokenizer shape for LLM token counting."""
    return F.filter(
        F.split(text, r"(?<=\W)(?=\w)|(?<=\w)(?=\W)|\s+"),
        lambda x: (x != "") & (x != " "),
    )
