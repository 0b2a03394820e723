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


def word_shingles(text: Column | str, k: int = 3) -> Column:
    """Distinct word k-grams (shingles) of a document — the unit set
    for Jaccard/MinHash near-dup detection. Built entirely with
    sequence/transform/slice (JVM-side)."""
    toks = tokens(text)
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    return F.array_distinct(grams)


def bpe_ish_tokens(text: Column | str) -> Column:
    """BPE-ish regex tokenization (words / numbers / punctuation runs),
    the common pre-tokenizer shape for LLM token counting."""
    return F.filter(
        F.split(text, r"(?<=\W)(?=\w)|(?<=\w)(?=\W)|\s+"),
        lambda x: (x != "") & (x != " "),
    )
