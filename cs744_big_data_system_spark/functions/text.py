"""Text-statistics column expressions over the ``documents`` table.

All native Column ops (split/regexp/aggregate) — the whole text-analysis
pass stays in one codegen stage per SURVEY.md §7 risk 5 (no row-at-a-time
Python in hot paths). Generalizes the reference's string surface
(startswith/split — assignment1/part3/task1/task1.py:28-29) to the
quality/tokenization ops a training-data pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language stopword lists for the n-gram/stopword language
#: heuristic (public common-word lists; deterministic, no model).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ein"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "de", "que", "los"],
    "zh": ["的", "是", "了", "在", "我"],
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalized_text(col: Column | str) -> Column:
    """Lowercase, collapse whitespace runs, trim — canonical form used by
    exact dedup and fingerprinting so trivially-different bytes dedup."""
    return F.trim(F.regexp_replace(F.lower(_c(col)), r"\s+", " "))


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization → array<string> (empty-string safe)."""
    t = F.split(F.trim(_c(col)), r"\s+")
    return F.filter(t, lambda x: x != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def punct_ratio(col: Column | str) -> Column:
    """(# punctuation chars) / (total chars); 0 for empty text."""
    c = _c(col)
    total = F.length(c)
    punct = total - F.length(F.regexp_replace(c, r"[!-/:-@\[-`{-~]", ""))
    return F.when(total > 0, punct.cast("double") / total).otherwise(F.lit(0.0))


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    toks = tokens(col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))
    n = F.size(toks)
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def ngrams_from_tokens(tok_col: Column | str, n: int = 3, sep: str = " ") -> Column:
    """Word n-grams from an ALREADY-MATERIALIZED token-array column →
    array<string>; empty array when fewer than ``n`` tokens.

    The token array must be a plain column (materialized by a prior
    select), NOT an inline split expression: Catalyst inlines expression
    references, so an inline tokenizer would re-run the regex split for
    every n-gram element — measured 10× slower at sf0.1. Pure array ops
    (sequence + slice + concat_ws), no UDF."""
    toks = _c(tok_col)
    starts = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0)))
    return F.when(F.size(toks) >= n,
                  F.transform(starts, lambda i: F.concat_ws(sep, F.slice(toks, i, n)))
                  ).otherwise(F.array().cast("array<string>"))


def word_ngrams(col: Column | str, n: int = 3, sep: str = " ") -> Column:
    """Word-level n-gram shingles of a TEXT column → array<string>.

    Convenience form for one-shot use on small inputs; hot paths should
    materialize ``tokens(...)`` in a select and call
    :func:`ngrams_from_tokens` (see its docstring for why)."""
    return ngrams_from_tokens(tokens(col), n, sep)
