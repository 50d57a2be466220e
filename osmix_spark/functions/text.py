"""Text-analysis kernels for a web-scale training-data pipeline.

All pure Column expressions (codegen'd, no Python in the hot path):
tokenization, token/word counts, quality scoring, language-ID scoring,
document fingerprinting, shingling for MinHash.

These operate on the Common-Crawl-style pages/documents tables
(text: string). Each has an exact ANSI-SQL twin used by the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .hashing import portable_hash64

# Tiny built-in stopword/marker lists. Deterministic, language-marker style
# (a real deployment would broadcast a bigger lexicon — the plumbing is
# identical, the list is a broadcast literal either way).
STOPWORDS_EN = ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "fr": ("le", "la", "et"),
    "de": ("der", "die", "und"),
    "es": ("el", "la", "que"),
}

# BPE-ish token regex: word pieces, numbers, or single punctuation — a cheap
# deterministic stand-in for a real tokenizer's pre-tokenization pass.
BPE_TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(text) -> Column:
    """Lower-cased whitespace tokens, empty strings removed."""
    t = F.split(F.lower(text), r"\s+")
    return F.filter(t, lambda x: x != "")


def token_count(text) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def bpe_token_count(text) -> Column:
    """Count of BPE-ish pre-tokens (regexp-based). Group index 0 = the
    whole match (the default of 1 requires a capture group and throws)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_REGEX), F.lit(0)))


def stopword_ratio(text, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    toks = tokens(text)
    n = F.size(toks)
    sw = F.size(F.filter(toks, lambda x: x.isin(*stopwords)))
    return F.when(n > 0, sw.cast("double") / n).otherwise(F.lit(0.0))


def punct_ratio(text) -> Column:
    """Non-alphanumeric-non-space chars / total chars."""
    text = F.col(text) if isinstance(text, str) else text
    n = F.length(text)
    stripped = F.length(F.regexp_replace(text, r"[^A-Za-z0-9\s]", ""))
    return F.when(n > 0, (n - stripped).cast("double") / n).otherwise(F.lit(0.0))


def mean_word_len(text) -> Column:
    toks = tokens(text)
    n = F.size(toks)
    total = F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x))
    return F.when(n > 0, total.cast("double") / n).otherwise(F.lit(0.0))


def quality_score(text) -> Column:
    """Composite [0,1] quality heuristic: length band + stopword presence +
    low punctuation + sane word length. Deterministic, SQL-expressible."""
    n_tok = token_count(text).cast("double")
    len_score = F.least(n_tok / 64.0, F.lit(1.0))
    sw_score = F.least(stopword_ratio(text) * 5.0, F.lit(1.0))
    punct_score = 1.0 - F.least(punct_ratio(text) * 4.0, F.lit(1.0))
    wl = mean_word_len(text)
    wl_score = F.when((wl >= 3.0) & (wl <= 10.0), 1.0).otherwise(0.5)
    return F.round((len_score + sw_score + punct_score + wl_score) / 4.0, 6)


def lang_scores(text) -> list[Column]:
    """Per-language marker-word hit counts (n-gram-heuristic language ID).

    Returns one aliased count column per language in LANG_MARKERS.
    """
    toks = tokens(text)

    def marker_pred(markers):
        # single-arg lambda factory: a 2-arg lambda would make F.filter pass
        # the element index as the second argument
        return lambda x: x.isin(*markers)

    return [
        F.size(F.filter(toks, marker_pred(markers))).alias(f"score_{lang}")
        for lang, markers in LANG_MARKERS.items()
    ]


def fingerprint(text) -> Column:
    """Document fingerprint: normalize (lower, collapse whitespace, strip
    punctuation) then portable 60-bit hash. The exact-dedupe key."""
    norm = F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(text), r"[^a-z0-9\s]", ""), r"\s+", " ")
    )
    return portable_hash64(norm, "fp")


def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """Word k-shingles as strings: token[i..i+k) joined by ' '.

    Takes a MATERIALIZED token-array column: passing the `tokens(text)`
    expression directly would inline the full split() once per element_at —
    k evaluations per shingle, an O(len^2) blowup (observed 2x bench
    regression). Callers project tokens into a column first.
    """
    n = F.size(toks)
    # n < k must yield an EMPTY array: sequence(1, 0) is Spark's
    # DESCENDING [1, 0], and element_at(toks, 0) then errors at runtime
    idx = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))) \
        .otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)]),
    )


def shingles(text, k: int = 3) -> Column:
    """Convenience wrapper for small inputs/tests; hot paths must use
    shingles_from_tokens on a projected column (see its docstring)."""
    return shingles_from_tokens(tokens(text), k)
