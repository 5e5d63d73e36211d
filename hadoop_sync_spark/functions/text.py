"""Text-analysis column functions: tokenization, fingerprints, quality.

Design: tokenization is a regex split (builtin, codegen'd).  Fingerprints are
md5 of normalized text (builtin).  SimHash/MinHash live in
:mod:`hadoop_sync_spark.functions.hashing` since they're dedup machinery.
No Python UDFs anywhere in this module — at 100 TB these run on every row,
so they must stay JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: Tiny English stopword list used by quality scoring and the lang-ID
#: heuristic.  Ordered tuple (not set) so SQL oracles serialize identically.
STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "of", "and", "to", "in", "is", "it", "for",
)

#: Whitespace run, spelled as an explicit class instead of `\s` because the
#: two regex engines disagree on `\s`'s members: Java (Spark) includes
#: vertical tab U+000B, RE2 (the DuckDB oracle) does not — a latent parity
#: break for any document containing U+000B.  This class IS Java's `\s`
#: set, written portably; both engines read the identical pattern text.
WS_RE = r"[ \t\n\x0b\f\r]+"

_WS = WS_RE


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of trimmed text → array<string>."""
    return F.split(F.trim(_c(col)), _WS)


def token_count(col: Column | str) -> Column:
    """Number of whitespace tokens (BIGINT)."""
    return F.size(tokens(col)).cast("long")


def unique_token_count(col: Column | str) -> Column:
    """Number of distinct tokens (BIGINT)."""
    return F.size(F.array_distinct(tokens(col))).cast("long")


def normalize(col: Column | str) -> Column:
    """Canonical text form for fingerprinting: lowercase, trimmed."""
    return F.lower(F.trim(_c(col)))


def fingerprint(col: Column | str) -> Column:
    """Deterministic 128-bit content fingerprint (md5 hex of normalized
    text).  Collision-safe enough for exact-dedup grouping at 100 TB
    (2^64 birthday bound ≫ corpus row counts)."""
    return F.md5(normalize(col))


def token_set_key(col: Column | str) -> Column:
    """Order/multiplicity-insensitive near-dup key: md5 of the sorted
    distinct token list.  Catches shuffled/duplicated-word copies."""
    return F.md5(
        F.array_join(F.array_sort(F.array_distinct(tokens(normalize(col)))), " ")
    )


def stopword_ratio(col: Column | str) -> Column:
    """Fraction of tokens that are English stopwords (DOUBLE)."""
    tok = tokens(col)
    stops = F.filter(tok, lambda x: F.array_contains(F.lit(list(STOPWORDS)), x))
    return F.size(stops).cast("double") / F.size(tok)


def avg_token_len(col: Column | str) -> Column:
    """Characters per token (DOUBLE) — proxy for boilerplate/garbage."""
    return F.length(_c(col)).cast("double") / F.size(tokens(col))


def non_ascii_ratio(col: Column | str) -> Column:
    """Fraction of characters outside ASCII (DOUBLE) — script evidence."""
    return (
        F.length(F.regexp_replace(_c(col), r"[\x00-\x7F]", "")).cast("double")
        / F.length(_c(col))
    )


def quality_score(col: Column | str, min_tokens: int = 20) -> Column:
    """keep/flag bucket from length + stopword-ratio heuristics."""
    ratio = stopword_ratio(col)
    return (
        F.when(
            (token_count(col) >= min_tokens) & ratio.between(0.01, 0.6), "keep"
        ).otherwise("flag")
    )


def shingles_of_tokens(tok: Column, n: int = 3) -> Column:
    """Word n-gram shingles of an ALREADY-MATERIALIZED token array column →
    array<string>.  For a doc of t tokens produces t-n+1 shingles of n
    space-joined tokens.

    `tok` must be a plain column reference (project the token array in a
    prior ``select``), NOT an inline expression: Catalyst expression trees
    are trees, not DAGs, so an expression embedded in the ``transform``
    lambda body is re-evaluated once per shingle index — an inline
    ``split()`` there re-tokenizes the whole document t times (measured
    ~50× slowdown on the fixture corpus).
    """
    idx = F.sequence(F.lit(0), F.greatest(F.size(tok) - n, F.lit(0)))
    return F.transform(idx, lambda i: F.array_join(F.slice(tok, i + 1, n), " "))


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles straight from a text column.

    Convenience form; on hot paths prefer projecting
    ``tokens(normalize(text))`` first and calling
    :func:`shingles_of_tokens` on the materialized column (see its
    docstring for why)."""
    return shingles_of_tokens(tokens(normalize(col)), n)
