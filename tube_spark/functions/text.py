"""Text expression builders shared by dedup / analysis operators.

Everything here is a pure Catalyst expression (JVM-side, codegen'd) —
the 100 TB path never leaves the executor JVM.  Each builder documents
its DuckDB-SQL equivalent so differential oracles stay in lockstep.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: Column) -> Column:
    """Lowercased alpha tokens.  DuckDB equivalent:
    ``list_filter(regexp_split_to_array(lower(t), '[^a-z]+'), x -> x <> '')``.
    """
    return F.filter(F.split(F.lower(col), "[^a-z]+"), lambda x: x != F.lit(""))


def normalize(col: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, strip non-alnum,
    collapse whitespace.  DuckDB: ``trim(regexp_replace(regexp_replace(
    lower(t), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))``."""
    cleaned = F.regexp_replace(F.lower(col), "[^a-z0-9 ]", " ")
    return F.trim(F.regexp_replace(cleaned, " +", " "))


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.
    (md5 is bit-identical across Spark and DuckDB, which makes this the
    one hash usable in differential oracles.)"""
    return F.md5(normalize(col))


def word_ngrams(tok: Column, n: int) -> Column:
    """Positional word n-grams joined by a space — element ``i`` (0-based)
    is the gram starting at token ``i``; duplicates preserved.  DuckDB:
    ``list_transform(generate_series(1, len(t) - n + 1),
    i -> array_to_string(t[i:i+n-1], ' '))`` (1-based inclusive slices).
    Documents shorter than n words yield an empty array.
    """
    # n-gram as n-1 zips of shifted copies: O(n) whole-array ops per doc
    # instead of a per-gram slice+copy inside a transform() lambda —
    # measured ~6× faster (HOF lambdas run interpreted; fewer, bigger
    # array ops win)
    length = F.greatest(F.size(tok) - F.lit(n - 1), F.lit(0))
    parts = [F.slice(tok, i + 1, length) for i in range(n)]
    grams = parts[0]
    for p in parts[1:]:
        grams = F.zip_with(grams, p, lambda a, b: F.concat_ws(" ", a, b))
    return grams


def word_shingles(tok: Column, n: int) -> Column:
    """Distinct word n-grams (``word_ngrams`` order-preserving dedup).
    DuckDB: wrap the ``word_ngrams`` twin in ``list_distinct(...)``."""
    return F.array_distinct(word_ngrams(tok, n))


def portable_hash(col: Column) -> Column:
    """32-bit content hash computable bit-identically in DuckDB:
    first 8 hex digits of md5.  DuckDB twin:
    ``('0x' || substr(md5(s), 1, 8))::BIGINT``.
    Slower than ``xxhash64`` (md5 + string slicing) — use only where a
    differential oracle must reproduce the hash.
    """
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def portable_hash60(col: Column) -> Column:
    """60-bit variant (15 md5 hex digits — the most that fit a signed
    int64).  DuckDB twin: ``('0x' || substr(md5(s), 1, 15))::BIGINT``."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def token_count_bpe_ish(col: Column) -> Column:
    """Rough token count for LLM budgeting: splits on whitespace AND
    punctuation boundaries (a cheap BPE-ish proxy: words + standalone
    punctuation runs each count as one token).
    DuckDB: ``len(regexp_extract_all(t, '[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]'))``."""
    return F.size(F.regexp_extract_all(col, F.lit(r"[a-zA-Z0-9]+|[^a-zA-Z0-9\s]"), F.lit(0)))


# PII patterns: deliberately simple enough to parse identically under
# Java regex (Spark) and RE2 (DuckDB) — no lookaround, no backrefs.
PII_PATTERNS: dict[str, str] = {
    "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "phone": r"\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def pii_count(col: Column, kind: str) -> Column:
    """Occurrences of one PII pattern.  DuckDB:
    ``len(regexp_extract_all(t, <pattern>))``."""
    return F.size(F.regexp_extract_all(col, F.lit(PII_PATTERNS[kind]), F.lit(0)))


def redact_pii(col: Column) -> Column:
    """Replace every known PII pattern with a typed placeholder
    (``[EMAIL]`` …).  Chained ``regexp_replace`` — one codegen'd
    projection, no UDF.  DuckDB: nested
    ``regexp_replace(t, <pattern>, '[KIND]', 'g')`` in the same order
    (email first, so the ipv4 rule never clips a domain)."""
    out = col
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"[{kind.upper()}]")
    return out
