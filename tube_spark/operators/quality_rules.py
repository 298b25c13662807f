"""Published corpus-curation rule sets: Gopher quality signals and C4
line-level cleaning.

Both are MAP-ONLY Catalyst expression pipelines (split / higher-order
array functions / arithmetic — no UDF, no shuffle, no join), so at
100 TB they run at scan speed inside whole-stage codegen and compose
with any downstream gate.  Every signal has a DuckDB twin on the
shared SQL subset (``string_split`` + list lambdas), so the full rule
arithmetic is differentially oracled, not just the pass/fail bit.

Rule provenance (public papers — thresholds quoted from the papers):

* Gopher rules: Rae et al. 2021, "Scaling Language Models: Methods,
  Analysis & Insights from Training Gopher", Appendix A (the MassiveWeb
  quality heuristics).  Reproduced here: word-count bounds, mean word
  length band, symbol-to-word ratio, bullet-line and ellipsis-line
  caps, alphabetic-word floor, required-stopword floor, duplicate-line
  character mass.
* C4 rules: Raffel et al. 2020, "Exploring the Limits of Transfer
  Learning with a Unified Text-to-Text Transformer" (the C4 cleaning
  recipe): keep lines ending in terminal punctuation with >= 5 words,
  drop "javascript" lines, drop pages containing "lorem ipsum" or a
  curly brace, drop pages with < 3 surviving lines.

Reference parity note: the reference ETL (uc-cdis/tube) has no corpus
curation stage — this module is part of the training-data-pipeline
extension scope (SURVEY.md §2 extensions), alongside operators/
curation.py (the composed gate) and text_analysis.py (the signal
library these rules extend).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Gopher Appendix A: a document must contain >= 2 of these stopwords.
REQUIRED_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

# Leading characters that mark a bullet line (Gopher: "90% of lines
# starting with a bullet point").  Plain ASCII subset so the SQL twin
# needs no unicode-escape gymnastics.
BULLET_PREFIXES = ("-", "*")


def _words(text: Column) -> Column:
    """Whitespace words (punctuation kept — Gopher measures raw words).
    DuckDB: ``list_filter(regexp_split_to_array(t, '\\s+'), x -> x <> '')``.
    """
    return F.filter(F.split(text, "\\s+"), lambda x: x != F.lit(""))


def _lines(text: Column) -> Column:
    """Trimmed non-empty lines.  DuckDB:
    ``list_filter(list_transform(string_split(t, chr(10)), x -> trim(x)),
    x -> x <> '')``."""
    return F.filter(
        F.transform(F.split(text, "\n"), lambda x: F.trim(x)),
        lambda x: x != F.lit(""),
    )


def gopher_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document Gopher quality signals + the composite pass flag.

    Output columns (ratios rounded to 6, NULL-safe — an empty/NULL doc
    gets zero words, ratio 0, ``gopher_pass`` false):

    ===================  ====================================================
    n_words              whitespace word count
    mean_word_len        sum(len(word)) / n_words
    alpha_word_ratio     fraction of words containing an ASCII letter
    symbol_word_ratio    ('#' chars + non-overlapping '...') / n_words
    bullet_line_ratio    fraction of non-empty lines starting '-' or '*'
    ellipsis_line_ratio  fraction of non-empty lines ending '...'
    dup_line_char_ratio  chars on lines whose exact text repeats within
                         the doc / total line chars
    stop_hits            distinct REQUIRED_STOPWORDS present (lowercased)
    gopher_pass          all Appendix-A thresholds hold (see below)
    ===================  ====================================================

    Thresholds (Rae et al. 2021 Appendix A): 50 <= n_words <= 100000;
    3 <= mean_word_len <= 10; symbol_word_ratio <= 0.1;
    bullet_line_ratio <= 0.9; ellipsis_line_ratio <= 0.3;
    alpha_word_ratio >= 0.8; stop_hits >= 2; dup_line_char_ratio <= 0.2
    (the repetition family in the paper spans n-gram sizes — the line
    form is implemented here; operators/text_analysis.repetition_stats
    carries the n-gram forms).

    Scale note: every signal is per-row arithmetic over the row's own
    arrays — map-only, embarrassingly parallel, no state.  The
    duplicate-line check is the one quadratic-in-lines term (list
    self-scan); docs are bounded in practice and a pathological
    million-line doc should be routed to repetition_stats' explode
    form instead.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = _words(t)
    n_words = F.size(words)
    nw1 = F.greatest(n_words, F.lit(1))
    sum_len = F.aggregate(words, F.lit(0), lambda acc, x: acc + F.length(x))
    mean_word_len = (sum_len / nw1).cast("double")
    alpha_words = F.size(F.filter(words, lambda x: x.rlike("[A-Za-z]")))
    hash_chars = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    ellipses = (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / F.lit(3)
    symbol_ratio = ((hash_chars + ellipses) / nw1).cast("double")

    lines = _lines(t)
    n_lines = F.size(lines)
    nl1 = F.greatest(n_lines, F.lit(1))
    bullet = F.size(
        F.filter(
            lines,
            lambda x: F.substring(x, 1, 1).isin(*BULLET_PREFIXES),
        )
    )
    ellipsis_lines = F.size(F.filter(lines, lambda x: x.endswith("...")))
    dup_lines = F.filter(
        lines,
        lambda x: F.size(F.filter(lines, lambda y: y == x)) > 1,
    )
    line_chars = F.aggregate(lines, F.lit(0), lambda acc, x: acc + F.length(x))
    dup_chars = F.aggregate(dup_lines, F.lit(0), lambda acc, x: acc + F.length(x))
    dup_ratio = (dup_chars / F.greatest(line_chars, F.lit(1))).cast("double")

    lowered = F.transform(words, lambda x: F.lower(x))
    stop_hits = F.size(
        F.array_intersect(lowered, F.array(*[F.lit(w) for w in REQUIRED_STOPWORDS]))
    )

    alpha_ratio = (alpha_words / nw1).cast("double")
    bullet_ratio = (bullet / nl1).cast("double")
    ellipsis_ratio = (ellipsis_lines / nl1).cast("double")
    gopher_pass = (
        (n_words >= 50)
        & (n_words <= 100000)
        & (mean_word_len >= 3)
        & (mean_word_len <= 10)
        & (symbol_ratio <= 0.1)
        & (bullet_ratio <= 0.9)
        & (ellipsis_ratio <= 0.3)
        & (alpha_ratio >= 0.8)
        & (stop_hits >= 2)
        & (dup_ratio <= 0.2)
    )
    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(alpha_ratio, 6).alias("alpha_word_ratio"),
        F.round(symbol_ratio, 6).alias("symbol_word_ratio"),
        F.round(bullet_ratio, 6).alias("bullet_line_ratio"),
        F.round(ellipsis_ratio, 6).alias("ellipsis_line_ratio"),
        F.round(dup_ratio, 6).alias("dup_line_char_ratio"),
        stop_hits.cast("long").alias("stop_hits"),
        gopher_pass.alias("gopher_pass"),
    )


def c4_line_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 5,
    min_kept_lines: int = 3,
) -> DataFrame:
    """C4 line-level cleaning (Raffel et al. 2020 §2.2).

    A line survives iff (on its trimmed form): it ends in terminal
    punctuation ``. ! ? "``; it has >= ``min_words_per_line``
    whitespace words; and it does not contain ``javascript``
    (case-insensitive).  A page survives iff: >= ``min_kept_lines``
    lines survive AND the page contains neither ``lorem ipsum``
    (case-insensitive) nor a ``{``.

    Output: (id, n_lines, n_kept, text_clean, page_pass) — one row per
    input doc, nothing silently dropped; ``text_clean`` is the kept
    lines re-joined with newlines (empty string when none survive).
    Callers gate on ``page_pass`` / emptiness themselves so the drop
    accounting stays visible.

    Map-only expression pipeline: one split + per-line lambda filter +
    array_join — no shuffle, scan-speed at any corpus size.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.transform(F.split(t, "\n"), lambda x: F.trim(x))
    nonempty = F.filter(lines, lambda x: x != F.lit(""))

    def _line_ok(x: Column) -> Column:
        last = F.substring(x, -1, 1)
        words_in = F.size(F.filter(F.split(x, "\\s+"), lambda w: w != F.lit("")))
        return (
            last.isin(".", "!", "?", '"')
            & (words_in >= min_words_per_line)
            & (~F.lower(x).contains("javascript"))
        )

    kept = F.filter(nonempty, _line_ok)
    n_kept = F.size(kept)
    page_pass = (
        (n_kept >= min_kept_lines)
        & (~F.lower(t).contains("lorem ipsum"))
        & (~t.contains("{"))
    )
    return df.select(
        F.col(id_col),
        F.size(nonempty).cast("long").alias("n_lines"),
        n_kept.cast("long").alias("n_kept"),
        F.array_join(kept, "\n").alias("text_clean"),
        page_pass.alias("page_pass"),
    )


def readability(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Flesch reading-ease and Flesch-Kincaid grade level (Flesch 1948;
    Kincaid et al. 1975) — the classic curation-side complexity scores
    next to the Gopher/C4 gates.

    Deterministic approximations chosen for engine portability:
    sentences = maximal runs split on ``[.!?]+`` with non-empty trimmed
    remainder (min 1); words = whitespace tokens (min 1); syllables
    per word = count of ``[aeiouy]+`` vowel groups in the lowercased
    word, min 1 (the standard heuristic — within one syllable for most
    English words, and exactly replayable in SQL, unlike dictionary
    lookups).

    Output: (id, n_sentences, n_words, n_syllables, flesch_ease,
    fk_grade), ratios rounded to 6.  Map-only expression pipeline —
    split + per-element lambdas + arithmetic, no shuffle, no UDF.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    sentences = F.filter(
        F.transform(F.split(t, "[.!?]+"), lambda x: F.trim(x)),
        lambda x: x != F.lit(""),
    )
    words = _words(t)
    syl = F.aggregate(
        words,
        F.lit(0),
        lambda acc, x: acc
        + F.greatest(
            F.size(
                F.filter(
                    F.split(F.lower(x), "[^aeiouy]+"), lambda g: g != F.lit("")
                )
            ),
            F.lit(1),
        ),
    )
    n_sent = F.greatest(F.size(sentences), F.lit(1))
    n_words = F.greatest(F.size(words), F.lit(1))
    wps = n_words / n_sent
    spw = syl / n_words
    ease = F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
    grade = F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)
    return df.select(
        F.col(id_col),
        F.size(sentences).cast("long").alias("n_sentences"),
        F.size(words).cast("long").alias("n_words"),
        syl.cast("long").alias("n_syllables"),
        F.round(ease, 6).alias("flesch_ease"),
        F.round(grade, 6).alias("fk_grade"),
    )
