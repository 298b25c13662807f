"""Text analysis for corpus curation: language ID, quality scoring,
token counting, fingerprinting.

All pure Catalyst expressions (each documents its DuckDB equivalent for
differential testing).  At 100 TB these are embarrassingly parallel
map-only transforms — no shuffle at all; the whole module fuses into
one WholeStageCodegen span over the document scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tube_spark.functions.text import fingerprint, token_count_bpe_ish, tokens

# Tiny per-language stopword inventories for the n-gram/stopword-overlap
# language heuristic.  Deliberately small and literal so the oracle SQL
# can embed the same lists.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "as"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "del", "las", "por"),
    "fr": ("le", "la", "de", "et", "les", "des", "en", "un", "du", "une"),
    "de": ("der", "die", "und", "das", "von", "den", "mit", "für", "auf", "ist"),
}

_EN_STOPWORDS = STOPWORDS["en"]


def lang_scores(tok: Column) -> dict[str, Column]:
    """Per-language score: count of *distinct* stopwords present.
    DuckDB: ``len(list_intersect(toks, ['the','and',...]))``."""
    return {
        lang: F.size(F.array_intersect(tok, F.array(*[F.lit(w) for w in words])))
        for lang, words in STOPWORDS.items()
    }


def lang_id_col(tok: Column) -> Column:
    """Argmax language with deterministic tie-break (lexicographic lang
    code wins ties; 'und' when no stopword matches at all)."""
    scores = lang_scores(tok)
    best = F.greatest(*scores.values())
    out = F.lit("und")
    # iterate in reverse-alphabetical order so the final (alphabetically
    # first) when() wins ties
    for lang in sorted(scores, reverse=True):
        out = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(out)
    return out


def text_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document stats + quality score.

    Columns (each with a DuckDB twin, see __spark_entry__ oracles):
      n_chars, n_tokens (whitespace words), n_tokens_bpe, avg_token_len,
      stopword_ratio, upper_ratio, digit_ratio, quality_score, lang_pred.
    """
    t = F.col(text_col)
    tok = tokens(t)
    n_tokens = F.size(tok)
    total_tok_len = F.aggregate(tok, F.lit(0), lambda acc, x: acc + F.length(x))
    stop_hits = F.size(F.filter(tok, lambda x: x.isin(*_EN_STOPWORDS)))
    n_chars = F.length(t)
    digit_ratio = (
        F.length(F.regexp_replace(t, "[^0-9]", "")) / F.greatest(n_chars, F.lit(1))
    )
    upper_ratio = (
        F.length(F.regexp_replace(t, "[^A-Z]", "")) / F.greatest(n_chars, F.lit(1))
    )
    avg_tok = (total_tok_len / F.greatest(n_tokens, F.lit(1))).cast("double")
    stop_ratio = (stop_hits / F.greatest(n_tokens, F.lit(1))).cast("double")
    # simple composite quality heuristic: long-enough docs with natural
    # word lengths and some stopword mass score higher
    quality = (
        F.least(n_tokens / F.lit(50.0), F.lit(1.0)) * F.lit(0.4)
        + F.when((avg_tok >= 3) & (avg_tok <= 10), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.least(stop_ratio * 3, F.lit(0.3))
    )
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        token_count_bpe_ish(t).cast("long").alias("n_tokens_bpe"),
        F.round(avg_tok, 6).alias("avg_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(upper_ratio, 6).alias("upper_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(quality, 6).alias("quality_score"),
        lang_id_col(tok).alias("lang_pred"),
        fingerprint(t).alias("fingerprint"),
    )
