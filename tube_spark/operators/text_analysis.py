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


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    window: int = 4,
) -> DataFrame:
    """MOSS-style winnowing document fingerprints (rolling-hash family).

    Hash every word k-gram, then keep the MIN hash of each sliding
    window of ``window`` consecutive k-gram hashes; the sorted distinct
    survivors are the document's fingerprint set.  Winnowing guarantees
    any shared substring of ≥ k+window−1 words between two documents
    yields at least one shared fingerprint — the standard local
    plagiarism/near-copy sketch (Schleimer et al., SIGMOD'03).

    Pure Catalyst: the k-gram array is built with the shifted-copy
    ``zip_with`` trick, the windowed min with ``window−1`` further
    ``zip_with(least)`` passes over shifted copies — O(k+window) whole-
    array ops per document, no HOF-per-element lambdas, no shuffle.
    Hashes are ``portable_hash`` (md5-derived) so DuckDB reproduces the
    pipeline bit-for-bit:

    DuckDB twin of the windowed min over hashes ``h`` (1-based):
      ``list_sort(list_distinct(list_transform(
            generate_series(1, len(h) - w + 1),
            i -> list_min(h[i:i+w-1]))))``
    """
    from tube_spark.functions.text import portable_hash  # local: avoids cycle risk

    # overlapping word k-grams IN ORDER (winnowing needs positions, so
    # no array_distinct here, unlike word_shingles)
    tok = tokens(F.col(text_col))
    length = F.greatest(F.size(tok) - F.lit(k - 1), F.lit(0))
    parts = [F.slice(tok, i + 1, length) for i in range(k)]
    grams = parts[0]
    for p in parts[1:]:
        grams = F.zip_with(grams, p, lambda a, b: F.concat_ws(" ", a, b))
    hashes = F.transform(grams, portable_hash)

    # windowed min via window-1 zip_with(least) passes over shifted copies
    n_windows = F.greatest(F.size(hashes) - F.lit(window - 1), F.lit(0))
    mins = F.slice(hashes, 1, n_windows)
    for i in range(1, window):
        mins = F.zip_with(mins, F.slice(hashes, i + 1, n_windows), lambda a, b: F.least(a, b))

    return df.select(
        F.col(id_col),
        F.sort_array(F.array_distinct(mins)).alias("fingerprints"),
    )


def _ordered_kgrams(tok: Column, k: int) -> Column:
    """Overlapping word k-grams in document order (shifted-slice
    zip_with build — O(k) whole-array ops, no per-element lambdas)."""
    if k == 1:
        return tok
    length = F.greatest(F.size(tok) - F.lit(k - 1), F.lit(0))
    parts = [F.slice(tok, i + 1, length) for i in range(k)]
    grams = parts[0]
    for p in parts[1:]:
        grams = F.zip_with(grams, p, lambda a, b: F.concat_ws(" ", a, b))
    return grams


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    grams: tuple[int, ...] = (1, 2, 3),
    top2_max: float = 0.20,
    dup3_max: float = 0.30,
) -> DataFrame:
    """Gopher-style within-document repetition signals, per document:
    for each k in ``grams``, the fraction of k-gram instances covered by
    the single most frequent k-gram (``top_{k}gram_frac``) and the
    fraction that are repeats of an earlier instance
    (``dup_{k}gram_frac``), plus an ``is_repetitive`` verdict using the
    Gopher-ish default thresholds (Rae et al. 2021 use per-n caps of
    this exact shape).

    Scale path: one exploded pass over (doc, k, gram) and three
    aggregations ALL keyed on doc_id-prefixed keys — linear in corpus
    token count, no per-document quadratic work, safe for documents of
    any length (a transform()-based in-array mode would be O(distinct x
    len) per doc and melt on long docs).
    """
    tok = tokens(F.col(text_col))

    # NB: the tag lambda must be unary — PySpark passes the array INDEX
    # to a second lambda parameter, which would silently shadow a
    # captured default (`lambda g, _k=k` receives the index as _k)
    def _tag(k: int):
        return lambda g: F.struct(F.lit(k).alias("k"), g.alias("g"))

    tagged = F.flatten(
        F.array(*[F.transform(_ordered_kgrams(tok, k), _tag(k)) for k in grams])
    )
    exploded = df.select(F.col(id_col), F.explode(tagged).alias("kg")).select(
        F.col(id_col), F.col("kg.k").alias("k"), F.col("kg.g").alias("g")
    )
    per_gram = exploded.groupBy(id_col, "k", "g").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    per_k = per_gram.groupBy(id_col, "k").agg(
        F.max("cnt").alias("top_cnt"),
        F.sum("cnt").alias("total"),
        F.count(F.lit(1)).alias("n_distinct"),
    )
    frac = lambda num, den: F.round(num / F.greatest(den, F.lit(1)), 6)  # noqa: E731
    wide = per_k.groupBy(id_col).agg(
        *[
            f
            for k in grams
            for f in (
                frac(
                    F.max(F.when(F.col("k") == k, F.col("top_cnt"))),
                    F.max(F.when(F.col("k") == k, F.col("total"))),
                ).alias(f"top_{k}gram_frac"),
                frac(
                    F.max(F.when(F.col("k") == k, F.col("total") - F.col("n_distinct"))),
                    F.max(F.when(F.col("k") == k, F.col("total"))),
                ).alias(f"dup_{k}gram_frac"),
            )
        ]
    )
    # token-less documents produce no exploded rows; re-attach them with
    # zero fractions so the output covers every input document
    out = df.select(F.col(id_col)).join(wide, id_col, "left")
    for k in grams:
        for c in (f"top_{k}gram_frac", f"dup_{k}gram_frac"):
            out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0.0)))
    if 2 in grams and 3 in grams:
        out = out.withColumn(
            "is_repetitive",
            (F.col("top_2gram_frac") > top2_max)
            | (F.col("dup_3gram_frac") > dup3_max),
        )
    return out


def ngram_novelty(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Per-document n-gram NOVELTY against the earlier corpus: the
    share of a document's distinct word n-grams whose FIRST occurrence
    (minimum ``id_col`` over the whole corpus) is this document.

    The curation signal behind "is the crawl still adding new text or
    re-serving what we have" and per-source novelty curves — dedup
    asks "is this a copy of one other doc", novelty asks "how much of
    this doc exists ANYWHERE earlier".  Returns
    ``(id, n_grams, n_novel, novelty)`` with ``n_grams`` = distinct
    grams; documents shorter than ``n`` tokens keep their row with
    zero grams and NULL novelty (never silently dropped).

    Scale shape: one explode + one (gram -> min id) agg + one
    (id, first-flag) count — the minhash-family gram volume, state one
    row per DISTINCT gram, no pairwise anything.  The gram agg
    map-side-combines; skewed hot grams cost one combiner cell each.
    """
    from tube_spark.functions.text import tokens, word_shingles

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    base = df.select(
        F.col(id_col).alias("__id"),
        word_shingles(tokens(F.col(text_col)), n).alias("__grams"),
    )
    grams = base.select(
        "__id", F.explode("__grams").alias("gram")
    )
    first = grams.groupBy("gram").agg(F.min("__id").alias("__first"))
    per_doc = (
        grams.join(first, "gram")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("__first") == F.col("__id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
    )
    return (
        base.select("__id")
        .join(per_doc, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
            F.when(
                F.coalesce("n_grams", F.lit(0)) > 0,
                F.round(F.col("n_novel") / F.col("n_grams"), 6),
            ).alias("novelty"),
        )
    )


def structural_templates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
) -> DataFrame:
    """Template/boilerplate mining by STRUCTURAL skeleton: lowercase
    the text, collapse every letter run to ``w`` and digit run to
    ``0``, squeeze whitespace — documents generated from the same
    template (error pages, listing boilerplate, form letters) collapse
    to one skeleton even though exact/near-dup misses them (their slot
    VALUES differ everywhere, so shingle overlap is low).  Returns one
    row per skeleton seen in >= ``min_docs`` documents:
    ``(skeleton, n_docs, n_texts, example_doc_id, total_chars)`` with
    ``n_texts`` = distinct raw texts (1 means exact dups, > 1 means a
    true fill-in template) and the minimum id as the stable example.

    Map-only skeletonization (fuses into the scan) + one count agg —
    the text_stats scale shape.  DuckDB twin of the skeleton:
    ``trim(regexp_replace(regexp_replace(regexp_replace(lower(text),
    '[a-z]+', 'w', 'g'), '[0-9]+', '0', 'g'), '\\s+', ' ', 'g'))``.
    """
    if min_docs < 1:
        raise ValueError(f"min_docs must be >= 1, got {min_docs}")
    skel = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col(text_col)), "[a-z]+", "w"),
                "[0-9]+",
                "0",
            ),
            "\\s+",
            " ",
        )
    )
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("__id"),
            skel.alias("skeleton"),
            F.col(text_col).alias("__text"),
        )
        .groupBy("skeleton")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("__text").alias("n_texts"),
            F.min("__id").alias("example_doc_id"),
            F.sum(F.length("__text")).alias("total_chars"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def zipf_fit(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 1000,
) -> DataFrame:
    """Zipf's-law fit over the corpus unigram distribution: OLS of
    ln(frequency) on ln(rank) for the ``top_n`` most frequent terms.

    A natural corpus follows ln(tf) ~ intercept - s·ln(rank) with
    s ≈ 1 and r² near 1 (Zipf 1949; Piantadosi 2014 for the modern
    treatment); machine-generated / templated / keyword-stuffed
    corpora bend the curve — slope and r² are standard corpus-health
    numbers next to ngram_novelty and repetition_stats.

    One row: n_terms (distinct vocabulary), n_fit (terms entering the
    fit), zipf_slope (the NEGATIVE s, i.e. the raw OLS coefficient),
    zipf_intercept, zipf_r2.  Degenerate vocabularies (< 2 distinct
    fit terms → zero rank variance) yield NULL slope/intercept/r2
    rather than a fabricated fit.

    Shape: one explode + map-side-combinable count, a bounded top-n
    cut (TakeOrderedAndProject — no global sort materialization), then
    a single agg over ≤ top_n rows; OLS is closed-form
    (covar_pop/var_pop — the n-vs-n-1 convention cancels in the
    ratio, so the DuckDB twin matches bit-for-bit).
    """
    from pyspark.sql import Window

    tok = df.select(F.explode(tokens(F.col(text_col))).alias("term"))
    counts = tok.groupBy("term").agg(F.count(F.lit(1)).alias("tf"))
    n_terms = counts.agg(F.count(F.lit(1)).alias("n_terms"))
    top = counts.orderBy(F.col("tf").desc(), F.col("term").asc()).limit(top_n)
    # the frame is <= top_n rows — the unpartitioned window is bounded
    ranked = top.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.col("tf").desc(), F.col("term").asc())),
    ).select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("tf").cast("double")).alias("y"),
    )
    # try_divide: a 0/1-term vocabulary has zero rank variance — NULL
    # fit, not an ANSI divide-by-zero error
    fit = ranked.agg(
        F.count(F.lit(1)).alias("n_fit"),
        F.try_divide(F.covar_pop("x", "y"), F.var_pop("x")).alias("slope"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        # explicit Pearson behind try_divide: a frequency-uniform corpus
        # has zero y-variance and ANSI-mode corr() raises DIVIDE_BY_ZERO
        # where the SQL convention is NULL
        F.try_divide(
            F.covar_pop("x", "y"), F.stddev_pop("x") * F.stddev_pop("y")
        ).alias("r"),
    ).select(
        "n_fit",
        F.round("slope", 6).alias("zipf_slope"),
        F.round(F.col("my") - F.col("slope") * F.col("mx"), 6).alias(
            "zipf_intercept"
        ),
        F.round(F.col("r") * F.col("r"), 6).alias("zipf_r2"),
    )
    return n_terms.crossJoin(fit).select(
        "n_terms", "n_fit", "zipf_slope", "zipf_intercept", "zipf_r2"
    )


def compression_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """(id, n_bytes, n_deflate_bytes, compression_ratio) — DEFLATE
    compressibility as a redundancy/quality signal: boilerplate,
    repeated templates, and log spam compress far below natural prose
    (a Gopher-family screen that catches repetition ``repetition_stats``
    n-gram shares can miss when the repeated unit is long).
    ``compression_ratio`` = n_bytes / n_deflate_bytes over the UTF-8
    encoding — higher = more redundant; NULL text yields NULL signals
    (rows kept: auditable, filterable).

    The one legitimately Python-side kernel in this module: DEFLATE is
    stdlib ``zlib`` (the multimodal-codec argument — per-byte work, not
    relational), Arrow-batched via ``mapInPandas``, level fixed so the
    signal is deterministic.  Not SQL-replayable (no DEFLATE in SQL);
    differentially pinned against local zlib by pytest instead."""
    import pandas as pd

    schema = (
        f"`{id_col}` long, n_bytes long, n_deflate_bytes long, "
        "compression_ratio double"
    )

    def run(batches):
        import zlib

        for pdf in batches:
            out = {id_col: pdf[id_col], "n_bytes": [], "n_deflate_bytes": [],
                   "compression_ratio": []}
            for t in pdf[text_col]:
                if t is None:
                    out["n_bytes"].append(None)
                    out["n_deflate_bytes"].append(None)
                    out["compression_ratio"].append(None)
                    continue
                raw = t.encode("utf-8")
                nz = len(zlib.compress(raw, level))
                out["n_bytes"].append(len(raw))
                out["n_deflate_bytes"].append(nz)
                out["compression_ratio"].append(
                    len(raw) / nz if nz else None
                )
            yield pd.DataFrame(out)

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        run, schema=schema
    )
