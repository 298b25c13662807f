"""Span-level (substring) duplication analysis across a corpus.

Document-level dedup (``operators/dedup.py``) misses the dominant form
of web duplication: documents that are globally distinct but share long
verbatim SPANS — boilerplate, license headers, quoted passages.
"Deduplicating Training Data Makes Language Models Better" (Lee et al.,
ACL 2022, arXiv:2107.06499) removes such spans with a suffix array; the
map-reduce re-expression used at corpus scale is fixed-width window
hashing (the same approximation their released pipeline applies for
distributed runs): a length-``k`` token window appearing verbatim in
two different documents is a duplicated span seed, and a document's
*duplicated-token fraction* is the share of its tokens covered by at
least one cross-document duplicated window.

Dataflow (all native Catalyst — no Python in the hot path):

1. **index**: ``posexplode`` of positional k-gram hashes → one row per
   token position ``(doc, pos, gram_hash)``.  Hashes are 8-byte ints
   (``xxhash64``, or the md5-derived portable hash when a differential
   oracle must reproduce them).
2. **dup set**: ``(gram_hash, doc)`` distinct → count per hash → hashes
   seen in ≥ ``min_docs`` distinct documents.  Both steps are partial-
   aggregated map-side; the shuffle key is the 8-byte hash.
3. **hits**: left-semi join of the position rows against the dup set —
   no row blowup (build side is distinct hashes), AQE splits the
   inevitable hot keys (boilerplate windows are hot *by definition*).
4. **coverage**: per document, windows at sorted positions p₁<p₂<…
   cover ``Σ min(k, pᵢ₊₁ − pᵢ) + k`` tokens (interval union via one
   ``lag`` window, keyed by doc — state is one row).

SCALE: the corpus is scanned twice (once for the dup set, once for the
hits) — deliberate.  Materializing the positional index to avoid the
re-scan would persist a corpus-sized frame; re-tokenizing is map-side
CPU, which is the cheap resource at 100 TB.  Nothing is ever
O(pairs): unlike Jaccard/LSH there is no candidate join — membership
in the dup set is the whole test.

Within-document repetition is deliberately out of scope here
(``count(DISTINCT doc) >= min_docs`` ignores self-repeats); that signal
is ``text_analysis.repetition_stats``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tube_spark.functions.text import portable_hash60, tokens, word_ngrams


def _positional_hashes(
    df: DataFrame, id_col: str, text_col: str, k: int, portable: bool
) -> DataFrame:
    """(id, pos, sh): one row per token position with the hash of the
    k-token window starting there.  0-based positions."""
    grams = word_ngrams(tokens(F.col(text_col)), k)
    out = df.select(F.col(id_col), F.posexplode(grams).alias("pos", "gram"))
    h = portable_hash60(F.col("gram")) if portable else F.xxhash64("gram")
    return out.select(F.col(id_col), "pos", h.alias("sh"))


def span_dup_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_docs: int = 2,
    portable: bool = False,
) -> DataFrame:
    """Per-document duplicated-span statistics:

    ``(id, n_tokens, n_dup_windows, dup_tokens, dup_fraction)``

    * ``n_dup_windows`` — positions whose k-token window also appears in
      ≥ ``min_docs``−1 OTHER documents;
    * ``dup_tokens`` — tokens covered by the union of those windows;
    * ``dup_fraction`` — ``dup_tokens / n_tokens`` (0.0 for docs shorter
      than ``k`` tokens).

    Filter on ``dup_fraction`` to drop boilerplate-heavy documents, or
    feed ``n_dup_windows > 0`` docs to a finer-grained span remover.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    pos = _positional_hashes(df, id_col, text_col, k, portable)
    dup = (
        pos.select("sh", id_col)
        .distinct()
        .groupBy("sh")
        .agg(F.count(F.lit(1)).alias("ndocs"))
        .filter(F.col("ndocs") >= min_docs)
        .select("sh")
    )
    hits = pos.join(dup, "sh", "left_semi")
    w = Window.partitionBy(id_col).orderBy("pos")
    gap = F.col("pos") - F.lag("pos").over(w)
    cov = hits.select(
        id_col, F.least(F.lit(k), F.coalesce(gap, F.lit(k))).alias("covered")
    ).groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_dup_windows"),
        F.sum("covered").cast("long").alias("dup_tokens"),
    )
    base = df.select(
        F.col(id_col), F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens")
    )
    return (
        base.join(cov, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("n_dup_windows", F.lit(0)).cast("long").alias("n_dup_windows"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            F.when(
                F.col("n_tokens") > 0,
                F.round(
                    F.coalesce("dup_tokens", F.lit(0)) / F.col("n_tokens"), 6
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_fraction"),
        )
    )


def span_dup_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_docs: int = 2,
    max_fraction: float = 0.5,
    portable: bool = False,
) -> DataFrame:
    """Documents whose duplicated-token fraction is ≤ ``max_fraction``
    (the keep side of the Lee-et-al. span-dedup gate), original columns
    preserved."""
    stats = span_dup_stats(df, id_col, text_col, k, min_docs, portable)
    keep = stats.filter(F.col("dup_fraction") <= max_fraction).select(id_col)
    return df.join(keep, id_col, "left_semi")


def dedup_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    min_line_chars: int = 1,
    hash_lines: bool = False,
) -> DataFrame:
    """Corpus-wide duplicated-LINE removal (the RefinedWeb/C4 pass):
    a line appearing in ≥ ``min_docs`` distinct documents is kept only
    in the lowest-id document holding it and removed everywhere else;
    lines shorter than ``min_line_chars`` are exempt (empty lines and
    stray punctuation are not boilerplate evidence).  Returns
    ``(id, text, n_lines, n_lines_removed)`` with the document text
    rebuilt in original line order.  NULL ``text`` normalizes to the
    empty string — the document row is PRESERVED (with ``text = ''``),
    never silently dropped.

    Scale shape: one ``posexplode`` over lines; the dup-stat aggregate
    (``count(DISTINCT doc), min(doc)`` per line) is the only extra
    shuffle; boilerplate lines are hot keys by definition, which is
    exactly what AQE skew-split handles; the rebuild reuses the
    per-document grouping every doc-level operator needs anyway.

    ``hash_lines=True`` is the 100 TB configuration: a first aggregate
    keyed on ``xxhash64(line)`` — 8 bytes instead of the raw line —
    finds candidate hashes held by ≥ ``min_docs`` docs; exact textual
    stats are then computed ONLY over lines matching a candidate hash
    (at web scale the overwhelming majority of lines are unique and
    never enter a text-keyed exchange), and the dup-stat join verifies
    line equality alongside the hash.  A hash collision can only ADD a
    line to the candidate set, never remove one, and the second pass
    recomputes exact per-line stats — so the output is IDENTICAL to
    the textual path on every input (pinned by
    tests/test_spandedup.py).  The textual path stays the default
    because it is the oracle-replayable semantics.
    """
    lines = docs.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("pos", "line"),
    )
    eligible = F.length(F.col("line")) >= min_line_chars

    def _line_stats(frame: DataFrame) -> DataFrame:
        return (
            frame.groupBy("line")
            .agg(
                F.count_distinct(F.col(id_col)).alias("n_docs"),
                F.min(F.col(id_col)).alias("keeper"),
            )
            .filter(F.col("n_docs") >= min_docs)
        )

    if hash_lines:
        lines = lines.withColumn("lh", F.xxhash64("line"))
        # pass 1: pure 8-byte-key exchange — no line text moves
        hot = (
            lines.filter(eligible)
            .groupBy("lh")
            .agg(F.count_distinct(F.col(id_col)).alias("h_docs"))
            .filter(F.col("h_docs") >= min_docs)
            .select("lh")
        )
        # pass 2: exact textual stats over the candidate minority only
        stats = _line_stats(
            lines.join(hot, on="lh", how="left_semi").filter(eligible)
        ).withColumn("lh", F.xxhash64("line"))
        join_on = ["lh", "line"]  # hash narrows, equality verifies
    else:
        stats = _line_stats(lines.filter(eligible))
        join_on = ["line"]
    kept = (
        lines.join(stats, on=join_on, how="left")
        .withColumn(
            "keep",
            F.col("n_docs").isNull() | (F.col(id_col) == F.col("keeper")),
        )
    )
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("keep"), F.struct("pos", "line")).otherwise(
                                F.lit(None)
                            )
                        )
                    ),
                    lambda x: x["line"],
                ),
                "\n",
            ).alias(text_col),
            F.count("*").cast("long").alias("n_lines"),
            F.sum(F.when(~F.col("keep"), 1).otherwise(0))
            .cast("long")
            .alias("n_lines_removed"),
        )
    )
