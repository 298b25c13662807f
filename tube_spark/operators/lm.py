"""Bigram language-model perplexity: the CCNet-style quality filter.

CCNet (Wenzek et al., 2019, arXiv:1911.00359) ranks web documents by
the perplexity of a language model trained on a trusted corpus and
keeps the low-perplexity head — the single most load-bearing quality
gate in public LLM data pipelines.  This module provides the
self-contained Spark form: an add-k-smoothed bigram LM trained on a
(possibly different) document corpus, applied as a per-document
perplexity score.  It upgrades ``retrieval.unigram_lm_score`` with
word-order sensitivity: shuffled or templated text that fools a
unigram model scores high here.

Model

    P(w2 | w1) = (c(w1,w2) + k) / (c(w1) + k * V_ev)

with ``c(w1)`` the count of ``w1`` *as a context* (the row-sum of the
bigram table, so the conditional sums to 1 over seen events) and
``V_ev`` the number of distinct event types (distinct ``w2``).  An
optional vocabulary cap maps all tokens outside the ``vocab_size``
most frequent training tokens to ``<unk>`` before bigram extraction —
the standard open-vocabulary treatment, and what bounds the model size
at corpus scale.

Scale shape (100 TB):

* Bigram construction is map-only — ``transform(sequence(...))`` over
  the token array, no window, no per-doc shuffle.
* The vocab cap is two broadcast hash joins (the keep-list is
  ``vocab_size`` rows).
* The model is one ``(w1, w2)`` groupBy (a single shuffle whose output
  is bounded by distinct bigrams — at most ``(V+1)^2`` rows under the
  cap, far less in practice); context counts derive from it by a
  vocabulary-sized rollup that broadcasts into the scoring join.
* Scoring joins the document bigrams to the bigram table on
  ``(w1, w2)`` — broadcast when the model fits (Catalyst/AQE decides),
  sort-merge otherwise — then one keyed aggregation per document.

Nothing here is quadratic in the corpus and no state other than the
model tables (bounded by the vocabulary cap) ever leaves the
executors.

Reference anchor: the reference engine has no LM scoring; this extends
the quality-filter family (text_analysis.py, retrieval.py) that
SURVEY.md scopes beyond reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tube_spark.functions.text import tokens

UNK = "<unk>"


def _doc_bigrams(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    vocab: DataFrame | None,
) -> DataFrame:
    """(id, w1, w2) — one row per adjacent token pair, map-only except
    the two broadcast keep-list joins when a vocabulary cap applies.
    ``<unk>`` cannot collide with a real token (tokens are [a-z]+)."""
    t = tokens(F.col(text_col))
    pairs = docs.select(F.col(id_col), t.alias("__t")).where(
        F.size("__t") >= 2
    )
    big = pairs.select(
        id_col,
        F.explode(
            F.expr(
                "transform(sequence(1, size(__t) - 1),"
                " i -> struct(__t[i-1] AS w1, __t[i] AS w2))"
            )
        ).alias("__b"),
    ).select(id_col, "__b.w1", "__b.w2")
    if vocab is None:
        return big
    k1 = F.broadcast(vocab.select(F.col("term").alias("__k1")))
    k2 = F.broadcast(vocab.select(F.col("term").alias("__k2")))
    return (
        big.join(k1, big["w1"] == k1["__k1"], "left")
        .join(k2, big["w2"] == k2["__k2"], "left")
        .select(
            id_col,
            F.coalesce("__k1", F.lit(UNK)).alias("w1"),
            F.coalesce("__k2", F.lit(UNK)).alias("w2"),
        )
    )


def top_vocab(
    docs: DataFrame, text_col: str = "text", vocab_size: int = 1000
) -> DataFrame:
    """The ``vocab_size`` most frequent tokens (ties broken by term
    asc — deterministic, and replayable in SQL as a row_number cut)."""
    counts = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # TakeOrderedAndProject (per-partition heaps + a vocab_size-row
    # merge), the zipf_fit form — at 100 TB the distinct-term frame is
    # 10^8-10^9 rows, so a single-task row_number window over it is a
    # scale-killer; with a deterministic total order, limit(k) selects
    # exactly the rows a row_number <= k cut would (the SQL oracle
    # replays it as that cut)
    return (
        counts.orderBy(F.col("cnt").desc(), F.col("term").asc())
        .limit(vocab_size)
        .select("term")
    )


def bigram_lm_perplexity(
    docs: DataFrame,
    train_docs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int | None = None,
    add_k: float = 0.5,
) -> DataFrame:
    """Per-document bigram perplexity under a model trained on
    ``train_docs`` (default: ``docs`` itself — the self-trained corpus
    fluency signal).  Output: (id, n_bigrams, avg_nll, ppl); documents
    with fewer than two tokens are omitted (no bigram likelihood to
    report).  ``avg_nll`` rounded to 6 decimals, ``ppl`` to 4.

    Unseen events degrade smoothly: a bigram absent from training
    scores ``k / (c(w1) + k*V_ev)``; an unseen context scores the
    uniform ``1 / V_ev``.
    """
    self_trained = train_docs is None
    if self_trained:
        train_docs = docs
    vocab = (
        top_vocab(train_docs, text_col, vocab_size)
        if vocab_size is not None
        else None
    )
    train_big = _doc_bigrams(train_docs, id_col, text_col, vocab)
    # NOT pinned when self-trained: the bigram frame is map-only
    # (explode + two broadcast joins), and materializing every bigram
    # row costs more than recomputing the pass (measured: pinning was
    # 1.7 -> 2.3 s at sf0.1, flat at sf1 — the reused-subtree rule
    # pays only when the subtree contains a shuffle or Python stage)
    score_big = (
        train_big
        if self_trained
        else _doc_bigrams(docs, id_col, text_col, vocab)
    )
    c12 = train_big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    return score_with_bigram_counts(score_big, c12, add_k, id_col)


def score_with_bigram_counts(
    score_big: DataFrame,
    c12: DataFrame,
    add_k: float,
    id_col: str = "doc_id",
) -> DataFrame:
    """Score (id, w1, w2) bigram rows against a ``(w1, w2, c12)`` count
    frame.  Context counts and the event-vocabulary size derive from
    the count frame itself (so the conditional sums to 1 over seen
    events).  Shared by the batch fit and the streaming twin (whose
    counts come from accumulated JSON state) — both paths run the
    IDENTICAL float expression, so equivalence under equal counts is
    bit-exact."""
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vev = c12.agg(F.count_distinct("w2").alias("vev"))
    p = (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(add_k)) / (
        F.coalesce(F.col("c1"), F.lit(0)) + F.lit(add_k) * F.col("vev")
    )
    return (
        score_big.join(c12, ["w1", "w2"], "left")
        .join(F.broadcast(c1), "w1", "left")
        .crossJoin(F.broadcast(vev))
        .withColumn("__nll", -F.ln(p))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("__nll"), 6).alias("avg_nll"),
            F.round(F.exp(F.avg("__nll")), 4).alias("ppl"),
        )
    )
