"""Ranked retrieval over a document corpus: term statistics and BM25.

Library home of the entry queries ``term_frequencies`` / ``bm25_search``
(promoted in round 4 so users can call them on their own frames, the
same move as operators/funnel.py).

Scale shape: corpus statistics (N, avgdl, per-term document frequency)
are tiny aggregates ``broadcast()`` into the scoring join; the per-
(doc, term) frequencies come from one explode + one shuffle keyed on
(doc, term); ranking is a global top-k (TakeOrderedAndProject — no full
sort).  Nothing materializes per-corpus state larger than the query's
term list.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tube_spark.functions.text import tokens


def term_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """(per-doc token stream, per-doc length) — shared scaffolding."""
    tok = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    doclen = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    return tok, doclen


def bm25_topk(
    docs: DataFrame,
    terms: Sequence[str],
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25 for a bag-of-terms query:
    (id, bm25, n_matched_terms), ties broken by ascending id."""
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    tok, doclen = term_stats(docs, id_col, text_col)
    stats = doclen.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        tok.filter(F.col("term").isin(list(terms)))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    idf = F.ln(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_norm = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(df_), "term")
        .join(doclen, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn("contrib", idf * tf_norm)
        .groupBy(id_col)
        .agg(
            F.round(F.sum("contrib"), 6).alias("bm25"),
            F.count(F.lit(1)).alias("n_matched_terms"),
        )
        .orderBy(F.col("bm25").desc(), F.col(id_col).asc())
        .limit(k)
    )


def unigram_lm_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document unigram negative log-likelihood under the corpus
    unigram model — the classic cheap fluency/quality signal (a KenLM
    perplexity proxy without the external model): documents whose token
    distribution diverges from the corpus score high.

    p(term) = (count + alpha) / (total + alpha * vocab)   (add-alpha)
    avg_nll = mean over the doc's tokens of -ln p(term)
    ppl     = exp(avg_nll)

    One explode, one (term) count aggregation whose result is
    vocabulary-sized (broadcast into the scoring join), one per-doc
    aggregation keyed on id — linear in corpus tokens.  Token-less
    documents are omitted (no likelihood to report).
    """
    tok, _ = term_stats(docs, id_col, text_col)
    counts = tok.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("vocab")
    )
    p = (F.col("cnt") + F.lit(alpha)) / (
        F.col("total") + F.lit(alpha) * F.col("vocab")
    )
    return (
        tok.join(F.broadcast(counts), "term")
        .crossJoin(F.broadcast(totals))
        .withColumn("nll", -F.ln(p))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("nll"), 6).alias("avg_nll"),
            F.round(F.exp(F.avg("nll")), 4).alias("ppl"),
        )
    )
