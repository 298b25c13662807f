"""DSIR: data selection with importance resampling (Xie et al., 2023,
arXiv:2302.03169).

The public-method standard for "make the raw corpus look like a
trusted target corpus": fit two bag-of-hashed-n-gram unigram models —
one on the target distribution, one on the raw pool — and weight every
raw document by its log importance ratio

    log w(x) = sum over the document's hashed features b of
               log p_target(b) - log p_raw(b)

with add-k smoothing over the ``dim`` hash buckets.  High-weight
documents look like the target; resampling by ``exp(log w)`` (e.g. via
``sampling.weighted_sample``, which composes directly with this
output) yields the DSIR-selected subset.

Features are word unigrams + bigrams hashed into ``dim`` buckets with
the portable salted md5 hash (``functions.text.portable_hash60``), so
the whole computation — hashing included — is replayable bit-for-bit
in a SQL oracle.

Scale shape (100 TB):

* Feature extraction is map-only (token array → n-gram arrays →
  explode; no per-doc shuffle).
* Both models are one groupBy(bucket) each — output bounded by
  ``dim`` rows regardless of corpus size.
* The per-bucket log-ratio table (``dim`` rows) broadcasts into the
  scoring join; scoring is then a broadcast join + one keyed
  aggregation per document.  Nothing grows with the corpus except the
  two linear scans.

Reference anchor: no counterpart in the reference engine; part of the
LLM-pipeline suite (SURVEY.md scope beyond reference parity),
composing with sampling.weighted_sample and mixture.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tube_spark.functions.text import portable_hash60, tokens, word_ngrams


def _doc_buckets(
    df: DataFrame, id_col: str, text_col: str, dim: int, seed: str
) -> DataFrame:
    """(id, bucket) — one row per unigram+bigram occurrence, hashed
    into [0, dim) with the portable salted hash.  Map-only."""
    t = tokens(F.col(text_col))
    grams = F.concat(word_ngrams(t, 1), word_ngrams(t, 2))
    g = df.select(F.col(id_col), F.explode(grams).alias("__g"))
    b = F.pmod(portable_hash60(F.concat(F.lit(seed), F.col("__g"))), F.lit(dim))
    return g.select(id_col, b.alias("bucket"))


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 1024,
    add_k: float = 0.5,
    seed: str = "dsir",
) -> DataFrame:
    """Per-raw-document DSIR log importance weight.  Output:
    (id, n_feats, log_weight, avg_log_weight) — ``log_weight`` is the
    raw DSIR score (length-biased, what the paper resamples by),
    ``avg_log_weight`` the per-feature mean (length-normalized variant
    for thresholding).  Both rounded to 6 decimals.  Documents with no
    features (no tokens) are omitted.

    Buckets unseen in either corpus contribute the smoothed floor on
    that side — add-k over ``dim`` buckets keeps every ratio finite.
    """
    # raw_b feeds BOTH the model count and the scoring join — pinned so
    # the hash/explode pass runs once (reused-subtree rule)
    raw_b = _doc_buckets(raw, id_col, text_col, dim, seed).localCheckpoint(
        eager=False
    )
    tgt_b = _doc_buckets(target, id_col, text_col, dim, seed)

    rc = raw_b.groupBy("bucket").agg(F.count(F.lit(1)).alias("rc"))
    tc = tgt_b.groupBy("bucket").agg(F.count(F.lit(1)).alias("tc"))
    # dim-bounded model tables; full outer so a bucket seen on only one
    # side still gets its smoothed ratio
    model = rc.join(tc, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("rc", F.lit(0)).alias("rc"),
        F.coalesce("tc", F.lit(0)).alias("tc"),
    )
    return score_against_model(raw_b, model, dim, add_k, id_col)


def score_against_model(
    doc_buckets: DataFrame,
    model: DataFrame,
    dim: int,
    add_k: float,
    id_col: str = "doc_id",
) -> DataFrame:
    """Score (id, bucket) feature rows against a ``(bucket, rc, tc)``
    model frame.  Shared by the batch fit and the streaming twin
    (whose model rows come from accumulated JSON state) so both paths
    run the IDENTICAL float expression — equivalence is bit-exact, not
    approximate."""
    totals = model.agg(F.sum("rc").alias("rt"), F.sum("tc").alias("tt"))
    lr = (
        model.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                F.ln((F.col("tc") + F.lit(add_k)) / (F.col("tt") + F.lit(add_k) * dim))
                - F.ln((F.col("rc") + F.lit(add_k)) / (F.col("rt") + F.lit(add_k) * dim))
            ).alias("lr"),
        )
    )
    return (
        doc_buckets.join(F.broadcast(lr), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.round(F.sum("lr"), 6).alias("log_weight"),
            F.round(F.avg("lr"), 6).alias("avg_log_weight"),
        )
    )
