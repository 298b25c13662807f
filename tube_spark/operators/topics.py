"""Cluster labeling: class-based TF-IDF top terms per cluster.

K-means / SemDeDup / entity clusters are opaque integers; the question
a curator actually asks is "what IS cluster 7?".  The public BERTopic
recipe (Grootendorst 2022) answers it with class-based TF-IDF: treat
each cluster as one pseudo-document, score term t in cluster c as

    ctfidf(t, c) = tf(t, c) * ln(1 + A / df(t))

where ``tf`` is t's count inside c, ``df`` t's count across the whole
corpus, and ``A`` the average token count per cluster — terms frequent
in the cluster but rare overall float to the top.

Spark shape: one token explode → one (cluster, term) count + one term
total (both map-side combinable) → broadcast the per-cluster/corpus
scalars → rank per cluster.  Per-cluster ranking uses the bounded
top-k (grouped window over per-cluster terms is acceptable: the
keyed-term space is already aggregated, so each cluster's partition
holds distinct terms, not raw tokens — millions, not billions).
Fully deterministic (ties break on the term) → SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tube_spark.functions.text import tokens


def cluster_terms(
    df: DataFrame,
    cluster_col: str,
    text_col: str = "text",
    top_k: int = 5,
) -> DataFrame:
    """(cluster, term, tf, score, rank): the ``top_k`` class-TF-IDF
    terms per cluster."""
    if top_k <= 0:
        raise ValueError(f"top_k must be positive, got {top_k}")
    tok = df.select(
        F.col(cluster_col).alias("cluster"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    tf = tok.groupBy("cluster", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tok.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # A = average tokens per cluster: one-row aggregate, broadcast
    avg_tokens = (
        tok.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.avg("n").alias("A"))
    )
    scored = (
        tf.join(dfreq, on="term")
        .crossJoin(F.broadcast(avg_tokens))
        .select(
            "cluster",
            "term",
            "tf",
            (F.col("tf") * F.log(F.lit(1.0) + F.col("A") / F.col("df"))).alias(
                "raw"
            ),
        )
    )
    w = Window.partitionBy("cluster").orderBy(
        F.col("raw").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            "cluster",
            "term",
            "tf",
            F.round("raw", 6).alias("score"),
            F.col("rank").cast("integer").alias("rank"),
        )
    )
