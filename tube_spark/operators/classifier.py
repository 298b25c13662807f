"""Trainable document-quality classifier: distributed logistic
regression over native text features.

Production curation pipelines (CCNet, LLaMA/GPT-3 data work) gate web
documents with a linear classifier trained to recognize "reference-
like" text.  This is that component, Spark-first:

* **features** are pure Catalyst expressions over the text column
  (log-length, mean token length, stopword fraction, distinct-token
  ratio) — computed in the scan projection, no UDF, no tokenizer
  service;
* **standardization** is one tiny aggregate (means/stds, rounded) —
  embedded back as literals, so scoring stays map-only;
* **training** is full-batch gradient descent: each iteration is ONE
  aggregate job producing m+1 partial means (the gradient), collected
  to the driver (one row), the weight update applied in Python, and the
  new weights embedded as literals for the next pass.  The corpus never
  moves: per-iteration shuffle volume is m+1 doubles per partition.
  This is the same bounded-collect iteration shape as
  ``clustering.kmeans_fit`` — at 100 TB each pass is a map-side
  partial-aggregated scan, which is the floor for full-batch GD.
* **scoring** is a map-only projection (dot product + sigmoid).

Portability: gradients and weights are rounded to 6 decimals every
update.  ``exp`` differs across engines in the last ulp; per-row
sigmoid differences of ~1e-16 average into gradient components at
~1e-14, far below the rounding grain — so the whole training
trajectory, and therefore every weight and every (4-decimal) score, is
bit-reproducible in DuckDB.  The driver oracle replays the unrolled
iterations and hash-matches all scores.

Mini-batch/SGD variants would need per-batch barriers and give up
reproducibility; full-batch with a handful of iterations is the right
trade for a linear model over millions of rows.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tube_spark.functions.text import tokens

STOPWORDS = ("the", "a", "of", "and", "to", "in")


def text_features(text: Column) -> dict[str, Column]:
    """Named feature expressions.  DuckDB twins (t = tokenized text):
    ``ln(1 + len(t))``;
    ``list_sum(list_transform(t, x -> len(x)))::DOUBLE / nullif(len(t), 0)``;
    ``len(list_filter(t, x -> x IN (...)))::DOUBLE / nullif(len(t), 0)``;
    ``len(list_distinct(t))::DOUBLE / nullif(len(t), 0)``."""
    t = tokens(text)
    n = F.size(t)
    safe = F.when(n > 0, n.cast("double"))
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    return {
        "f_loglen": F.log(F.lit(1.0) + n.cast("double")),
        "f_wordlen": F.coalesce(
            F.aggregate(
                F.transform(t, lambda x: F.length(x)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / safe,
            F.lit(0.0),
        ),
        "f_stopfrac": F.coalesce(
            F.size(F.filter(t, lambda x: F.array_contains(stop, x))).cast("double")
            / safe,
            F.lit(0.0),
        ),
        "f_distinct": F.coalesce(
            F.size(F.array_distinct(t)).cast("double") / safe, F.lit(0.0)
        ),
    }


def standardization_stats(
    df: DataFrame, feature_cols: list[str], round_to: int = 6
) -> dict[str, tuple[float, float]]:
    """(mean, stddev_pop) per feature, rounded — one aggregate job."""
    aggs = []
    for c in feature_cols:
        aggs += [F.avg(c).alias(f"m_{c}"), F.stddev_pop(c).alias(f"s_{c}")]
    row = df.agg(*aggs).first()
    return {
        c: (round(row[f"m_{c}"], round_to), round(row[f"s_{c}"], round_to))
        for c in feature_cols
    }


def _standardize(df: DataFrame, stats: dict[str, tuple[float, float]]) -> DataFrame:
    for c, (m, s) in stats.items():
        denom = s if s != 0 else 1.0
        df = df.withColumn(c, (F.col(c) - F.lit(m)) / F.lit(denom))
    return df


def _margin(feature_cols: list[str], w: list[float], b: float) -> Column:
    z: Column = F.lit(float(b))
    for c, wj in zip(feature_cols, w):
        z = z + F.lit(float(wj)) * F.col(c)
    return z


def logreg_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    lr: float = 0.5,
    iters: int = 5,
    round_to: int = 6,
) -> tuple[list[float], float]:
    """Full-batch GD on standardized features already present in
    ``df``; returns (weights, bias).  ``label_col`` must be 0.0/1.0."""
    w = [0.0] * len(feature_cols)
    b = 0.0
    for _ in range(iters):
        sig = F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin(feature_cols, w, b)))
        err = sig - F.col(label_col)
        aggs = [F.avg(err * F.col(c)).alias(f"g_{c}") for c in feature_cols]
        aggs.append(F.avg(err).alias("g_bias"))
        row = df.agg(*aggs).first()
        w = [
            round(wj - lr * row[f"g_{c}"], round_to)
            for wj, c in zip(w, feature_cols)
        ]
        b = round(b - lr * row["g_bias"], round_to)
    return w, b


def logreg_score(
    df: DataFrame,
    feature_cols: list[str],
    w: list[float],
    b: float,
    out_col: str = "score",
    round_to: int = 4,
) -> DataFrame:
    """Map-only sigmoid score + thresholded label."""
    sig = F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin(feature_cols, w, b)))
    return df.withColumn(out_col, F.round(sig, round_to)).withColumn(
        "predicted", (F.col(out_col) >= 0.5).cast("int")
    )


def quality_classifier(
    docs: DataFrame,
    label: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    lr: float = 0.5,
    iters: int = 5,
) -> DataFrame:
    """End-to-end: features → standardize → train → score every doc.
    Returns ``(id, score, predicted, label)``."""
    feats = text_features(F.col(text_col))
    base = docs.select(
        F.col(id_col),
        label.cast("double").alias("y"),
        *[e.alias(n) for n, e in feats.items()],
    )
    cols = list(feats)
    stats = standardization_stats(base, cols)
    z = _standardize(base, stats).localCheckpoint(eager=False)
    w, b = logreg_train(z, cols, "y", lr=lr, iters=iters)
    return logreg_score(z, cols, w, b).select(
        id_col, "score", "predicted", F.col("y").cast("int").alias("label")
    )


def sigmoid(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))
