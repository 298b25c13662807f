"""Benchmark decontamination: flag training documents that overlap an
evaluation set by shared word n-grams.

The standard pre-training hygiene step (GPT-3 appendix C uses 13-gram
collisions; smaller n for short benchmarks): a training document is
contaminated if it shares at least ``min_hits`` distinct n-grams with
any benchmark document, or if the shared n-grams cover at least
``min_frac`` of that benchmark document's n-gram set.

100 TB shape: the benchmark side is small by definition (thousands of
eval items vs billions of train docs), so its exploded shingle index is
``broadcast()`` into the join — the training corpus streams through
map-side, one shuffle for the per-(train, eval) overlap count keyed on
the pair, never an all-pairs comparison and never a corpus-side
inverted index.  Shingle hashes are ``portable_hash`` (md5-derived) so
a SQL oracle reproduces the pipeline bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tube_spark.functions.text import portable_hash, tokens, word_shingles


def _shingle_rows(df: DataFrame, id_col: str, text_col: str, n: int, alias: str):
    sh = word_shingles(tokens(F.col(text_col)), n)
    return df.select(
        F.col(id_col).alias(alias), F.explode(sh).alias("g")
    ).select(alias, portable_hash(F.col("g")).alias("sh"))


def contamination_pairs(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    n: int = 5,
    min_hits: int = 1,
    min_frac: float | None = None,
) -> DataFrame:
    """(train_id, bench_id, n_shared, bench_frac) for every
    contaminated pair.  ``bench_frac`` is the fraction of the benchmark
    document's distinct n-grams found in the training document."""
    train_sh = _shingle_rows(corpus, id_col, text_col, n, "train_id")
    bench_sh = _shingle_rows(benchmark, bench_id_col, text_col, n, "bench_id")
    bench_sizes = bench_sh.groupBy("bench_id").agg(
        F.count(F.lit(1)).alias("bench_n")
    )
    hits = (
        train_sh.join(F.broadcast(bench_sh), "sh")
        .groupBy("train_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .join(F.broadcast(bench_sizes), "bench_id")
        .withColumn(
            "bench_frac",
            F.round(F.col("n_shared") / F.greatest("bench_n", F.lit(1)), 6),
        )
    )
    cond = F.col("n_shared") >= min_hits
    if min_frac is not None:
        cond = cond & (F.col("bench_frac") >= min_frac)
    return hits.filter(cond).select("train_id", "bench_id", "n_shared", "bench_frac")


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    n: int = 5,
    min_hits: int = 1,
    min_frac: float | None = None,
) -> DataFrame:
    """The corpus minus contaminated documents (left-anti on the pair
    set) — the actual filter step of the hygiene pipeline."""
    bad = contamination_pairs(
        corpus, benchmark, id_col, text_col, bench_id_col, n, min_hits, min_frac
    ).select(F.col("train_id").alias(id_col)).distinct()
    return corpus.join(bad, id_col, "left_anti")
