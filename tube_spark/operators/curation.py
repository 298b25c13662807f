"""End-to-end corpus curation: the composed pipeline a training-data
run actually executes, as ONE Catalyst plan.

Stages (all deterministic, so the whole pipeline is differentially
testable against SQL):

1. quality gate     — text_stats quality score ≥ threshold
2. exact dedup      — keep the minimum doc_id per identical text
3. near-dup drop    — compute word-n-gram Jaccard pairs among survivors
                      and drop the HIGHER doc_id of every pair ≥ τ
                      (canonical-survivor rule)
4. enrich           — left-join embeddings; flag availability

The near-dup stage uses the exact inverted-index Jaccard (not MinHash)
so the result is reproducible; swap in ``minhash_lsh_pairs`` for the
approximate version at extreme scale — the surrounding plan is
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tube_spark.operators.dedup import exact_duplicates, ngram_jaccard_pairs
from tube_spark.operators.text_analysis import text_stats


def curate_corpus(
    docs: DataFrame,
    embeddings: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    ngram_n: int = 1,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """Returns the curated corpus: (doc_id, n_tokens, lang_pred,
    quality_score, is_near_dup_dropped=false rows only, has_embedding)."""
    stats = text_stats(docs, id_col, text_col)
    quality_ids = stats.filter(F.col("quality_score") >= min_quality).select(
        id_col, "n_tokens", "lang_pred", "quality_score"
    )
    survivors = docs.join(quality_ids.select(id_col), on=id_col, how="inner")

    # exact dedup: keep canonical (min) id per content hash
    canon = exact_duplicates(survivors, id_col, text_col, normalized=False).select(
        F.col("canonical_id").alias(id_col)
    )
    survivors = survivors.join(canon, on=id_col, how="inner")

    # near-dup drop: the higher id of every pair above threshold dies
    pairs = ngram_jaccard_pairs(
        survivors, id_col, text_col, n=ngram_n, threshold=jaccard_threshold
    )
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    survivors = survivors.join(dropped, on=id_col, how="left_anti")

    out = survivors.select(id_col).join(quality_ids, on=id_col, how="inner")
    if embeddings is not None:
        emb_ids = embeddings.select(F.col("vec_id").alias(id_col)).distinct()
        out = out.join(
            emb_ids.withColumn("has_embedding", F.lit(True)), on=id_col, how="left"
        ).withColumn("has_embedding", F.coalesce("has_embedding", F.lit(False)))
    return out
