"""Text featurization without a model: hashed n-gram embeddings.

The similarity/vector operators (``similarity.py``, ``vectorstore.py``,
``semdedup.py``) consume an ``array<float>`` column.  Real pipelines
get it from a neural encoder; this module provides the classic
model-free baseline — the hashing trick (feature hashing, Weinberger
et al., ICML 2009): each word n-gram hashes to one of ``dim`` feature
indices with a ±1 sign drawn from another hash bit (sign-hashing keeps
collisions unbiased), term frequencies accumulate per index, and the
vector is L2-normalized.  Deterministic, vocabulary-free, and entirely
native Catalyst — which makes documents → vectors → ANN/near-dup a
fully differentially-testable path with no model dependency.

Shapes:
* ``hashed_ngram_features_sparse`` — (id, idx, val) entries; two keyed
  shuffles ((id, idx) combine, then per-id window for the norm).  The
  driver-facing oracle form (flat rows hash cleanly).
* ``hashed_ngram_features`` — dense ``array<double>`` assembled from
  the sparse map natively (``map_from_entries`` + ``transform`` over
  ``sequence``), ready for ``cosine_topk`` / ``build_ivf_store``.

At 100 TB the sparse form IS the scalable representation (dim=1M
hashed features stay sparse per doc); densify only at the consumer
that needs fixed-width vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tube_spark.functions.text import portable_hash60, tokens, word_ngrams


def hashed_ngram_features_sparse(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    n: int = 2,
    seed: str = "feat",
    l2_normalize: bool = True,
) -> DataFrame:
    """Sparse signed-hash features: (id, idx, val), val L2-normalized
    per document unless disabled.  Documents with no n-grams emit no
    rows."""
    if dim <= 0:
        raise ValueError(f"dim must be positive, got {dim}")
    grams = df.select(
        F.col(id_col),
        F.explode(word_ngrams(tokens(F.col(text_col)), n)).alias("g"),
    )
    h = portable_hash60(F.concat(F.lit(seed), F.col("g")))
    # sign bit via INTEGER division (h spans 60 bits — float division
    # would lose the low bits and scramble the parity)
    signed = grams.withColumn("__h", h).select(
        F.col(id_col),
        F.pmod(F.col("__h"), F.lit(dim)).alias("idx"),
        F.when(F.expr(f"pmod(__h div {dim}, 2)") == 1, F.lit(-1.0))
        .otherwise(F.lit(1.0))
        .alias("s"),
    )
    sparse = signed.groupBy(id_col, "idx").agg(F.sum("s").alias("val"))
    if not l2_normalize:
        return sparse
    w = Window.partitionBy(id_col)
    norm = F.sqrt(F.sum(F.col("val") * F.col("val")).over(w))
    return sparse.select(
        id_col,
        "idx",
        F.round(
            F.when(norm > 0, F.col("val") / norm).otherwise(F.lit(0.0)), 6
        ).alias("val"),
    )


def hashed_ngram_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    n: int = 2,
    seed: str = "feat",
    vec_col: str = "embedding",
) -> DataFrame:
    """Dense L2-normalized ``array<double>`` per document (docs with no
    n-grams get the zero vector).  Assembled natively from the sparse
    form: per-id map, then ``transform(sequence(0, dim-1))`` fills the
    gaps — no UDF, no collect."""
    sparse = hashed_ngram_features_sparse(
        df, id_col, text_col, dim, n, seed, l2_normalize=True
    )
    dense = (
        sparse.groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("idx", "val"))
            ).alias("__m")
        )
        .select(
            id_col,
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(
                    F.element_at(F.col("__m"), i.cast("long")), F.lit(0.0)
                ),
            ).alias(vec_col),
        )
    )
    # left join keeps empty documents (zero vector) in the output
    zeros = F.array_repeat(F.lit(0.0), dim)
    return (
        df.select(id_col)
        .join(dense, on=id_col, how="left")
        .select(id_col, F.coalesce(vec_col, zeros).alias(vec_col))
    )
