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


def rrf_fuse(
    rankings: Sequence[DataFrame],
    names: Sequence[str],
    id_col: str = "doc_id",
    k: int = 20,
    rrf_k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR'09) of N ranked
    lists: ``score(d) = Σ_lists 1/(rrf_k + rank_list(d))``, summing only
    the lists that ranked d.

    Each input must carry (id_col, "rank"); the output has one
    ``<name>_rank`` column per list (NULL when absent from that list)
    plus the fused ``rrf_score``, top-k by (score desc, id) —
    a TakeOrderedAndProject, never a full sort.

    Scale: candidate lists are top-N subsets (bounded), so every join
    here is broadcast-sized regardless of corpus size; fusion cost is
    independent of the corpus."""
    assert len(rankings) == len(names) and rankings
    fused = None
    for df, name in zip(rankings, names):
        part = df.select(F.col(id_col), F.col("rank").alias(f"{name}_rank"))
        fused = part if fused is None else fused.join(part, id_col, "full")
    score = None
    for name in names:
        c = F.when(
            F.col(f"{name}_rank").isNotNull(),
            1.0 / (F.lit(rrf_k) + F.col(f"{name}_rank")),
        ).otherwise(F.lit(0.0))
        score = c if score is None else score + c
    return (
        fused.withColumn("rrf_score", F.round(score, 6))
        .orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "rrf_score", *[f"{n}_rank" for n in names])
    )


def hybrid_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    terms: Sequence[str],
    query_vec_id: int,
    k: int = 20,
    pool: int = 30,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid (sparse + dense) retrieval: BM25 over the text column and
    cosine against a query embedding drawn from the corpus
    ("more-like-this" for ``query_vec_id``), fused with RRF.

    The sparse and dense branches each produce a top-``pool`` candidate
    list with deterministic ranks (rounded score desc, id asc); fusion
    is rank-only, so the two branches never need comparable score
    scales — the whole point of RRF.  The query vector joins in as a
    broadcast one-row frame (no driver collect); the dense branch is
    the exact brute-force scorer, swappable for ivf_topk/rhp_lsh_topk
    at corpus scales where exact scanning is the bottleneck."""
    from pyspark.sql import Window

    from tube_spark.operators.similarity import cosine

    sparse = bm25_topk(docs, terms, k=pool, id_col=id_col, text_col=text_col)
    wb = Window.orderBy(F.col("bm25").desc(), F.col(id_col).asc())
    sparse = sparse.withColumn("rank", F.row_number().over(wb))

    v = F.col(vec_col).cast("array<double>")
    emb = embeddings.select(F.col(vec_id_col).alias(id_col), v.alias("v"))
    # .limit(1) makes the broadcast side STRUCTURALLY one-row (the id
    # filter already guarantees it semantically) — the plan audit can
    # then prove the BNLJ build bounded instead of trusting the filter
    qv = (
        emb.filter(F.col(id_col) == query_vec_id)
        .select(F.col("v").alias("qv"))
        .limit(1)
    )
    dense = (
        emb.filter(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(qv))
        .withColumn("cos", F.round(cosine(F.col("v"), F.col("qv")), 6))
    )
    # top-pool FIRST via orderBy+limit (TakeOrderedAndProject: per-
    # partition heaps + a pool-row driver merge), then rank the bounded
    # candidate set — a global row_number window over the corpus would
    # funnel every row through one partition
    dense = (
        dense.orderBy(F.col("cos").desc(), F.col(id_col).asc())
        .limit(pool)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("cos").desc(), F.col(id_col).asc())
            ),
        )
        .select(id_col, "rank")
    )
    return rrf_fuse(
        [sparse.select(id_col, "rank"), dense],
        ["bm25", "dense"],
        id_col=id_col,
        k=k,
        rrf_k=rrf_k,
    )


def doc_keywords(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Per-document keyword extraction: the top-``k`` terms by TF-IDF
    (sklearn's smooth variant: ``tf * (ln((1+N)/(1+df)) + 1)``) —
    ``(id, rank, term, score)``, ties by ascending term.  The
    document-level counterpart of topics.py's per-CLUSTER c-TF-IDF
    labels; feeds metadata enrichment and sparse-signal routing.

    Scale shape: one (doc, term) count, per-term df as a second keyed
    agg broadcast into the scoring join, and the funnel-free grouped
    top-k — never a per-doc window over the full token stream.  Ranks
    order by the UNROUNDED score (rounding is for oracle portability
    of the output only)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    tok, _ = term_stats(docs, id_col, text_col)
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = docs.count()
    df_ = tf.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    idf = F.log((F.lit(1.0) + F.lit(n_docs)) / (F.lit(1.0) + F.col("df"))) + F.lit(1.0)
    scored = tf.join(F.broadcast(df_), "term").withColumn(
        "score", F.col("tf") * idf
    )
    from tube_spark.operators.ranking import grouped_topk

    top = grouped_topk(scored, [id_col], "score", k, tiebreak_col="term")
    return top.select(
        F.col(id_col),
        F.col("rank"),
        F.col("term"),
        F.round("score", 6).alias("score"),
    )
