"""Contrastive-training data mining over embedding tables.

Training embedding models (retrieval, dedup encoders) needs labeled
pairs: positives (same label) and HARD negatives — the wrong-label
neighbors closest to the anchor, which carry nearly all the gradient
signal (public lore from FaceNet/SBERT-style training).  Random
negatives are trivial at any scale; hard ones need a top-k similarity
search per anchor, which is exactly the machinery this engine already
has.

``hard_negatives`` composes the existing exact ``cosine_topk`` (or any
swappable top-k: ``ivf_topk`` / ``search_store`` at scale) with a
label anti-match: for each anchor, the k nearest neighbors whose label
differs.  The label join is by id against the (id, label) projection —
vectors never travel twice.

``class_balanced`` resamples a labeled table toward a per-class target
count: minority classes replicate deterministically (whole copies +
a salted-hash remainder slice), majority classes downsample with the
same ``stratified_fixed_k`` hash order — fully deterministic, so both
directions carry a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tube_spark.operators.similarity import cosine_topk


def hard_negatives(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
    candidate_k: int = 25,
    anchors: DataFrame | None = None,
) -> DataFrame:
    """Per anchor: the ``k`` most-similar wrong-label vectors —
    (anchor_id, negative_id, rank, cosine, anchor_label,
    negative_label).

    ``candidate_k`` controls how deep the similarity search looks
    before the label filter (a same-label-dense neighborhood needs
    headroom; candidates are ids only, so depth is cheap).  Pass
    ``anchors`` to mine for a subset (defaults to every vector)."""
    if k > candidate_k:
        raise ValueError(f"k ({k}) must be <= candidate_k ({candidate_k})")
    anchors = anchors if anchors is not None else emb
    top = cosine_topk(emb, anchors, k=candidate_k, id_col=id_col, vec_col=vec_col)
    labels = emb.select(F.col(id_col), F.col(label_col))
    a_lab = labels.select(
        F.col(id_col).alias("query_id"), F.col(label_col).alias("anchor_label")
    )
    n_lab = labels.select(
        F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("negative_label")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        top.join(F.broadcast(a_lab), "query_id")
        .join(F.broadcast(n_lab), "neighbor_id")
        .filter(F.col("anchor_label") != F.col("negative_label"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("query_id").alias("anchor_id"),
            F.col("neighbor_id").alias("negative_id"),
            "rank",
            "cosine",
            "anchor_label",
            "negative_label",
        )
    )


def class_balanced(
    df: DataFrame,
    label_col: str,
    target: int,
    id_col: str = "vec_id",
    seed: str = "balance",
) -> DataFrame:
    """Exactly ``target`` rows per class, deterministically:
    minority classes replicate (floor(target/n) whole copies, then the
    hash-ranked first ``target mod n`` rows contribute one extra copy);
    majority classes keep their hash-ranked first ``target``.  Output
    adds ``copy`` (0-based replica index).

    Everything derives from a per-class count (one small aggregate,
    broadcast back) plus the salted-hash rank — partitioning-
    independent and SQL-reproducible."""
    if target <= 0:
        raise ValueError(f"target must be positive, got {target}")
    from tube_spark.functions.text import portable_hash60
    from pyspark.sql import Window

    counts = df.groupBy(label_col).agg(F.count(F.lit(1)).alias("__n"))
    h = portable_hash60(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    w = Window.partitionBy(label_col).orderBy(h.asc(), F.col(id_col).asc())
    ranked = df.join(F.broadcast(counts), on=label_col).withColumn(
        "__rk", F.row_number().over(w)
    )
    base = F.floor(F.lit(target) / F.col("__n"))
    rem = F.lit(target) % F.col("__n")
    n_copies = F.when(F.col("__n") >= target, F.when(F.col("__rk") <= target, 1).otherwise(0)).otherwise(
        base + F.when(F.col("__rk") <= rem, 1).otherwise(0)
    )
    return (
        ranked.withColumn("__c", n_copies.cast("int"))
        .filter(F.col("__c") > 0)
        .withColumn("copy", F.explode(F.sequence(F.lit(0), F.col("__c") - 1)))
        .drop("__n", "__rk", "__c")
    )


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    max_basket: int | None = None,
) -> DataFrame:
    """Market-basket pair rules (the Apriori k=2 layer — in practice
    the layer that carries almost all retail/co-view signal): for
    every unordered item pair co-occurring in >= ``min_pair_count``
    baskets, the standard rule statistics —

      ``support``    n_ab / N        (fraction of baskets with both)
      ``conf_a_b``   n_ab / n_a      (confidence of a -> b)
      ``conf_b_a``   n_ab / n_b
      ``lift``       n_ab * N / (n_a * n_b)   (>1 = positive assoc.)

    Scale shape: distinct (basket, item) membership once; per-item
    support is one keyed count; the pair count is the SAME capped
    self-join as ``triangles.cooccurrence_edges`` (``max_basket``
    drops mega-baskets BEFORE the quadratic pair step — a basket of g
    items emits g*(g-1)/2 pairs); the two per-item support joins
    broadcast (item-cardinality-sized).  ``min_pair_count`` prunes the
    long tail before the joins.  All ratios rounded to 6 for oracle
    portability."""
    if min_pair_count < 1:
        raise ValueError(f"min_pair_count must be >= 1, got {min_pair_count}")
    from pyspark.sql import Window

    membership = df.select(
        F.col(basket_col).alias("g"), F.col(item_col).alias("n")
    ).distinct()
    if max_basket is not None:
        # size cap via a count window on the distinct frame — one
        # shuffle on g that the pair self-join then rides, instead of a
        # separate size aggregation joined back (which re-shuffled the
        # full membership a second time; measured at sf1: 7.7 -> 4.9 s
        # for the whole rules query)
        membership = (
            membership.withColumn(
                "__gs", F.count(F.lit(1)).over(Window.partitionBy("g"))
            )
            .filter(F.col("__gs") <= max_basket)
            .drop("__gs")
        )
    membership = membership.localCheckpoint(eager=False)  # feeds 3 branches
    n_baskets = membership.select("g").distinct().count()
    item_supp = membership.groupBy("n").agg(F.count(F.lit(1)).alias("cnt"))
    a = membership.select("g", F.col("n").alias("a"))
    b = membership.select("g", F.col("n").alias("b"))
    pairs = (
        a.join(b, "g")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_pair_count)
    )
    sa = item_supp.select(F.col("n").alias("a"), F.col("cnt").alias("n_a"))
    sb = item_supp.select(F.col("n").alias("b"), F.col("cnt").alias("n_b"))
    out = pairs.join(F.broadcast(sa), "a").join(F.broadcast(sb), "b")
    N = F.lit(n_baskets).cast("double")
    return out.select(
        "a",
        "b",
        "n_ab",
        "n_a",
        "n_b",
        F.round(F.col("n_ab") / N, 6).alias("support"),
        F.round(F.col("n_ab") / F.col("n_a"), 6).alias("conf_a_b"),
        F.round(F.col("n_ab") / F.col("n_b"), 6).alias("conf_b_a"),
        F.round(F.col("n_ab") * N / (F.col("n_a") * F.col("n_b")), 6).alias(
            "lift"
        ),
    )


def collocations(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    k: int = 100,
) -> DataFrame:
    """Collocation mining: adjacent word pairs that co-occur far more
    than their unigram frequencies predict — the signal behind
    multi-word vocabulary entries ("new york", "machine learning"),
    tokenizer merge seeding, and phrase-aware dedup keys.

    Association is scored as LIFT rather than PMI:

        lift(a, b) = N * c(a,b) / (c(a) * c(b))

    (PMI is log(lift); the log adds nothing to the RANKING and a
    cross-engine libm log would poison the oracle, so the monotone
    rational form is the portable choice — one division, exact under
    IEEE, rounded to 6.)  Counts are corpus-wide token occurrences
    (c(a), c(b)) and adjacent-bigram occurrences (c(a,b)); N = total
    tokens.  Pairs below ``min_count`` bigram occurrences are noise
    and cut BEFORE scoring (classic collocation practice — lift of a
    once-seen pair of two rare words is huge and meaningless).  Top
    ``k`` by (lift desc, pair asc) — fully deterministic.

    Scale shape: one token explode feeding BOTH the unigram and the
    (lead-window) bigram map-side aggs; scoring joins the bigram frame
    (already <= distinct-bigram sized, further cut by min_count)
    against two broadcast-sized unigram projections.  No pairwise
    blowup anywhere — c(a,b) only exists for ADJACENT pairs.
    """
    from pyspark.sql import Window

    from tube_spark.functions.text import tokens

    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    tok = docs.select(
        F.col(id_col).alias("__id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "tok"),
    )
    uni = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = tok.agg(F.count(F.lit(1)).alias("n_tokens"))
    w = Window.partitionBy("__id").orderBy("pos")
    big = (
        tok.withColumn("nxt", F.lead("tok").over(w))
        .filter(F.col("nxt").isNotNull())
        .groupBy("tok", "nxt")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_count)
    )
    scored = (
        big.join(
            F.broadcast(uni.select(F.col("tok"), F.col("c").alias("c_a"))),
            "tok",
        )
        .join(
            F.broadcast(
                uni.select(F.col("tok").alias("nxt"), F.col("c").alias("c_b"))
            ),
            "nxt",
        )
        .crossJoin(F.broadcast(total))
        .select(
            F.col("tok").alias("term_a"),
            F.col("nxt").alias("term_b"),
            F.col("c_ab"),
            F.col("c_a"),
            F.col("c_b"),
            F.round(
                F.col("n_tokens") * F.col("c_ab") / (F.col("c_a") * F.col("c_b")),
                6,
            ).alias("lift"),
        )
    )
    # top-k via orderBy().limit(k): Spark plans TakeOrderedAndProject
    # (per-partition heaps + a k-row merge), never funneling the whole
    # bigram frame through one task the global-window form would need;
    # the rank window then runs over k rows only
    top = scored.orderBy(
        F.col("lift").desc(), F.col("term_a").asc(), F.col("term_b").asc()
    ).limit(k)
    wr = Window.orderBy(
        F.col("lift").desc(), F.col("term_a").asc(), F.col("term_b").asc()
    )
    return top.withColumn(
        "rank", F.row_number().over(wr)
    ).select("rank", "term_a", "term_b", "c_ab", "c_a", "c_b", "lift")
