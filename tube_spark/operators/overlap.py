"""Corpus-overlap estimation via K-Minimum-Values sketches.

`approx_count_distinct` (HLL) answers "how many distinct" and unions
mergeably, but HLL cannot INTERSECT — "how much does crawl B overlap
crawl A" (the question every training-data refresh asks before paying
for a full dedup join) needs a sketch that supports set operations.
K-Minimum-Values (Bar-Yossef et al. 2002; Beyer et al., "On synopses
for distinct-value estimation under multiset operations", SIGMOD 2007)
is that sketch: keep the k smallest distinct hash values per corpus;
the k-th minimum estimates the distinct count, and because every
corpus keeps the SAME deterministic minima, the sketches intersect —
Jaccard is estimated by counting shared values among the union's k
minima.

Scale shape: the only corpus-wide work is one map-side-combinable
`approx_count_distinct` (for the threshold) plus a hash + threshold
FILTER that keeps ~8k rows per corpus out of N — the `distinct` and
top-k that follow run on the tiny survivor set, never the corpus.  The
k-th order statistic of N uniform hashes concentrates at k/N·SPACE;
an 8x-margin threshold loses a true minimum with probability
~exp(-Θ(k)) (Chernoff) — at k=256 that is never.  Per-corpus state is
k int64s, collected driver-side like centroids (bounded by
construction).

Everything is md5-derived (`portable_hash60`), so a SQL engine replays
the sketch bit-for-bit — the driver oracle recomputes shingles, the
k minima, and the estimate arithmetic end to end.

The reference has no overlap estimator; this extends its aggregation
family (reference: tube/etl/indexers/aggregation/new_translator.py
count/sum reducers) to mergeable multiset synopses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tube_spark.functions.localrel import local_df

from tube_spark.functions.text import portable_hash60

_SPACE = float(1 << 60)  # portable_hash60 is uniform in [0, 2^60)


def _kmv_hash(col, fast_hash: bool):
    """Element hash, uniform in [0, 2^60).  Portable (md5-derived,
    SQL-replayable — the oracle semantics) by default; ``fast_hash``
    swaps in ``pmod(xxhash64, 2^60)`` — exactly uniform because 2^60
    divides the 2^64 hash space.  Measured at sf1: 13.9 -> 9.6 s for
    the full word-bigram sketch pass (1.4x — md5 is ~30% of the pass;
    shingle tokenize/explode dominates and is shared by both paths).
    Same estimator guarantees; only the hash function differs."""
    if fast_hash:
        return F.pmod(F.xxhash64(col), F.lit(1 << 60))
    return portable_hash60(col)


def kmv_minima(
    elements: DataFrame,
    corpus_col: str = "corpus",
    element_col: str = "element",
    k: int = 256,
    threshold_margin: float = 8.0,
    fast_hash: bool = False,
) -> DataFrame:
    """Per-corpus KMV sketch: the ``k`` smallest distinct element-hash
    values of ``element_col``, as
    ``(corpus, minima array<long> sorted ascending)``.

    The threshold pre-filter is the 100 TB lever: hashes are uniform,
    so the k smallest of a corpus with ~n distinct elements lie below
    ``margin * k / n * SPACE`` with probability 1 - exp(-Θ(k)); rows
    above the per-corpus threshold are dropped BEFORE the distinct
    shuffle, so the exchange carries ~margin*k rows per corpus instead
    of the corpus."""
    el = elements.select(
        F.col(corpus_col).alias("corpus"),
        _kmv_hash(F.col(element_col), fast_hash).alias("h"),
    )
    # bounded collect: one row per corpus (the sketch's whole point is
    # that #corpora is small — crawl snapshots, not documents).  The
    # cardinality estimate feeds ONLY the filter threshold, so it runs
    # on the RAW element (HLL hashes internally): column pruning then
    # drops the md5-derived `h` from this pass entirely — the sketch
    # hash is computed once, in the survivor pass, not twice.
    est = {
        r["corpus"]: r["n_est"]
        for r in elements.groupBy(F.col(corpus_col).alias("corpus"))
        .agg(F.approx_count_distinct(element_col).alias("n_est"))
        .collect()
    }
    thr = F.lit(None).cast("double")
    for c, n in est.items():
        frac = min(1.0, threshold_margin * k / max(float(n), 1.0))
        thr = F.when(F.col("corpus") == F.lit(c), F.lit(frac * _SPACE)).otherwise(thr)
    survivors = el.filter(F.col("h") < thr).distinct()
    w = Window.partitionBy("corpus").orderBy(F.col("h").asc())
    return (
        survivors.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy("corpus")
        .agg(F.sort_array(F.collect_list("h")).alias("minima"))
    )


def _kmv_estimate(minima: list[int], k: int) -> float:
    """Distinct-count estimate from one sketch: exact when the corpus
    had fewer than k distinct elements (the sketch IS the value set),
    else the classic (k-1) * SPACE / h_k."""
    if len(minima) < k:
        return float(len(minima))
    return (k - 1) * _SPACE / float(minima[k - 1])


def kmv_overlap_stats(
    minima_a: list[int], minima_b: list[int], k: int
) -> dict[str, float]:
    """Pairwise estimates from two KMV sketches (driver-side k-sized
    math — the distributed work already happened in ``kmv_minima``).

    Union sketch = k smallest of the merged minima; Jaccard = fraction
    of the union sketch present in BOTH input sketches (Beyer et al.
    2007, the unbiased KMV Jaccard estimator); intersection size =
    Jaccard x union estimate."""
    sa, sb = set(minima_a), set(minima_b)
    union = sorted(sa | sb)[:k]
    n_union = _kmv_estimate(union, k)
    shared = sum(1 for h in union if h in sa and h in sb)
    jaccard = shared / float(len(union)) if union else 0.0
    return {
        "n_a_est": _kmv_estimate(minima_a, k),
        "n_b_est": _kmv_estimate(minima_b, k),
        "n_union_est": n_union,
        "jaccard_est": jaccard,
        "n_intersection_est": jaccard * n_union,
    }


def corpus_overlap(
    elements: DataFrame,
    corpus_a: str,
    corpus_b: str,
    corpus_col: str = "corpus",
    element_col: str = "element",
    k: int = 256,
    fast_hash: bool = False,
) -> DataFrame:
    """One-row overlap report between two corpora:
    ``(n_a_est, n_b_est, n_union_est, jaccard_est,
    n_intersection_est)`` — all doubles, all deterministic functions of
    the corpora's element sets (md5-based hashing, IEEE-identical
    arithmetic), so a SQL oracle reproduces every value exactly.
    Values are unrounded; callers round for display."""
    spark = elements.sparkSession
    rows = {
        r["corpus"]: list(r["minima"])
        for r in kmv_minima(
            elements, corpus_col, element_col, k, fast_hash=fast_hash
        ).collect()
    }
    stats = kmv_overlap_stats(rows.get(corpus_a, []), rows.get(corpus_b, []), k)
    return local_df(
        spark,
        [tuple(stats[c] for c in (
            "n_a_est", "n_b_est", "n_union_est", "jaccard_est",
            "n_intersection_est",
        ))],
        "n_a_est double, n_b_est double, n_union_est double, "
        "jaccard_est double, n_intersection_est double",
    )


def overlap_matrix(
    elements: DataFrame,
    corpus_col: str = "corpus",
    element_col: str = "element",
    k: int = 256,
    fast_hash: bool = False,
) -> DataFrame:
    """All-pairs overlap report across EVERY corpus in ``elements``:
    one row ``(corpus_a, corpus_b, n_a_est, n_b_est, n_union_est,
    jaccard_est, n_intersection_est)`` per unordered pair (a < b) — the
    mixture-design view ("how redundant are my sources?").  One
    distributed sketch pass total; the C(C,2) pairwise arithmetic runs
    on k-sized driver state, so adding a corpus costs one more sketch,
    never another corpus scan."""
    spark = elements.sparkSession
    rows = {
        r["corpus"]: list(r["minima"])
        for r in kmv_minima(
            elements, corpus_col, element_col, k, fast_hash=fast_hash
        ).collect()
    }
    names = sorted(rows)
    out = []
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            s = kmv_overlap_stats(rows[a], rows[b], k)
            out.append(
                (a, b, s["n_a_est"], s["n_b_est"], s["n_union_est"],
                 s["jaccard_est"], s["n_intersection_est"])
            )
    return local_df(
        spark,
        out,
        "corpus_a string, corpus_b string, n_a_est double, n_b_est double, "
        "n_union_est double, jaccard_est double, n_intersection_est double",
    )
