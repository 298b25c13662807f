"""Deterministic splits and stratified sampling for dataset curation.

A training-data pipeline needs train/val/test splits and per-stratum
subsampling that are REPRODUCIBLE: the same document lands in the same
split on every run, on any cluster, regardless of partitioning — which
rules out ``df.randomSplit``/``df.sample`` (both partition-dependent).

Everything here keys off a portable salted md5 hash of the row id
(``functions.text.portable_hash60``), so:

* assignment is MAP-ONLY — no shuffle, no state, no sampling pass;
  it fuses into whatever scan/filter plan surrounds it;
* membership is stable under repartitioning, incremental appends, and
  re-runs (a new document never displaces an old one from its split);
* an external system (or the DuckDB oracle) can recompute membership
  from the id alone — the split IS the contract, not an artifact.

``hash_split`` generalizes the 80/10/10 convention to arbitrary named
weights; ``stratified_sample`` keeps a per-stratum fraction (e.g. 10%
of every language) with the same guarantees — at 100 TB this is the
difference between "sampled once, hope the files survive" and a
one-line reproducible definition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tube_spark.functions.text import portable_hash60

# granularity of the hash buckets: weights/fractions resolve to 1/10000
_BUCKETS = 10_000


def _bucket(id_col: Column, seed: str) -> Column:
    """Stable bucket in [0, _BUCKETS): salted portable hash of the id.
    DuckDB twin: ``('0x' || substr(md5(<seed> || id), 1, 15))::BIGINT
    % 10000``."""
    return F.pmod(portable_hash60(F.concat(F.lit(seed), id_col.cast("string"))), F.lit(_BUCKETS))


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    seed: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Add ``out_col`` assigning each row to a named split with the
    given weights (default train/val/test = 0.8/0.1/0.1).  Weights must
    sum to 1 within bucket granularity (1/10000)."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    bounds = []
    acc = 0.0
    for name, w in weights.items():
        acc += w
        bounds.append((name, int(round(acc * _BUCKETS))))
    if bounds[-1][1] != _BUCKETS:
        raise ValueError(f"weights must sum to 1, got {sum(weights.values())}")
    b = F.col("__split_bucket")
    # half-open bucket ranges [lo, hi) per split, in declaration order
    chained = F.lit(None).cast("string")
    lo = 0
    for name, hi in bounds:
        chained = F.when((b >= lo) & (b < hi), F.lit(name)).otherwise(chained)
        lo = hi
    return (
        df.withColumn("__split_bucket", _bucket(F.col(id_col), seed))
        .withColumn(out_col, chained)
        .drop("__split_bucket")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
    seed: str = "sample",
) -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows: a row survives
    iff its hash bucket falls under its stratum's fraction.  Strata not
    listed keep ``default_fraction``.  Map-only (one scan, no shuffle),
    and the kept set only GROWS as a fraction is raised — nested
    samples come free (the 5% sample is a subset of the 10% sample)."""
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for {k!r} must be in [0,1], got {v}")
    b = _bucket(F.col(id_col), seed)
    thresh = F.lit(int(round(default_fraction * _BUCKETS)))
    for k, v in fractions.items():
        thresh = F.when(
            F.col(strata_col) == k, F.lit(int(round(v * _BUCKETS)))
        ).otherwise(thresh)
    return df.filter(b < thresh)


def stratified_fixed_k(
    df: DataFrame,
    strata_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: str = "fixedk",
    rank_col: str = "sample_rank",
) -> DataFrame:
    """EXACTLY min(k, |stratum|) rows per stratum, deterministically:
    rows are ranked inside each stratum by salted portable hash (ties
    by id) and the first k survive.  Partitioning-independent — but
    NOT append-stable (a new row can hash below an old survivor and
    displace it); use ``stratified_sample`` when append stability
    matters more than an exact count.

    Skew shape: the naive form is one window over each stratum — a
    billion-row stratum funnels through ONE task.  Here selection runs
    in two phases: (1) per-(input-partition, stratum) top-k via a
    map-side-complete ``groupBy`` on ``spark_partition_id()`` (each
    group lives in one partition, so the partial aggregation finishes
    before the shuffle and at most k x partitions candidate ids move;
    the aggregation buffers carry only 16-byte (hash, id) entries, not
    payloads);
    (2) global top-k per stratum over that bounded candidate set, then
    a broadcast semi-join pulls the surviving rows' payloads.  No
    stratum ever funnels through a single task with more than
    k x partitions rows.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    h = portable_hash60(F.concat(F.lit(seed), F.col(id_col).cast("string")))

    keyed = df.select(
        F.col(strata_col).alias("__s"),
        F.col(id_col).alias("__id"),
        h.alias("__h"),
        F.spark_partition_id().alias("__pid"),
    )
    local = (
        keyed.groupBy("__s", "__pid")
        .agg(
            F.slice(
                F.sort_array(F.collect_list(F.struct("__h", "__id"))), 1, k
            ).alias("__top")
        )
        .select("__s", F.explode("__top").alias("__t"))
        .select("__s", F.col("__t.__h").alias("__h"), F.col("__t.__id").alias("__id"))
    )
    final = (
        local.groupBy("__s")
        .agg(
            F.slice(
                F.sort_array(F.collect_list(F.struct("__h", "__id"))), 1, k
            ).alias("__top")
        )
        .select(F.posexplode("__top").alias("__rk", "__t"), "__s")
        .select(
            F.col("__t.__id").alias("__id"),
            (F.col("__rk") + 1).cast("integer").alias(rank_col),
        )
    )
    return df.join(
        F.broadcast(final), on=F.col(id_col) == F.col("__id"), how="inner"
    ).drop("__id")


def weighted_sample_k(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: str = "wsample",
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis
    & Spirakis 2006): every row draws u in (0, 1] from a salted
    portable hash of its id and scores key = ln(u) / w; the k largest
    keys are the sample, which realizes inclusion probabilities
    proportional to weight (exactly the A-ES reservoir scheme, made
    rerun-stable by the deterministic u).

    Scale shape: ``orderBy(key).limit(k)`` plans as
    TakeOrderedAndProject — per-partition top-k heaps merged at the
    driver, never a global sort shuffle.  Rows with weight <= 0 are
    excluded (their inclusion probability is zero).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    w = F.col(weight_col).cast("double")
    h = portable_hash60(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    u = (h.cast("double") + F.lit(1.0)) / F.lit(float(1 << 60))
    key = F.log(u) / w  # negative; larger (closer to 0) wins
    ranked = (
        df.filter(w > 0)
        .withColumn("__wkey", key)
        .orderBy(F.col("__wkey").desc(), F.col(id_col).asc())
        .limit(k)
    )
    # rank the k survivors (k rows — the window is trivially small)
    from pyspark.sql import Window

    win = Window.orderBy(F.col("__wkey").desc(), F.col(id_col).asc())
    return (
        ranked.withColumn(rank_col, F.row_number().over(win).cast("integer"))
        .drop("__wkey")
    )


def leakage_safe_split(
    docs: DataFrame,
    dup_pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    weights: dict[str, float] | None = None,
    seed: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Train/val/test assignment that near-duplicates can never
    straddle: documents are first grouped by connected components over
    ``dup_pairs`` (the LSH candidate pairs a dedup pass already
    produces), then the salted portable-hash bucket is computed on the
    GROUP id, so every member of a duplicate cluster lands in the same
    split.  Splitting on raw doc ids leaks evaluation data whenever a
    near-copy of a test document sits in train — the standard
    contamination hole that survives doc-level dedup decisions being
    made *after* splitting.

    Output: ``docs`` columns + ``group_id`` + ``out_col``.  Documents
    with no duplicate pair are singleton groups of themselves, so for
    a fully-deduplicated corpus this degrades exactly to ``hash_split``
    (same seed, same buckets).

    Scale shape: the CC solve is the O(log n)-round large/small-star
    of ``dedup_groups`` (pair-set sized, not corpus sized); the only
    corpus-wide costs are one join against the CC labels and the
    map-only bucket assignment.  No new shuffle class beyond what the
    dedup pass itself needs.
    """
    from tube_spark.operators.components import connected_components

    comp = connected_components(dup_pairs, id_a, id_b).select(
        F.col("node").alias(id_col), F.col("component").alias("group_id")
    )
    grouped = docs.join(comp, on=id_col, how="left").withColumn(
        "group_id", F.coalesce(F.col("group_id"), F.col(id_col))
    )
    return hash_split(
        grouped, id_col="group_id", weights=weights, seed=seed, out_col=out_col
    )
