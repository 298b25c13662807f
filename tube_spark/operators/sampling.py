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
