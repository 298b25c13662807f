"""Declarative data-quality validation: Deequ-style constraint suites
compiled into ONE aggregate pass.

An ETL that publishes indexes (the reference's job) or curates training
corpora needs gate-keeping metrics — null fractions, key uniqueness,
value bounds, referential integrity — before a publish is allowed (the
natural companion of ``sinks/writer.py``'s freshness gate).  The naive
implementation runs one job per constraint; at 100 TB that is N full
scans.  Here every row-level constraint contributes one aggregate
expression to a SINGLE ``df.agg(...)`` — one scan, map-side partials,
whatever the suite size — and the one-row result is exploded back into
a (constraint, column, metric, threshold, passed) row per check.

Cross-table referential checks can't share that scan; ``referential``
is one left join (broadcast the parent key set when it is dimension-
sized) + the same agg shape, unionable into the suite result.

Semantics notes:
* fraction metrics are over NON-NULL values (completeness itself is
  the null gauge) — a column of all nulls passes ``in_bounds``
  vacuously (metric coalesced to 1.0), by design;
* ``uniqueness`` uses exact ``count(distinct)``; several distinct
  aggregates in one suite trigger Spark's expand — fine for a handful
  of key columns, use ``approx=True`` (HLL++, documented error) when
  auditing many;
* everything is deterministic, so suites are oracle-checkable
  (``quality_checks`` extras query) and stable across partitionings.

Public model: Databricks' Deequ papers/docs (Schelter et al., VLDB
2018) describe the metric-per-aggregate compilation; this is that idea
re-expressed directly in DataFrame algebra.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    constraint: str
    column: str
    metric: Column  # aggregate expression producing the metric (double)
    threshold: float


def completeness(col: str, min_ratio: float = 1.0) -> Check:
    """Non-null fraction ≥ min_ratio."""
    return Check(
        "completeness",
        col,
        (F.count(col) / F.count(F.lit(1))).cast("double"),
        min_ratio,
    )


def uniqueness(col: str, approx: bool = False) -> Check:
    """distinct/non-null ratio == 1.0 (≥ 1.0 as a threshold).  With
    ``approx`` the numerator is HLL++ (±~2%); lower the threshold
    accordingly (e.g. 0.98) or the check will flap."""
    distinct = F.approx_count_distinct(col) if approx else F.countDistinct(col)
    return Check(
        "uniqueness_approx" if approx else "uniqueness",
        col,
        (distinct / F.count(col)).cast("double"),
        1.0 if not approx else 0.98,
    )


def in_bounds(col: str, lo, hi, min_ratio: float = 1.0) -> Check:
    """Fraction of non-null values inside [lo, hi] ≥ min_ratio."""
    ok = F.sum(F.col(col).between(lo, hi).cast("long"))
    return Check(
        "in_bounds", col, F.coalesce(ok / F.count(col), F.lit(1.0)), min_ratio
    )


def accepted_values(col: str, values: list, min_ratio: float = 1.0) -> Check:
    ok = F.sum(F.col(col).isin(values).cast("long"))
    return Check(
        "accepted_values", col, F.coalesce(ok / F.count(col), F.lit(1.0)), min_ratio
    )


def matches(col: str, regex: str, min_ratio: float = 1.0) -> Check:
    ok = F.sum(F.col(col).rlike(regex).cast("long"))
    return Check(
        "matches", col, F.coalesce(ok / F.count(col), F.lit(1.0)), min_ratio
    )


def row_count(min_rows: int) -> Check:
    return Check(
        "row_count", "*", F.count(F.lit(1)).cast("double"), float(min_rows)
    )


def validate(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Run the suite in one aggregate pass.  Returns one row per check:
    (constraint, column, metric, threshold, passed)."""
    if not checks:
        raise ValueError("validate needs at least one check")
    row = df.agg(*[c.metric.alias(f"__m{i}") for i, c in enumerate(checks)])
    structs = [
        F.struct(
            F.lit(c.constraint).alias("constraint"),
            F.lit(c.column).alias("column"),
            F.round(F.col(f"__m{i}"), 6).alias("metric"),
            F.lit(float(c.threshold)).alias("threshold"),
            (F.col(f"__m{i}") >= F.lit(float(c.threshold))).alias("passed"),
        )
        for i, c in enumerate(checks)
    ]
    return row.select(F.explode(F.array(*structs)).alias("r")).select("r.*")


def referential(
    child: DataFrame,
    col: str,
    parent: DataFrame,
    parent_col: str,
    min_ratio: float = 1.0,
    broadcast_parent: bool = True,
) -> DataFrame:
    """FK containment: fraction of non-null child values present in the
    parent key set ≥ min_ratio.  One child scan + one join (broadcast
    the parent key set when it is dimension-sized); same output schema
    as ``validate`` for unioning into a suite result."""
    keys = parent.select(F.col(parent_col).alias("__pk")).distinct()
    if broadcast_parent:
        keys = F.broadcast(keys)
    joined = (
        child.select(F.col(col))
        .filter(F.col(col).isNotNull())
        .join(keys, on=F.col(col) == F.col("__pk"), how="left")
    )
    row = joined.agg(
        F.coalesce(
            F.sum(F.col("__pk").isNotNull().cast("long")) / F.count(F.lit(1)),
            F.lit(1.0),
        ).alias("__m")
    )
    return row.select(
        F.lit("referential").alias("constraint"),
        F.lit(col).alias("column"),
        F.round(F.col("__m"), 6).alias("metric"),
        F.lit(float(min_ratio)).alias("threshold"),
        (F.col("__m") >= F.lit(float(min_ratio))).alias("passed"),
    )
