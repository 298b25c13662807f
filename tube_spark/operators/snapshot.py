"""Dataset snapshot diffing: what changed between corpus versions.

Training-data pipelines republish curated corpora repeatedly; the
operational questions are "what did this run add / remove / change?"
and "is the delta the size we expected?" — answered before a publish
is promoted (alongside ``operators/quality_checks.py`` gates and the
versioned-alias publish in ``sinks/``).

Shape: ONE full-outer join keyed on the id — the minimal shuffle for
any diff (if both snapshots are bucketed on the id, even that shuffle
disappears; see tests/test_bucketing.py for the bucketed-join plan
proof).  Row comparison is by content fingerprint: either a caller
column, or md5 over the compared columns (computed map-side, so the
join carries one 32-char hash per row instead of the full payload —
at 100 TB you diff fingerprints, not documents).

``snapshot_diff`` emits one row per id with a status in
added / removed / changed / unchanged; ``snapshot_diff_summary``
reduces that to one count row per status (map-side combinable).
Everything is deterministic → the ``snapshot_diff`` extras query has a
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NULL_SENTINEL = "\x00"


def _fingerprint(df: DataFrame, id_col: str, compare_cols, fingerprint_col):
    if fingerprint_col is not None:
        return df.select(
            F.col(id_col), F.col(fingerprint_col).alias("__fp")
        )
    cols = compare_cols or [c for c in df.columns if c != id_col]
    # null-safe: coalesce each column into a sentinel so NULL != ''
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL_SENTINEL)) for c in cols
    ]
    return df.select(
        F.col(id_col), F.md5(F.concat_ws("\x01", *parts)).alias("__fp")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    compare_cols: list[str] | None = None,
    fingerprint_col: str | None = None,
) -> DataFrame:
    """Per-id change status between two snapshots:
    ``(id_col, status)`` with status ∈ added | removed | changed |
    unchanged.  ``compare_cols`` defaults to every non-id column both
    callers share the schema of; pass ``fingerprint_col`` to reuse a
    precomputed content hash (skips the md5)."""
    o = _fingerprint(old, id_col, compare_cols, fingerprint_col).select(
        F.col(id_col).alias("__id"), F.col("__fp").alias("__fp_old")
    )
    n = _fingerprint(new, id_col, compare_cols, fingerprint_col).select(
        F.col(id_col).alias("__id"), F.col("__fp").alias("__fp_new")
    )
    return (
        o.join(n, on="__id", how="full_outer")
        .select(
            F.col("__id").alias(id_col),
            F.when(F.col("__fp_old").isNull(), F.lit("added"))
            .when(F.col("__fp_new").isNull(), F.lit("removed"))
            .when(F.col("__fp_old") != F.col("__fp_new"), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("status"),
        )
    )


def snapshot_diff_summary(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    compare_cols: list[str] | None = None,
    fingerprint_col: str | None = None,
) -> DataFrame:
    """One row per status with its count — the publish-gate number
    ("this run would remove 40% of the corpus" is a page, not a
    promote)."""
    return (
        snapshot_diff(old, new, id_col, compare_cols, fingerprint_col)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def assert_delta_bounds(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    max_removed_frac: float = 0.2,
    max_changed_frac: float = 0.5,
    **kwargs,
) -> dict:
    """Driver-side gate: collect the (tiny) summary and raise if the
    delta exceeds the caller's expectations.  Returns the counts."""
    counts = {
        r["status"]: r["n"]
        for r in snapshot_diff_summary(old, new, id_col, **kwargs).collect()
    }
    base = sum(
        counts.get(s, 0) for s in ("removed", "changed", "unchanged")
    )  # = |old|
    if base:
        removed_frac = counts.get("removed", 0) / base
        changed_frac = counts.get("changed", 0) / base
        if removed_frac > max_removed_frac:
            raise ValueError(
                f"snapshot delta gate: removed fraction {removed_frac:.3f} > "
                f"{max_removed_frac} ({counts})"
            )
        if changed_frac > max_changed_frac:
            raise ValueError(
                f"snapshot delta gate: changed fraction {changed_frac:.3f} > "
                f"{max_changed_frac} ({counts})"
            )
    return counts
