"""Data-governance checks: k-anonymity / l-diversity reporting.

The release-side complement of PII redaction (functions/pii): after
direct identifiers are stripped, a record is still re-identifiable
when its QUASI-identifier combination (zip+age+segment, ...) is rare.
Sweeney 2002 ("k-Anonymity: a model for protecting privacy") defines
the standard: every equivalence class over the quasi-identifiers must
hold >= k records; Machanavajjhala et al. 2007 ("l-Diversity") adds
that each class must also contain >= l distinct values of the
sensitive attribute, or the class leaks it outright.

This module reports, it does not transform: generalization /
suppression policy is a caller decision, and the report is the input
to it (same philosophy as quality_checks / snapshot_diff — gates
stay visible).

Scale shape: ONE map-side-combinable groupBy over the quasi columns
(+ a distinct count when a sensitive column is given) — no windows,
no joins, no state beyond one row per equivalence class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str | None = None,
    k: int = 5,
    l: int = 2,
) -> DataFrame:
    """One row per quasi-identifier equivalence class:
    (quasi..., n_records, meets_k[, n_sensitive, meets_l]).

    NULL quasi values form their own class (SQL grouping semantics —
    a NULL zip code is itself a linkable signature).  ``meets_k`` is
    n_records >= k; with a sensitive column, ``n_sensitive`` counts
    its distinct non-null values in the class and ``meets_l`` is
    n_sensitive >= l.  The caller's release gate is typically
    ``every class meets_k AND meets_l`` — filter or aggregate this
    frame for the one-line verdict.
    """
    if not quasi_cols:
        raise ValueError("anonymity_report needs at least one quasi column")
    if k < 1 or l < 1:
        raise ValueError(f"k and l must be >= 1, got k={k} l={l}")
    aggs = [F.count(F.lit(1)).alias("n_records")]
    if sensitive_col is not None:
        aggs.append(F.count_distinct(F.col(sensitive_col)).alias("n_sensitive"))
    out = df.groupBy(*quasi_cols).agg(*aggs)
    out = out.withColumn("meets_k", F.col("n_records") >= k)
    if sensitive_col is not None:
        out = out.withColumn("meets_l", F.col("n_sensitive") >= l)
    return out
