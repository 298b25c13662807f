"""Row-level quarantine: split a batch into clean and rejected rows.

``operators/quality_checks.py`` measures a TABLE (one aggregate per
constraint); ingestion also needs the ROW-level decision — keep this
record, reject that one with a reason — without failing the job or
silently dropping data.  The standard shape (Delta Lake/DLT
"expectations", public docs): evaluate every rule as a boolean column,
collect the violated rule names per row, and route rows with any
violation to a quarantine sink carrying WHY they were rejected.

Scale shape: ONE projection pass — rules are ordinary Column
predicates fused into the scan; the split is two filters over the same
cached/fused plan (no shuffle, no second source read); the rejected
side carries a ``violations`` array column for triage.

``split_quarantine`` returns (clean, rejected); ``rule`` builds named
rules from Column predicates; common rules (non-null, in-range,
matches) come free from small builders.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    predicate: Column  # True = row is OK


def rule(name: str, predicate: Column) -> Rule:
    return Rule(name, predicate)


def non_null(col: str) -> Rule:
    return Rule(f"{col}_not_null", F.col(col).isNotNull())


def in_range(col: str, lo, hi) -> Rule:
    """NULLs pass (pair with ``non_null`` when they should not)."""
    return Rule(
        f"{col}_in_range", F.col(col).isNull() | F.col(col).between(lo, hi)
    )


def matches(col: str, regex: str) -> Rule:
    return Rule(f"{col}_matches", F.col(col).isNull() | F.col(col).rlike(regex))


def split_quarantine(
    df: DataFrame, rules: list[Rule]
) -> tuple[DataFrame, DataFrame]:
    """(clean, rejected): clean rows satisfy every rule; rejected rows
    carry ``violations: array<string>`` naming each failed rule.  One
    fused evaluation — rules are Column predicates, so Catalyst pushes
    the whole thing into the scan projection."""
    if not rules:
        raise ValueError("split_quarantine needs at least one rule")
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {names}")
    viol = F.filter(
        F.array(
            *[
                F.when(~r.predicate, F.lit(r.name)).otherwise(F.lit(None))
                for r in rules
            ]
        ),
        lambda x: x.isNotNull(),
    )
    tagged = df.withColumn("violations", viol)
    clean = tagged.filter(F.size("violations") == 0).drop("violations")
    rejected = tagged.filter(F.size("violations") > 0)
    return clean, rejected
