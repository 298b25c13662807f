"""Snapshot diff semantics and the delta gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tube_spark.operators.snapshot import (
    assert_delta_bounds,
    snapshot_diff,
    snapshot_diff_summary,
)


@pytest.fixture(scope="module")
def versions(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "id long, txt string, v long",
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "c2", 30), (4, "", 40), (5, "e", 50)],
        "id long, txt string, v long",
    )
    return old, new


def test_statuses(spark, versions):
    old, new = versions
    got = {r["id"]: r["status"] for r in snapshot_diff(old, new, "id").collect()}
    # id 4: NULL -> '' must count as changed (null-safe fingerprint)
    assert got == {
        1: "removed",
        2: "unchanged",
        3: "changed",
        4: "changed",
        5: "added",
    }


def test_compare_cols_subset(spark, versions):
    old, new = versions
    got = {
        r["id"]: r["status"]
        for r in snapshot_diff(old, new, "id", compare_cols=["v"]).collect()
    }
    assert got[3] == "unchanged"  # v unchanged, txt ignored


def test_fingerprint_col_reuse(spark, versions):
    old, new = versions
    o = old.withColumn("fp", F.md5(F.coalesce("txt", F.lit("~"))))
    n = new.withColumn("fp", F.md5(F.coalesce("txt", F.lit("~"))))
    got = {
        r["id"]: r["status"]
        for r in snapshot_diff(o, n, "id", fingerprint_col="fp").collect()
    }
    assert got[2] == "unchanged" and got[3] == "changed"


def test_summary_counts(spark, versions):
    old, new = versions
    got = {
        r["status"]: r["n"]
        for r in snapshot_diff_summary(old, new, "id").collect()
    }
    assert got == {"removed": 1, "unchanged": 1, "changed": 2, "added": 1}


def test_delta_gate(spark, versions):
    old, new = versions
    counts = assert_delta_bounds(old, new, "id", max_removed_frac=0.5)
    assert counts["removed"] == 1
    with pytest.raises(ValueError, match="removed fraction"):
        assert_delta_bounds(old, new, "id", max_removed_frac=0.1)
    with pytest.raises(ValueError, match="changed fraction"):
        assert_delta_bounds(
            old, new, "id", max_removed_frac=0.5, max_changed_frac=0.3
        )
