"""merge_upsert / scd2 incremental-ETL semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tube_spark.operators.merge import merge_upsert, scd2


@pytest.fixture(scope="module")
def target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, val double",
    )


def test_upsert_update_insert_keep(spark, target):
    delta = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "k long, name string, val double"
    )
    out = {r["k"]: (r["name"], r["val"]) for r in merge_upsert(target, delta, ["k"]).collect()}
    assert out == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_upsert_delete_flag(spark, target):
    delta = spark.createDataFrame(
        [(1, "a", 10.0, True), (4, "d", 40.0, False), (5, "e", 50.0, None)],
        "k long, name string, val double, _deleted boolean",
    )
    out = merge_upsert(target, delta, ["k"], delete_flag="_deleted")
    keys = sorted(r["k"] for r in out.collect())
    assert keys == [2, 3, 4, 5]  # 1 deleted, 4 inserted, NULL flag = keep
    assert out.columns == target.columns


def test_upsert_missing_column_rejected(spark, target):
    bad = spark.createDataFrame([(9, "x")], "k long, name string")
    with pytest.raises(ValueError, match="missing target columns"):
        merge_upsert(target, bad, ["k"])


def test_upsert_idempotent(spark, target):
    """Re-delivering the same delta (at-least-once upstream) is a no-op."""
    delta = spark.createDataFrame([(2, "B", 99.0)], "k long, name string, val double")
    once = merge_upsert(target, delta, ["k"])
    twice = merge_upsert(once, delta, ["k"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


@pytest.fixture(scope="module")
def changelog(spark):
    return spark.createDataFrame(
        [
            (1, 100, "bronze"),
            (1, 200, "bronze"),  # no-op delivery
            (1, 300, "gold"),
            (2, 150, "silver"),
        ],
        "k long, ts long, tier string",
    )


def test_scd2_intervals(changelog):
    rows = {
        (r["k"], r["valid_from"]): (r["valid_to"], r["is_current"], r["tier"])
        for r in scd2(changelog, ["k"], "ts", ["tier"]).collect()
    }
    assert rows[(1, 100)] == (200, False, "bronze")
    assert rows[(1, 200)] == (300, False, "bronze")
    assert rows[(1, 300)] == (None, True, "gold")
    assert rows[(2, 150)] == (None, True, "silver")


def test_scd2_collapse_noop_versions(changelog):
    rows = {
        (r["k"], r["valid_from"]): (r["valid_to"], r["is_current"], r["tier"])
        for r in scd2(changelog, ["k"], "ts", ["tier"], collapse=True).collect()
    }
    # the ts=200 re-delivery of "bronze" is folded into the first interval
    assert (1, 200) not in rows
    assert rows[(1, 100)] == (300, False, "bronze")
    assert rows[(1, 300)] == (None, True, "gold")
    assert len(rows) == 3


def test_scd2_collapse_null_safe(spark):
    log = spark.createDataFrame(
        [(1, 10, None), (1, 20, None), (1, 30, "x")],
        "k long, ts long, tier string",
    )
    rows = scd2(log, ["k"], "ts", ["tier"], collapse=True).collect()
    assert len(rows) == 2  # NULL == NULL for collapse purposes


def test_scd2_single_shuffle_even_with_collapse(changelog):
    plan = (
        scd2(changelog, ["k"], "ts", ["tier"], collapse=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
