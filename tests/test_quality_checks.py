"""Data-quality constraint suites: metrics, one-pass plan, referential."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tube_spark.operators.quality_checks import (
    accepted_values,
    completeness,
    in_bounds,
    matches,
    referential,
    row_count,
    uniqueness,
    validate,
)


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        (1, "a", 10.0, "x-1"),
        (2, "b", 20.0, "x-2"),
        (3, None, 30.0, "x-3"),
        (4, "a", -5.0, "y-4"),
        (4, "c", 15.0, "x-5"),
    ]
    return spark.createDataFrame(rows, "id long, cat string, val double, code string")


def test_metrics_and_verdicts(spark, frame):
    out = {
        (r["constraint"], r["column"]): r
        for r in validate(
            frame,
            [
                completeness("cat", 0.9),
                uniqueness("id"),
                in_bounds("val", 0, 100),
                accepted_values("cat", ["a", "b"], 0.5),
                matches("code", "^x-", 0.7),
                row_count(3),
            ],
        ).collect()
    }
    c = out[("completeness", "cat")]
    assert c["metric"] == 0.8 and not c["passed"]  # 4/5 non-null < 0.9
    u = out[("uniqueness", "id")]
    assert u["metric"] == 0.8 and not u["passed"]  # 4 distinct / 5
    b = out[("in_bounds", "val")]
    assert b["metric"] == 0.8 and not b["passed"]  # -5 out of bounds
    a = out[("accepted_values", "cat")]
    assert a["metric"] == 0.75 and a["passed"]  # 3 of 4 non-null in {a,b}
    m = out[("matches", "code")]
    assert m["metric"] == 0.8 and m["passed"]
    rc = out[("row_count", "*")]
    assert rc["metric"] == 5.0 and rc["passed"]


def test_single_pass_plan(spark, frame):
    """The whole suite (sans distinct aggregates) is ONE aggregate over
    one scan — no per-check jobs."""
    df = validate(
        frame,
        [completeness("cat"), in_bounds("val", 0, 100), row_count(1)],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") <= 1


def test_all_null_vacuous(spark):
    df = spark.createDataFrame([(None,), (None,)], "v double")
    out = {r["constraint"]: r for r in validate(df, [in_bounds("v", 0, 1)]).collect()}
    assert out["in_bounds"]["metric"] == 1.0 and out["in_bounds"]["passed"]


def test_referential(spark, frame):
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pid long")
    r = referential(frame, "id", parent, "pid").collect()[0]
    assert r["metric"] == 0.6 and not r["passed"]  # the two id=4 rows dangle
    ok = referential(parent, "pid", frame, "id").collect()[0]
    assert ok["metric"] == 1.0 and ok["passed"]


def test_union_suite_shape(spark, frame):
    parent = spark.createDataFrame([(1,), (2,)], "pid long")
    suite = validate(frame, [row_count(1)]).unionByName(
        referential(frame, "id", parent, "pid", min_ratio=0.5)
    )
    rows = suite.collect()
    assert {r["constraint"] for r in rows} == {"row_count", "referential"}


def test_validate_empty_suite(frame):
    with pytest.raises(ValueError, match="at least one check"):
        validate(frame, [])
