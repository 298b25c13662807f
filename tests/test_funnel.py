"""operators/funnel.py: ordered funnels and cohort retention.

The entry-point queries (event_funnel / cohort_retention) delegate to
these operators and are driver-verified against DuckDB; these tests
pin the library semantics on hand-built frames where the right answer
is visible by inspection.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tube_spark.operators.funnel import (
    cohort_retention,
    funnel_report,
    funnel_user_steps,
)


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, event_type string, ts long")


def test_funnel_requires_order(spark):
    # u1 converts in order; u2 clicked BEFORE viewing — click must not count
    ev = _events(
        spark,
        [
            (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
            (2, "click", 5), (2, "view", 10),
            (3, "view", 7),
        ],
    )
    per_user = {
        r["user_id"]: r
        for r in funnel_user_steps(ev, ["view", "click", "purchase"]).collect()
    }
    assert per_user[1]["step_0_ts"] == 10
    assert per_user[1]["step_1_ts"] == 20
    assert per_user[1]["step_2_ts"] == 30
    assert per_user[2]["step_0_ts"] == 10
    assert per_user[2]["step_1_ts"] is None  # out-of-order click ignored
    assert per_user[3]["step_1_ts"] is None


def test_funnel_strictly_after_previous_step(spark):
    # a click at the same instant as the view does not advance the funnel
    ev = _events(spark, [(1, "view", 10), (1, "click", 10), (1, "click", 11)])
    row = funnel_user_steps(ev, ["view", "click"]).collect()[0]
    assert row["step_0_ts"] == 10 and row["step_1_ts"] == 11


def test_funnel_report_counts(spark):
    ev = _events(
        spark,
        [
            (1, "view", 1), (1, "click", 2), (1, "purchase", 3),
            (2, "view", 1), (2, "click", 2),
            (3, "view", 1),
            (4, "click", 1),  # never viewed: not in any reach count
        ],
    )
    row = funnel_report(ev, ["view", "click", "purchase"]).collect()[0]
    assert row["n_users"] == 4
    assert row["reached_view"] == 3
    assert row["reached_click"] == 2
    assert row["reached_purchase"] == 1
    assert abs(row["conversion_pct"] - 100.0 / 3) < 1e-4


def test_funnel_needs_two_steps(spark):
    ev = _events(spark, [(1, "view", 1)])
    with pytest.raises(ValueError):
        funnel_user_steps(ev, ["view"])


def test_cohort_retention_offsets(spark):
    ev = spark.createDataFrame(
        [
            (1, "signup", "2024-01-01 00:00:00"),
            (1, "click", "2024-01-10 00:00:00"),   # week offset 1
            (2, "signup", "2024-01-02 00:00:00"),  # same cohort week as u1
            (2, "click", "2024-01-03 00:00:00"),   # offset 0
            (3, "click", "2024-01-01 00:00:00"),   # never signed up: excluded
        ],
        "user_id long, event_type string, ets string",
    ).withColumn("ets", F.col("ets").cast("timestamp"))
    got = {
        (r["cohort_period"], r["period_offset"]): r["n_active"]
        for r in cohort_retention(ev, "signup").collect()
    }
    offsets = {k[1]: v for k, v in got.items()}
    assert offsets[0] == 2  # both users active in their cohort week
    assert offsets[1] == 1  # only u1 came back the next week
    assert len({k[0] for k in got}) == 1  # one cohort week


def test_cohort_retention_bad_period(spark):
    ev = spark.createDataFrame([], "user_id long, event_type string, ets timestamp")
    with pytest.raises(ValueError):
        cohort_retention(ev, "signup", period="month")
