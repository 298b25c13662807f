"""As-of join semantics vs a naive per-row argmax reference."""

from __future__ import annotations

import pytest

from tube_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 25, "b"), (1, 5, "c"), (2, 50, "d"), (3, 7, "e")],
        "k long, t long, lv string",
    )
    right = spark.createDataFrame(
        [(1, 10, "r10"), (1, 20, "r20"), (2, 60, "r60")],
        "k long, t long, rv string",
    )
    return left, right


def test_backward_inclusive(spark):
    left, right = _frames(spark)
    out = {
        (r["k"], r["t"]): r["rv"]
        for r in asof_join(
            left, right.withColumnRenamed("t", "rt"), on="k", left_time="t", right_time="rt"
        ).collect()
    }
    assert out[(1, 10)] == "r10"  # tie: inclusive (<=)
    assert out[(1, 25)] == "r20"  # latest at-or-before
    assert out[(1, 5)] is None    # nothing before
    assert out[(2, 50)] is None   # right exists but only later
    assert out[(3, 7)] is None    # key absent on right


def test_forward(spark):
    left, right = _frames(spark)
    out = {
        (r["k"], r["t"]): r["rv"]
        for r in asof_join(
            left,
            right.withColumnRenamed("t", "rt"),
            on="k",
            left_time="t",
            right_time="rt",
            direction="forward",
        ).collect()
    }
    assert out[(1, 10)] == "r10"  # tie inclusive
    assert out[(1, 25)] is None   # nothing at-or-after
    assert out[(1, 5)] == "r10"   # earliest at-or-after
    assert out[(2, 50)] == "r60"


def test_column_collision_raises(spark):
    left, right = _frames(spark)
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("t", "rt").withColumnRenamed("rv", "lv"),
                  on="k", left_time="t", right_time="rt")


def test_null_payload_not_backfilled(spark):
    """A matched right row with a NULL payload column must yield NULL —
    not that column's value from an OLDER right row.  Carrying payload
    columns independently composes rows that never existed; the struct
    carry keeps each right row atomic (DuckDB ASOF semantics)."""
    left = spark.createDataFrame([(1, 30, "a"), (1, 15, "b")], "k long, t long, lv string")
    right = spark.createDataFrame(
        [(1, 10, "old", 100.0), (1, 20, None, 200.0)],
        "k long, rt long, rv string, price double",
    )
    out = {
        r["t"]: (r["rv"], r["price"])
        for r in asof_join(left, right, on="k", left_time="t", right_time="rt").collect()
    }
    # t=30 matches the rt=20 row whose rv is NULL — must stay NULL, with
    # price from the SAME row, never ("old", 200.0) composed across rows.
    assert out[30] == (None, 200.0)
    assert out[15] == ("old", 100.0)


def test_all_null_payload_row_still_matches(spark):
    """A right row whose payload members are ALL NULL is still a match —
    it must shadow older rows, not be skipped."""
    left = spark.createDataFrame([(1, 30, "a")], "k long, t long, lv string")
    right = spark.createDataFrame(
        [(1, 10, "old"), (1, 20, None)], "k long, rt long, rv string"
    )
    [row] = asof_join(left, right, on="k", left_time="t", right_time="rt").collect()
    assert row["rv"] is None


def test_no_cross_product_in_plan(spark):
    """The plan must be a single window over a union — no join node with
    a range condition (the quadratic emulation)."""
    left, right = _frames(spark)
    out = asof_join(left, right.withColumnRenamed("t", "rt"), on="k",
                    left_time="t", right_time="rt")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Window" in plan
