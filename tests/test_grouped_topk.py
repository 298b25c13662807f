"""Grouped top-k: window equivalence, partitioning independence, edges."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from tube_spark.operators.ranking import grouped_topk


@pytest.fixture(scope="module")
def sales(spark):
    rows = [
        (i, f"g{i % 5}", float((i * 37) % 400), f"it{i}") for i in range(2500)
    ]
    return spark.createDataFrame(rows, "id long, grp string, amt double, item string")


def _naive(df, k, desc=True):
    order = [F.col("amt").desc(), F.col("id").asc()] if desc else [
        F.col("amt").asc(), F.col("id").asc()
    ]
    w = Window.partitionBy("grp").orderBy(*order)
    return (
        df.filter(F.col("amt").isNotNull())
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def test_matches_naive_window_desc_and_asc(spark, sales):
    for desc in (True, False):
        want = {
            (r["id"], r["rank"])
            for r in _naive(sales, 7, desc).collect()
        }
        got = {
            (r["id"], r["rank"])
            for r in grouped_topk(
                sales, ["grp"], "amt", 7, descending=desc, tiebreak_col="id"
            ).collect()
        }
        assert got == want


def test_partitioning_independent(spark, sales):
    a = {
        (r["id"], r["rank"])
        for r in grouped_topk(
            sales.repartition(1), ["grp"], "amt", 5, tiebreak_col="id"
        ).collect()
    }
    b = {
        (r["id"], r["rank"])
        for r in grouped_topk(
            sales.repartition(13), ["grp"], "amt", 5, tiebreak_col="id"
        ).collect()
    }
    assert a == b


def test_small_groups_and_nulls(spark):
    rows = [(1, "a", 5.0), (2, "a", None), (3, "b", 1.0)]
    df = spark.createDataFrame(rows, "id long, grp string, amt double")
    got = {
        (r["id"], r["rank"])
        for r in grouped_topk(df, ["grp"], "amt", 10, tiebreak_col="id").collect()
    }
    assert got == {(1, 1), (3, 1)}  # null amt excluded, small groups keep all


def test_multi_group_cols(spark):
    rows = [(i, "x" if i % 2 else "y", i % 3, float(i)) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, a string, b long, amt double")
    out = grouped_topk(df, ["a", "b"], "amt", 2, tiebreak_col="id")
    counts = out.groupBy("a", "b").count().collect()
    assert all(r["count"] == 2 for r in counts) and len(counts) == 6


def test_duplicate_tiebreak_values(spark):
    """ADVICE r4: repeated tiebreak values within a group must not
    inflate the result past k, duplicate ranks, or admit non-top rows
    (the old retrieval join matched on tiebreak alone; k=2 returned 6
    rows including a non-top value on exactly this shape)."""
    rows = [
        (1, "g", 10.0, "t1"),
        (2, "g", 9.0, "t1"),   # same tiebreak as the winner, lower amt
        (3, "g", 8.0, "t1"),
        (4, "g", 7.0, "t2"),
        (5, "h", 3.0, "t1"),
    ]
    df = spark.createDataFrame(rows, "id long, grp string, amt double, tb string")
    out = grouped_topk(df, ["grp"], "amt", 2, tiebreak_col="tb").collect()
    got = {(r["id"], r["rank"]) for r in out}
    assert got == {(1, 1), (2, 2), (5, 1)}

    # full (group, amt, tiebreak) duplicates: output trims back to k
    # rows with distinct ranks (row identity among exact ties is
    # arbitrary — the same nondeterminism the naive window has)
    dup = spark.createDataFrame(
        [(1, "g", 5.0, "t"), (2, "g", 5.0, "t"), (3, "g", 5.0, "t")],
        "id long, grp string, amt double, tb string",
    )
    out = grouped_topk(dup, ["grp"], "amt", 2, tiebreak_col="tb").collect()
    assert sorted(r["rank"] for r in out) == [1, 2]


def test_null_tiebreak_not_dropped(spark):
    rows = [(1, "g", 10.0, None), (2, "g", 9.0, "t"), (3, "g", 8.0, None)]
    df = spark.createDataFrame(rows, "id long, grp string, amt double, tb string")
    out = {
        (r["id"], r["rank"])
        for r in grouped_topk(df, ["grp"], "amt", 2, tiebreak_col="tb").collect()
    }
    assert out == {(1, 1), (2, 2)}


def test_null_group_key_not_dropped(spark):
    """ADVICE r5: groupBy keeps NULL groups, so a NULL group key can
    win — the retrieval join must use eqNullSafe on group columns too
    (plain == silently dropped the whole NULL group, diverging from the
    naive window, which ranks NULL partitions normally)."""
    rows = [
        (1, None, 10.0),
        (2, None, 9.0),
        (3, None, 8.0),
        (4, "g", 5.0),
    ]
    df = spark.createDataFrame(rows, "id long, grp string, amt double")
    out = {
        (r["id"], r["rank"])
        for r in grouped_topk(df, ["grp"], "amt", 2, tiebreak_col="id").collect()
    }
    assert out == {(1, 1), (2, 2), (4, 1)}


def test_validation(spark, sales):
    with pytest.raises(ValueError, match="k must be positive"):
        grouped_topk(sales, ["grp"], "amt", 0)
    with pytest.raises(ValueError, match="at least one group"):
        grouped_topk(sales, [], "amt", 1)
