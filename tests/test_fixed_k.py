"""Exact-k stratified sampling: counts, determinism, two-phase equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from tube_spark.functions.text import portable_hash60
from tube_spark.operators.sampling import stratified_fixed_k


@pytest.fixture(scope="module")
def frame(spark):
    rows = [(i, "big" if i % 10 else "small") for i in range(3000)]
    return spark.createDataFrame(rows, "doc_id long, grp string")


def test_exact_counts(spark, frame):
    out = stratified_fixed_k(frame, "grp", 50, "doc_id")
    counts = {r["grp"]: r["n"] for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert counts == {"big": 50, "small": 50}
    tiny = frame.filter(F.col("grp") == "small").limit(7)
    got = stratified_fixed_k(tiny, "grp", 50, "doc_id")
    assert got.count() == 7  # min(k, stratum size)


def test_partitioning_independent(spark, frame):
    a = {
        (r["doc_id"], r["sample_rank"])
        for r in stratified_fixed_k(frame.repartition(1), "grp", 25).collect()
    }
    b = {
        (r["doc_id"], r["sample_rank"])
        for r in stratified_fixed_k(frame.repartition(17), "grp", 25).collect()
    }
    assert a == b


def test_matches_naive_window(spark, frame):
    """The two-phase selection equals the single-window definition."""
    h = portable_hash60(F.concat(F.lit("fixedk"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("grp").orderBy(h.asc(), F.col("doc_id").asc())
    naive = (
        frame.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= 40)
    )
    want = {(r["doc_id"], r["sample_rank"]) for r in naive.collect()}
    got = {
        (r["doc_id"], r["sample_rank"])
        for r in stratified_fixed_k(frame, "grp", 40).collect()
    }
    assert got == want


def test_validation(frame):
    with pytest.raises(ValueError, match="k must be positive"):
        stratified_fixed_k(frame, "grp", 0)
