"""operators/mixture.py: source-weighted token-budget mixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tube_spark.operators.mixture import mixture_report, mixture_sample


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")


def test_budget_met_and_boundary_included(spark):
    rows = [(i, "web", 10) for i in range(100)] + [(1000 + i, "code", 10) for i in range(100)]
    sel = mixture_sample(_docs(spark, rows), {"web": 3.0, "code": 1.0}, 400)
    per = {
        r["source"]: r["n_tokens"]
        for r in sel.groupBy("source").agg(F.sum("n_tokens").alias("n_tokens")).collect()
    }
    # allocations: web 300, code 100; docs are 10 tokens so exact fill
    assert per == {"web": 300, "code": 100}
    # cum_before strictly below the allocation for every selected doc
    assert sel.filter((F.col("source") == "web") & (F.col("cum_before") >= 300)).count() == 0


def test_boundary_doc_crosses_allocation(spark):
    # single source, docs of 7 tokens, budget 10: first doc fills 7,
    # second crosses (cum_before=7 < 10) and must be INCLUDED
    rows = [(1, "web", 7), (2, "web", 7), (3, "web", 7)]
    sel = mixture_sample(_docs(spark, rows), {"web": 1.0}, 10)
    assert sel.count() == 2
    assert sel.agg(F.sum("n_tokens")).first()[0] == 14  # meets-or-exceeds


def test_unweighted_source_dropped_and_determinism(spark):
    rows = [(i, s, 5) for i in range(60) for s in ("a", "b", "junk")]
    d = _docs(spark, rows)
    s1 = mixture_sample(d, {"a": 1.0, "b": 1.0}, 100)
    s2 = mixture_sample(d.repartition(13), {"a": 1.0, "b": 1.0}, 100)
    assert s1.filter(F.col("source") == "junk").count() == 0
    ids = lambda df: sorted(r["doc_id"] for r in df.select("doc_id").collect())
    assert ids(s1) == ids(s2)  # partitioning-independent selection


def test_report_shares(spark):
    rows = [(i, "web", 10) for i in range(50)] + [(100 + i, "code", 10) for i in range(50)]
    rep = {
        r["source"]: r
        for r in mixture_report(_docs(spark, rows), {"web": 1.0, "code": 1.0}, 200).collect()
    }
    assert rep["web"]["allocation"] == 100 and rep["code"]["allocation"] == 100
    assert abs(rep["web"]["realized_share"] - 0.5) < 0.01


def test_bad_inputs(spark):
    d = _docs(spark, [(1, "web", 5)])
    with pytest.raises(ValueError):
        mixture_sample(d, {"web": 1.0}, 0)
    with pytest.raises(ValueError):
        mixture_sample(d, {}, 10)
    with pytest.raises(ValueError):
        mixture_sample(d, {"web": -1.0}, 10)


def test_mixture_weights_temperature_semantics(spark):
    """alpha=1 -> proportional to token mass; alpha=0 -> uniform;
    0<alpha<1 upsamples the small source (weight above proportional,
    below uniform); allocations sum to <= budget with floor rounding."""
    import pytest
    from pyspark.sql import functions as F

    from tube_spark.operators.mixture import mixture_weights

    rows = [("web", 100) for _ in range(90)] + [("code", 100) for _ in range(10)]
    df = spark.createDataFrame(rows, "source string, n_tok int")

    prop = {r["source"]: r["weight"] for r in mixture_weights(df, "source", "n_tok", alpha=1.0).collect()}
    assert prop["web"] == pytest.approx(0.9, abs=1e-6)
    uni = {r["source"]: r["weight"] for r in mixture_weights(df, "source", "n_tok", alpha=0.0).collect()}
    assert uni["web"] == pytest.approx(0.5, abs=1e-6)
    half = {r["source"]: r["weight"] for r in mixture_weights(df, "source", "n_tok", alpha=0.5).collect()}
    assert prop["code"] < half["code"] < uni["code"]

    out = mixture_weights(df, "source", "n_tok", alpha=0.5, total_budget=1000).collect()
    allocs = {r["source"]: r["alloc_tokens"] for r in out}
    assert sum(allocs.values()) <= 1000
    assert all(r["alloc_tokens"] is not None for r in out)
    no_budget = mixture_weights(df, "source", "n_tok", alpha=0.5).collect()
    assert all(r["alloc_tokens"] is None for r in no_budget)
    with pytest.raises(ValueError, match="alpha"):
        mixture_weights(df, "source", "n_tok", alpha=-1)
