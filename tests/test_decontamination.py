"""operators/decontamination.py on hand-built corpora."""

from __future__ import annotations

from pyspark.sql import functions as F

from tube_spark.operators.decontamination import contamination_pairs, decontaminate


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BENCH = [(100, "the capital of france is paris and it is large")]


def test_exact_ngram_leak_detected(spark):
    corpus = _df(
        spark,
        [
            # contains the benchmark's 5-gram run verbatim
            (1, "trivia time the capital of france is paris everyone knows"),
            # shares words but never 5 consecutive ones
            (2, "paris france capital the of is and it large nothing shared"),
        ],
    )
    pairs = contamination_pairs(corpus, _df(spark, BENCH), n=5).collect()
    assert {(r["train_id"], r["bench_id"]) for r in pairs} == {(1, 100)}
    row = pairs[0]
    # "the capital of france is" + "capital of france is paris" = 2 shared
    assert row["n_shared"] == 2
    # benchmark has 10 tokens -> 6 distinct 5-grams
    assert abs(row["bench_frac"] - 2 / 6) < 1e-6


def test_min_frac_threshold(spark):
    corpus = _df(spark, [(1, "x y the capital of france is paris q r")])
    bench = _df(spark, BENCH)
    loose = contamination_pairs(corpus, bench, n=5, min_frac=0.1)
    strict = contamination_pairs(corpus, bench, n=5, min_frac=0.9)
    assert loose.count() == 1 and strict.count() == 0


def test_decontaminate_filters_only_leaked(spark):
    corpus = _df(
        spark,
        [
            (1, "trivia time the capital of france is paris everyone knows"),
            (2, "clean document with totally unrelated content inside"),
        ],
    )
    kept = decontaminate(corpus, _df(spark, BENCH), n=5)
    assert [r["doc_id"] for r in kept.collect()] == [2]


def test_benchmark_index_is_broadcast(spark):
    corpus = _df(spark, [(1, "a b c d e f g h")])
    plan = contamination_pairs(corpus, _df(spark, BENCH), n=5)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
