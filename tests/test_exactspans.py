"""Exact duplicate-substring extraction: maximal shared spans per
candidate pair, cross-checked against an independent character-walk
reference and against the window approximation it verifies."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from tube_spark.operators.exactspans import (
    exact_dup_coverage,
    exact_duplicate_spans,
)


def _py_spans(a: str, b: str, L: int) -> set[tuple[int, int, int]]:
    """All maximal common substrings >= L via per-diagonal character
    runs (independent of the operator's L-gram join formulation).
    Returns {(pos_a, pos_b, span_len)} with 1-based positions."""
    out = set()
    for d in range(-(len(b) - 1), len(a)):
        i = max(0, d)
        j = i - d
        run = 0
        while True:
            inside = i < len(a) and j < len(b)
            if inside and a[i] == b[j]:
                run += 1
            else:
                if run >= L:
                    out.add((i - run + 1, j - run + 1, run))
                run = 0
                if not inside:
                    break
            i += 1
            j += 1
    return out


def _spark_spans(spark, a: str, b: str, L: int) -> set[tuple[int, int, int]]:
    docs = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    return {
        (r["pos_a"], r["pos_b"], r["span_len"])
        for r in exact_duplicate_spans(docs, pairs, min_len=L).collect()
    }


def test_planted_span(spark):
    shared = "the quick brown fox jumps over the lazy dog"
    a = "XXXX" + shared + "YYYYYY"
    b = "zz" + shared + "qqq"
    got = _spark_spans(spark, a, b, 10)
    assert got == {(5, 3, len(shared))}


def test_multiple_occurrences_reported_separately(spark):
    s = "ABCDEFGHIJ"
    a = s + "xxxx"
    b = "1" + s + "22" + s + "3"
    got = _spark_spans(spark, a, b, len(s))
    assert got == {(1, 2, 10), (1, 14, 10)}


def test_random_strings_match_reference(spark):
    rng = random.Random(10)
    alpha = "abc"  # small alphabet -> plenty of accidental overlap
    for L in (3, 5):
        a = "".join(rng.choice(alpha) for _ in range(120))
        b = "".join(rng.choice(alpha) for _ in range(90))
        # plant one long shared block to guarantee a >=L hit
        block = "".join(rng.choice("xyz") for _ in range(L + 7))
        a = a[:40] + block + a[40:]
        b = b[:10] + block + b[10:]
        assert _spark_spans(spark, a, b, L) == _py_spans(a, b, L)


def test_min_len_validation_and_short_docs(spark):
    docs = spark.createDataFrame([(1, "ab"), (2, "ab")], "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with pytest.raises(ValueError):
        exact_duplicate_spans(docs, pairs, min_len=1)
    # both docs shorter than min_len: no rows, not an error
    assert exact_duplicate_spans(docs, pairs, min_len=5).count() == 0


def test_coverage_interval_union(spark):
    # doc 1 shares two OVERLAPPING spans with docs 2 and 3: coverage
    # must count the union, not the sum (base has no repeats, so each
    # shared block matches on exactly one diagonal)
    import string

    base = (string.ascii_letters + string.digits)[:60]
    a = base
    b = "PP" + base[:35] + "QQ"   # spans a[1..35]
    c = base[20:55] + "RR"        # spans a[21..55]
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "id_a long, id_b long")
    cov = {
        r["doc_id"]: (r["dup_chars"], r["dup_fraction"])
        for r in exact_dup_coverage(docs, pairs, min_len=10).collect()
    }
    assert cov[1][0] == 55  # union of [1,35] and [21,55]
    assert cov[2][0] == 35 and cov[3][0] == 35
    assert cov[1][1] == round(55 / 60, 6)


def test_exact_spans_consistent_with_window_approximation(spark):
    """Verification-tier contract: every exact span >= L implies the
    window stats see duplicated tokens for both docs at a window width
    that fits inside the span."""
    from tube_spark.operators.spandedup import span_dup_stats

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, "intro text then " + shared + " and a unique tail one"),
            (2, "different head " + shared + " closing words here two"),
            (3, "no overlap with anything else at all in this row"),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    spans = exact_duplicate_spans(docs, pairs, min_len=20).collect()
    assert len(spans) == 1 and spans[0]["span_len"] >= len(shared)
    stats = {
        r["doc_id"]: r["dup_tokens"]
        for r in span_dup_stats(docs, k=4, min_docs=2).collect()
    }
    assert stats[1] > 0 and stats[2] > 0 and stats[3] == 0


def test_max_pair_matches_guard_quarantines_hostile_pair(spark):
    # a self-repetitive pair's gram join is |A|x|B| — the guard skips
    # it entirely (never partially resolves) while ordinary pairs are
    # untouched, and the quarantine list reports the exact volume
    from tube_spark.operators.exactspans import (
        exact_duplicate_spans,
        exact_spans_overweight_pairs,
    )

    shared = (
        "the quick brown fox jumps over the lazy dog while seven "
        "wizards quietly mixed bright blue potions downstairs"
    )
    docs = spark.createDataFrame(
        [
            (1, "x" * 2000),
            (2, "x" * 2000),
            (3, "AAA " + shared + "BBB"),
            (4, "CCC " + shared + "DDD"),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (3, 4)], "id_a long, id_b long")

    unguarded_ok = exact_duplicate_spans(
        docs.filter("doc_id >= 3"), pairs.filter("id_a = 3"), min_len=40
    ).collect()
    assert len(unguarded_ok) == 1  # one maximal shared span

    guarded = exact_duplicate_spans(
        docs, pairs, min_len=40, max_pair_matches=100_000
    ).collect()
    # hostile pair gone, ordinary pair bit-identical
    assert sorted(map(tuple, guarded)) == sorted(map(tuple, unguarded_ok))

    over = exact_spans_overweight_pairs(
        docs, pairs, min_len=40, max_pair_matches=100_000
    ).collect()
    assert len(over) == 1
    r = over[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["est_matches"] == (2000 - 39) ** 2  # exact, not an estimate

    import pytest as _pytest

    with _pytest.raises(ValueError):
        exact_duplicate_spans(docs, pairs, max_pair_matches=0)


def test_guard_is_on_by_default_and_pipeline_surface(spark):
    # r11 verdict: the guard must be wired into the public surface, not
    # just exist — the DEFAULT call must quarantine a hostile pair (a
    # 4000-char self-repetitive doc pair exceeds the 10M default:
    # (4000-39)^2 ~ 15.7M matches), and the pipeline twin must hand
    # back the skipped pairs
    from tube_spark.operators.exactspans import exact_spans_with_quarantine

    shared = (
        "the quick brown fox jumps over the lazy dog while seven "
        "wizards quietly mixed bright blue potions downstairs"
    )
    docs = spark.createDataFrame(
        [
            (1, "x" * 4000),
            (2, "x" * 4000),
            (3, "AAA " + shared + "BBB"),
            (4, "CCC " + shared + "DDD"),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (3, 4)], "id_a long, id_b long")
    spans, quarantined = exact_spans_with_quarantine(docs, pairs, min_len=40)
    got = spans.collect()
    # hostile pair quarantined (not resolved), benign pair exact
    assert {(r["id_a"], r["id_b"]) for r in got} == {(3, 4)}
    # maximal span = " " + shared (both prefixes end in a space)
    assert len(got) == 1 and got[0]["span_len"] == len(shared) + 1
    q = quarantined.collect()
    assert [(r["id_a"], r["id_b"]) for r in q] == [(1, 2)]
    assert q[0]["est_matches"] == (4000 - 39) ** 2
