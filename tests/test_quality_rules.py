"""Gopher quality rules, C4 line filtering, sorted-neighborhood
blocking, graph degree stats, and the Zipf fit — unit semantics beyond
the differential oracles (which tests/test_extra_queries.py runs)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from tube_spark.operators.entities import sorted_neighborhood_pairs
from tube_spark.operators.graphstats import degree_table, graph_degree_stats
from tube_spark.operators.quality_rules import c4_line_filter, gopher_signals
from tube_spark.operators.text_analysis import zipf_fit

GOOD = (
    "the quick brown fox and that dog have fun with all of them to be sure "
    * 5
)


def _gopher(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in gopher_signals(df).collect()}


class TestGopherSignals:
    def test_natural_text_passes(self, spark):
        out = _gopher(spark, [(1, GOOD)])
        r = out[1]
        assert r["gopher_pass"] is True
        assert r["n_words"] == 80
        assert r["stop_hits"] == 8
        assert r["alpha_word_ratio"] == 1.0

    def test_each_rule_fails_independently(self, spark):
        rows = [
            (1, GOOD),
            (2, "short text only"),  # word-count floor
            (3, ("a " * 60) + GOOD),  # mean word length floor
            (4, GOOD + " " + "#" * 30),  # symbol ratio
            (5, "\n".join(f"- {GOOD}" for _ in range(3))),  # bullets
            (6, "\n".join(f"{GOOD}..." for _ in range(3))),  # ellipsis lines
            (7, GOOD + " " + "12345 " * 30),  # alpha-word floor
            (8, "alpha bravo charlie delta echo " * 20),  # no stopwords
            (9, "\n".join([GOOD] * 4 + ["unique closing line"])),  # dup lines
        ]
        out = _gopher(spark, rows)
        assert out[1]["gopher_pass"] is True
        for i in range(2, 10):
            assert out[i]["gopher_pass"] is False, i
        assert out[2]["n_words"] < 50
        assert out[3]["mean_word_len"] < 3
        assert out[4]["symbol_word_ratio"] > 0.1
        assert out[5]["bullet_line_ratio"] == 1.0
        assert out[6]["ellipsis_line_ratio"] == 1.0
        assert out[7]["alpha_word_ratio"] < 0.8
        assert out[8]["stop_hits"] < 2
        assert out[9]["dup_line_char_ratio"] > 0.2

    def test_null_and_empty_are_rows_not_errors(self, spark):
        out = _gopher(spark, [(1, None), (2, ""), (3, "   \n  \n ")])
        for i in (1, 2, 3):
            assert out[i]["n_words"] == 0
            assert out[i]["gopher_pass"] is False

    def test_dup_line_char_ratio_exact(self, spark):
        # two identical 3-char lines + one distinct 6-char line
        out = _gopher(spark, [(1, "abc\nabc\nabcdef")])
        assert out[1]["dup_line_char_ratio"] == pytest.approx(6 / 12)

    def test_ellipsis_count_non_overlapping(self, spark):
        # 7 dots = two non-overlapping '...' (left to right), 4 words
        out = _gopher(spark, [(1, "a b c d" + "." * 7)])
        assert out[1]["symbol_word_ratio"] == pytest.approx(2 / 4)


class TestC4LineFilter:
    def test_line_rules(self, spark):
        page = "\n".join(
            [
                "This line has the five words needed and ends well.",
                "no terminal punctuation on this line here",
                "Too short.",
                "This line mentions javascript so it is dropped.",
                'A quoted ending also counts as terminal here he said."',
                "What about a question with enough words in it?",
            ]
        )
        df = spark.createDataFrame([(1, page)], "doc_id long, text string")
        r = c4_line_filter(df).collect()[0]
        assert r["n_lines"] == 6
        assert r["n_kept"] == 3
        assert r["page_pass"] is True
        kept = r["text_clean"].split("\n")
        assert kept[0].startswith("This line has")
        assert kept[1].startswith("A quoted")
        assert kept[2].startswith("What about")

    def test_page_poisons(self, spark):
        good = "This sentence has more than enough words to stay."
        rows = [
            (1, "\n".join([good] * 3)),
            (2, "\n".join([good] * 3 + ["includes Lorem Ipsum filler text."])),
            (3, "\n".join([good] * 3 + ["x = { }"])),
            (4, "\n".join([good] * 2)),  # below min kept lines
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in c4_line_filter(df).collect()}
        assert out[1]["page_pass"] is True
        assert out[2]["page_pass"] is False  # lorem ipsum, case-insensitive
        assert out[3]["page_pass"] is False  # curly brace
        assert out[4]["page_pass"] is False
        # the poison drops the PAGE, not the surviving lines (the lorem
        # line itself is a keepable sentence — 5+ words, terminal '.')
        assert out[2]["n_kept"] == 4

    def test_null_text(self, spark):
        df = spark.createDataFrame([(1, None)], "doc_id long, text string")
        r = c4_line_filter(df).collect()[0]
        assert (r["n_lines"], r["n_kept"], r["text_clean"]) == (0, 0, "")
        assert r["page_pass"] is False


class TestSortedNeighborhood:
    def test_pair_count_and_adjacency(self, spark):
        df = spark.createDataFrame(
            [(i, f"name{(i * 7) % 20:03d}") for i in range(12)],
            "id long, name string",
        )
        pairs = sorted_neighborhood_pairs(df, "id", F.col("name"), window=3)
        rows = pairs.collect()
        # n=12, w=3: (n-w+1)*(w-1) + C(w-1,2) = 20 + 1
        assert len(rows) == 21
        for r in rows:
            assert 1 <= r["rank_b"] - r["rank_a"] <= 2

    def test_catches_cross_block_typo(self, spark):
        # 'aohn smith' vs 'john smith': first-letter typo — equal-prefix
        # blocking separates them, the sort keeps them adjacent
        names = [(1, "aohn smith"), (2, "john smith"), (3, "zz zz")] + [
            (10 + i, f"mid{i}") for i in range(5)
        ]
        df = spark.createDataFrame(names, "id long, name string")
        got = {
            (r["id_a"], r["id_b"])
            for r in sorted_neighborhood_pairs(
                df, "id", F.col("name"), window=2
            ).collect()
        }
        assert (1, 2) in got  # adjacent in sort order

    def test_window_validation(self, spark):
        df = spark.createDataFrame([(1, "a")], "id long, name string")
        with pytest.raises(ValueError):
            sorted_neighborhood_pairs(df, "id", F.col("name"), window=1)

    def test_rank_matches_global_sort(self, spark):
        df = spark.createDataFrame(
            [(i, f"k{(i * 13) % 50:03d}") for i in range(40)],
            "id long, name string",
        )
        pairs = sorted_neighborhood_pairs(df, "id", F.col("name"), window=2)
        order = [
            r["id"]
            for r in df.orderBy("name", "id").collect()
        ]
        expect = {(order[i], order[i + 1]) for i in range(len(order) - 1)}
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        assert got == expect


class TestGraphStats:
    def test_known_graph(self, spark):
        # square 1-2-3-4 plus diagonal 1-3; self-loop and a reverse
        # duplicate must vanish
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (5, 5), (2, 1)],
            "src long, dst long",
        )
        r = graph_degree_stats(edges).collect()[0]
        assert (r["n_nodes"], r["n_edges"], r["max_degree"]) == (4, 5, 3)
        assert r["avg_degree"] == pytest.approx(2.5)
        # degrees 3,2,3,2: hubs (1,3) attach to leaves -> disassortative
        assert r["degree_assortativity"] < 0

    def test_star_is_disassortative(self, spark):
        edges = spark.createDataFrame(
            [(0, i) for i in range(1, 8)], "src long, dst long"
        )
        r = graph_degree_stats(edges).collect()[0]
        assert r["degree_assortativity"] == pytest.approx(-1.0)

    def test_regular_graph_null_assortativity(self, spark):
        # a 4-cycle is 2-regular: zero degree variance, corr undefined
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
        )
        r = graph_degree_stats(edges).collect()[0]
        assert r["degree_variance"] == 0.0
        assert r["degree_assortativity"] is None or math.isnan(
            r["degree_assortativity"]
        )

    def test_degree_table_distinct_neighbors(self, spark):
        edges = spark.createDataFrame(
            [(1, 2), (2, 1), (1, 2)], "src long, dst long"
        )
        rows = {r["node"]: r["degree"] for r in degree_table(edges).collect()}
        assert rows == {1: 1, 2: 1}


class TestZipfFit:
    def test_exact_zipf_corpus(self, spark):
        # construct tf(rank) = round(1000/rank): slope ~ -1, r2 ~ 1
        # (terms must be pure-alpha: the tokenizer splits on digits)
        words = []
        for rank in range(1, 30):
            name = "w" + chr(ord("a") + rank // 26) + chr(ord("a") + rank % 26)
            words += [name] * round(1000 / rank)
        df = spark.createDataFrame(
            [(1, " ".join(words))], "doc_id long, text string"
        )
        r = zipf_fit(df).collect()[0]
        assert r["n_terms"] == 29
        assert r["zipf_slope"] == pytest.approx(-1.0, abs=0.02)
        assert r["zipf_r2"] > 0.999

    def test_uniform_corpus_flat_slope(self, spark):
        df = spark.createDataFrame(
            [
                (
                    1,
                    " ".join(
                        "u" + chr(ord("a") + i // 26) + chr(ord("a") + i % 26)
                        for i in range(50)
                    ),
                )
            ],
            "doc_id long, text string",
        )
        r = zipf_fit(df).collect()[0]
        assert r["zipf_slope"] == pytest.approx(0.0, abs=1e-9)

    def test_degenerate_vocab_null_fit(self, spark):
        df = spark.createDataFrame(
            [(1, "aaa aaa aaa")], "doc_id long, text string"
        )
        r = zipf_fit(df).collect()[0]
        assert r["n_terms"] == 1
        assert r["zipf_slope"] is None

    def test_top_n_caps_fit(self, spark):
        df = spark.createDataFrame(
            [(1, "a a a b b c d e f g")], "doc_id long, text string"
        )
        r = zipf_fit(df, top_n=3).collect()[0]
        assert r["n_terms"] == 7
        assert r["n_fit"] == 3
