"""benford_digits / gini_coefficient / chi_square_independence
(operators/stats_tests.py)."""

from __future__ import annotations

import math

import pytest

from tube_spark.operators.stats_tests import (
    benford_digits,
    chi_square_independence,
    gini_coefficient,
)


class TestBenford:
    def test_digit_extraction_and_exclusions(self, spark):
        df = spark.createDataFrame(
            [(1.0,), (19.5,), (0.0042,), (-300.0,), (0.0,), (None,),
             (float("nan"),), (999.99,)],
            "v double",
        )
        rows = {r["digit"]: r for r in benford_digits(df, "v").collect()}
        # digits: 1, 1, 4, 3, 9 — zero/null/nan excluded
        assert rows[1]["n"] == 2
        assert rows[3]["n"] == 1  # |-300|
        assert rows[4]["n"] == 1  # 0.0042
        assert rows[9]["n"] == 1
        assert sum(r["n"] for r in rows.values()) == 5

    def test_perfect_benford_sample_low_chi2(self, spark):
        rows = []
        total = 10000
        for d in range(1, 10):
            rows += [(float(d),)] * round(total * math.log10(1 + 1 / d))
        df = spark.createDataFrame(rows, "v double")
        out = benford_digits(df, "v").collect()
        assert out[0]["chi2_total"] < 1.0  # rounding residue only
        for r in out:
            assert r["observed_p"] == pytest.approx(r["expected_p"], abs=1e-4)

    def test_infinities_excluded(self, spark):
        # +/-inf have no leading digit: they must not emit a digit-0
        # row or inflate the total behind observed_p (ADVICE r11)
        df = spark.createDataFrame(
            [(1.0,), (2.0,), (float("inf"),), (float("-inf"),)],
            "v double",
        )
        rows = {r["digit"]: r for r in benford_digits(df, "v").collect()}
        assert set(rows) == {1, 2}
        assert sum(r["n"] for r in rows.values()) == 2
        assert rows[1]["observed_p"] == pytest.approx(0.5)
        assert all(r["chi2_term"] is not None for r in rows.values())

    def test_uniform_digits_high_chi2(self, spark):
        df = spark.createDataFrame(
            [(float(d),) for d in range(1, 10) for _ in range(100)], "v double"
        )
        out = benford_digits(df, "v").collect()
        assert out[0]["chi2_total"] > 50  # chi2(8 dof) critical ~ 20


class TestGini:
    def test_equal_shares(self, spark):
        df = spark.createDataFrame(
            [(k, 10.0) for k in range(10)], "k long, v double"
        )
        r = gini_coefficient(df, "k", "v").collect()[0]
        # discrete-population floor: G = -(1/n)·... -> 0 as n grows;
        # for equal shares the rank formula gives exactly 0
        assert r["gini"] == pytest.approx(0.0, abs=1e-9)
        assert r["total"] == 100.0

    def test_total_concentration(self, spark):
        df = spark.createDataFrame(
            [(0, 100.0)] + [(k, 0.0) for k in range(1, 10)],
            "k long, v double",
        )
        r = gini_coefficient(df, "k", "v").collect()[0]
        # one holder of everything: G = (n-1)/n = 0.9
        assert r["gini"] == pytest.approx(0.9, abs=1e-9)

    def test_all_zero_measure_null(self, spark):
        df = spark.createDataFrame([(1, 0.0), (2, 0.0)], "k long, v double")
        r = gini_coefficient(df, "k", "v").collect()[0]
        assert r["gini"] is None

    def test_known_hand_value(self, spark):
        # x = [1,2,3,4]: G = 2*(1+4+9+16)/(4*10) - 5/4 = 0.25
        df = spark.createDataFrame(
            [(i, float(i)) for i in (1, 2, 3, 4)], "k long, v double"
        )
        r = gini_coefficient(df, "k", "v").collect()[0]
        assert r["gini"] == pytest.approx(0.25)


class TestChiSquare:
    def test_independent_uniform(self, spark):
        rows = [(a, b) for a in "xy" for b in "pq" for _ in range(50)]
        df = spark.createDataFrame(rows, "a string, b string")
        r = chi_square_independence(df, "a", "b").collect()[0]
        assert (r["n"], r["n_a"], r["n_b"], r["dof"]) == (200, 2, 2, 1)
        assert r["chi2"] == pytest.approx(0.0, abs=1e-9)

    def test_perfect_dependence(self, spark):
        rows = [("x", "p")] * 50 + [("y", "q")] * 50
        df = spark.createDataFrame(rows, "a string, b string")
        r = chi_square_independence(df, "a", "b").collect()[0]
        # perfect association in a 2x2: chi2 = n
        assert r["chi2"] == pytest.approx(100.0, abs=1e-9)

    def test_null_level_counts_toward_dof(self, spark):
        # NULL forms its own contingency level (the cells and chi2
        # already include it) — dof must count it too (ADVICE r11:
        # count_distinct skipped NULL, so a 3x3 table with NULL levels
        # reported dof=1 instead of 4)
        rows = (
            [("x", "p")] * 10 + [("x", None)] * 10 + [(None, "p")] * 10
            + [("y", "q")] * 10 + [(None, None)] * 10 + [("y", None)] * 10
            + [("x", "q")] * 5 + [("y", "p")] * 5 + [(None, "q")] * 5
        )
        df = spark.createDataFrame(rows, "a string, b string")
        r = chi_square_independence(df, "a", "b").collect()[0]
        assert (r["n_a"], r["n_b"], r["dof"]) == (3, 3, 4)

    def test_internal_names_do_not_collide_with_user_schema(self, spark):
        # user columns named like the old internals (o/ra/cb/nn) must
        # not raise AMBIGUOUS_REFERENCE (ADVICE r11)
        df = spark.createDataFrame(
            [("x", "p", 1, 2), ("y", "q", 3, 4)],
            "cb string, nn string, o long, ra long",
        )
        r = chi_square_independence(df, "cb", "nn").collect()[0]
        assert (r["n"], r["n_a"], r["n_b"]) == (2, 2, 2)

    def test_empty_cells_contribute_expected_mass(self, spark):
        # 2x2 with one structurally empty cell: hand-computed chi2
        rows = [("x", "p")] * 30 + [("x", "q")] * 10 + [("y", "p")] * 10
        df = spark.createDataFrame(rows, "a string, b string")
        r = chi_square_independence(df, "a", "b").collect()[0]
        n = 50
        obs = {("x", "p"): 30, ("x", "q"): 10, ("y", "p"): 10, ("y", "q"): 0}
        ra = {"x": 40, "y": 10}
        cb = {"p": 40, "q": 10}
        chi2 = sum(
            (obs[(a, b)] - ra[a] * cb[b] / n) ** 2 / (ra[a] * cb[b] / n)
            for a in "xy" for b in "pq"
        )
        assert r["chi2"] == pytest.approx(chi2, abs=1e-6)
