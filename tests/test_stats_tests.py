"""benford_digits / gini_coefficient / chi_square_independence
(operators/stats_tests.py)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

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


class TestKsTwoSample:
    def test_identical_distributions_d_zero(self, spark):
        from tube_spark.operators.stats_tests import ks_two_sample

        rows = [(float(i % 10), "a") for i in range(50)] + [
            (float(i % 10), "b") for i in range(50)
        ]
        df = spark.createDataFrame(rows, "v double, g string")
        r = ks_two_sample(df, "v", "g", "a", "b").collect()[0]
        assert r["ks_d"] == 0.0 and not r["reject_95"]
        assert r["n_a"] == 50 and r["n_b"] == 50

    def test_disjoint_supports_d_one(self, spark):
        from tube_spark.operators.stats_tests import ks_two_sample

        rows = [(float(i), "a") for i in range(30)] + [
            (float(i + 100), "b") for i in range(30)
        ]
        df = spark.createDataFrame(rows, "v double, g string")
        r = ks_two_sample(df, "v", "g", "a", "b").collect()[0]
        assert r["ks_d"] == 1.0 and r["reject_95"]

    def test_matches_python_reference(self, spark):
        """D equals a plain-python ECDF scan; third groups and NULL/NaN
        values are excluded."""
        from tube_spark.operators.stats_tests import ks_two_sample

        import numpy as np

        rng = np.random.default_rng(5)
        a = list(rng.normal(0, 1, 80))
        b = list(rng.normal(0.7, 1.3, 60))
        rows = (
            [(float(x), "a") for x in a]
            + [(float(x), "b") for x in b]
            + [(None, "a"), (float("nan"), "b"), (5.0, "zz")]
        )
        df = spark.createDataFrame(rows, "v double, g string")
        r = ks_two_sample(df, "v", "g", "a", "b").collect()[0]
        pooled = sorted(set(a) | set(b))
        sa, sb = sorted(a), sorted(b)
        import bisect

        d = max(
            abs(
                bisect.bisect_right(sa, v) / len(a)
                - bisect.bisect_right(sb, v) / len(b)
            )
            for v in pooled
        )
        assert r["ks_d"] == pytest.approx(round(d, 6), abs=1e-9)
        assert r["n_a"] == 80 and r["n_b"] == 60
        crit = 1.358 * math.sqrt((80 + 60) / (80 * 60))
        assert r["critical_95"] == pytest.approx(round(crit, 6), abs=1e-9)
        assert r["reject_95"] == (d > crit)

    def test_empty_input_degenerate_row(self, spark):
        """ADVICE r13: zero input rows (or both groups filtered away)
        must pin n_a=n_b=0 and reject_95=false — callers branching on
        reject_95 must never read a silent NULL.  ks_d/critical_95
        stay NULL (no statistic exists)."""
        from tube_spark.operators.stats_tests import ks_two_sample

        df = spark.createDataFrame([], "v double, g string")
        r = ks_two_sample(df, "v", "g", "a", "b").collect()[0]
        assert r["n_a"] == 0 and r["n_b"] == 0
        assert r["reject_95"] is False
        assert r["ks_d"] is None and r["critical_95"] is None


class TestMannWhitney:
    def _ref(self, a, b):
        """Pure-python midrank rank-sum reference."""
        import collections

        vals = sorted(a + b)
        ranks, i = {}, 0
        while i < len(vals):
            j = i
            while j < len(vals) and vals[j] == vals[i]:
                j += 1
            ranks[vals[i]] = (i + 1 + j) / 2.0
            i = j
        na, nb, n = len(a), len(b), len(a) + len(b)
        ra = sum(ranks[x] for x in a)
        ua = ra - na * (na + 1) / 2.0
        tie = sum(
            c**3 - c for c in collections.Counter(vals).values()
        )
        var = na * nb / 12.0 * ((n + 1) - tie / (n * (n - 1)))
        z = (ua - na * nb / 2.0) / math.sqrt(var) if var > 0 else None
        return na, nb, ua, na * nb - ua, z

    def test_matches_python_reference_with_ties(self, spark):
        """u/z equal the midrank reference; third groups and NULL/NaN
        excluded; rounding to 2 decimals forces heavy ties."""
        from tube_spark.operators.stats_tests import mann_whitney_u

        import numpy as np

        rng = np.random.default_rng(11)
        a = [round(float(x), 1) for x in rng.normal(0, 1, 70)]
        b = [round(float(x), 1) for x in rng.normal(0.6, 1.2, 50)]
        rows = (
            [(float(x), "a") for x in a]
            + [(float(x), "b") for x in b]
            + [(None, "a"), (float("nan"), "b"), (3.0, "zz")]
        )
        df = spark.createDataFrame(rows, "v double, g string")
        r = mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
        na, nb, ua, ub, z = self._ref(a, b)
        assert (r["n_a"], r["n_b"]) == (na, nb)
        assert r["u_a"] == pytest.approx(round(ua, 1), abs=1e-9)
        assert r["u_b"] == pytest.approx(round(ub, 1), abs=1e-9)
        assert r["z"] == pytest.approx(round(z, 6), abs=1e-9)
        assert r["reject_95"] == (abs(z) > 1.96)

    def test_location_shift_detected_symmetrically(self, spark):
        """A clear upward shift of group a gives z > 1.96; swapping
        the labels negates z."""
        from tube_spark.operators.stats_tests import mann_whitney_u

        rows = [(float(i), "a") for i in range(40, 80)] + [
            (float(i), "b") for i in range(40)
        ]
        df = spark.createDataFrame(rows, "v double, g string")
        r = mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
        s = mann_whitney_u(df, "v", "g", "b", "a").collect()[0]
        assert r["z"] > 1.96 and r["reject_95"]
        assert s["z"] == -r["z"] and s["u_a"] == r["u_b"]

    def test_degenerate_inputs_pinned(self, spark):
        """Empty input, one-sided input, and all-tied input: counts
        pinned, z NULL, reject_95 false — never a silent NULL branch
        (the ks_two_sample empty-row contract)."""
        from tube_spark.operators.stats_tests import mann_whitney_u

        df = spark.createDataFrame(
            [(1.0, "a")] * 5 + [(1.0, "b")] * 5, "v double, g string"
        )
        tied = mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
        # every comparison is a tie: U_a = U_b = n_a*n_b/2, zero variance
        assert tied["u_a"] == tied["u_b"] == 12.5
        assert tied["z"] is None and tied["reject_95"] is False

        empty = mann_whitney_u(
            df.where(F.lit(False)), "v", "g", "a", "b"
        ).collect()[0]
        assert empty["n_a"] == 0 and empty["n_b"] == 0
        assert empty["z"] is None and empty["reject_95"] is False

        one = mann_whitney_u(
            df.where(F.col("g") == "a"), "v", "g", "a", "b"
        ).collect()[0]
        assert one["n_b"] == 0 and one["reject_95"] is False


class TestMadOutliers:
    def test_known_hand_values(self, spark):
        from tube_spark.operators.stats_tests import mad_outliers

        # group a: median 5, MAD 1, one far point beyond 3*MAD
        rows = [("a", v) for v in [4.0, 5.0, 6.0, 5.0, 100.0]]
        df = spark.createDataFrame(rows, "g string, v double")
        r = mad_outliers(df, "g", "v", k=3.0).collect()[0]
        assert r["med"] == 5.0 and r["mad"] == 1.0
        assert r["n"] == 5 and r["n_outliers"] == 1
        assert r["outlier_share"] == pytest.approx(0.2)

    def test_zero_mad_flags_any_deviation(self, spark):
        from tube_spark.operators.stats_tests import mad_outliers

        rows = [("a", 3.0)] * 6 + [("a", 4.0)]
        df = spark.createDataFrame(rows, "g string, v double")
        r = mad_outliers(df, "g", "v", k=3.0).collect()[0]
        assert r["mad"] == 0.0 and r["n_outliers"] == 1

    def test_robust_to_contamination_where_zscore_is_not(self, spark):
        """The selling point: 20% contamination shifts mean/stddev so a
        3-sigma rule misses planted outliers; the MAD fence holds."""
        from tube_spark.operators.stats_tests import mad_outliers

        import numpy as np

        rng = np.random.default_rng(9)
        clean = list(rng.normal(10, 1, 80))
        planted = [1000.0 + float(x) for x in rng.normal(0, 1, 20)]
        vals = clean + planted
        df = spark.createDataFrame(
            [("a", float(v)) for v in vals], "g string, v double"
        )
        r = mad_outliers(df, "g", "v", k=3.0).collect()[0]
        assert r["n_outliers"] == 20  # every planted point flagged
        # mean/std cut misses them all: std ~ 400, mean ~ 208
        mu, sd = float(np.mean(vals)), float(np.std(vals))
        assert all(abs(p - mu) < 3 * sd for p in planted)

    def test_nulls_and_nans_excluded(self, spark):
        from tube_spark.operators.stats_tests import mad_outliers

        rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", None),
                ("a", float("nan"))]
        df = spark.createDataFrame(rows, "g string, v double")
        r = mad_outliers(df, "g", "v").collect()[0]
        assert r["n"] == 3 and r["med"] == 2.0


class TestCompressionSignals:
    def test_matches_local_zlib_and_ranks_redundancy(self, spark):
        """Differential vs local zlib; repeated text compresses far
        better than varied text; NULL text keeps its row with NULL
        signals."""
        import zlib

        from tube_spark.operators.text_analysis import compression_signals

        varied = " ".join(f"w{i*i % 9973}x{i}" for i in range(400))
        spam = "click here buy now " * 100
        rows = [(1, varied), (2, spam), (3, None), (4, "")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in
               compression_signals(df).collect()}
        assert len(out) == 4
        for did, t in [(1, varied), (2, spam)]:
            raw = t.encode()
            assert out[did]["n_bytes"] == len(raw)
            assert out[did]["n_deflate_bytes"] == len(zlib.compress(raw, 6))
            assert out[did]["compression_ratio"] == pytest.approx(
                len(raw) / len(zlib.compress(raw, 6))
            )
        assert out[2]["compression_ratio"] > 3 * out[1]["compression_ratio"]
        assert out[3]["n_bytes"] is None and out[3]["compression_ratio"] is None
        # empty text: 0 bytes compress to a nonzero stub -> ratio 0
        assert out[4]["n_bytes"] == 0 and out[4]["compression_ratio"] == 0.0

    def test_arrow_stage_not_row_python(self, spark):
        from tube_spark.operators.text_analysis import compression_signals

        df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
        plan = compression_signals(df)._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" in plan and "BatchEvalPython" not in plan


class TestSpearman:
    def _mid(self, vals):
        s = sorted(vals)
        r, i = {}, 0
        while i < len(s):
            j = i
            while j < len(s) and s[j] == s[i]:
                j += 1
            r[s[i]] = (i + 1 + j) / 2.0
            i = j
        return r

    def test_matches_python_reference_with_ties(self, spark):
        """rho/z equal the midrank Pearson reference (centered sums);
        NULL/NaN rows excluded."""
        from tube_spark.operators.stats_tests import spearman_corr

        import numpy as np

        rng = np.random.default_rng(19)
        xs = [round(float(v), 1) for v in rng.normal(0, 1, 120)]
        ys = [
            round(x * 0.6 + round(float(e), 1), 1)
            for x, e in zip(xs, rng.normal(0, 0.9, 120))
        ]
        rows = list(zip(xs, ys)) + [(None, 1.0), (1.0, float("nan"))]
        df = spark.createDataFrame(rows, "x double, y double")
        r = spearman_corr(df, "x", "y").collect()[0]
        rx, ry = self._mid(xs), self._mid(ys)
        n = len(xs)
        mean = (n + 1) / 2
        d = [(rx[a] - mean, ry[b] - mean) for a, b in zip(xs, ys)]
        sxy = sum(a * b for a, b in d)
        sxx = sum(a * a for a, _ in d)
        syy = sum(b * b for _, b in d)
        rho = sxy / math.sqrt(sxx * syy)
        z = rho * math.sqrt(n - 1)
        assert r["n"] == n
        assert r["rho"] == pytest.approx(round(rho, 6), abs=1e-9)
        assert r["z"] == pytest.approx(round(z, 6), abs=1e-9)
        assert r["reject_95"] == (abs(z) > 1.96)

    def test_monotone_invariance(self, spark):
        """rho is invariant under a strictly monotone transform of
        either column — the property Pearson lacks."""
        from tube_spark.operators.stats_tests import spearman_corr

        rows = [(float(i), float(i * i)) for i in range(1, 40)]
        df = spark.createDataFrame(rows, "x double, y double")
        a = spearman_corr(df, "x", "y").collect()[0]
        assert a["rho"] == 1.0 and a["reject_95"]
        cubed = df.select(F.col("x"), (F.col("y") ** 3).alias("y"))
        assert spearman_corr(cubed, "x", "y").collect()[0]["rho"] == 1.0

    def test_degenerate_inputs_pinned(self, spark):
        from tube_spark.operators.stats_tests import spearman_corr

        df = spark.createDataFrame(
            [(1.0, float(i)) for i in range(5)], "x double, y double"
        )
        const = spearman_corr(df, "x", "y").collect()[0]
        assert const["rho"] is None and const["reject_95"] is False
        empty = spearman_corr(
            df.where(F.lit(False)), "x", "y"
        ).collect()[0]
        assert empty["n"] == 0 and empty["rho"] is None
        assert empty["reject_95"] is False


class TestKruskalWallis:
    def test_matches_python_reference_with_ties(self, spark):
        from tube_spark.operators.stats_tests import kruskal_wallis

        import collections

        import numpy as np

        rng = np.random.default_rng(23)
        gs = [str(g) for g in rng.choice(list("abc"), 130)]
        shift = {"a": 0.0, "b": 0.4, "c": -0.3}
        vs = [
            round(float(rng.normal(shift[g], 1)), 1) for g in gs
        ]
        df = spark.createDataFrame(
            list(zip(vs, gs)) + [(None, "a")], "v double, g string"
        )
        r = kruskal_wallis(df, "v", "g").collect()[0]
        s = sorted(vs)
        mid, i = {}, 0
        while i < len(s):
            j = i
            while j < len(s) and s[j] == s[i]:
                j += 1
            mid[s[i]] = (i + 1 + j) / 2.0
            i = j
        N = len(vs)
        rj, nj = collections.Counter(), collections.Counter()
        for v_, g_ in zip(vs, gs):
            rj[g_] += mid[v_]
            nj[g_] += 1
        H = 12 / (N * (N + 1)) * sum(
            rj[g] ** 2 / nj[g] for g in nj
        ) - 3 * (N + 1)
        tie = sum(
            c**3 - c
            for c in collections.Counter(vs).values()
        )
        Hc = H / (1 - tie / (N**3 - N))
        assert r["n"] == N and r["k"] == 3
        assert r["h"] == pytest.approx(round(H, 6), abs=1e-9)
        assert r["h_tie_corrected"] == pytest.approx(round(Hc, 6), abs=1e-9)

    def test_two_groups_equals_squared_mwu_z(self, spark):
        """With k=2 and no ties across groups, tie-corrected H equals
        the squared Mann-Whitney z (both are the same rank-sum test)."""
        from tube_spark.operators.stats_tests import (
            kruskal_wallis,
            mann_whitney_u,
        )

        rows = [(float(i), "a") for i in range(30)] + [
            (float(i) + 0.5, "b") for i in range(25)
        ]
        df = spark.createDataFrame(rows, "v double, g string")
        h = kruskal_wallis(df, "v", "g").collect()[0]
        z = mann_whitney_u(df, "v", "g", "a", "b").collect()[0]["z"]
        assert h["h_tie_corrected"] == pytest.approx(z * z, abs=1e-4)

    def test_degenerates(self, spark):
        from tube_spark.operators.stats_tests import kruskal_wallis

        df = spark.createDataFrame(
            [(1.0, "a")] * 4 + [(1.0, "b")] * 4, "v double, g string"
        )
        tied = kruskal_wallis(df, "v", "g").collect()[0]
        assert tied["h"] == 0.0 and tied["h_tie_corrected"] is None
        empty = kruskal_wallis(
            df.where(F.lit(False)), "v", "g"
        ).collect()[0]
        assert empty["n"] == 0 and empty["k"] == 0 and empty["h"] is None
        # NULL group label forms its own level
        ng = spark.createDataFrame(
            [(1.0, "a"), (2.0, "a"), (3.0, None), (4.0, None)],
            "v double, g string",
        )
        assert kruskal_wallis(ng, "v", "g").collect()[0]["k"] == 2


class TestAnovaOneway:
    def test_matches_python_reference(self, spark):
        from tube_spark.operators.stats_tests import anova_oneway

        import collections
        import random

        random.seed(9)
        gs = [random.choice("abcd") for _ in range(200)]
        shift = {"a": 10, "b": 11, "c": 9.5, "d": 10.2}
        vs = [round(random.gauss(shift[g], 2), 2) for g in gs]
        df = spark.createDataFrame(
            list(zip(vs, gs)) + [(None, "a"), (float("nan"), "b")],
            "v double, g string",
        )
        r = anova_oneway(df, "v", "g").collect()[0]
        by = collections.defaultdict(list)
        for v, g in zip(vs, gs):
            by[g].append(v)
        N, k, S = len(vs), len(by), sum(vs)
        ssb = sum(sum(x) ** 2 / len(x) for x in by.values()) - S * S / N
        ssw = sum(
            sum(v * v for v in x) - sum(x) ** 2 / len(x)
            for x in by.values()
        )
        f = (ssb / (k - 1)) / (ssw / (N - k))
        assert r["n"] == N and r["k"] == k
        assert r["ss_between"] == pytest.approx(ssb, abs=0.02)
        assert r["ss_within"] == pytest.approx(ssw, abs=0.02)
        assert r["f"] == pytest.approx(f, abs=1e-5)

    def test_strong_separation_large_f(self, spark):
        from tube_spark.operators.stats_tests import anova_oneway

        rows = [(float(i % 3), "a") for i in range(30)] + [
            (float(i % 3) + 50, "b") for i in range(30)
        ]
        df = spark.createDataFrame(rows, "v double, g string")
        assert anova_oneway(df, "v", "g").collect()[0]["f"] > 1000

    def test_degenerates_null_f(self, spark):
        """One group, empty input, N == k (zero within dof), and zero
        within-variance all pin NULL f via try_divide — never an ANSI
        divide-by-zero."""
        from tube_spark.operators.stats_tests import anova_oneway

        df = spark.createDataFrame(
            [(1.0, "a"), (2.0, "a"), (3.0, "a")], "v double, g string"
        )
        assert anova_oneway(df, "v", "g").collect()[0]["f"] is None
        e = anova_oneway(df.where(F.lit(False)), "v", "g").collect()[0]
        assert e["n"] == 0 and e["k"] == 0 and e["f"] is None
        nk = spark.createDataFrame(
            [(1.0, "a"), (2.0, "b")], "v double, g string"
        )
        assert anova_oneway(nk, "v", "g").collect()[0]["f"] is None
        zv = spark.createDataFrame(
            [(1.0, "a")] * 3 + [(1.0, "b")] * 3, "v double, g string"
        )
        rz = anova_oneway(zv, "v", "g").collect()[0]
        assert rz["f"] is None and rz["ss_within"] == 0.0


class TestMutualInformation:
    def test_matches_python_reference(self, spark):
        from tube_spark.operators.stats_tests import mutual_information

        import collections
        import random

        random.seed(4)
        rows = []
        for _ in range(300):
            a = random.choice("xyz")
            b = a if random.random() < 0.6 else random.choice("pq")
            rows.append((a, b))
        df = spark.createDataFrame(rows, "a string, b string")
        r = mutual_information(df, "a", "b").collect()[0]
        n = len(rows)
        ca = collections.Counter(x for x, _ in rows)
        cb = collections.Counter(y for _, y in rows)
        cab = collections.Counter(rows)
        ha = -sum(c / n * math.log(c / n) for c in ca.values())
        hb = -sum(c / n * math.log(c / n) for c in cb.values())
        mi = sum(
            c / n * math.log((c * n) / (ca[a] * cb[b]))
            for (a, b), c in cab.items()
        )
        assert r["n"] == n
        assert r["h_a"] == pytest.approx(ha, abs=2e-6)
        assert r["h_b"] == pytest.approx(hb, abs=2e-6)
        assert r["mi"] == pytest.approx(mi, abs=2e-6)
        assert r["nmi"] == pytest.approx(mi / math.sqrt(ha * hb), abs=2e-6)

    def test_independence_zero_identity_one(self, spark):
        from tube_spark.operators.stats_tests import mutual_information

        ind = spark.createDataFrame(
            [(a, b) for a in "xy" for b in "pq" for _ in range(25)],
            "a string, b string",
        )
        ri = mutual_information(ind, "a", "b").collect()[0]
        assert ri["mi"] == pytest.approx(0.0, abs=1e-9)
        ident = spark.createDataFrame(
            [("x", "x")] * 30 + [("y", "y")] * 70, "a string, b string"
        )
        # perfect dependence: nmi = 1 even with skewed marginals
        assert mutual_information(ident, "a", "b").collect()[0][
            "nmi"
        ] == pytest.approx(1.0, abs=1e-9)

    def test_degenerates(self, spark):
        """Constant column (H=0) pins NULL nmi; empty input pins n=0;
        NULL forms its own level."""
        from tube_spark.operators.stats_tests import mutual_information

        cst = spark.createDataFrame(
            [("x", "p"), ("x", "q")], "a string, b string"
        )
        rc = mutual_information(cst, "a", "b").collect()[0]
        assert rc["h_a"] == 0.0 and rc["nmi"] is None
        e = mutual_information(
            cst.where(F.lit(False)), "a", "b"
        ).collect()[0]
        assert e["n"] == 0 and e["mi"] is None
        nl = spark.createDataFrame(
            [("x", "p"), (None, "q"), (None, "q")], "a string, b string"
        )
        assert mutual_information(nl, "a", "b").collect()[0][
            "nmi"
        ] == pytest.approx(1.0, abs=1e-9)
