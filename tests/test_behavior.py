"""event_transitions / rfm_scores / ab_test (operators/behavior.py)."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from tube_spark.operators.behavior import ab_test, event_transitions, rfm_scores

T0 = dt.datetime(2024, 1, 1)


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


class TestEventTransitions:
    def test_counts_and_probabilities(self, spark):
        m = dt.timedelta(minutes=1)
        ev = _events(spark, [
            (1, T0, 1, "view", 0.0),
            (2, T0 + m, 1, "click", 0.0),
            (3, T0 + 2 * m, 1, "view", 0.0),
            (4, T0 + 3 * m, 1, "click", 0.0),
            (5, T0, 2, "view", 0.0),
            (6, T0 + m, 2, "purchase", 1.0),
        ])
        out = {
            (r["from_type"], r["to_type"]): r
            for r in event_transitions(ev).collect()
        }
        assert out[("view", "click")]["n"] == 2
        assert out[("view", "purchase")]["n"] == 1
        assert out[("view", "click")]["p"] == pytest.approx(2 / 3)
        assert out[("click", "view")]["p"] == 1.0
        # first event per user emits no pair
        assert sum(r["n"] for r in out.values()) == 4

    def test_probabilities_sum_to_one_per_row_type(self, spark):
        ev = _events(spark, [
            (i, T0 + dt.timedelta(minutes=i), i % 3, t, 0.0)
            for i, t in enumerate(["a", "b", "c", "a", "b", "a", "c", "b", "a"])
        ])
        rows = event_transitions(ev).collect()
        by_from = {}
        for r in rows:
            by_from.setdefault(r["from_type"], 0.0)
            by_from[r["from_type"]] += r["p"]
        for tot in by_from.values():
            assert tot == pytest.approx(1.0, abs=1e-5)


class TestRfmScores:
    def test_quartiles_and_segment(self, spark):
        rows = []
        eid = 0
        # 8 users: user u purchases u+1 times, each of value 10*(u+1),
        # last purchase at T0 + u days -> all three metrics rank by u
        for u in range(8):
            for j in range(u + 1):
                rows.append((
                    eid, T0 + dt.timedelta(days=u, minutes=j), u,
                    "purchase", 10.0 * (u + 1),
                ))
                eid += 1
        out = {r["user_id"]: r for r in rfm_scores(_events(spark, rows)).collect()}
        assert out[0]["segment"] == "111"
        assert out[7]["segment"] == "444"
        assert out[0]["frequency"] == 1 and out[7]["frequency"] == 8
        assert out[7]["monetary"] == pytest.approx(80.0 * 8)
        # ntile(4) over 8 rows: exactly 2 users per quartile
        from collections import Counter
        assert Counter(r["r_score"] for r in out.values()) == {1: 2, 2: 2, 3: 2, 4: 2}

    def test_non_conversions_ignored(self, spark):
        ev = _events(spark, [
            (1, T0, 1, "purchase", 5.0),
            (2, T0, 2, "view", 0.0),
        ])
        out = rfm_scores(ev).collect()
        assert [r["user_id"] for r in out] == [1]


class TestAbTest:
    def _df(self, spark, a_vals, b_vals):
        rows = [("a", v) for v in a_vals] + [("b", v) for v in b_vals]
        return spark.createDataFrame(rows, "arm string, x double")

    def test_known_statistics(self, spark):
        a = [1.0, 2.0, 3.0, 4.0]
        b = [2.0, 4.0, 6.0]
        r = ab_test(self._df(spark, a, b), "arm", "x", "a", "b").collect()[0]
        assert (r["n_a"], r["n_b"]) == (4, 3)
        assert r["mean_a"] == pytest.approx(2.5)
        assert r["mean_b"] == pytest.approx(4.0)
        var_a = sum((v - 2.5) ** 2 for v in a) / 4
        var_b = sum((v - 4.0) ** 2 for v in b) / 3
        assert r["var_a"] == pytest.approx(var_a)
        assert r["var_b"] == pytest.approx(var_b)
        z = (2.5 - 4.0) / math.sqrt(var_a / 4 + var_b / 3)
        assert r["z_stat"] == pytest.approx(z, abs=1e-5)

    def test_constant_metric_null_z(self, spark):
        r = ab_test(
            self._df(spark, [5.0, 5.0], [5.0, 5.0]), "arm", "x", "a", "b"
        ).collect()[0]
        assert r["var_a"] == 0.0 and r["var_b"] == 0.0
        assert r["z_stat"] is None  # 0/0 -> NULL, never NaN

    def test_empty_arm_null_stats(self, spark):
        r = ab_test(self._df(spark, [1.0], []), "arm", "x", "a", "b").collect()[0]
        assert r["n_b"] == 0
        assert r["mean_b"] is None and r["z_stat"] is None

    def test_other_arms_excluded(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0), ("b", 2.0), ("c", 99.0)], "arm string, x double"
        )
        r = ab_test(df, "arm", "x", "a", "b").collect()[0]
        assert (r["n_a"], r["n_b"]) == (1, 1)
