"""anonymity_report / seasonal_decompose / session_attribution — unit
semantics beyond the differential oracles."""

from __future__ import annotations

import datetime as dt

import pytest

from tube_spark.operators.attribution import session_attribution
from tube_spark.operators.privacy import anonymity_report
from tube_spark.operators.seasonal import seasonal_decompose


class TestAnonymityReport:
    def _df(self, spark):
        rows = (
            [("z1", "m", 100.0 + i) for i in range(6)]
            + [("z1", "f", 200.0)] * 3  # small class, 1 sensitive value
            + [("z2", None, 300.0), ("z2", None, 301.0)]
        )
        return spark.createDataFrame(rows, "zip string, seg string, sal double")

    def test_k_and_l_gates(self, spark):
        out = {
            (r["zip"], r["seg"]): r
            for r in anonymity_report(
                self._df(spark), ["zip", "seg"], "sal", k=5, l=2
            ).collect()
        }
        big = out[("z1", "m")]
        assert (big["n_records"], big["n_sensitive"]) == (6, 6)
        assert big["meets_k"] and big["meets_l"]
        small = out[("z1", "f")]
        assert (small["n_records"], small["n_sensitive"]) == (3, 1)
        assert not small["meets_k"] and not small["meets_l"]

    def test_null_quasi_is_its_own_class(self, spark):
        out = {
            (r["zip"], r["seg"]): r["n_records"]
            for r in anonymity_report(
                self._df(spark), ["zip", "seg"], k=2
            ).collect()
        }
        assert out[("z2", None)] == 2

    def test_without_sensitive_column(self, spark):
        cols = anonymity_report(self._df(spark), ["zip"], k=2).columns
        assert "n_sensitive" not in cols and "meets_l" not in cols

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            anonymity_report(self._df(spark), [])
        with pytest.raises(ValueError):
            anonymity_report(self._df(spark), ["zip"], k=0)


class TestSeasonalDecompose:
    def _series(self, spark, days=28, trend=0.0):
        # additive construction: level 100 + trend*i + seasonal by dow
        seasonal = [10.0, -5.0, 0.0, 3.0, -3.0, 8.0, -13.0]  # sums to 0
        rows = []
        for i in range(days):
            d = dt.datetime(2024, 1, 1) + dt.timedelta(days=i)
            phase = (d.date() - dt.date(1970, 1, 1)).days % 7
            rows.append(("k", d, 100.0 + trend * i + seasonal[phase]))
        return spark.createDataFrame(rows, "event_type string, ts timestamp, value double"), seasonal

    def test_recovers_construction(self, spark):
        df, seasonal = self._series(spark)
        out = {r["day"]: r for r in seasonal_decompose(df).collect()}
        days = sorted(out)
        # 3 edge days each side have NULL components
        for d in days[:3] + days[-3:]:
            assert out[d]["trend"] is None
        mid = days[10]
        r = out[mid]
        assert r["trend"] == pytest.approx(100.0, abs=1e-6)
        assert r["seasonal"] == pytest.approx(seasonal[r["phase"]], abs=1e-6)
        assert r["residual"] == pytest.approx(0.0, abs=1e-6)

    def test_linear_trend_recovered(self, spark):
        df, _ = self._series(spark, trend=2.0)
        out = {r["day"]: r for r in seasonal_decompose(df).collect()}
        days = sorted(out)
        a, b = out[days[5]], out[days[15]]
        # centered MA of a linear trend IS the trend: slope 2/day
        assert (b["trend"] - a["trend"]) / 10 == pytest.approx(2.0, abs=1e-6)
        assert abs(b["residual"]) < 1e-6

    def test_seasonal_sums_to_zero(self, spark):
        df, _ = self._series(spark, trend=1.0)
        rows = seasonal_decompose(df).filter("seasonal is not null").collect()
        per_phase = {r["phase"]: r["seasonal"] for r in rows}
        assert sum(per_phase.values()) == pytest.approx(0.0, abs=1e-5)

    def test_period_validation(self, spark):
        df, _ = self._series(spark)
        with pytest.raises(ValueError):
            seasonal_decompose(df, period=6)


class TestSessionAttribution:
    def _events(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
        )

    def test_first_last_and_revenue(self, spark):
        t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
        m = dt.timedelta(minutes=1)
        ev = self._events(spark, [
            (1, t0, 7, "view", 0.0),
            (2, t0 + m, 7, "click", 0.0),
            (3, t0 + 2 * m, 7, "purchase", 50.0),
            (4, t0 + 3 * m, 7, "purchase", 25.0),
            # new session (>30 min gap): dark conversion
            (5, t0 + dt.timedelta(hours=2), 7, "purchase", 10.0),
            # other user, touch after the purchase still counts as last
            (6, t0, 9, "purchase", 5.0),
            (7, t0 + m, 9, "view", 0.0),
        ])
        out = {
            (r["user_id"], r["session_id"]): r
            for r in session_attribution(ev).collect()
        }
        s1 = out[(7, 1)]
        assert s1["n_conversions"] == 2
        assert s1["revenue"] == pytest.approx(75.0)
        assert s1["first_touch_type"] == "view"
        assert s1["last_touch_type"] == "click"
        assert s1["n_touches"] == 2
        dark = out[(7, 2)]
        assert dark["n_touches"] == 0
        assert dark["first_touch_type"] is None
        s9 = out[(9, 1)]
        assert s9["first_touch_type"] == "view" == s9["last_touch_type"]

    def test_sessions_without_conversion_are_absent(self, spark):
        t0 = dt.datetime(2024, 1, 1)
        ev = self._events(spark, [
            (1, t0, 1, "view", 0.0),
            (2, t0 + dt.timedelta(minutes=5), 1, "click", 0.0),
        ])
        assert session_attribution(ev).count() == 0

    def test_tie_break_on_event_id(self, spark):
        t0 = dt.datetime(2024, 1, 1)
        ev = self._events(spark, [
            (10, t0, 1, "view", 0.0),
            (11, t0, 1, "click", 0.0),  # same ts: id breaks the tie
            (12, t0 + dt.timedelta(minutes=1), 1, "purchase", 1.0),
        ])
        r = session_attribution(ev).collect()[0]
        assert r["first_touch_type"] == "view"
        assert r["last_touch_type"] == "click"
