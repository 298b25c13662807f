"""khop_reach / hyperball (operators/graphstats.py) and readability
(operators/quality_rules.py) — unit semantics beyond the differential
oracles in tests/test_extra_queries.py."""

from __future__ import annotations

import pytest

from tube_spark.operators.graphstats import hyperball, khop_reach
from tube_spark.operators.quality_rules import readability


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


class TestKhopReach:
    def test_path_graph(self, spark):
        e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
        r2 = {r["node"]: r for r in khop_reach(e, k=2).collect()}
        assert r2[1]["reach"] == 2  # {2, 3}
        assert r2[3]["reach"] == 4  # everyone
        assert r2[1]["degree"] == 1
        assert r2[3]["degree"] == 2

    def test_k1_equals_degree(self, spark):
        e = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
        for r in khop_reach(e, k=1).collect():
            assert r["reach"] == r["degree"]

    def test_star_two_hops(self, spark):
        e = _edges(spark, [(0, i) for i in range(1, 8)])
        rows = {r["node"]: r["reach"] for r in khop_reach(e, k=2).collect()}
        assert rows[0] == 7
        for leaf in range(1, 8):
            assert rows[leaf] == 7  # hub + 6 siblings

    def test_k_validation(self, spark):
        with pytest.raises(ValueError):
            khop_reach(_edges(spark, [(1, 2)]), k=0)


class TestHyperball:
    def _ring_plus_chords(self, spark, n=60):
        pairs = [(i, (i + 1) % n) for i in range(n)] + [
            (i, (i + 7) % n) for i in range(n)
        ]
        return _edges(spark, pairs)

    def test_round0_singleton(self, spark):
        e = self._ring_plus_chords(spark)
        for r in hyperball(e, rounds=0, p=8).collect():
            assert r["estimate"] == pytest.approx(1.0, abs=0.1)

    def test_tracks_exact_reach(self, spark):
        e = self._ring_plus_chords(spark)
        exact = {
            r["node"]: r["reach"] for r in khop_reach(e, k=2).collect()
        }
        est = {
            r["node"]: r["estimate"]
            for r in hyperball(e, rounds=2, p=8).collect()
        }
        rel = [
            abs(est[n] / (exact[n] + 1) - 1.0) for n in exact
        ]  # ball includes self
        assert sum(rel) / len(rel) < 0.15

    def test_monotone_in_rounds(self, spark):
        e = self._ring_plus_chords(spark)
        e1 = {r["node"]: r["estimate"] for r in hyperball(e, rounds=1).collect()}
        e2 = {r["node"]: r["estimate"] for r in hyperball(e, rounds=2).collect()}
        for n in e1:
            assert e2[n] >= e1[n] - 1e-9

    def test_deterministic(self, spark):
        e = self._ring_plus_chords(spark, n=30)
        a = sorted(hyperball(e, rounds=2, p=6).collect())
        b = sorted(hyperball(e, rounds=2, p=6).collect())
        assert a == b

    def test_fixpoint_on_small_component(self, spark):
        # triangle: ball saturates at round 1; extra rounds are no-ops
        e = _edges(spark, [(1, 2), (2, 3), (1, 3)])
        e1 = sorted(hyperball(e, rounds=1, p=6).collect())
        e3 = sorted(hyperball(e, rounds=3, p=6).collect())
        assert e1 == e3


class TestReadability:
    def test_known_text(self, spark):
        df = spark.createDataFrame(
            [(1, "The cat sat. The dog ran!")], "doc_id long, text string"
        )
        r = readability(df).collect()[0]
        assert r["n_sentences"] == 2
        assert r["n_words"] == 6
        assert r["n_syllables"] == 6
        # wps = 3, spw = 1
        assert r["flesch_ease"] == pytest.approx(206.835 - 1.015 * 3 - 84.6)
        assert r["fk_grade"] == pytest.approx(0.39 * 3 + 11.8 - 15.59)

    def test_syllable_heuristic(self, spark):
        df = spark.createDataFrame(
            [(1, "beautiful"), (2, "rhythm"), (3, "queueing idea")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r["n_syllables"] for r in readability(df).collect()}
        assert out[1] == 3  # b-eau-t-i-f-u-l -> eau, i, u
        assert out[2] == 1  # y
        assert out[3] == 3  # ueuei -> 1 group (+ min floor), idea -> i, ea

    def test_null_and_empty(self, spark):
        df = spark.createDataFrame(
            [(1, None), (2, "")], "doc_id long, text string"
        )
        for r in readability(df).collect():
            assert r["n_sentences"] == 0
            assert r["n_words"] == 0
            assert r["n_syllables"] == 0
            # floors keep the formulas finite: wps = spw = 0/1 ... 1/1
            assert r["flesch_ease"] is not None

    def test_more_complex_text_lower_ease(self, spark):
        df = spark.createDataFrame(
            [
                (1, "The cat sat. The dog ran. We go now."),
                (
                    2,
                    "Extraordinarily complicated considerations "
                    "necessitate exceptionally deliberate interpretation "
                    "methodologies throughout contemporary organizations.",
                ),
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in readability(df).collect()}
        assert out[1]["flesch_ease"] > out[2]["flesch_ease"]
        assert out[1]["fk_grade"] < out[2]["fk_grade"]


class TestNeighborhoodFunction:
    def test_curve_shape_and_effective_round(self, spark):
        from tube_spark.operators.graphstats import neighborhood_function

        # 40-ring: balls grow by 2 per round, far from saturation
        e = _edges(spark, [(i, (i + 1) % 40) for i in range(40)])
        rows = neighborhood_function(e, max_rounds=3, p=8).collect()
        assert [r["round"] for r in rows] == [0, 1, 2, 3]
        ests = [r["nf_est"] for r in rows]
        assert all(b >= a for a, b in zip(ests, ests[1:]))  # monotone
        assert rows[-1]["nf_ratio"] == 1.0
        # exactly one effective round, and it's the first >= 0.9
        eff = [r["round"] for r in rows if r["is_effective"]]
        first = min(r["round"] for r in rows if r["nf_ratio"] >= 0.9)
        assert eff == [first]

    def test_saturating_clique(self, spark):
        from tube_spark.operators.graphstats import neighborhood_function

        e = _edges(
            spark, [(i, j) for i in range(6) for j in range(i + 1, 6)]
        )
        rows = {r["round"]: r for r in neighborhood_function(
            e, max_rounds=2, p=8
        ).collect()}
        # round 1 already holds the whole clique; round 2 is a no-op
        assert rows[1]["nf_est"] == rows[2]["nf_est"]
        assert rows[1]["is_effective"]


class TestHyperballPacked:
    def test_bit_identical_to_row_form(self, spark):
        from tube_spark.operators.graphstats import hyperball, hyperball_packed

        pairs = [(i, (i + 1) % 40) for i in range(40)] + [
            (i, (i + 7) % 40) for i in range(40)
        ]
        e = _edges(spark, pairs)
        row = sorted(
            (r["node"], r["m"], r["n_zero"], r["estimate"])
            for r in hyperball(e, rounds=2, p=6).collect()
        )
        packed = sorted(
            (r["node"], r["m"], r["n_zero"], r["estimate"])
            for r in hyperball_packed(e, rounds=2, p=6).collect()
        )
        assert row == packed

    def test_round0_and_rounds_monotone(self, spark):
        from tube_spark.operators.graphstats import hyperball_packed

        e = _edges(spark, [(1, 2), (2, 3), (1, 3)])
        e0 = {r["node"]: r["estimate"] for r in hyperball_packed(e, rounds=0, p=8).collect()}
        e1 = {r["node"]: r["estimate"] for r in hyperball_packed(e, rounds=1, p=8).collect()}
        for n in e0:
            assert 0.9 <= e0[n] <= 1.1
            assert e1[n] >= e0[n]
