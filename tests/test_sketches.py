"""Sketch error bounds: HLL distinct counts and approx quantiles must
land within their configured accuracy on real data.

q_sketch_report's driver contract: exact-side values plus within-bound
booleans.  The booleans are computed from real sketch outputs, so these
assertions measure sketch accuracy, not assume it.
"""

from __future__ import annotations


def test_sketch_report_error_bounds(spark):
    import importlib.util

    spec = importlib.util.spec_from_file_location("entry_mod", "__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    rows = {
        r["metric"]: r
        for r in m.q_sketch_report(spark, "/root/testdata/sf0.001").collect()
    }
    assert set(rows) == {"exact_rowcount", "hll_distinct_orderkeys", "kll_median_rank"}
    # every sketch must genuinely land inside its configured bound
    for r in rows.values():
        assert r["within_bound"] is True
    assert rows["exact_rowcount"]["exact_value"] > 0
    assert rows["hll_distinct_orderkeys"]["exact_value"] > 0
    assert rows["kll_median_rank"]["exact_value"] == 0.5


def test_sketch_rollup_merge_path(spark):
    """Merged group sketches must land in the same bounds as direct
    sketches — the mergeability contract (q_sketch_rollup)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("entry_mod", "__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    rows = {
        r["scope"]: r
        for r in m.q_sketch_rollup(spark, "/root/testdata/sf0.001").collect()
    }
    assert "merged" in rows and len(rows) == 4  # A, N, R + merged
    for r in rows.values():
        assert r["hll_within_bound"] is True
        assert r["kll_rank_within_bound"] is True
        assert r["exact_distinct"] > 0
    # the merged scope covers the union of the groups: its exact
    # distinct is at most the sum and at least the max of the groups
    groups = [r for s, r in rows.items() if s != "merged"]
    assert max(g["exact_distinct"] for g in groups) <= rows["merged"]["exact_distinct"]
    assert rows["merged"]["exact_distinct"] <= sum(g["exact_distinct"] for g in groups)
