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
