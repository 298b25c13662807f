"""Sketch error bounds: HLL distinct counts and approx quantiles must
land within their configured accuracy on real data."""

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
    # HLL++ at rsd=0.02: allow 3 standard deviations
    assert rows["hll_count_distinct"]["rel_err"] <= 0.06
    # KLL/GK percentile at accuracy 10000: rank error 1/10000; value-space
    # slack is generous
    assert rows["approx_median"]["rel_err"] <= 0.01
    for r in rows.values():
        assert r["exact"] > 0 and r["approx"] > 0
