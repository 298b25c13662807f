"""Count-Min sketch: bit-exact python-reference grid, never-undercount
+ (eps, delta) envelope, weighted build, merge = union build, sizing."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from tube_spark.operators.cms import cms_build, cms_estimate, cms_merge, cms_params


def _py_bucket(value, r, width, seed="cms"):
    h = hashlib.md5(f"{seed}|{r}|{value}".encode()).hexdigest()
    return int(h[:15], 16) % width


def _py_grid(values, width, depth):
    grid = Counter()
    for v in values:
        for r in range(depth):
            grid[(r, _py_bucket(v, r, width))] += 1
    return dict(grid)


def _zipf_values(n_keys=120, reps=4):
    vals = []
    for i in range(n_keys):
        vals += [f"key-{i}"] * (1 + reps * (n_keys - i) // 10)
    return vals


def test_grid_matches_python_reference(spark):
    vals = _zipf_values()
    df = spark.createDataFrame([(v,) for v in vals], "value string")
    got = {
        (r["r"], r["b"]): r["c"]
        for r in cms_build(df, "value", width=128, depth=3).collect()
    }
    assert got == _py_grid(vals, 128, 3)


def test_never_undercounts_and_eps_bound(spark):
    vals = _zipf_values()
    truth = Counter(vals)
    n = len(vals)
    eps, delta = 0.02, 0.05
    width, depth = cms_params(eps, delta)
    df = spark.createDataFrame([(v,) for v in vals], "value string")
    grid = cms_build(df, "value", width, depth)
    probes = spark.createDataFrame(
        [(k,) for k in truth], "value string"
    )
    est = {
        r["value"]: r["est"]
        for r in cms_estimate(probes, "value", grid, width, depth).collect()
    }
    over = 0
    for k, true_c in truth.items():
        assert est[k] >= true_c  # the guarantee
        if est[k] > true_c + eps * n:
            over += 1
    # delta=5%: allow a small overshooting fraction with margin
    assert over / len(truth) <= 3 * delta


def test_absent_key_estimates_from_collisions_only(spark):
    df = spark.createDataFrame([("a",), ("b",)], "value string")
    grid = cms_build(df, "value", width=4096, depth=4)
    probes = spark.createDataFrame([("never-seen",)], "value string")
    est = cms_estimate(probes, "value", grid, 4096, 4).first()["est"]
    assert 0 <= est <= 2  # at worst full collision with both keys


def test_weighted_build(spark):
    df = spark.createDataFrame(
        [("x", 5), ("x", 2), ("y", 1)], "value string, w long"
    )
    grid = cms_build(df, "value", width=512, depth=3, weight_col="w")
    probes = spark.createDataFrame([("x",), ("y",)], "value string")
    est = {
        r["value"]: r["est"]
        for r in cms_estimate(probes, "value", grid, 512, 3).collect()
    }
    assert est["x"] >= 7 and est["y"] >= 1


def test_merge_equals_union_build(spark):
    vals = _zipf_values()
    cut = len(vals) // 3
    mk = lambda v: spark.createDataFrame([(x,) for x in v], "value string")
    merged = cms_merge(
        cms_build(mk(vals[:cut]), "value", 128, 3),
        cms_build(mk(vals[cut:]), "value", 128, 3),
    )
    want = {
        (r["r"], r["b"]): r["c"]
        for r in cms_build(mk(vals), "value", 128, 3).collect()
    }
    got = {(r["r"], r["b"]): r["c"] for r in merged.collect()}
    assert got == want


def test_cms_params():
    w, d = cms_params(0.01, 0.01)
    assert w == math.ceil(math.e / 0.01) and d == math.ceil(math.log(100))
