"""Bloom gate: no false negatives ever, FPR near theory, bit-exact
python-reference filter words, null handling, sizing formulas."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from tube_spark.operators.bloomgate import (
    bloom_build,
    bloom_gate,
    bloom_params,
    bloom_probe,
)

W = 63  # usable bits per word


def _py_positions(value, m_bits, n_hashes, seed="bloomgate"):
    for j in range(n_hashes):
        h = hashlib.md5(f"{seed}|{j}|{value}".encode()).hexdigest()
        yield int(h[:15], 16) % m_bits


def _py_words(values, m_bits, n_hashes):
    words = [0] * (-(-m_bits // W))
    for v in values:
        for p in _py_positions(v, m_bits, n_hashes):
            words[p // W] |= 1 << (p % W)
    return words


def test_words_match_python_reference(spark):
    vals = [f"doc-{i}" for i in range(200)]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = bloom_build(df, "v", m_bits=1024, n_hashes=3)
    assert got == _py_words(vals, 1024, 3)
    assert all(w >= 0 for w in got)  # bit 63 never set


def test_no_false_negatives_and_fpr(spark):
    members = [f"in-{i}" for i in range(300)]
    others = [f"out-{i}" for i in range(3000)]
    m_bits, k = bloom_params(len(members), 0.02)
    df = spark.createDataFrame([(v,) for v in members], "v string")
    words = bloom_build(df, "v", m_bits, k)
    probe_df = spark.createDataFrame(
        [(v, True) for v in members] + [(v, False) for v in others],
        "v string, is_member boolean",
    )
    flagged = bloom_gate(probe_df, "v", words, m_bits, k)
    rows = flagged.collect()
    # the guarantee: every member flags
    assert all(r["maybe_blocked"] for r in rows if r["is_member"])
    # FPR sanity: within 3x of the 2% design point
    fp = sum(1 for r in rows if not r["is_member"] and r["maybe_blocked"])
    assert fp / len(others) < 0.06


def test_null_values_flag_false(spark):
    df = spark.createDataFrame([("a",), (None,)], "v string")
    words = bloom_build(df, "v", m_bits=63, n_hashes=1)
    out = {
        r["v"]: r["maybe_blocked"]
        for r in bloom_gate(df, "v", words, 63, 1).collect()
    }
    assert out["a"] is True and out[None] is False


def test_probe_is_map_only(spark):
    """The gate must compile to a plain projection — no join, no
    exchange: the filter rides the plan as a literal."""
    df = spark.range(100).select(F.col("id").cast("string").alias("v"))
    words = bloom_build(df.limit(10), "v", m_bits=504, n_hashes=2)
    plan = (
        df.withColumn("hit", bloom_probe(F.col("v"), words, 504, 2))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Join" not in plan


def test_bloom_params_formulas():
    m, k = bloom_params(1000, 0.01)
    assert m == math.ceil(-1000 * math.log(0.01) / math.log(2) ** 2)
    assert k == round(m / 1000 * math.log(2))
    m1, k1 = bloom_params(10, 0.5)
    assert k1 >= 1 and m1 > 0
