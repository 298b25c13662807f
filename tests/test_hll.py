"""HyperLogLog: bit-exact python-reference registers, estimator
accuracy, exact max-merge, grouped form, and the streaming twin's
batch-equivalence + redelivery no-op."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from tube_spark.operators.hll import (
    _alpha,
    hll_distinct,
    hll_estimate,
    hll_grouped,
    hll_merge,
    hll_registers,
)

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_registers(values, p, seed="hll"):
    m = 1 << p
    w_bits = 60 - p
    regs = {}
    for v in values:
        if v is None:
            continue
        h = _h60(f"{seed}|{v}")
        j = h % m
        w = h // m
        rank = (w_bits - w.bit_length() + 1) if w > 0 else w_bits + 1
        regs[j] = max(regs.get(j, 0), rank)
    return regs


def _py_estimate(regs: dict, p: int) -> float:
    m = 1 << p
    s = sum(2.0 ** -r for r in regs.values()) + (m - len(regs))
    n_zero = m - len(regs)
    raw = _alpha(m) * m * m / s
    if raw <= 2.5 * m and n_zero > 0:
        return round(m * math.log(m / n_zero), 4)
    return round(raw, 4)


def test_registers_match_python_reference(spark):
    vals = [f"item-{i}" for i in range(500)] + [None, "item-3"]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = {r["j"]: r["m_rank"] for r in hll_registers(df, "v", p=6).collect()}
    assert got == _py_registers(vals, 6)
    est = hll_estimate(hll_registers(df, "v", p=6), p=6).first()
    assert est["estimate"] == _py_estimate(_py_registers(vals, 6), 6)
    assert est["m"] == 64


@pytest.mark.parametrize("n,p", [(100, 8), (5000, 10)])
def test_estimate_within_error_bound(spark, n, p):
    df = spark.range(n).select(F.concat(F.lit("u"), F.col("id")).alias("v"))
    est = hll_distinct(df, "v", p=p).first()["estimate"]
    # 1.04/sqrt(m) standard error; allow 5 sigma
    m = 1 << p
    assert abs(est - n) <= 5 * 1.04 / math.sqrt(m) * n


def test_duplicates_do_not_move_estimate(spark):
    base = spark.range(300).select(F.concat(F.lit("k"), F.col("id")).alias("v"))
    dups = base.unionAll(base).unionAll(base)
    a = hll_distinct(base, "v", p=8).first()["estimate"]
    b = hll_distinct(dups, "v", p=8).first()["estimate"]
    assert a == b


def test_merge_equals_union_build(spark):
    a = spark.range(0, 400).select(F.concat(F.lit("x"), F.col("id")).alias("v"))
    b = spark.range(200, 700).select(F.concat(F.lit("x"), F.col("id")).alias("v"))
    merged = hll_merge(hll_registers(a, "v", p=7), hll_registers(b, "v", p=7))
    union = hll_registers(a.unionAll(b), "v", p=7)
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in union.collect()
    }
    # idempotent: merging a sketch with itself is a no-op
    ra = hll_registers(a, "v", p=7)
    assert {tuple(r) for r in hll_merge(ra, ra).collect()} == {
        tuple(r) for r in ra.collect()
    }


def test_grouped_matches_single_runs(spark):
    df = spark.range(600).select(
        (F.col("id") % 3).alias("g"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    )
    grouped = {
        r["g"]: (r["n_zero"], r["estimate"])
        for r in hll_grouped(df, "g", "v", p=7).collect()
    }
    for g in range(3):
        one = hll_distinct(df.filter(F.col("g") == g), "v", p=7).first()
        assert grouped[g] == (one["n_zero"], one["estimate"])


def test_real_corpus_tokens(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = docs.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    exact = toks.select("tok").distinct().count()
    est = hll_distinct(toks, "tok", p=10).first()["estimate"]
    assert abs(est - exact) <= 5 * 1.04 / math.sqrt(1024) * exact


def test_streaming_equals_batch_and_redelivery_noop(spark, tmp_path):
    from tube_spark.streaming.hll import StreamingHLL

    df = spark.range(900).select(F.concat(F.lit("s"), F.col("id")).alias("v"))
    b1 = df.filter(F.col("v").substr(2, 10).cast("long") % 3 == 0)
    b2 = df.filter(F.col("v").substr(2, 10).cast("long") % 3 == 1)
    b3 = df.filter(F.col("v").substr(2, 10).cast("long") % 3 == 2)
    sh = StreamingHLL(spark, str(tmp_path / "hll.json"), col="v", p=8)
    sh.process_batch(b1)
    sh.process_batch(b2)
    sh.process_batch(b2)  # redelivery: must be a no-op
    sh.process_batch(b3)
    # bit-identical to the batch build over everything seen
    batch_regs = [0] * 256
    for r in hll_registers(df, "v", p=8).collect():
        batch_regs[r["j"]] = r["m_rank"]
    assert sh.registers() == batch_regs
    assert (
        sh.estimate()
        == hll_estimate(hll_registers(df, "v", p=8), p=8).first()["estimate"]
    )


def test_streaming_wiring(spark, tmp_path):
    from tube_spark.streaming.hll import StreamingHLL, streaming_hll

    df = spark.range(300).select(F.concat(F.lit("w"), F.col("id")).alias("v"))
    src = str(tmp_path / "src")
    df.write.parquet(src)
    q = streaming_hll(
        spark, src, str(tmp_path / "state.json"), col="v", p=8,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    sh = StreamingHLL(spark, str(tmp_path / "state.json"), col="v", p=8)
    batch_regs = [0] * 256
    for r in hll_registers(df, "v", p=8).collect():
        batch_regs[r["j"]] = r["m_rank"]
    assert sh.registers() == batch_regs


def test_geometry_frozen(spark, tmp_path):
    from tube_spark.streaming.hll import StreamingHLL

    df = spark.range(10).select(F.col("id").cast("string").alias("v"))
    sh = StreamingHLL(spark, str(tmp_path / "h.json"), col="v", p=8)
    sh.process_batch(df)
    with pytest.raises(ValueError):
        StreamingHLL(spark, str(tmp_path / "h.json"), col="v", p=9).process_batch(df)
    with pytest.raises(ValueError):
        hll_registers(df, "v", p=3)
