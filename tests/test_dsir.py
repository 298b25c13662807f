"""DSIR importance weights vs an independent pure-Python reference."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

from tube_spark.operators.dsir import dsir_log_weights

RAW = [
    (0, "the cat sat on the mat"),
    (1, "stock prices rallied on tuesday trading"),
    (2, "the dog sat on the log"),
    (3, "market prices fell in early trading"),
    (4, ""),  # no tokens: omitted
]
TARGET = [
    (100, "the cat ate the fish"),
    (101, "a dog and a cat sat together"),
]


def _tok(t):
    return [w for w in re.split(r"[^a-z]+", (t or "").lower()) if w]


def _grams(t):
    toks = _tok(t)
    return toks + [" ".join(p) for p in zip(toks, toks[1:])]


def _bucket(g, dim, seed="dsir"):
    return int(hashlib.md5((seed + g).encode()).hexdigest()[:15], 16) % dim


def _py_reference(raw, target, dim=64, add_k=0.5):
    rc = Counter(_bucket(g, dim) for _, t in raw for g in _grams(t))
    tc = Counter(_bucket(g, dim) for _, t in target for g in _grams(t))
    rt, tt = sum(rc.values()), sum(tc.values())
    lr = {
        b: math.log((tc.get(b, 0) + add_k) / (tt + add_k * dim))
        - math.log((rc.get(b, 0) + add_k) / (rt + add_k * dim))
        for b in set(rc) | set(tc)
    }
    out = {}
    for did, t in raw:
        bs = [_bucket(g, dim) for g in _grams(t)]
        if not bs:
            continue
        s = [lr[b] for b in bs]
        out[did] = (len(bs), round(sum(s), 6), round(sum(s) / len(s), 6))
    return out


def test_matches_reference(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    df = dsir_log_weights(raw, tgt, dim=64)
    got = {
        r["doc_id"]: (r["n_feats"], r["log_weight"], r["avg_log_weight"])
        for r in df.collect()
    }
    assert got == _py_reference(RAW, TARGET, dim=64)
    assert 4 not in got


def test_target_like_docs_rank_higher(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    got = {
        r["doc_id"]: r["avg_log_weight"]
        for r in dsir_log_weights(raw, tgt, dim=256).collect()
    }
    # cat/dog docs (target-like) outrank the finance docs
    assert min(got[0], got[2]) > max(got[1], got[3])


def test_composes_with_weighted_sample(spark):
    """DSIR -> weighted_sample: the published selection recipe end to
    end (weights = exp(log_weight) via the A-ES sampler)."""
    from pyspark.sql import functions as F

    from tube_spark.operators.sampling import weighted_sample_k

    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    w = dsir_log_weights(raw, tgt, dim=256).withColumn(
        "w", F.exp(F.col("avg_log_weight"))
    )
    picked = weighted_sample_k(w, weight_col="w", k=2, id_col="doc_id")
    assert picked.count() == 2
