"""operators/quantize.py: int8 scalar quantization round-trip laws."""

from __future__ import annotations

from pyspark.sql import functions as F

from tube_spark.operators.quantize import (
    dequantize_codes,
    dimension_ranges,
    quantize_embeddings,
)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_codes_in_int8_range_and_roundtrip_bound(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    ranges = dimension_ranges(emb)
    q = quantize_embeddings(emb, ranges=ranges)
    lim = q.select(
        F.array_min("codes").alias("mn"), F.array_max("codes").alias("mx")
    ).agg(F.min("mn"), F.max("mx")).first()
    assert lim[0] >= -127 and lim[1] <= 127

    # dequantize error per dimension is at most scale/2 + float32 noise
    deq = dequantize_codes(q, ranges)
    joined = emb.join(deq, "vec_id").select(
        F.max(
            F.array_max(
                F.zip_with(
                    F.col("embedding"),
                    F.col("vector"),
                    lambda a, b: F.abs(a.cast("double") - b),
                )
            )
        ).alias("max_err")
    ).first()
    max_scale = max((h - l) / 254.0 for l, h in ranges)
    assert joined["max_err"] <= max_scale / 2 + 1e-6


def test_extreme_values_hit_code_bounds(spark):
    df = _vecs(spark, [(1, [0.0, 10.0]), (2, [10.0, 0.0])])
    got = {r["vec_id"]: r["codes"] for r in quantize_embeddings(df).collect()}
    assert got[1] == [-127, 127]
    assert got[2] == [127, -127]


def test_constant_dimension_codes_zero(spark):
    df = _vecs(spark, [(1, [5.0, 1.0]), (2, [5.0, 2.0])])
    got = {r["vec_id"]: r["codes"] for r in quantize_embeddings(df).collect()}
    assert got[1][0] == 0 and got[2][0] == 0  # constant dim -> 0
    assert got[1][1] == -127 and got[2][1] == 127


def test_frozen_ranges_reused_for_new_data(spark):
    train = _vecs(spark, [(1, [0.0]), (2, [10.0])])
    ranges = dimension_ranges(train)
    new = _vecs(spark, [(3, [5.0])])
    got = quantize_embeddings(new, ranges=ranges).collect()[0]
    assert got["codes"] == [0]  # midpoint of the frozen range


def _rand_books(m, sub_dim, k, seed=7):
    import random

    rng = random.Random(seed)
    return [
        [[rng.uniform(-1, 1) for _ in range(sub_dim)] for _ in range(k)]
        for _ in range(m)
    ]


def test_pq_flat_and_hof_forms_bit_identical(spark):
    # the >_PQ_FLAT_TERM_LIMIT compact aggregate(zip_with(...)) form
    # must reproduce the flat straight-line arithmetic EXACTLY (same
    # operand order; +0.0 + t == t for non-negative squares)
    import tube_spark.operators.quantize as Q

    vecs = spark.createDataFrame(
        [
            (i, [((i * 31 + d * 7) % 19 - 9) / 3.7 for d in range(16)])
            for i in range(40)
        ],
        "vec_id long, embedding array<double>",
    )
    books = _rand_books(4, 4, 8)
    flat = Q.pq_encode(vecs, dim=16, m=4, k=8, codebooks=books).collect()
    orig = Q._PQ_FLAT_TERM_LIMIT
    try:
        Q._PQ_FLAT_TERM_LIMIT = 0  # force the compact path
        hof = Q.pq_encode(vecs, dim=16, m=4, k=8, codebooks=books).collect()
    finally:
        Q._PQ_FLAT_TERM_LIMIT = orig
    as_map = lambda rows: {  # noqa: E731
        r["vec_id"]: (r["codes"], r["sq_error"]) for r in rows
    }
    assert as_map(flat) == as_map(hof)  # bit-equal, no approx


def test_pq_encode_large_config_compiles_codegen(spark):
    # r11 verdict: m=16/k=64 trained-config encode blew janino's 64 KB
    # method limit and silently fell back to interpreted execution.
    # codegen.fallback=false turns any regression into a hard failure.
    from tube_spark.operators.quantize import pq_encode

    vecs = spark.createDataFrame(
        [
            (i, [((i * 13 + d * 11) % 23 - 11) / 5.1 for d in range(64)])
            for i in range(50)
        ],
        "vec_id long, embedding array<double>",
    )
    books = _rand_books(16, 4, 64)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        out = pq_encode(vecs, dim=64, m=16, k=64, codebooks=books)
        rows = out.collect()  # throws on any codegen compile failure
    finally:
        spark.conf.set("spark.sql.codegen.fallback", "true")
    assert len(rows) == 50
    assert all(len(r["codes"]) == 16 for r in rows)
