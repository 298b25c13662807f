"""Product quantization: encode/decode consistency, tie-breaks, plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tube_spark.operators.quantize import lattice_codebooks, pq_decode, pq_encode


def test_encode_decode_roundtrip_error(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    enc = pq_encode(emb, dim=64, m=8, k=16)
    dec = pq_decode(enc, dim=64, m=8, k=16)
    # sq_error must equal the squared distance to the decoded vector
    joined = (
        enc.join(dec, "vec_id")
        .join(emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v")), "vec_id")
        .select(
            "vec_id",
            "sq_error",
            F.aggregate(
                F.zip_with("v", "vector", lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("recomputed"),
        )
    )
    bad = joined.filter(F.abs(F.col("sq_error") - F.col("recomputed")) > 1e-9)
    assert bad.count() == 0
    assert dec.select(F.size("vector")).distinct().collect()[0][0] == 64


def test_codes_bounded_and_deterministic(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    enc = pq_encode(emb, dim=64, m=8, k=16)
    stats = enc.select(
        F.min(F.array_min("codes")).alias("lo"),
        F.max(F.array_max("codes")).alias("hi"),
        F.min(F.size("codes")).alias("m"),
    ).first()
    assert stats["lo"] >= 0 and stats["hi"] <= 15 and stats["m"] == 8
    a = sorted(map(tuple, enc.collect()))
    b = sorted(map(tuple, pq_encode(emb.repartition(7), dim=64, m=8, k=16).collect()))
    assert a == b


def test_tie_breaks_to_lowest_index(spark):
    # codebook with duplicate centroids: argmin must take the FIRST
    books = [[[0.0, 0.0], [1.0, 1.0], [0.0, 0.0]]]
    df = spark.createDataFrame([(1, [0.1, 0.1])], "vec_id long, embedding array<double>")
    r = pq_encode(df, dim=2, m=1, k=3, codebooks=books).first()
    assert list(r["codes"]) == [0]


def test_validation(spark):
    df = spark.createDataFrame([(1, [0.0] * 64)], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="not divisible"):
        pq_encode(df, dim=64, m=7)
    with pytest.raises(ValueError, match="codebooks"):
        pq_encode(df, dim=64, m=8, k=16, codebooks=[[[0.0]]])


def test_map_only_plan(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = (
        pq_encode(emb, dim=64)._jdf.queryExecution().executedPlan().toString()
    )
    # one scan, no shuffle, no Python stages
    assert "Exchange" not in plan
    assert "Python" not in plan and "MapInPandas" not in plan


def test_pq_search_adc_matches_decoded_distance(spark):
    from tube_spark.operators.quantize import pq_search

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    codes = pq_encode(emb, dim=64).select("vec_id", "codes")
    top = pq_search(codes, qv, dim=64, topk=5)
    # ADC distance == exact distance from query to the DECODED vector
    dec = pq_decode(codes, dim=64)
    q = F.array(*[F.lit(x) for x in qv])
    exact = dec.select(
        "vec_id",
        F.aggregate(
            F.zip_with(q, "vector", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("d"),
    )
    joined = top.join(exact, "vec_id").filter(
        F.abs(F.col("approx_sq_dist") - F.col("d")) > 1e-9
    )
    assert joined.count() == 0
    assert top.count() == 5

    with pytest.raises(ValueError, match="query dim"):
        pq_search(codes, [0.0] * 63, dim=64)


def test_pq_train_beats_lattice_codebooks(spark):
    from tube_spark.operators.quantize import pq_train

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    trained = pq_train(emb, dim=64, m=8, k=16, iters=3)
    assert len(trained) == 8 and all(len(b) == 16 for b in trained)
    assert all(len(c) == 8 for b in trained for c in b)

    def total_err(books):
        return (
            pq_encode(emb, dim=64, m=8, k=16, codebooks=books)
            .agg(F.sum("sq_error"))
            .first()[0]
        )

    err_trained = total_err(trained)
    err_lattice = total_err(lattice_codebooks(8, 8, 16))
    # trained codebooks must reconstruct strictly better than the
    # data-independent lattice (that is the point of training)
    assert err_trained < err_lattice * 0.9, (err_trained, err_lattice)


def test_pq_train_monotone_improvement(spark):
    from tube_spark.operators.quantize import pq_train

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(200)

    def err(books):
        return (
            pq_encode(emb, dim=64, m=8, k=16, codebooks=books)
            .agg(F.sum("sq_error"))
            .first()[0]
        )

    e1 = err(pq_train(emb, dim=64, m=8, k=16, iters=1))
    e3 = err(pq_train(emb, dim=64, m=8, k=16, iters=3))
    # Lloyd iterations never increase total quantization error
    assert e3 <= e1 + 1e-9


def test_pq_search_many_equals_per_query(spark):
    """Batched ADC == per-query pq_search for every query and rank."""
    import pytest
    from pyspark.sql import functions as F

    from tube_spark.operators.quantize import (
        pq_encode, pq_search, pq_search_many, pq_train,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    books = pq_train(emb, dim=64, m=8, k=16, iters=1)
    codes = pq_encode(emb, dim=64, m=8, k=16, codebooks=books).select(
        "vec_id", "codes"
    ).localCheckpoint()
    qs = [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 4).collect()
    ]
    many = pq_search_many(codes, qs, dim=64, m=8, k=16, topk=7, codebooks=books)
    got = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["approx_sq_dist"])
        for r in many.collect()
    }
    assert len(got) == 4 * 7
    for qid, qv in qs:
        one = pq_search(codes, qv, dim=64, m=8, k=16, topk=7, codebooks=books).collect()
        for rank, r in enumerate(one, start=1):
            vid, dist = got[(qid, rank)]
            assert vid == r["vec_id"]
            assert dist == pytest.approx(r["approx_sq_dist"], rel=1e-12)
    # ONE plan for all queries: no per-query Union fan-out (the
    # pq_search loop shape), scoring expression shared; grouped_topk's
    # two phases may rescan the pinned relations, which is independent
    # of B
    plan = many._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    with pytest.raises(ValueError, match="at least one"):
        pq_search_many(codes, [], dim=64, m=8, k=16)
