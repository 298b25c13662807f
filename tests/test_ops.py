"""Operator tests: dedup, similarity, text analysis, multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox jumps over a lazy dog"),  # near dup
        (4, "completely different content about spark engines"),
        (5, "THE QUICK  brown fox, jumps over the lazy dog!"),  # normalized dup of 1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(docs):
    from tube_spark.operators.dedup import exact_duplicates

    out = {r["canonical_id"]: r.asDict() for r in
           exact_duplicates(docs, "doc_id", "text", normalized=False).collect()}
    grp = out[1]
    assert grp["n_copies"] == 2 and grp["member_ids"] == [1, 2]

    norm = {r["canonical_id"]: r.asDict() for r in
            exact_duplicates(docs, "doc_id", "text", normalized=True).collect()}
    assert norm[1]["n_copies"] == 3 and norm[1]["member_ids"] == [1, 2, 5]


def test_ngram_jaccard(docs):
    from tube_spark.operators.dedup import ngram_jaccard_pairs

    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.3).collect()}
    assert pairs[(1, 2)] == 1.0  # identical docs
    assert (1, 3) in pairs and pairs[(1, 3)] < 1.0  # near dup
    assert not any(4 in p for p in pairs)  # unrelated doc pairs with nothing


def test_minhash_lsh(docs):
    from tube_spark.operators.dedup import minhash_lsh_pairs

    # r = num_hashes/bands = 2 → band-collision prob for a 0.4-Jaccard
    # pair is 1-(1-0.4²)^32 ≈ 0.996 (r=4 would miss it a third of the time)
    pairs = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in
             minhash_lsh_pairs(docs, "doc_id", "text", n=3, num_hashes=64,
                               bands=32, threshold=0.25).collect()}
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs  # high-similarity pair must be found by LSH
    assert not any(4 in p for p in pairs)


def test_simhash(docs):
    from tube_spark.operators.dedup import simhash_pairs

    # the (1,3) pair differs by one token → hamming 7; 8 bands of 8 bits
    # guarantee recall for any pair under hamming 8 (pigeonhole)
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in
             simhash_pairs(docs, "doc_id", "text", max_hamming=7, bands=8).collect()}
    assert pairs[(1, 2)] == 0  # identical token sets
    assert (1, 3) in pairs  # near dup within hamming budget
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_simhash_incomplete_blocking_raises(docs):
    """max_hamming >= bands would silently lose pairs (pigeonhole only
    covers distance < bands) — must raise, not under-report."""
    import pytest

    from tube_spark.operators.dedup import simhash_pairs

    with pytest.raises(ValueError, match="bands"):
        simhash_pairs(docs, "doc_id", "text", max_hamming=4, bands=4)


def test_cosine_topk(spark):
    from tube_spark.operators.similarity import cosine_topk

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),  # closest to 0
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),  # antipode of 0
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") == 0)
    out = [r.asDict() for r in cosine_topk(df, q, k=3).orderBy("rank").collect()]
    assert [r["neighbor_id"] for r in out] == [1, 2, 3]
    assert out[0]["cosine"] > 0.99 and out[2]["cosine"] == -1.0


def test_rhp_lsh_recall(spark):
    """LSH with enough bands must recover the exact top-1 for clustered vectors."""
    import random

    from tube_spark.operators.similarity import cosine_topk, rhp_lsh_topk

    rnd = random.Random(7)
    base = [[rnd.gauss(0, 1) for _ in range(16)] for _ in range(20)]
    rows = []
    for i, v in enumerate(base):
        rows.append((i * 2, v))
        rows.append((i * 2 + 1, [x + rnd.gauss(0, 0.01) for x in v]))  # twin
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") == 0)
    exact = cosine_topk(df, q, k=1).collect()[0]["neighbor_id"]
    approx = rhp_lsh_topk(df, q, dim=16, k=1, bits=16, bands=8).collect()
    assert approx and approx[0]["neighbor_id"] == exact == 1


def test_ivf_topk_recall(spark):
    """IVF with enough probes recovers the exact top-1 for clustered data."""
    import random

    from tube_spark.operators.similarity import cosine_topk, ivf_topk

    rnd = random.Random(11)
    rows = []
    for c in range(4):  # 4 well-separated clusters
        center = [rnd.gauss(0, 1) for _ in range(16)]
        for i in range(10):
            rows.append((c * 10 + i, [x + rnd.gauss(0, 0.05) for x in center]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") == 0)
    exact = cosine_topk(df, q, k=3).orderBy("rank").collect()
    out = ivf_topk(df, q, k=3, n_clusters=4, nprobe=2, seed=3)
    approx = out.orderBy("rank").collect()
    assert [r["neighbor_id"] for r in approx] == [r["neighbor_id"] for r in exact]
    # candidates are unique by construction (one cell per corpus vector,
    # distinct probe cells) — the plan must have NO aggregate-based dedup
    # after scoring; the only post-score exchange is the ranking window's
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" not in plan and "SortAggregate" not in plan


def test_text_stats(docs):
    from tube_spark.operators.text_analysis import text_stats

    out = {r["doc_id"]: r.asDict() for r in text_stats(docs).collect()}
    d1 = out[1]
    assert d1["n_tokens"] == 9
    assert d1["lang_pred"] == "en"
    assert out[1]["fingerprint"] == out[5]["fingerprint"]  # normalization
    assert 0 <= d1["quality_score"] <= 1


def test_curate_corpus(spark):
    from tube_spark.operators.curation import curate_corpus

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog and that is that for now"),
            (2, "the quick brown fox jumps over the lazy dog and that is that for now"),  # exact dup
            (3, "the quick brown fox jumps over the lazy dog and that is that for sure"),  # near dup of 1
            (4, "x"),  # fails quality gate (too short)
            (5, "completely different words about engines with many of the usual tokens in them to pass quality"),
        ],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame([(1, [0.1]), (9, [0.2])], "vec_id long, embedding array<double>")
    out = {r["doc_id"]: r.asDict() for r in
           curate_corpus(docs, emb, min_quality=0.3, ngram_n=1, jaccard_threshold=0.8).collect()}
    assert 2 not in out  # exact dup dropped (canonical 1 kept)
    assert 3 not in out  # near dup dropped (higher id dies)
    assert 4 not in out  # quality gate
    assert set(out) == {1, 5}
    assert out[1]["has_embedding"] is True and out[5]["has_embedding"] is False


def test_partitioned_sink_prunes(spark, tmp_path):
    """DocumentSink partition_by → reading with a partition filter scans
    only the matching directory (partition pruning)."""
    from tube_spark.sinks.writer import DocumentSink

    df = spark.createDataFrame(
        [(i, "ab"[i % 2]) for i in range(100)], "id long, part string"
    )
    sink = DocumentSink(str(tmp_path / "docs"), partition_by=("part",))
    sink.write(df)
    back = spark.read.parquet(str(tmp_path / "docs")).filter(F.col("part") == "a")
    assert back.count() == 50
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(part" in plan or "part#" in plan


def test_multimodal_decode(spark):
    """Real BMP/WAV parse through the Arrow mapInPandas plumbing:
    synthesized container bytes decode back to their exact stats;
    unparseable payloads fall through to kind=unknown; nulls survive."""
    from tube_spark.operators.multimodal import (
        decode_features,
        synthesize_bmp,
        synthesize_wav,
    )

    rows = [
        (1, bytearray(synthesize_bmp(seed=1, width=5, height=3))),
        (2, bytearray(synthesize_wav(seed=2, n_samples=40, sample_rate=8000))),
        (3, bytearray(b"not-a-container")),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    out = {r["doc_id"]: r.asDict() for r in decode_features(df).collect()}

    img = out[1]
    assert img["kind"] == "image" and (img["width"], img["height"]) == (5, 3)
    # stride pads 15 pixel bytes to 16: file = 54 header + 16*3
    assert img["n_bytes"] == 54 + 16 * 3
    expected_mean = sum((1 * 31 + i) % 256 for i in range(45)) / 45
    assert abs(img["value_mean"] - expected_mean) < 1e-9

    wav = out[2]
    assert wav["kind"] == "audio" and wav["sample_rate"] == 8000
    assert wav["n_bytes"] == 44 + 2 * 40
    assert wav["duration_ms"] == 40 * 1000 // 8000
    expected_rms = (sum(((2 * 7 + i * 13) % 1024 - 512) ** 2 for i in range(40)) / 40) ** 0.5
    assert abs(wav["value_mean"] - expected_rms) < 1e-9

    assert out[3]["kind"] == "unknown" and out[3]["n_bytes"] == 15
    assert out[4]["kind"] == "unknown" and out[4]["n_bytes"] == 0



def test_bmp_wav_decoder_edge_cases():
    from tube_spark.operators.multimodal import decode_bmp, decode_media, decode_wav, synthesize_bmp

    assert decode_bmp(b"BM" + b"\x00" * 10) is None          # truncated header
    assert decode_wav(b"RIFF1234WAVE") is None               # no fmt/data chunks
    bmp = synthesize_bmp(seed=7, width=4, height=2)
    assert decode_bmp(bmp[:-5]) is None                      # truncated pixels
    assert decode_media(bmp)["kind"] == "image"
    # width that needs no padding (stride == 3*w): mean covers all bytes
    out = decode_bmp(synthesize_bmp(seed=0, width=4, height=1))
    assert out["width"] == 4 and out["n_bytes"] == 54 + 12


def test_streaming_window_matches_batch(spark, tmp_path):
    from tube_spark.streaming.refresh import streaming_daily_event_counts

    src = str(tmp_path / "events")
    spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "click", 1.0), (2, "2024-01-01 11:00:00", "click", 2.0),
         (3, "2024-01-02 09:00:00", "view", 5.0)],
        "event_id long, ts_str string, event_type string, value double",
    ).withColumn("ts", (F.unix_timestamp("ts_str") * F.lit(1_000_000_000)).cast("long")).drop(
        "ts_str"
    ).write.parquet(src)

    out = {(str(r["day"]), r["event_type"]): r.asDict() for r in
           streaming_daily_event_counts(spark, src).collect()}
    assert out[("2024-01-01 00:00:00", "click")]["n_events"] == 2
    assert out[("2024-01-01 00:00:00", "click")]["total_value"] == 3.0
    assert out[("2024-01-02 00:00:00", "view")]["n_events"] == 1


def test_winnowing_guarantee(spark):
    """Winnowing's core property: documents sharing a run of ≥ k+w−1
    words share at least one fingerprint; disjoint docs share none."""
    from tube_spark.operators.text_analysis import winnowing_fingerprints

    shared = "the quick brown fox jumps over the lazy dog tonight"  # 10 words ≥ k+w−1=6
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta gamma {shared} delta epsilon"),
            (2, f"one two three four five {shared} six seven"),
            (3, "entirely different words without any overlap at all here friend"),
        ],
        "doc_id long, text string",
    )
    fps = {
        r["doc_id"]: set(r["fingerprints"])
        for r in winnowing_fingerprints(docs, "doc_id", "text", k=3, window=4).collect()
    }
    assert fps[1] & fps[2], "docs sharing a long run must share a fingerprint"
    assert not fps[1] & fps[3] and not fps[2] & fps[3]
    # short doc (< k words) → empty fingerprint set, not null/error
    short = spark.createDataFrame([(9, "tiny doc")], "doc_id long, text string")
    out = winnowing_fingerprints(short, "doc_id", "text", k=3, window=4).collect()
    assert out[0]["fingerprints"] == []


def test_ngram_jaccard_prefix_filter_lossless(spark):
    """Prefix filtering is exact: identical (pair, jaccard) output to
    the full inverted-index path at several thresholds on real docs,
    while strictly fewer rows enter the candidate self-join."""
    from pyspark.sql import functions as F

    from tube_spark.operators.dedup import _shingle_hashes, ngram_jaccard_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    for t in (0.25, 0.5, 0.8):
        full = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(
                docs, "doc_id", "text", n=2, threshold=t
            ).collect()
        }
        pref = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(
                docs, "doc_id", "text", n=2, threshold=t, prefix_filter=True
            ).collect()
        }
        assert pref == full, f"t={t}: prefix-filtered output diverged"
        assert full, f"t={t}: degenerate test (no pairs at all)"
    # the reduction that pays at scale: prefix rows << index rows
    inv = _shingle_hashes(docs, "doc_id", "text", 2)
    n_inv = inv.count()
    sizes = inv.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    n_prefix = sizes.agg(
        F.sum(F.col("sz") - F.ceil(F.lit(0.8) * F.col("sz")) + 1)
    ).collect()[0][0]
    assert n_prefix < 0.3 * n_inv
