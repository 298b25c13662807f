"""Streaming PCA moments: batch-equivalence across schedules,
redelivery idempotency via the batch_id watermark, end-to-end
availableNow wiring."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tube_spark.operators.pca import pca_fit
from tube_spark.streaming.pca import StreamingMoments, streaming_pca_ingest

SF = "/root/testdata/sf0.001"
DIM = 64


@pytest.fixture()
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select("vec_id", "embedding")


def _close(a, b, rtol=1e-9):
    return np.allclose(a, b, rtol=rtol, atol=1e-12)


def test_stream_equals_batch_any_schedule(spark, emb, tmp_path):
    """Three uneven batches vs one batch fit: same model to float
    accumulation error (moments are sums — same addends, different
    association)."""
    inc = StreamingMoments(spark, str(tmp_path / "st.json"), dim=DIM)
    cuts = [(0, 100), (100, 130), (130, 500)]
    for bid, (lo, hi) in enumerate(cuts):
        inc.process_batch(
            emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)), bid
        )
    stream_model = inc.model(k=8)
    batch_model = pca_fit(emb, dim=DIM, k=8)
    assert stream_model.n == batch_model.n
    assert _close(stream_model.mean, batch_model.mean)
    assert _close(stream_model.eigenvalues, batch_model.eigenvalues, rtol=1e-8)
    assert np.allclose(stream_model.components, batch_model.components, atol=1e-6)


def test_redelivery_is_noop(spark, emb, tmp_path):
    inc = StreamingMoments(spark, str(tmp_path / "st.json"), dim=DIM)
    b0 = emb.filter(F.col("vec_id") < 250)
    inc.process_batch(b0, 0)
    m1 = inc.moments()
    inc.process_batch(b0, 0)          # exact replay
    assert inc.moments() == m1        # bit-identical state
    inc.process_batch(emb.filter(F.col("vec_id") >= 250), 1)
    m2 = inc.moments()
    inc.process_batch(b0, 0)          # stale replay after progress
    assert inc.moments() == m2
    assert inc.model(k=4).n == emb.count()


def test_streaming_wiring_end_to_end(spark, emb, tmp_path):
    src = str(tmp_path / "in")
    emb.filter(F.col("vec_id") < 300).write.parquet(src)
    state = str(tmp_path / "state.json")
    ckpt = str(tmp_path / "ckpt")
    q = streaming_pca_ingest(spark, src, state, dim=DIM, checkpoint_dir=ckpt)
    q.awaitTermination(120)
    inc = StreamingMoments(spark, state, dim=DIM)
    m1 = inc.moments()
    assert m1[0] == 300
    # restart with no new files: full redelivery opportunity, state fixed
    q = streaming_pca_ingest(spark, src, state, dim=DIM, checkpoint_dir=ckpt)
    q.awaitTermination(120)
    assert inc.moments() == m1
    # late files arrive; model converges to the full-corpus batch fit
    emb.filter(F.col("vec_id") >= 300).write.mode("append").parquet(src)
    q = streaming_pca_ingest(spark, src, state, dim=DIM, checkpoint_dir=ckpt)
    q.awaitTermination(120)
    got = inc.model(k=8)
    want = pca_fit(emb, dim=DIM, k=8)
    assert got.n == want.n
    assert np.allclose(got.eigenvalues, want.eigenvalues, rtol=1e-8)


def test_dim_mismatch_rejected(spark, emb, tmp_path):
    p = str(tmp_path / "st.json")
    StreamingMoments(spark, p, dim=DIM).process_batch(emb.limit(10), 0)
    with pytest.raises(ValueError, match="dim"):
        StreamingMoments(spark, p, dim=32).process_batch(emb.limit(10), 1)
