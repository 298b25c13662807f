"""Shard-sink scaling bench (VERDICT r7 #4): export / verify / append
wall-times at two scales, showing export cost tracks shard count x
shard bytes and append cost tracks the appended batch + ONE boundary
shard — not the store.

``python tools/bench_shards.py [sf_dir ...]`` (default sf0.1 and
/tmp/sf1).  Row mode uses a fixed rows_per_shard (more data => more
shards, never bigger ones); token mode a fixed token budget.  The
append batch is a FIXED 5000 documents at every scale — flat append
wall-time across a 10x store is the store-size-independence claim.
Best-of-2 per op (writes are less noisy than reads; a second run
keeps the page-cache story honest without tripling I/O).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tube_spark.functions.text import token_count_bpe_ish
from tube_spark.session import get_spark
from tube_spark.sinks.shards import append_shards, export_shards, verify_shards

ROWS_PER_SHARD = 256   # ~20 shards at sf0.1 (5k docs), ~196 at sf1 (50k)
TOKEN_BUDGET = 60_000
APPEND_N = 500         # FIXED batch at every scale (store-independence)


def _best2(fn):
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 2)


def bench(spark, sf_dir: str) -> dict[str, float]:
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .withColumn("n_tok", token_count_bpe_ish(F.col("text")))
        .localCheckpoint()  # charge tokenization to setup, not the sink
    )
    n = docs.count()
    cut = docs.selectExpr(
        f"approx_percentile(doc_id, {1.0 - APPEND_N / n}) AS c"
    ).collect()[0]["c"]
    seed, tail = docs.filter(F.col("doc_id") < cut), docs.filter(
        F.col("doc_id") >= cut
    )
    out: dict[str, float] = {"n_docs": n, "append_n": tail.count()}
    work = tempfile.mkdtemp(prefix="shardbench_")
    try:
        def export_rows():
            export_shards(
                docs, f"{work}/rows", "doc_id", rows_per_shard=ROWS_PER_SHARD,
                shuffle_seed=7,
            )

        out["export_rows"] = _best2(export_rows)
        out["verify"] = _best2(
            lambda: verify_shards(spark, f"{work}/rows").collect()
        )

        def export_tok():
            export_shards(
                docs, f"{work}/tok", "doc_id", token_budget=TOKEN_BUDGET,
                token_count_col="n_tok", shuffle_seed=7,
            )

        out["export_tokens"] = _best2(export_tok)

        def append_fixed():
            shutil.rmtree(f"{work}/app", ignore_errors=True)
            export_shards(
                seed, f"{work}/app", "doc_id", rows_per_shard=ROWS_PER_SHARD,
                shuffle_seed=7,
            )
            t0 = time.time()
            append_shards(tail, f"{work}/app")
            return time.time() - t0

        out["append_fixed_batch"] = round(min(append_fixed(), append_fixed()), 2)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


def main():
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sf1"]
    spark = get_spark("bench-shards", extra_conf={"spark.ui.enabled": "false"})
    for d in dirs:
        print(d, bench(spark, d), flush=True)


if __name__ == "__main__":
    main()
