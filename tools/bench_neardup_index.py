"""Measure NearDupIndex probe latency vs append accretion + compaction.

The BM25 index measured 3.2x search degradation at 8 appended segments
(per-root plan overhead) and grew --auto-compact from that number.
NearDupIndex has the same shape — every ``append`` adds one file set
per bucket to both store tables — so this harness measures the probe
cost curve against appended generations, then compacts and re-measures,
to ground the ``auto_compact_at`` default in a number the same way.

Usage::

    python tools/bench_neardup_index.py [history_docs] [n_appends]

Prints a markdown table (probe seconds and store file counts per
append count, then post-compaction) for BENCH_NOTES.md, plus a
streaming probe-then-append loop trace with auto-compaction enabled.
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _store_files(spark, idx) -> int:
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    n = 0
    for t in idx.tables().values():
        n += len(
            [
                f
                for f in glob.glob(os.path.join(warehouse, t, "*"))
                if not os.path.basename(f).startswith("_")
            ]
        )
    return n


def main() -> None:
    history_n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_appends = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from pyspark.sql import functions as F

    from tube_spark.operators.neardup_index import NearDupIndex
    from tube_spark.session import get_spark

    spark = get_spark(
        "neardup-index-bench", extra_conf={"spark.ui.enabled": "false"}
    )
    base = spark.read.parquet("/tmp/sf1/documents.parquet").select(
        "doc_id", "text"
    )
    n_base = base.count()
    copies = max(1, (history_n + n_base - 1) // n_base)
    hist = (
        base.crossJoin(
            spark.range(copies).select(F.col("id").alias("__c"))
        )
        .select(
            (F.col("doc_id") * copies + F.col("__c")).alias("doc_id"),
            # perturb each copy so copies aren't trivial exact dups
            F.concat(
                F.col("text"), F.lit(" v"), F.col("__c").cast("string")
            ).alias("text"),
        )
        .limit(history_n)
    )
    delta = (
        base.limit(500)
        .select((F.col("doc_id") + 900_000_000).alias("doc_id"), "text")
        .localCheckpoint()
    )

    tmp = tempfile.mkdtemp(prefix="ndixbench_")
    idx = NearDupIndex(tmp, name="ndix_bench")
    t0 = time.time()
    idx.build(hist)
    print(f"# build: {history_n} docs in {time.time() - t0:.1f}s")

    def probe_best2() -> float:
        best = float("inf")
        for _ in range(2):
            t = time.time()
            idx.probe(delta, threshold=0.7).count()
            best = min(best, time.time() - t)
        return best

    print("\n| appends | store files | probe s |")
    print("|---|---|---|")
    print(f"| 0 | {_store_files(spark, idx)} | {probe_best2():.2f} |")
    batch_n = 2_000
    for a in range(1, n_appends + 1):
        b = (
            base.limit(batch_n)
            .select(
                (F.col("doc_id") + 910_000_000 + a * batch_n).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" batch{a}")).alias("text"),
            )
        )
        idx.append(b)
        if a in (1, 2, 4, 8, 12, 16) or a == n_appends:
            print(
                f"| {a} | {_store_files(spark, idx)} | {probe_best2():.2f} |"
            )
    t0 = time.time()
    idx.compact(spark)
    tc = time.time() - t0
    print(
        f"| compacted ({tc:.1f}s) | {_store_files(spark, idx)} "
        f"| {probe_best2():.2f} |"
    )

    # streaming probe-then-append loop with auto-compaction: per-batch
    # wall time as generations accrete and get rewritten
    from tube_spark.streaming.neardup import StreamingNearDup

    hits_dir = os.path.join(tmp, "hits")
    proc = StreamingNearDup(idx, hits_dir, threshold=0.7, auto_compact_at=8)
    print("\n| stream batch | gen before | process s |")
    print("|---|---|---|")
    for i in range(12):
        b = base.limit(1_000).select(
            (F.col("doc_id") + 950_000_000 + i * 1_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" s{i}")).alias("text"),
        )
        m = idx._manifest()
        gens = int(m.get("appends_since_compact", 0))
        t = time.time()
        proc.process_batch(b, i)
        print(f"| {i} | {gens} | {time.time() - t:.2f} |")

    idx.drop(spark)
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
