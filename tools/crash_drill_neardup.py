"""End-to-end crash-recovery drill for the streaming near-dup crawl
loop at sf1 scale (VERDICT r12 stretch).

Runs the probe-then-append loop twice over the same batch sequence:
once clean, once with a kill injected at EVERY commit boundary in
rotation — pre-intent (after the hit-log write), post-append (before
the watermark), and post-watermark (a wholesale-skip redelivery) —
with auto-compaction firing mid-run.  Asserts the final hit log and
the final index signatures are BIT-IDENTICAL to the clean run, and
prints per-batch probe/process latency for BENCH_NOTES.md.

Usage::

    python tools/crash_drill_neardup.py [history_n] [n_batches] [batch_n]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    history_n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    batch_n = int(sys.argv[3]) if len(sys.argv) > 3 else 2_000

    from pyspark.sql import functions as F

    from tube_spark.operators.neardup_index import NearDupIndex
    from tube_spark.session import get_spark
    from tube_spark.streaming.neardup import StreamingNearDup

    spark = get_spark(
        "neardup-crash-drill", extra_conf={"spark.ui.enabled": "false"}
    )
    base = spark.read.parquet("/tmp/sf1/documents.parquet").select(
        "doc_id", "text"
    )
    hist = base.limit(history_n)
    batches = []
    for k in range(n_batches):
        batches.append(
            base.limit(batch_n)
            .select(
                (F.col("doc_id") + 900_000_000 + k * batch_n).alias("doc_id"),
                # half of each batch perturbed (near-dups of history),
                # half novel suffixes so the index genuinely grows
                F.when(
                    F.col("doc_id") % 2 == 0, F.col("text")
                ).otherwise(
                    F.concat(F.col("text"), F.lit(f" drill batch {k} "))
                ).alias("text"),
            )
            .localCheckpoint()
        )

    boundaries = [None, "pre-intent", "post-append"]

    def run(tag, inject):
        tmp = tempfile.mkdtemp(prefix=f"nddrill_{tag}_")
        idx = NearDupIndex(tmp, name=f"nddrill_{tag}")
        t0 = time.time()
        idx.build(hist)
        print(f"# [{tag}] build {history_n} docs: {time.time() - t0:.1f}s")
        proc = StreamingNearDup(
            idx, os.path.join(tmp, "hits"), threshold=0.7, auto_compact_at=4
        )
        print(f"\n| [{tag}] batch | boundary killed | gen | process s |")
        print("|---|---|---|---|")
        for k, b in enumerate(batches):
            boundary = boundaries[k % 3] if inject else None
            t0 = time.time()
            if boundary is not None:
                real = proc._write_state

                def crashing(state, _real=real, _b=boundary):
                    if _b == "pre-intent" and "pending" in state:
                        raise RuntimeError("kill pre-intent")
                    if _b == "post-append" and "pending" not in state:
                        raise RuntimeError("kill post-append")
                    _real(state)

                proc._write_state = crashing
                try:
                    proc.process_batch(b, k)
                    raise AssertionError("kill did not fire")
                except RuntimeError:
                    pass
                proc._write_state = real
            proc.process_batch(b, k)  # delivery / redelivery
            proc.process_batch(b, k)  # post-watermark redelivery: no-op
            gen = idx._manifest()["table_gen"]
            print(
                f"| {k} | {boundary or '-'} | g{gen} "
                f"| {time.time() - t0:.2f} |"
            )
        return tmp, idx, proc

    clean_tmp, clean_idx, clean_proc = run("clean", inject=False)
    kill_tmp, kill_idx, kill_proc = run("killed", inject=True)

    ch = sorted(map(tuple, clean_proc.hits(spark).collect()))
    kh = sorted(map(tuple, kill_proc.hits(spark).collect()))
    cs = sorted(map(tuple, spark.table(clean_idx.tables()["sigs"]).collect()))
    ks = sorted(map(tuple, spark.table(kill_idx.tables()["sigs"]).collect()))
    print(f"\nhit log rows: clean={len(ch)} killed={len(kh)} "
          f"identical={kh == ch}")
    print(f"index sigs:   clean={len(cs)} killed={len(ks)} "
          f"identical={ks == cs}")
    print(f"killed-run pending flag: {kill_idx._manifest().get('pending')}")
    assert kh == ch and ks == cs
    print("DRILL PASSED: killed run bit-identical to clean run")
    for t in (clean_tmp, kill_tmp):
        shutil.rmtree(t, ignore_errors=True)
    clean_idx.drop(spark)
    kill_idx.drop(spark)


if __name__ == "__main__":
    main()
