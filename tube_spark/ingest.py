"""JSONL-ingestion entry point — the landing-zone front door to the
curation pipeline (``tube_spark.curate`` consumes what this publishes).

One command takes raw JSON-lines (optionally gzipped) to typed,
quarantine-split parquet:

    python -m tube_spark.ingest \
        --src  /landing/crawl-2026-08/ \
        --schema "doc_id long, text string, lang string" \
        --out  /data/ingested \
        [--required doc_id,text] \
        [--max-quarantine-frac 0.05] \
        [--streaming --checkpoint /data/ingested/_ckpt] \
        [--master local[8]]

Stages (each documented in COVERAGE.md):
  1. ``sources.jsonl.read_jsonl``  — declared-schema PERMISSIVE parse;
     malformed lines and required-column failures preserved with
     reasons (or ``streaming.jsonl.streaming_jsonl_ingest`` with
     ``--streaming``: replay-idempotent batch=N directories)
  2. quarantine gate — refuse the publish when more than
     ``--max-quarantine-frac`` of the input failed (a crawl that is 30%
     garbage is a crawler bug, not a cleaning job)
  3. writes ``<out>/clean`` + ``<out>/quarantine`` parquet

Prints one JSON line: counts, per-reason breakdown, gate result.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", required=True, help="landing directory or glob")
    ap.add_argument("--format", default="jsonl", choices=["jsonl", "csv"],
                    help="landing format (csv is batch-only)")
    ap.add_argument("--sep", default=",", help="csv delimiter")
    ap.add_argument("--no-header", action="store_true",
                    help="csv files carry no header row")
    ap.add_argument("--schema", required=True, help="DDL schema string")
    ap.add_argument("--out", required=True, help="output root")
    ap.add_argument("--required", default="", help="comma-separated required columns")
    ap.add_argument("--max-quarantine-frac", type=float, default=1.0)
    ap.add_argument("--streaming", action="store_true",
                    help="drain via Structured Streaming (availableNow)")
    ap.add_argument("--checkpoint", default="", help="streaming checkpoint dir")
    ap.add_argument("--master", default="local[8]")
    args = ap.parse_args(argv)

    from tube_spark.session import get_spark

    spark = get_spark(
        "tube_spark-ingest", master=args.master,
        extra_conf={"spark.ui.enabled": "false"},
    )
    required = [c.strip() for c in args.required.split(",") if c.strip()]
    clean_dir = f"{args.out}/clean"
    quar_dir = f"{args.out}/quarantine"

    if args.streaming:
        if args.format != "jsonl":
            ap.error("--streaming currently supports --format jsonl only")
        from tube_spark.streaming.jsonl import streaming_jsonl_ingest

        q = streaming_jsonl_ingest(
            spark, args.src, args.schema, clean_dir, quar_dir,
            required=required,
            checkpoint_dir=args.checkpoint or f"{args.out}/_checkpoint",
        )
        q.awaitTermination()
        clean = spark.read.parquet(clean_dir)
        try:
            quar = spark.read.parquet(quar_dir)
        except Exception:  # no quarantined batches were written at all
            quar = spark.createDataFrame([], "raw string, reason string")
    else:
        from tube_spark.sources.jsonl import read_csv_landing, read_jsonl

        if args.format == "csv":
            clean, quar = read_csv_landing(
                spark, args.src, args.schema, required=required,
                header=not args.no_header, sep=args.sep,
            )
        else:
            clean, quar = read_jsonl(spark, args.src, args.schema, required=required)
        clean.write.mode("overwrite").parquet(clean_dir)
        quar.write.mode("overwrite").parquet(quar_dir)
        clean = spark.read.parquet(clean_dir)
        quar = spark.read.parquet(quar_dir)

    from pyspark.sql import functions as F

    n_clean = clean.count()
    reasons = {
        r["reason"]: r["n"]
        for r in quar.groupBy("reason").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_quar = sum(reasons.values())
    total = n_clean + n_quar
    frac = (n_quar / total) if total else 0.0
    ok = frac <= args.max_quarantine_frac
    print(json.dumps({
        "clean": n_clean,
        "quarantined": n_quar,
        "quarantine_frac": round(frac, 6),
        "reasons": dict(sorted(reasons.items())),
        "gate_ok": ok,
        "clean_dir": clean_dir,
        "quarantine_dir": quar_dir,
    }))
    return 0 if ok else 3


if __name__ == "__main__":
    sys.exit(main())
