"""Corpus-curation entry point — the training-data twin of
``tube_spark.run`` (which drives the graph-ETL surface).

One command takes a raw document table to a curated, split, versioned
training corpus:

    python -m tube_spark.curate \
        --docs /data/documents.parquet \
        --out  /data/curated \
        [--embeddings /data/embeddings.parquet] \
        [--min-quality 0.5] [--max-ppl 500] [--ngram 1] [--jaccard 0.8] \
        [--splits train=0.9,val=0.05,test=0.05] \
        [--quality-gate] [--max-removed-frac 0.5] \
        [--master local[8]]

Stages (each an operator documented in COVERAGE.md):
  0a. ``html_extract``       (opt-in ``--html-extract``) — strip HTML
                              boilerplate from the text column and drop
                              nav pages over ``--max-link-density``
  0. ``bigram_lm_perplexity`` (opt-in ``--max-ppl``) — CCNet-style
                              fluency gate: drop high-perplexity docs
                              under a self-trained capped bigram LM
  0b. ``dsir_log_weights``   (opt-in ``--dsir-target``) — keep the
                              top ``--dsir-keep-frac`` of documents by
                              hashed-n-gram importance to the target
                              distribution (threshold via GK sketch,
                              no global sort)
  0c. ``bloom_gate``         (opt-in ``--blocklist``) — drop documents
                              whose text hits a Bloom filter built from
                              the blocklist parquet (opt-out/takedown/
                              benchmark values; auto-sized to
                              ``--blocklist-fpr``, no false negatives,
                              map-only probe)
  1. ``curate_corpus``      — quality gate, exact dedup, near-dup drop
  2. ``quality_checks``     — publish gate: id uniqueness + completeness
                              (refuses to publish a broken corpus)
  3. ``snapshot_diff``      — delta gate vs the previous published
                              version (refuses surprise mass-removals)
  4. ``hash_split``         — deterministic train/val/test assignment
  5. versioned publish      — ``VersionedIndexWriter``: the new corpus
                              lands as ``_vN`` + atomic alias swap, so
                              readers never see a half-written dataset

Prints one JSON line with per-split counts and gate results.
"""

from __future__ import annotations

import argparse
import json
import sys


def _parse_splits(spec: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for part in spec.split(","):
        name, _, w = part.partition("=")
        if not _ or not name:
            raise ValueError(f"bad split spec {part!r} (want name=weight)")
        out[name.strip()] = float(w)
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--docs", required=True, help="documents parquet (doc_id, text, ...)")
    ap.add_argument("--out", required=True, help="output root (versioned)")
    ap.add_argument("--embeddings", help="optional embeddings parquet (vec_id, embedding)")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument(
        "--max-ppl", type=float, default=None,
        help="CCNet-style gate: drop documents whose self-trained "
        "bigram-LM perplexity exceeds this (operators/lm.py); "
        "documents too short to score (<2 tokens) pass through to "
        "the quality gate",
    )
    ap.add_argument(
        "--ppl-vocab", type=int, default=10000,
        help="vocabulary cap for the --max-ppl model (<unk> beyond)",
    )
    ap.add_argument(
        "--dsir-target", default=None,
        help="DSIR selection: parquet of target-distribution documents "
        "(same id/text columns); raw docs are ranked by hashed-n-gram "
        "importance weight (operators/dsir.py)",
    )
    ap.add_argument(
        "--dsir-keep-frac", type=float, default=0.5,
        help="fraction of documents to keep under --dsir-target "
        "(top avg log-weight; threshold via quantile sketch)",
    )
    ap.add_argument("--dsir-dim", type=int, default=1024)
    ap.add_argument(
        "--html-extract", action="store_true",
        help="treat the text column as HTML: strip boilerplate "
        "(script/style/comments/tags, entity decode, whitespace "
        "collapse — operators/text_extract.py) and drop nav pages "
        "whose link density exceeds --max-link-density BEFORE any gate",
    )
    ap.add_argument(
        "--max-link-density", type=float, default=0.5,
        help="with --html-extract: drop pages whose anchor-text share "
        "of the extracted text exceeds this (nav/menu pages)",
    )
    ap.add_argument(
        "--blocklist", default=None,
        help="Bloom gate: parquet of blocked values "
        "(operators/bloomgate.py); documents whose text matches are "
        "dropped — no false negatives by construction",
    )
    ap.add_argument(
        "--blocklist-col", default=None,
        help="column of --blocklist holding the blocked values "
        "(default: --text-col)",
    )
    ap.add_argument(
        "--blocklist-fpr", type=float, default=0.001,
        help="Bloom false-positive design point (filter auto-sized)",
    )
    ap.add_argument("--ngram", type=int, default=1)
    ap.add_argument("--jaccard", type=float, default=0.8)
    ap.add_argument("--splits", default="train=0.8,val=0.1,test=0.1")
    ap.add_argument(
        "--quality-gate", action="store_true",
        help="fail the publish when id uniqueness/completeness fail",
    )
    ap.add_argument(
        "--max-removed-frac", type=float, default=1.0,
        help="delta gate vs the previous version (1.0 disables)",
    )
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    try:
        splits = _parse_splits(args.splits)
    except ValueError as e:
        print(str(e), file=sys.stderr)
        return 2

    from pyspark.sql import functions as F

    from tube_spark.operators.curation import curate_corpus
    from tube_spark.operators.quality_checks import completeness, uniqueness, validate
    from tube_spark.operators.sampling import hash_split
    from tube_spark.operators.snapshot import snapshot_diff_summary
    from tube_spark.session import get_spark
    from tube_spark.sinks.writer import VersionedIndexWriter

    spark = get_spark(
        "tube_spark-curate",
        master=args.master,
        extra_conf={"spark.ui.enabled": "false"},
    )
    docs = spark.read.parquet(args.docs)
    emb = spark.read.parquet(args.embeddings) if args.embeddings else None

    gates: dict[str, object] = {}
    # each opt-in gate below pins its output with localCheckpoint before
    # counting, and the next gate's "before" count reuses the previous
    # gate's "after" count — without this, every count() replays the
    # whole uncheckpointed upstream chain (including the self-trained
    # bigram LM and DSIR scoring joins) once per gate, which compounds
    # at corpus scale.  Each gate's pinned subtree contains shuffles
    # (scoring joins / aggregations), so pinning beats recompute (the
    # map-only-subtree exception does not apply here).
    n_docs: int | None = None

    def _gate(df: DataFrame) -> tuple[DataFrame, int]:
        df = df.localCheckpoint(eager=False)
        return df, df.count()

    if args.html_extract:
        from tube_spark.operators.text_extract import html_extract

        before = docs.count() if n_docs is None else n_docs
        docs, n_docs = _gate(
            html_extract(docs, args.text_col)
            .filter(F.col("link_density") <= args.max_link_density)
            .drop(args.text_col)
            .withColumnRenamed("text_extracted", args.text_col)
            .drop("n_links", "link_density")
        )
        gates["html"] = {
            "max_link_density": args.max_link_density,
            "removed": before - n_docs,
        }

    if args.max_ppl is not None:
        from tube_spark.operators.lm import bigram_lm_perplexity

        scores = bigram_lm_perplexity(
            docs, id_col=args.id_col, text_col=args.text_col,
            vocab_size=args.ppl_vocab,
        ).select(args.id_col, "ppl")
        before = docs.count() if n_docs is None else n_docs
        docs, n_docs = _gate(
            docs.join(scores, args.id_col, "left")
            .filter(F.col("ppl").isNull() | (F.col("ppl") <= args.max_ppl))
            .drop("ppl")
        )
        gates["perplexity"] = {"max_ppl": args.max_ppl, "removed": before - n_docs}

    if args.dsir_target is not None:
        if not 0 < args.dsir_keep_frac <= 1:
            print("--dsir-keep-frac must be in (0, 1]", file=sys.stderr)
            return 2
        from tube_spark.operators.dsir import dsir_log_weights

        target = spark.read.parquet(args.dsir_target)
        w = dsir_log_weights(
            docs, target, id_col=args.id_col, text_col=args.text_col,
            dim=args.dsir_dim,
        ).select(args.id_col, "avg_log_weight")
        # global threshold from the weight distribution (bounded GK
        # sketch — no single-partition global sort); docs without
        # features (no tokens) carry no weight and are dropped here,
        # matching the filter's intent
        qs = w.approxQuantile(
            "avg_log_weight", [1.0 - args.dsir_keep_frac], 0.0001
        )
        if not qs:
            # no document produced any feature (all texts empty /
            # non-alpha, or earlier gates emptied the corpus) — there is
            # no weight distribution to threshold on; record the skip
            # instead of crashing on qs[0]
            gates["dsir"] = {
                "keep_frac": args.dsir_keep_frac,
                "skipped": "no documents carried DSIR features",
            }
        else:
            thr = qs[0]
            before = docs.count() if n_docs is None else n_docs
            docs, n_docs = _gate(
                docs.join(w, args.id_col)
                .filter(F.col("avg_log_weight") >= thr)
                .drop("avg_log_weight")
            )
            gates["dsir"] = {
                "keep_frac": args.dsir_keep_frac,
                "threshold": round(thr, 6),
                "removed": before - n_docs,
            }

    if args.blocklist is not None:
        from tube_spark.operators.bloomgate import (
            bloom_build,
            bloom_gate,
            bloom_params,
        )

        bl = spark.read.parquet(args.blocklist)
        bcol = args.blocklist_col or args.text_col
        m_bits, k = bloom_params(max(bl.count(), 1), args.blocklist_fpr)
        m_bits = max(m_bits, 63)
        words = bloom_build(bl, bcol, m_bits, k)
        before = docs.count() if n_docs is None else n_docs
        docs, n_docs = _gate(
            bloom_gate(docs, args.text_col, words, m_bits, k)
            .filter(~F.col("maybe_blocked"))
            .drop("maybe_blocked")
        )
        gates["blocklist"] = {
            "m_bits": m_bits,
            "n_hashes": k,
            "removed": before - n_docs,
        }

    curated = curate_corpus(
        docs,
        emb,
        id_col=args.id_col,
        text_col=args.text_col,
        min_quality=args.min_quality,
        ngram_n=args.ngram,
        jaccard_threshold=args.jaccard,
    )
    curated = hash_split(curated, id_col=args.id_col, weights=splits)

    if args.quality_gate:
        suite = validate(
            curated, [uniqueness(args.id_col), completeness(args.id_col)]
        ).collect()
        gates["quality"] = {r["constraint"]: bool(r["passed"]) for r in suite}
        if not all(r["passed"] for r in suite):
            print(json.dumps({"error": "quality gate failed", "gates": gates}))
            return 3

    writer = VersionedIndexWriter(args.out, "corpus")
    prev = writer.current_path()
    if prev is not None and args.max_removed_frac < 1.0:
        summary = {
            r["status"]: r["n"]
            for r in snapshot_diff_summary(
                spark.read.parquet(prev), curated, args.id_col, compare_cols=[args.id_col]
            ).collect()
        }
        base = sum(summary.get(s, 0) for s in ("removed", "changed", "unchanged"))
        removed_frac = summary.get("removed", 0) / base if base else 0.0
        gates["delta"] = {"removed_frac": round(removed_frac, 6)}
        if removed_frac > args.max_removed_frac:
            print(json.dumps({"error": "delta gate failed", "gates": gates}))
            return 4

    version = writer.publish(curated)
    counts = {
        r["split"]: r["n"]
        for r in curated.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    print(
        json.dumps(
            {
                "version": version,
                "rows": sum(counts.values()),
                "splits": counts,
                "gates": gates,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
