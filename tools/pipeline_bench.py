"""End-to-end training-data pipeline bench THROUGH THE CLI SURFACE.

Composes the stages a real corpus build runs, in order, against one
scale factor, and reports per-stage wall time:

  1. curate CLI   — HTML extraction, bigram-LM perplexity gate, DSIR
                    selection toward a target corpus, Bloom blocklist
                    gate, quality + near-dup curation, splits,
                    versioned publish (tube_spark/curate.py)
  2. tokenize     — BPE-ish token counts over the published train split
  3. shards       — token-budgeted shard export + manifest verify
                    (operators/packing token counts -> sinks/shards.py)
  4. BM25 index   — persistent term-partitioned postings build over the
                    published corpus (index CLI `build`)
  5. IVF vectors  — cell-partitioned vector store build (index CLI
                    `build-vectors`) over the embeddings table
  6. serve probes — one BM25 search + one IVF search (the read path)

Correctness of this composition is pinned by
tests/test_training_pipeline.py and the per-stage suites; this script
measures the whole-engine wall-clock the per-query bench cannot show.

Usage: python tools/pipeline_bench.py [sf_dir] [master]
Prints a stage table and one JSON line.
"""

from __future__ import annotations

import contextlib
import io
import json
import shutil
import sys
import tempfile
import time


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    master = sys.argv[2] if len(sys.argv) > 2 else "local[32]"
    sys.path.insert(0, "/root/repo")

    from pyspark.sql import functions as F

    from tube_spark.session import get_spark

    spark = get_spark(
        "pipeline-bench", master=master, extra_conf={"spark.ui.enabled": "false"}
    )
    work = tempfile.mkdtemp(prefix="pipe_bench_")
    stages: dict[str, float] = {}
    t_all = time.time()

    # -- stage inputs ------------------------------------------------
    docs_path = f"{sf_dir}/documents.parquet"
    emb_path = f"{sf_dir}/embeddings.parquet"
    docs = spark.read.parquet(docs_path)
    n_docs = docs.count()

    # DSIR target: the English slice of the SMALL reference sf (bounded
    # by design — the target corpus is always small relative to the raw
    # crawl); blocklist: every ~101st document's text
    tgt_path = f"{work}/dsir_target"
    spark.read.parquet("/root/testdata/sf0.01/documents.parquet").filter(
        F.col("lang") == "en"
    ).select("doc_id", "text").write.parquet(tgt_path)
    bl_path = f"{work}/blocklist"
    docs.filter(F.col("doc_id") % 101 == 0).filter(
        F.col("text").isNotNull()
    ).select("text").write.parquet(bl_path)

    # -- 1. curate CLI -----------------------------------------------
    from tube_spark.curate import main as curate_main

    t0 = time.time()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = curate_main([
            "--docs", docs_path,
            "--out", f"{work}/corpus",
            "--html-extract",
            "--max-ppl", "50000",
            "--dsir-target", tgt_path,
            "--dsir-keep-frac", "0.9",
            "--blocklist", bl_path,
            "--min-quality", "0.1",
            # trigram shingles: the unigram default degenerates toward
            # all-pairs on a shared vocabulary (BENCH_NOTES r4) and
            # over-merges near-dups; n=3 is the documented scale config
            "--ngram", "3",
            "--master", master,
        ])
    stages["curate_cli"] = time.time() - t0
    rep = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert rc == 0, rep
    published = rep["version"]

    # -- 2. tokenize the train split ---------------------------------
    # the published corpus carries metadata only (doc_id, n_tokens,
    # lang_pred, quality_score, split); rejoin text from the raw table
    # and materialize once for the three text consumers below
    from tube_spark.functions.text import token_count_bpe_ish

    t0 = time.time()
    corpus_text = f"{work}/corpus_text"
    spark.read.parquet(published).select("doc_id", "split").join(
        docs.select("doc_id", "text"), "doc_id"
    ).write.parquet(corpus_text)
    train = (
        spark.read.parquet(corpus_text)
        .filter(F.col("split") == "train")
        .withColumn("n_tok", token_count_bpe_ish(F.col("text")))
        .select("doc_id", "text", "n_tok")
        .localCheckpoint(eager=False)
    )
    n_train = train.count()
    stages["tokenize"] = time.time() - t0

    # -- 3. token-budgeted shard export ------------------------------
    from tube_spark.sinks.shards import export_shards, verify_shards

    t0 = time.time()
    m = export_shards(
        train, f"{work}/shards", "doc_id",
        token_budget=65536, token_count_col="n_tok", shuffle_seed=11,
    )
    bad = verify_shards(spark, f"{work}/shards").filter(~F.col("ok")).count()
    stages["shards"] = time.time() - t0
    assert bad == 0 and m["n_rows"] == n_train

    # -- 4. BM25 index build (index CLI) -----------------------------
    from tube_spark.index import main as index_main

    t0 = time.time()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = index_main([
            "build", "--docs", corpus_text, "--index", f"{work}/bm25",
            "--n-buckets", "64", "--master", master,
        ])
    stages["bm25_build"] = time.time() - t0
    assert rc == 0

    # -- 5. IVF vector store build (index CLI) -----------------------
    t0 = time.time()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = index_main([
            "build-vectors", "--embeddings", emb_path,
            "--index", f"{work}/ivf", "--n-clusters", "16",
            "--master", master,
        ])
    stages["ivf_build"] = time.time() - t0
    assert rc == 0

    # -- 6. serving probes -------------------------------------------
    t0 = time.time()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc1 = index_main([
            "search", "--index", f"{work}/bm25",
            "--query", "data model training quality", "--k", "10",
            "--master", master,
        ])
        rc2 = index_main([
            "search-vectors", "--index", f"{work}/ivf",
            "--embeddings", emb_path, "--query-id", "7",
            "--k", "10", "--nprobe", "4", "--master", master,
        ])
    stages["serve_probes"] = time.time() - t0
    assert rc1 == 0 and rc2 == 0

    total = time.time() - t_all
    print(f"{'stage':<14} {'sec':>8}")
    for k, v in stages.items():
        print(f"{k:<14} {v:>8.2f}")
    print(f"{'TOTAL':<14} {total:>8.2f}")
    print(json.dumps({
        "metric": "pipeline_e2e",
        "value": round(total, 2),
        "unit": "sec",
        "stages": {k: round(v, 2) for k, v in stages.items()},
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "n_train": n_train,
        "curate_gates": rep["gates"],
        "published_rows": rep["rows"],
        "shard_rows": m["n_rows"],
    }))
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
