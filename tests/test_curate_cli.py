"""End-to-end curation CLI: curate -> gates -> split -> versioned publish."""

from __future__ import annotations

import json

import pytest

from tube_spark.curate import main

SF = "/root/testdata/sf0.001"


def _run(capsys, *argv) -> tuple[int, dict]:
    rc = main(list(argv))
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return rc, json.loads(out)


def test_publish_and_republish(spark, tmp_path, capsys):
    out = str(tmp_path / "corpus")
    rc, rep = _run(
        capsys,
        "--docs", f"{SF}/documents.parquet",
        "--out", out,
        "--embeddings", f"{SF}/embeddings.parquet",
        "--quality-gate",
    )
    assert rc == 0
    assert rep["rows"] == sum(rep["splits"].values()) > 0
    assert set(rep["splits"]) == {"train", "val", "test"}
    assert rep["gates"]["quality"] == {"uniqueness": True, "completeness": True}

    v1 = spark.read.parquet(rep["version"])
    assert v1.count() == rep["rows"]
    assert {"doc_id", "split", "quality_score", "has_embedding"} <= set(v1.columns)

    # republish: identical corpus passes the delta gate
    rc2, rep2 = _run(
        capsys,
        "--docs", f"{SF}/documents.parquet",
        "--out", out,
        "--max-removed-frac", "0.1",
    )
    assert rc2 == 0
    assert rep2["gates"]["delta"]["removed_frac"] == 0.0
    assert rep2["version"].endswith("_v2")


def test_delta_gate_blocks_mass_removal(tmp_path, capsys):
    out = str(tmp_path / "corpus")
    rc, _ = _run(capsys, "--docs", f"{SF}/documents.parquet", "--out", out)
    assert rc == 0
    # raising min-quality massively shrinks the corpus -> delta gate trips
    rc2, rep2 = _run(
        capsys,
        "--docs", f"{SF}/documents.parquet",
        "--out", out,
        "--min-quality", "0.99",
        "--max-removed-frac", "0.1",
    )
    assert rc2 == 4 and rep2["error"] == "delta gate failed"


def test_bad_split_spec(capsys):
    rc = main(["--docs", "x", "--out", "y", "--splits", "oops"])
    assert rc == 2


def test_perplexity_gate(spark, tmp_path, capsys):
    """--max-ppl drops the high-perplexity tail before curation, keeps
    short unscorable docs, and reports the removal in the gates."""
    from tube_spark.operators.lm import bigram_lm_perplexity

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    scores = bigram_lm_perplexity(docs, vocab_size=10000)
    # pick a threshold that bites but keeps most of the corpus
    cut = scores.approxQuantile("ppl", [0.9], 0.0)[0]
    n_over = scores.filter(scores.ppl > cut).count()
    assert n_over > 0

    out = str(tmp_path / "corpus")
    rc, rep = _run(
        capsys,
        "--docs", f"{SF}/documents.parquet",
        "--out", out,
        "--max-ppl", str(cut),
        "--min-quality", "0.0",
        "--jaccard", "1.01",  # disable near-dup so the gate is isolated
    )
    assert rc == 0
    assert rep["gates"]["perplexity"]["removed"] == n_over


def test_dsir_selection_gate(spark, tmp_path, capsys):
    """--dsir-target keeps the target-like fraction: with an English
    target, the surviving corpus is enriched in English docs."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    tgt_path = str(tmp_path / "target")
    docs.filter(docs.lang == "en").select("doc_id", "text").write.parquet(tgt_path)
    base_en = docs.filter(docs.lang == "en").count() / docs.count()

    out = str(tmp_path / "corpus")
    rc, rep = _run(
        capsys,
        "--docs", f"{SF}/documents.parquet",
        "--out", out,
        "--dsir-target", tgt_path,
        "--dsir-keep-frac", "0.4",
        "--min-quality", "0.0",
        "--jaccard", "1.01",
    )
    assert rc == 0
    g = rep["gates"]["dsir"]
    total = docs.count()
    kept = total - g["removed"]
    assert 0.3 * total <= kept <= 0.5 * total  # ~keep_frac of the corpus
    v1 = spark.read.parquet(rep["version"]).select("doc_id")
    survivors = v1.join(docs.select("doc_id", "lang"), "doc_id")
    en_frac = survivors.filter(survivors.lang == "en").count() / survivors.count()
    assert en_frac > base_en  # selection moved toward the target


def test_dsir_gate_skips_on_featureless_corpus(spark, tmp_path, capsys):
    """A corpus where no document yields a DSIR feature (all-numeric
    texts) has no weight distribution to threshold on: the gate must
    record a skip instead of crashing on approxQuantile()[0]."""
    docs = spark.createDataFrame(
        [(i, "12345 67890 ---") for i in range(20)],
        "doc_id long, text string",
    )
    src = str(tmp_path / "numeric_docs")
    docs.write.parquet(src)
    tgt = str(tmp_path / "target")
    spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    ).limit(50).write.parquet(tgt)

    out = str(tmp_path / "corpus")
    rc, rep = _run(
        capsys,
        "--docs", src,
        "--out", out,
        "--dsir-target", tgt,
        "--dsir-keep-frac", "0.5",
        "--min-quality", "0.0",
        "--jaccard", "1.01",
    )
    assert rc == 0
    assert "skipped" in rep["gates"]["dsir"]
    assert rep["rows"] > 0  # gate skipped, corpus flowed through


def test_blocklist_gate(spark, tmp_path, capsys):
    """--blocklist drops exactly the blocked documents (no false
    negatives; FPR-sized filter keeps collateral ~0 at this scale)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    blocked = docs.filter(docs.doc_id % 9 == 0).filter(docs.text.isNotNull())
    bl_path = str(tmp_path / "blocklist")
    blocked.select("text").write.parquet(bl_path)
    n_blocked_ids = {r["doc_id"] for r in blocked.select("doc_id").collect()}

    out = str(tmp_path / "corpus")
    rc, rep = _run(
        capsys,
        "--docs", f"{SF}/documents.parquet",
        "--out", out,
        "--blocklist", bl_path,
        "--min-quality", "0.0",
        "--jaccard", "1.01",
    )
    assert rc == 0
    g = rep["gates"]["blocklist"]
    # every blocked doc removed (guarantee) -- exact-dup texts of a
    # blocked doc are also (correctly) removed, hence >=
    assert g["removed"] >= len(n_blocked_ids) > 0
    published = {
        r["doc_id"]
        for r in spark.read.parquet(rep["version"]).select("doc_id").collect()
    }
    assert not (published & n_blocked_ids)
    # collateral stays small: the filter was sized for 0.1% FPR
    assert g["removed"] <= len(n_blocked_ids) + 0.05 * docs.count()


def test_html_extract_stage(spark, tmp_path, capsys):
    """--html-extract strips markup before the gates and drops nav
    pages by link density."""
    from pyspark.sql import functions as F

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .limit(40)
        .select(
            "doc_id",
            F.concat(
                F.lit("<html><body><p>"), "text", F.lit("</p></body></html>")
            ).alias("text"),
        )
    )
    nav = spark.createDataFrame(
        [(999_001, "<a href='/a'>home</a> <a href='/b'>about</a>")],
        "doc_id long, text string",
    )
    src = str(tmp_path / "html_docs")
    docs.unionByName(nav).write.parquet(src)

    out = str(tmp_path / "corpus")
    rc, rep = _run(
        capsys,
        "--docs", src,
        "--out", out,
        "--html-extract",
        "--min-quality", "0.0",
        "--jaccard", "1.01",
    )
    assert rc == 0
    assert rep["gates"]["html"]["removed"] == 1  # the nav page
    pub = spark.read.parquet(rep["version"])
    assert pub.filter(pub.doc_id == 999_001).count() == 0
    assert rep["rows"] > 0
    # the published lang/quality stats were computed over EXTRACTED
    # text: every surviving doc keeps the language its raw text had,
    # which markup-polluted tokens would have broken toward 'other'
    assert pub.filter(pub.lang_pred == "en").count() > 0
