"""Distributed BPE (operators/bpe.py) vs a pure-Python reference
implementation of Sennrich et al.'s algorithm (same tie-break: pair
frequency desc, then lexicographic pair order).

BPE is not SQL-expressible, so this differential test IS the
correctness gate (the registry carries bpe_tokenize as a rows-only
query); the reference implementation below is the classic textbook
loop, independent of any Spark code path.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from tube_spark.operators.bpe import (
    END,
    bpe_encode_udf,
    encode_with_vocab,
    token_frequencies,
    train_bpe,
    word_vocab,
)

SF = "/root/testdata/sf0.001"


# --- pure-Python reference ------------------------------------------------


def _ref_merge_word(syms: tuple, a: str, b: str) -> tuple:
    out, i = [], 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _ref_train(word_counts: dict[str, int], num_merges: int, min_pair_freq=2):
    vocab = {w: tuple(list(w) + [END]) for w in word_counts}
    merges = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for w, syms in vocab.items():
            cnt = word_counts[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += cnt
        if not pairs:
            break
        (a, b), freq = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if freq < min_pair_freq:
            break
        merges.append((a, b))
        vocab = {w: _ref_merge_word(s, a, b) for w, s in vocab.items()}
    return merges, vocab


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")


@pytest.fixture(scope="module")
def trained(spark, docs):
    return train_bpe(docs, 30)


def test_merges_match_reference(spark, docs, trained):
    """30 learned merges on the real corpus equal the reference loop's,
    in order."""
    counts = {
        r["word"]: r["cnt"] for r in word_vocab(docs).collect()
    }
    ref_merges, _ = _ref_train(counts, 30)
    merges, _ = trained
    assert merges == ref_merges


def test_final_segmentations_match_reference(spark, docs, trained):
    counts = {r["word"]: r["cnt"] for r in word_vocab(docs).collect()}
    ref_merges, ref_vocab = _ref_train(counts, 30)
    _, vocab = trained
    got = {r["word"]: tuple(r["syms"]) for r in vocab.collect()}
    assert got == ref_vocab


def test_encode_join_reconstructs_words(spark, docs, trained):
    """Lossless: concatenating a word's tokens (minus the end marker)
    reproduces the word; no word is unmatched by the trained vocab."""
    _, vocab = trained
    enc = encode_with_vocab(docs, vocab)
    bad = enc.filter(
        F.col("tokens").isNull()
        | (
            F.concat_ws("", F.col("tokens"))
            != F.concat(F.col("word"), F.lit(END))
        )
    )
    assert bad.count() == 0


def test_udf_matches_vocab_join(spark, docs, trained):
    """The OOV-capable Arrow encoder reproduces the vocab join's
    segmentation for every in-vocabulary word, and segments an unseen
    word using only learned merges."""
    merges, vocab = trained
    enc = bpe_encode_udf(merges)
    both = vocab.select("word", "syms", enc(F.col("word")).alias("udf_syms"))
    assert both.filter(F.col("syms") != F.col("udf_syms")).count() == 0
    [row] = (
        spark.createDataFrame([("quantization",)], "word string")
        .select(enc(F.col("word")).alias("t"))
        .collect()
    )
    assert "".join(row["t"]) == "quantization" + END


def test_min_pair_freq_stops_early(spark):
    docs = spark.createDataFrame([(1, "ab ab cd")], "doc_id long, text string")
    merges, _ = train_bpe(docs, 50, min_pair_freq=2)
    # only pairs inside 'ab' reach frequency 2: a+b, ab+</w>
    assert merges == [("a", "b"), ("ab", END)]


def test_token_frequencies_weighted_by_word_count(spark, docs, trained):
    """Top-token frequencies recomputed from the (word, cnt) table in
    Python equal the operator's — never touching the corpus twice."""
    _, vocab = trained
    expect: Counter = Counter()
    for r in vocab.collect():
        for s in r["syms"]:
            expect[s] += r["cnt"]
    top = token_frequencies(docs, vocab, k=20).collect()
    want = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r["token"], r["freq"]) for r in top] == want


def test_distributed_path_matches_driver_path(spark, docs, trained):
    """The distributed merge loop (forced via driver_vocab_rows=0) and
    the bounded driver-local fast path learn the SAME merges and final
    segmentations — the equivalence contract of the r14 small-state
    optimization."""
    local_merges, local_vocab = trained  # small vocab -> driver path
    dist_merges, dist_vocab = train_bpe(docs, 30, driver_vocab_rows=0)
    assert dist_merges == local_merges
    a = {
        r["word"]: (r["cnt"], tuple(r["syms"])) for r in local_vocab.collect()
    }
    b = {
        r["word"]: (r["cnt"], tuple(r["syms"])) for r in dist_vocab.collect()
    }
    assert a == b
