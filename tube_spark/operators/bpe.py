"""Distributed byte-pair-encoding tokenizer: train merges on a corpus,
encode documents with them (Sennrich et al., ACL 2016).

The classic algorithm is a loop: count adjacent symbol pairs across the
corpus, merge the most frequent pair everywhere, repeat.  Re-expressed
Spark-first:

* The corpus never re-enters the loop.  One pass builds the DISTINCT
  word-frequency table (`word_vocab`), which is what every iteration
  operates on — the map-reduce formulation of BPE.  At 100 TB the word
  vocabulary is orders of magnitude smaller than the corpus (Heaps'
  law) and is the ONLY iterated state.
* Each iteration is two narrow stages over the vocab frame: adjacent
  pairs via `arrays_zip(slice, slice)` → explode → weighted count →
  `orderBy().limit(1)` (a one-row TakeOrdered collect, the same bounded
  driver-side step as the k-means sample), then a merge REWRITE of the
  symbol arrays as a pure Catalyst `aggregate` fold — greedy
  left-to-right, non-overlapping, exactly the reference semantics.  No
  Python touches executor data during training.
* Lineage is truncated with `localCheckpoint` every few iterations
  (the components.py device), or the plan would grow one fold per merge.
* Encoding is a broadcast/shuffle JOIN against the trained vocab's
  final segmentations for in-vocabulary words — zero per-row Python —
  with an Arrow kernel fallback (`bpe_encode_udf`) that applies merge
  ranks to out-of-vocabulary words (the hot path caches per distinct
  word within each batch).

Determinism: pair-count ties break on lexicographic pair order, both
here and in the pure-Python reference implementation the tests compare
against (tests/test_bpe.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tube_spark.functions.text import tokens

END = "</w>"


def word_vocab(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(word, cnt, syms) — distinct words with corpus frequency and the
    initial character segmentation (chars + end-of-word marker).

    One explode + one shuffle keyed on word; the output size is the
    corpus vocabulary, not the corpus."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "syms",
            F.concat(F.split(F.col("word"), ""), F.array(F.lit(END))),
        )
    )


def _merge_fold(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right replacement of adjacent (a, b) with a+b as a
    native ``aggregate`` fold: append each symbol, or fuse it into the
    accumulator's tail when the tail is exactly ``a`` and the symbol is
    ``b``.  Non-overlapping by construction — once fused, the tail is
    ``a+b`` and no longer matches ``a``."""
    merged = a + b
    return F.aggregate(
        syms,
        F.expr("cast(array() as array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies weighted by word count: zip the symbol
    array with itself shifted by one, explode, sum.  Map-side partial
    aggregation makes the shuffle carry at most |distinct pairs| rows."""
    pairs = F.arrays_zip(
        F.slice(F.col("syms"), F.lit(1), F.size("syms") - 1).alias("a"),
        F.slice(F.col("syms"), F.lit(2), F.size("syms") - 1).alias("b"),
    )
    return (
        vocab.filter(F.size("syms") >= 2)
        .select(F.explode(pairs).alias("p"), "cnt")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").alias("freq"))
    )


def _train_bpe_local(
    vocab: DataFrame, num_merges: int, min_pair_freq: int
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Driver-local trainer for a BOUNDED vocab (see ``train_bpe``'s
    ``driver_vocab_rows``): identical semantics to the distributed loop
    — per-occurrence adjacent-pair counts weighted by word frequency,
    argmax with (freq desc, a asc, b asc) ties, greedy left-to-right
    non-overlapping rewrite, stop below ``min_pair_freq`` — pinned
    equal by tests/test_bpe.py.  Returns the final segmentations as a
    LocalRelation (broadcast-ready for the encode join)."""
    from tube_spark.functions.localrel import local_df

    rows = [(r["word"], r["cnt"], list(r["syms"])) for r in vocab.collect()]
    cnts = [c for (_, c, _) in rows]
    syms_list = [s for (_, _, s) in rows]
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pc: dict[tuple[str, str], int] = {}
        for s, c in zip(syms_list, cnts):
            for i in range(len(s) - 1):
                k = (s[i], s[i + 1])
                pc[k] = pc.get(k, 0) + c
        if not pc:
            break
        (a, b), freq = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if freq < min_pair_freq:
            break
        merges.append((a, b))
        merged = a + b
        for idx, s in enumerate(syms_list):
            if a not in s:
                continue
            out: list[str] = []
            i, n, changed = 0, len(s), False
            while i < n:
                if i + 1 < n and s[i] == a and s[i + 1] == b:
                    out.append(merged)
                    i += 2
                    changed = True
                else:
                    out.append(s[i])
                    i += 1
            if changed:
                syms_list[idx] = out
    final = local_df(
        vocab.sparkSession,
        [(w, c, s) for (w, c, _), s in zip(rows, syms_list)],
        "word string, cnt bigint, syms array<string>",
    )
    return merges, final


def train_bpe(
    docs: DataFrame,
    num_merges: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_pair_freq: int = 2,
    checkpoint_every: int = 8,
    driver_vocab_rows: int = 8192,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn up to ``num_merges`` BPE merges; returns (merges, vocab)
    where vocab carries each trained word's FINAL segmentation.

    Each iteration runs one Spark job whose driver-side result is a
    single row (the argmax pair) — the loop is inherently sequential in
    the algorithm, not a parallelism defect.  Stops early when no pair
    reaches ``min_pair_freq``.

    ``driver_vocab_rows``: when the distinct-word vocab (the ONLY
    iterated state) has at most this many rows, training runs on the
    driver over the collected vocab instead of paying ``num_merges``
    sequential Spark round-trips over a kilobyte-scale frame (measured
    at sf0.1: 31 distinct words, ~0.27 s of fixed job/AQE cost per
    merge → 8.1 s for 30 merges; the driver loop is ~0.1 s).  The
    bound caps driver state the same way the k-means sample does
    (similarity.py); 0 disables the fast path.  Both paths are the
    same algorithm and are pinned equal by tests/test_bpe.py."""
    from tube_spark.plans.lifecycle import CheckpointRotor

    rotor = CheckpointRotor(docs.sparkSession)
    rotor.begin()
    vocab = word_vocab(docs, id_col, text_col).localCheckpoint()
    rotor.commit()
    if driver_vocab_rows and vocab.count() <= driver_vocab_rows:
        return _train_bpe_local(vocab, num_merges, min_pair_freq)
    merges: list[tuple[str, str]] = []
    for i in range(num_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.col("freq").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["freq"] < min_pair_freq:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        vocab = vocab.withColumn("syms", _merge_fold(F.col("syms"), a, b))
        # truncate lineage: one fold per merge otherwise stacks into a
        # plan Catalyst re-analyzes quadratically.  Each new checkpoint
        # subsumes the previous one; the rotor frees the old blocks
        # (plans/lifecycle.py) so the loop holds ONE vocab copy, not
        # num_merges/checkpoint_every copies.
        if (i + 1) % checkpoint_every == 0:
            rotor.begin()
            vocab = vocab.localCheckpoint()
            rotor.commit()
    rotor.begin()
    final = vocab.localCheckpoint()
    rotor.commit()
    return merges, final


def encode_with_vocab(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, pos, word, tokens) — per-word BPE segmentation by JOINING the
    trained vocab's final symbol arrays: the scale path for encoding the
    training corpus (or any corpus whose vocabulary it covers).  Words
    absent from the vocab get NULL tokens — filter or route those
    through ``bpe_encode_udf``."""
    words = docs.select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "word"),
    )
    seg = vocab.select("word", F.col("syms").alias("tokens"))
    return words.join(seg, "word", "left").select(
        id_col, "pos", "word", "tokens"
    )


def bpe_encode_udf(merges: list[tuple[str, str]]):
    """Arrow kernel encoding arbitrary (incl. out-of-vocabulary) words
    with the learned merge ranks — the portable tokenizer artifact.

    Within each Arrow batch the segmentation is computed once per
    DISTINCT word (the Zipf-shaped repetition makes the cache hit rate
    high), then broadcast-mapped onto the rows.  Ranks dict is shipped
    once per executor via closure capture."""
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    def segment(word: str) -> list[str]:
        syms = list(word) + [END]
        while len(syms) >= 2:
            best, best_rank = None, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = i, r
            if best is None:
                break
            a, b = merges[best_rank]
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    @pandas_udf("array<string>")
    def enc(words: pd.Series) -> pd.Series:
        cache = {w: segment(w) for w in words.unique()}
        return words.map(cache)

    return enc


def token_frequencies(
    docs: DataFrame,
    vocab: DataFrame,
    k: int = 50,
) -> DataFrame:
    """Top-k BPE token frequencies over the corpus: explode the vocab's
    final segmentations weighted by word count — never re-touches the
    corpus text.  (token, freq), ties by token asc."""
    return (
        vocab.select(F.explode("syms").alias("token"), "cnt")
        .groupBy("token")
        .agg(F.sum("cnt").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token").asc())
        .limit(k)
    )
