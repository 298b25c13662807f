"""Portable Bloom-filter membership gate (Bloom 1970; parameter
formulas after Broder & Mitzenmacher 2004).

The 100 TB blocklist-filtering shape: a bounded reference set (a
benchmark suite to decontaminate against, a takedown/opt-out list, an
already-exported corpus to exclude) is compressed into an m-bit Bloom
filter ONCE, and the corpus scan then probes it as a map-only
expression — zero shuffle, zero join, no per-executor copy of the raw
blocklist.  The filter guarantees NO FALSE NEGATIVES (every
blocklisted value is flagged), trading a tunable false-positive rate
(~0.6185^(m/n)) for the (m/8)-byte footprint: 1e9 blocked items fit a
~1.2 GB filter at 1% FPR where the raw values would be hundreds of GB.
Complements operators/decontamination.py (which broadcasts the exact
shingle index and reports WHICH benchmark matched): the Bloom gate is
the cheap first pass when the reference set is too big to broadcast
raw, or when a boolean verdict is enough; positives can re-check
against the exact index.

Everything is built from the portable 60-bit md5 hash
(functions/text.py), so a SQL oracle reproduces the ENTIRE filter —
every word, every probe — bit-for-bit: k derived hashes per value
(seed|j|value), positions h % m_bits, words of 63 usable bits (bit 63
is never set, keeping every word a positive signed int64 in engines
without unsigned shifts).

Build = one explode(k) + one map-side-combinable bit_or aggregation
over ceil(m/63) word rows; probe = a pure column expression over an
array literal (the filter rides the Catalyst plan into every
executor, inside whole-stage codegen — no Python, no broadcast join).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tube_spark.functions.text import portable_hash60

_BITS_PER_WORD = 63  # keep every word a positive signed int64


def bloom_params(n_items: int, fpr: float) -> tuple[int, int]:
    """Standard sizing: m = -n ln p / (ln 2)^2 bits, k = (m/n) ln 2
    hashes — the (m, k) minimizing false positives for n items."""
    if n_items < 1:
        raise ValueError(f"n_items must be >= 1, got {n_items}")
    if not 0 < fpr < 1:
        raise ValueError(f"fpr must be in (0, 1), got {fpr}")
    m = math.ceil(-n_items * math.log(fpr) / math.log(2) ** 2)
    k = max(1, round(m / n_items * math.log(2)))
    return m, k


def _probe_hash(col: Column, j: int, m_bits: int, seed: str) -> Column:
    return portable_hash60(
        F.concat_ws("|", F.lit(seed), F.lit(str(j)), col.cast("string"))
    ) % F.lit(m_bits)


def bloom_build(
    df: DataFrame,
    col: str,
    m_bits: int,
    n_hashes: int,
    seed: str = "bloomgate",
) -> list[int]:
    """Build the filter from every (non-null) value of ``df[col]``:
    returns the dense word list (``ceil(m_bits/63)`` int64s, index =
    word position) ready for :func:`bloom_probe`.  One distributed
    pass: k hash positions per value, exploded, ``bit_or`` folded per
    word — only the word rows ever reach the driver."""
    if m_bits < _BITS_PER_WORD:
        raise ValueError(f"m_bits must be >= {_BITS_PER_WORD}, got {m_bits}")
    if n_hashes < 1:
        raise ValueError(f"n_hashes must be >= 1, got {n_hashes}")
    positions = df.filter(F.col(col).isNotNull()).select(
        F.explode(
            F.array(
                *[
                    _probe_hash(F.col(col), j, m_bits, seed)
                    for j in range(n_hashes)
                ]
            )
        ).alias("h")
    )
    words = (
        positions.select(
            (F.col("h") / _BITS_PER_WORD).cast("long").alias("w"),
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                (F.col("h") % _BITS_PER_WORD).cast("int"),
            ).alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(b)").alias("bits"))
        .collect()
    )
    dense = [0] * (-(-m_bits // _BITS_PER_WORD))
    for r in words:
        dense[r["w"]] = r["bits"]
    return dense


def bloom_probe(
    col: Column,
    words: list[int],
    m_bits: int,
    n_hashes: int,
    seed: str = "bloomgate",
) -> Column:
    """Boolean membership expression: true iff ALL k probe bits are
    set — map-only, the word array travels as a plan literal into
    whole-stage codegen.  Never false for a value the filter was built
    from (no false negatives); true for a non-member with probability
    ~(1 - e^(-kn/m))^k."""
    arr = F.lit(words)
    checks = []
    for j in range(n_hashes):
        h = _probe_hash(col, j, m_bits, seed)
        word = F.element_at(arr, ((h / _BITS_PER_WORD).cast("long") + 1).cast("int"))
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (h % _BITS_PER_WORD).cast("int")
        )
        checks.append(word.bitwiseAND(mask) != 0)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def bloom_gate(
    corpus: DataFrame,
    col: str,
    words: list[int],
    m_bits: int,
    n_hashes: int,
    seed: str = "bloomgate",
    flag_col: str = "maybe_blocked",
) -> DataFrame:
    """Corpus + ``flag_col``: whether ``col`` MAY be in the blocklist
    the filter was built from (definitely-not when false).  NULL
    values flag false — a null key cannot have been inserted
    (``bloom_build`` skips nulls)."""
    probe = bloom_probe(F.col(col), words, m_bits, n_hashes, seed)
    return corpus.withColumn(
        flag_col,
        F.when(F.col(col).isNull(), F.lit(False)).otherwise(probe),
    )
