"""HyperLogLog cardinality sketch (Flajolet, Fusy, Gandouet, Meunier,
AofA 2007): distinct-count estimates from m = 2^p max-rank registers.

Completes the sketch family: Misra-Gries answers "which keys are
frequent" (operators/heavyhitters.py), Count-Min "how often is this
key" (operators/cms.py), Bloom "was this key seen" (bloomgate.py), KMV
"how similar are two corpora" (overlap.py) — HLL answers "how many
DISTINCT keys" in m bytes-scale registers regardless of corpus size,
within ~1.04/sqrt(m) relative error.  KMV also estimates distincts,
but HLL's register state is smaller, merge is a plain MAX, and the
estimator needs no threshold tuning — it is the industry default for
streaming distinct counts (per-day unique users, per-shard unique
tokens).

Register assignment uses the portable 60-bit md5 hash
(functions/text.py): register index j = h mod m, the remaining
w = floor(h / m) is a (60 - p)-bit value whose leading-zero rank is
``W - bitlen(w) + 1`` with ``bitlen = length(bin(w))`` — an exact
integer formulation (float log2 misrounds at exact powers of two) that
Spark's ``bin`` and DuckDB's ``bin`` compute identically, so an SQL
oracle replays every register bit-for-bit.

Estimator: alpha_m * m^2 / sum_j 2^(-M_j) with the standard
small-range correction (linear counting m*ln(m/V) when E <= 2.5m and
V = empty registers > 0).  The 2^60 hash space makes the large-range
correction unreachable.

Scale shape: build = one map-side-combinable (j, max rank) agg — m
rows out no matter the corpus; merge = elementwise MAX, which is
idempotent and commutative, so the streaming twin
(streaming/hll.py) needs NO batch-id watermark: redelivery is a
no-op by algebra (the Bloom OR-merge contract, not the CMS
addition-with-watermark contract).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tube_spark.functions.text import portable_hash60

_HASH_BITS = 60


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame, col: str, p: int = 8, seed: str = "hll"
) -> DataFrame:
    """The register frame ``(j, m_rank)`` — at most m = 2^p rows
    (absent registers are zero): one explode-free map +
    map-side-combinable max agg.  Null keys are skipped (they are not
    elements)."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    m = 1 << p
    w_bits = _HASH_BITS - p
    h = portable_hash60(
        F.concat_ws("|", F.lit(seed), F.col(col).cast("string"))
    )
    # rank = leading zeros of the (60-p)-bit suffix, + 1; bitlen via the
    # binary-string length (exact; w < 2^(60-p) by construction).
    # w uses the SQL `div` operator — INTEGER division; `/` would
    # promote the 60-bit hash to double and round away its low bits
    # (2^60 > 2^53), silently diverging from the oracle's exact `//`.
    # NOTE: j = h mod m uses the LOW bits for the register and the HIGH
    # bits for the rank — the opposite split from the paper's
    # presentation but the same independence argument under md5.
    w = F.expr(f"__hll_h div {m}")
    rank = F.when(
        w > 0, F.lit(w_bits) - F.length(F.bin(w)) + 1
    ).otherwise(F.lit(w_bits) + 1)
    return (
        df.filter(F.col(col).isNotNull())
        .select(h.alias("__hll_h"))
        .select(
            F.pmod("__hll_h", F.lit(m)).cast("int").alias("j"),
            rank.cast("int").alias("rank"),
        )
        .groupBy("j")
        .agg(F.max("rank").alias("m_rank"))
    )


def hll_estimate(registers: DataFrame, p: int = 8) -> DataFrame:
    """One row: ``(m, n_zero, estimate)`` from a register frame.
    ``estimate`` is rounded to 4 decimals (oracle portability; the
    sketch's own error floor is orders of magnitude above 1e-4)."""
    m = 1 << p
    agg = registers.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("m_rank"))).alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    n_zero = F.lit(m) - F.col("n_present")
    s = F.coalesce(F.col("s_present"), F.lit(0.0)) + n_zero.cast("double")
    raw = F.lit(_alpha(m) * m * m) / s
    est = F.when(
        (raw <= 2.5 * m) & (n_zero > 0),
        F.lit(float(m)) * F.log(F.lit(m).cast("double") / n_zero),
    ).otherwise(raw)
    return agg.select(
        F.lit(m).alias("m"),
        n_zero.cast("long").alias("n_zero"),
        F.round(est, 4).alias("estimate"),
    )


def hll_distinct(
    df: DataFrame, col: str, p: int = 8, seed: str = "hll"
) -> DataFrame:
    """Convenience: registers -> one-row estimate."""
    return hll_estimate(hll_registers(df, col, p, seed), p)


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Register frame of the UNION of the two underlying element sets:
    elementwise max — idempotent (merge(x, x) = x), so replays and
    overlapping shards are free."""
    return (
        a.unionByName(b).groupBy("j").agg(F.max("m_rank").alias("m_rank"))
    )


def hll_grouped(
    df: DataFrame, group_col: str, col: str, p: int = 8, seed: str = "hll"
) -> DataFrame:
    """Per-group distinct estimates ``(group, m, n_zero, estimate)`` —
    the GROUP BY form (per-source unique tokens, per-day unique users):
    one (group, j, max rank) agg, then per-group estimator arithmetic;
    state is m rows PER GROUP, never corpus-sized."""
    m = 1 << p
    w_bits = _HASH_BITS - p
    h = portable_hash60(
        F.concat_ws("|", F.lit(seed), F.col(col).cast("string"))
    )
    # integer `div` — see hll_registers for why `/` would be wrong
    w = F.expr(f"__hll_h div {m}")
    rank = F.when(
        w > 0, F.lit(w_bits) - F.length(F.bin(w)) + 1
    ).otherwise(F.lit(w_bits) + 1)
    regs = (
        df.filter(F.col(col).isNotNull())
        .select(F.col(group_col).alias("g"), h.alias("__hll_h"))
        .select(
            "g",
            F.pmod("__hll_h", F.lit(m)).cast("int").alias("j"),
            rank.cast("int").alias("rank"),
        )
        .groupBy("g", "j")
        .agg(F.max("rank").alias("m_rank"))
    )
    return hll_estimate_by(regs, "g", p).withColumnRenamed("g", group_col)


def hll_estimate_by(registers: DataFrame, group_col: str, p: int = 8) -> DataFrame:
    """Per-group estimates ``(group, m, n_zero, estimate)`` from a
    register frame ``(group, j, m_rank)`` — the estimator arithmetic
    shared by ``hll_grouped`` and any operator that maintains register
    frames itself (e.g. graphstats.hyperball's per-node ball
    counters)."""
    m = 1 << p
    per_g = registers.groupBy(group_col).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("m_rank"))).alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    n_zero = F.lit(m) - F.col("n_present")
    s = F.col("s_present") + n_zero.cast("double")
    raw = F.lit(_alpha(m) * m * m) / s
    est = F.when(
        (raw <= 2.5 * m) & (n_zero > 0),
        F.lit(float(m)) * F.log(F.lit(m).cast("double") / n_zero),
    ).otherwise(raw)
    return per_g.select(
        F.col(group_col),
        F.lit(m).alias("m"),
        n_zero.cast("long").alias("n_zero"),
        F.round(est, 4).alias("estimate"),
    )
