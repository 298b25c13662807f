"""Relative-error quantile sketch with integer-exact log buckets — the
DDSketch shape (Masson, Rim, Lee, VLDB 2019) on a power-of-two mapping.

Completes the sketch family's last gap: HLL answers "how many
distinct", CMS "how often", Misra-Gries "which are frequent", Bloom
"was it seen", KMV "how similar" — this answers "what is the p50 /
p90 / p99" of a value column in bounded state.  Exact quantiles need a
full sort (a corpus-wide shuffle and corpus-sized state per group);
the sketch keeps one count per logarithmic bucket — a few hundred rows
per group however many values stream through — and guarantees the
returned estimate is within one bucket width of the true quantile,
i.e. bounded RELATIVE error (~1.1% at the default 32 sub-buckets per
octave).

The mapping is the paper's log-gamma binning computed WITHOUT floats:
values quantize to integer micro-units (the cusum_drift rule: float
window arithmetic diverges across engines; integers are exact under
any association), the octave is the micro-value's exact bit length
(``length(bin(v))`` — the HLL rule: float log2 misrounds at powers of
two), and the sub-bucket is the next ``sub_bits`` mantissa bits.
Micro-values below 2^sub_bits get EXACT singleton buckets (tiny values
have no mantissa bits to spare — the paper's contiguous small-key
region).  Bucket index, cumulative rank, and the bucket-midpoint
estimate are all integer arithmetic, so a DuckDB oracle replays the
sketch bit-for-bit — no float caveats anywhere.

Contract: nulls and NEGATIVE values are filtered out up front
(documented, like cusum's null rule — signed data should be split by
sign or shifted by the caller); zeros occupy the dedicated bottom
bucket (-1), per the paper's zero bin.

Scale shape: build = one map-side-combinable (group, bucket) count —
state is buckets-per-group, never corpus-sized; merge = count SUM
(additive, NOT idempotent — a streaming twin needs the batch-id
watermark contract, unlike HLL's max-merge); quantile extraction = a
per-group cumulative window over at most a few hundred bucket rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SCALE = 1_000_000  # micro-unit quantization (6 decimals)


def _bucket_expr(vi, sub_bits: int):
    """Integer bucket index of a non-negative micro-value column:
    -1 for zero, the value itself below 2^sub_bits, else
    (octave - sub_bits + 1) * 2^sub_bits + mantissa_bits."""
    m = sub_bits
    two_m = 1 << m
    e = F.length(F.bin(vi)) - 1  # exact floor(log2(vi)) for vi > 0
    # vi >> (e - m): dynamic shift needs call_function (F.shiftright
    # requires a literal shift)
    top = F.call_function(
        "shiftright", vi, (e - F.lit(m)).cast("int")
    )
    return (
        F.when(vi <= 0, F.lit(-1))
        .when(vi < two_m, vi)
        .otherwise((e - m + 1) * two_m + (top - two_m))
        .cast("long")
    )


def _estimate_expr(bucket, sub_bits: int):
    """Midpoint (floor) of the bucket's micro-value range, /1e6: the
    deterministic representative the oracle reproduces exactly."""
    m = sub_bits
    two_m = 1 << m
    o = F.floor(bucket / two_m).cast("long")  # bucket >= two_m here
    s = bucket - o * two_m
    width = F.call_function(
        "shiftleft", F.lit(1).cast("long"), (o - 1).cast("int")
    )  # 2^(e - m), e = o + m - 1
    lo = (two_m + s) * width
    hi = lo + width - 1
    mid = F.floor((lo + hi) / 2).cast("long")
    return (
        F.when(bucket <= F.lit(-1), F.lit(0.0))
        .when(bucket < two_m, bucket.cast("double") / _SCALE)
        .otherwise(mid.cast("double") / _SCALE)
    )


def ddsketch_buckets(
    df: DataFrame,
    group_col: str,
    value_col: str,
    sub_bits: int = 5,
) -> DataFrame:
    """The sketch state ``(group, bucket, cnt)``: one
    map-side-combinable count per logarithmic bucket."""
    if not 1 <= sub_bits <= 12:
        raise ValueError(f"sub_bits must be in [1, 12], got {sub_bits}")
    vi = F.round(F.col(value_col) * _SCALE).cast("long")
    return (
        df.filter(F.col(value_col).isNotNull() & (F.col(value_col) >= 0))
        .select(
            F.col(group_col).alias("g"),
            _bucket_expr(vi, sub_bits).alias("bucket"),
        )
        .groupBy("g", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumnRenamed("g", group_col)
    )


def ddsketch_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Sketch of the concatenated inputs: counts ADD (exact — the
    merged sketch is bit-identical to building over the union, unlike
    approximate mergeables).  Addition is not idempotent: replay
    protection is the caller's batch-watermark job (the CMS contract,
    not HLL's)."""
    cols = a.columns
    return (
        a.unionByName(b)
        .groupBy(*[c for c in cols if c != "cnt"])
        .agg(F.sum("cnt").alias("cnt"))
    )


def ddsketch_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: Sequence[float] = (0.5, 0.9, 0.99),
    sub_bits: int = 5,
) -> DataFrame:
    """Per-group quantile estimates ``(group, q, est_value, n_values)``
    from the bucket sketch: rank ``ceil(q * n)`` selected by a
    cumulative count over bucket order, estimate = the bucket's
    integer midpoint.  ``est_value`` is within one bucket width of the
    exact quantile (relative error ~(2^(1/2^sub_bits) - 1)/2)."""
    for q in quantiles:
        if not 0 < q <= 1:
            raise ValueError(f"quantiles must be in (0, 1], got {q}")
    buckets = ddsketch_buckets(df, group_col, value_col, sub_bits)
    w = (
        Window.partitionBy(group_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = buckets.select(
        group_col,
        "bucket",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(Window.partitionBy(group_col)).alias("n"),
    )
    qf = F.array(*[F.lit(float(q)) for q in quantiles])
    ranked = cum.select(
        group_col,
        "bucket",
        "cum",
        "n",
        F.explode(qf).alias("q"),
    ).filter(F.col("cum") >= F.ceil(F.col("q") * F.col("n")))
    first = ranked.groupBy(group_col, "q").agg(
        F.min("bucket").alias("bucket"), F.max("n").alias("n_values")
    )
    return first.select(
        group_col,
        F.round("q", 4).alias("q"),
        F.round(_estimate_expr(F.col("bucket"), sub_bits), 6).alias(
            "est_value"
        ),
        F.col("n_values"),
    )
