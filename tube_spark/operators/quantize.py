"""Scalar int8 quantization of embedding columns.

Embedding stores are float32 arrays; serving and training-data
pipelines routinely quantize them to int8 (4x smaller, SIMD-friendly)
with per-DIMENSION affine parameters: for dimension d with corpus
range [min_d, max_d],

    code = floor((x - min_d) / scale_d + 0.5) - 127,
    scale_d = (max_d - min_d) / 254          (codes in [-127, +127])

``floor(x + 0.5)`` is used instead of round() so the arithmetic is
bit-reproducible across engines (round-half-even vs half-up varies).
Constant dimensions (max == min) quantize to code 0.

Scale shape: the per-dimension ranges are one posexplode + groupBy(pos)
aggregation — the result is ``dim`` rows, collected and re-broadcast as
literal arrays into a map-only quantize pass.  Nothing corpus-sized
ever reaches the driver, and the quantize/dequantize steps are pure
whole-array expressions (zip_with/transform) — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dimension_ranges(
    df: DataFrame, vec_col: str = "embedding"
) -> list[tuple[float, float]]:
    """[(min_d, max_d)] per dimension — dim rows via one shuffle."""
    rows = (
        df.select(F.posexplode(vec_col).alias("pos", "x"))
        .groupBy("pos")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .collect()
    )
    return [
        (float(r["lo"]), float(r["hi"])) for r in sorted(rows, key=lambda r: r["pos"])
    ]


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ranges: list[tuple[float, float]] | None = None,
) -> DataFrame:
    """(id, codes array<int>, n_dims) — int8-range codes in [-127, 127].

    ``ranges`` may be passed (e.g. from a training corpus) so new data
    quantizes with frozen parameters; by default they are computed from
    ``df`` itself.
    """
    if ranges is None:
        ranges = dimension_ranges(df, vec_col)
    lo = F.array(*[F.lit(l) for l, _ in ranges])
    scale = F.array(
        *[F.lit((h - l) / 254.0 if h > l else 0.0) for l, h in ranges]
    )
    # zip (value, dim-index) so each element picks its own parameters
    idx = F.transform(F.col(vec_col), lambda _, i: i)
    code = F.zip_with(
        F.col(vec_col),
        idx,
        lambda x, i: F.when(
            F.element_at(scale, i + 1) > 0,
            F.floor(
                (x.cast("double") - F.element_at(lo, i + 1))
                / F.element_at(scale, i + 1)
                + F.lit(0.5)
            ).cast("int")
            - F.lit(127),
        ).otherwise(F.lit(0)),
    )
    return df.select(
        F.col(id_col),
        code.alias("codes"),
        F.size(vec_col).cast("long").alias("n_dims"),
    )


def dequantize_codes(
    df: DataFrame,
    ranges: list[tuple[float, float]],
    id_col: str = "vec_id",
    codes_col: str = "codes",
) -> DataFrame:
    """(id, vector array<double>) — inverse of ``quantize_embeddings``
    up to scale/2 per dimension."""
    lo = F.array(*[F.lit(l) for l, _ in ranges])
    scale = F.array(
        *[F.lit((h - l) / 254.0 if h > l else 0.0) for l, h in ranges]
    )
    idx = F.transform(F.col(codes_col), lambda _, i: i)
    vec = F.zip_with(
        F.col(codes_col),
        idx,
        lambda c, i: (c.cast("double") + 127.0) * F.element_at(scale, i + 1)
        + F.element_at(lo, i + 1),
    )
    return df.select(F.col(id_col), vec.alias("vector"))
