"""Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005):
point-frequency estimates from a depth x width counter grid.

Complements operators/heavyhitters.py: Misra-Gries answers "WHICH keys
are frequent" (a k-row candidate set with per-key error bounds); the
CMS answers "how often is THIS key" for any key, without storing keys
at all — d*w int64 counters total.  The estimate for key x is
``min_r grid[r][h_r(x)]``, which NEVER undercounts (every row holds
the true count plus nonnegative collision mass) and overcounts by more
than eps*N with probability at most delta, where eps = e/width and
delta = e^-depth — the classic (eps, delta) guarantee the tests pin.

Scale shape: build = one explode(depth) + one map-side-combinable
(row, bucket) count over the corpus — the grid is d*w rows no matter
the corpus; estimate = a broadcast join of the probe keys' d buckets
onto the grid + one min agg.  Counters are SUMS, so grids merge by
addition (the DSIR/streaming-profile mergeable-state contract —
addition is NOT redelivery-idempotent, so the streaming twin carries a
batch_id watermark).

Hashing is the portable 60-bit md5 (functions/text.py), so an SQL
oracle replays every counter and every probe bit-for-bit — the Bloom
gate's differential story (the two structures are duals: Bloom
compresses membership, CMS compresses frequency).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tube_spark.functions.text import portable_hash60


def cms_params(eps: float, delta: float) -> tuple[int, int]:
    """Standard sizing: width = ceil(e/eps), depth = ceil(ln(1/delta))
    — estimates overshoot truth by more than eps*N with probability at
    most delta."""
    if not 0 < eps < 1:
        raise ValueError(f"eps must be in (0, 1), got {eps}")
    if not 0 < delta < 1:
        raise ValueError(f"delta must be in (0, 1), got {delta}")
    return math.ceil(math.e / eps), math.ceil(math.log(1.0 / delta))


def _bucket(col: Column, r: int, width: int, seed: str) -> Column:
    return portable_hash60(
        F.concat_ws("|", F.lit(seed), F.lit(str(r)), col.cast("string"))
    ) % F.lit(width)


def cms_build(
    df: DataFrame,
    col: str,
    width: int,
    depth: int,
    seed: str = "cms",
    weight_col: str | None = None,
) -> DataFrame:
    """The counter grid as a ``(r, b, c)`` frame (missing cells are
    zero): one explode(depth) + one map-side-combinable keyed count —
    d*w rows out regardless of input size.  ``weight_col`` counts each
    row with a weight (e.g. token counts) instead of 1.  Null keys are
    skipped (they cannot be probed)."""
    if width < 1 or depth < 1:
        raise ValueError(f"width/depth must be >= 1, got {width}/{depth}")
    src = df.filter(F.col(col).isNotNull())
    rows = src.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        _bucket(F.col(col), r, width, seed).alias("b"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb"),
        (
            F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
        ).alias("wt"),
    )
    return (
        rows.groupBy(F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
        .agg(F.sum("wt").alias("c"))
    )


def cms_estimate(
    probes: DataFrame,
    key_col: str,
    grid: DataFrame,
    width: int,
    depth: int,
    seed: str = "cms",
    est_col: str = "est",
) -> DataFrame:
    """probes + ``est_col`` = min over the key's d grid cells — never
    below the true count.  The grid (d*w rows) broadcasts; one keyed
    min agg per probe set."""
    exploded = probes.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        _bucket(F.col(key_col), r, width, seed).alias("b"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(key_col, F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
    joined = exploded.join(F.broadcast(grid), ["r", "b"], "left")
    est = joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("c"), F.lit(0))).alias(est_col)
    )
    return probes.join(est, key_col, "left").fillna({est_col: 0})


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Grid of the union stream: cell-wise addition (counters are
    sums)."""
    return (
        a.unionByName(b)
        .groupBy("r", "b")
        .agg(F.sum("c").alias("c"))
    )
