"""Skew-mitigation utilities: salted joins for hot keys.

AQE's skew-join splitting handles most cases at runtime; salting is the
explicit fallback for EXTREME hot keys (one key holding >10% of a 100 TB
fact table) or for aggregations, which AQE does not split.

``salted_join``: replicate the small side k× (one copy per salt) and
scatter the big side across k sub-keys — the hot key's rows spread over
k reducers instead of one.

``salted_count``: two-phase aggregation — count per (key, salt), then
sum per key.  The first shuffle spreads the hot key across k partitions;
the second moves only k rows per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted across ``salt`` sub-keys.

    Only ``inner`` and ``left`` are supported: the small side is
    replicated ``salt``×, so right/full outer would emit each unmatched
    small-side row once PER SALT COPY — silent row duplication.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: the "
            "small side is replicated per salt, so right/full outer would "
            "duplicate unmatched small-side rows"
        )
    big_s = big.withColumn("__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)))
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = big_s.join(small_s, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def salted_count(df: DataFrame, key: str, salt: int = 16) -> DataFrame:
    """Per-key row count via two-phase salted aggregation.

    Equivalent to ``df.groupBy(key).count()`` but the hot key's rows
    first combine within ``salt`` sub-groups.  (Spark's map-side partial
    aggregation usually achieves the same; this is the explicit form for
    when the hot key dominates entire input partitions.)"""
    phase1 = (
        df.withColumn("__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)))
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    return phase1.groupBy(key).agg(F.sum("__c").cast("long").alias("count"))
