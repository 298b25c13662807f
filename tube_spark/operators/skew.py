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


def adaptive_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    min_share: float = 0.01,
    salt: int = 16,
    hot_keys: list | None = None,
) -> DataFrame:
    """Hybrid skew join: detect the big side's hot keys (Misra-Gries +
    exact re-count, ``operators/heavyhitters.py``) and salt ONLY those;
    everything else takes the plain equi-join.

    The failure mode this removes: blanket salting replicates the
    whole small side ``salt``x even though 99.9% of keys never needed
    it; blanket plain joins let one hot key own a task for hours.  The
    split routes each row to the right strategy:

      big  --> hot?  --(yes)--> salted join against replicated small-hot
               --(no)---> plain join against small
      union

    Hot-key membership is a broadcast literal set (bounded: at most
    1/min_share keys can exceed ``min_share``), so the router is a
    map-side filter.  Pass ``hot_keys`` explicitly to skip detection
    (e.g. detected yesterday, or from the streaming summary's
    guaranteed set).  Only inner/left, like ``salted_join``.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"adaptive_join supports how='inner'|'left', got {how!r}"
        )
    if hot_keys is None:
        from tube_spark.operators.heavyhitters import hot_key_values

        hot_keys = hot_key_values(big, on, min_share)
    if not hot_keys:
        return big.join(small, on=on, how=how)
    is_hot = F.col(on).isin(hot_keys)
    cold = big.filter(~is_hot | F.col(on).isNull()).join(
        small, on=on, how=how
    )
    hot = salted_join(
        big.filter(is_hot), small.filter(F.col(on).isin(hot_keys)),
        on=on, salt=salt, how=how,
    )
    return cold.unionByName(hot)
