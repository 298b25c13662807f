"""Range (band/interval) join — pairs where the right time falls in a
window around the left time.

Spark compiles ``l JOIN r ON r.t BETWEEN l.t+lo AND l.t+hi`` (no
equi-key) to BroadcastNestedLoopJoin / cartesian — quadratic.  The
scalable formulation is the classic *bucketed band join*:

* bucket width W = hi − lo, so a left row's admissible band
  ``[l.t+lo, l.t+hi]`` overlaps AT MOST TWO consecutive buckets;
* explode each left row to those ≤2 bucket ids (a 2× copy of the
  *smaller* conceptual unit, never a per-pair blowup);
* equi-join on (key, bucket) — a plain shuffled hash/sort-merge join
  Catalyst and AQE know how to size — then apply the exact BETWEEN as
  a post-filter.

Cost: one shuffle of 2|L| + |R| rows; work per bucket is |L_b|·|R_b|,
bounded by the band population (what the answer itself costs), not by
|L|·|R|.  An additional equi-key (user id, device id…) tightens the
buckets further and is the normal case at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_B = "_rj_bucket"


def interval_point_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    lower: float,
    upper: float,
    on: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Pairs (left × right) with ``right_time ∈ [left_time+lower,
    left_time+upper]`` (numeric/epoch columns), optionally also matching
    an equi-key ``on``.  ``how="left"`` keeps unmatched left rows with
    null right payload (right columns must not collide with left's;
    fully-duplicate left rows collapse to one in the unmatched branch —
    give left rows a unique id when that matters).
    """
    if upper <= lower:
        raise ValueError("upper must be > lower")
    clash = (set(right.columns) - {on}) & set(left.columns)
    if clash:
        raise ValueError(f"right columns collide with left: {sorted(clash)}")
    w = float(upper - lower)

    lo_b = F.floor((F.col(left_time) + F.lit(lower)) / F.lit(w))
    hi_b = F.floor((F.col(left_time) + F.lit(upper)) / F.lit(w))
    lft = left.withColumn(
        _B, F.explode(F.array_distinct(F.array(lo_b, hi_b)))
    )
    rgt = right.withColumn(_B, F.floor(F.col(right_time) / F.lit(w)))

    keys = [_B] if on is None else [on, _B]
    cond = F.col(right_time).between(
        F.col(left_time) + F.lit(lower), F.col(left_time) + F.lit(upper)
    )
    if how == "inner":
        return lft.join(rgt, on=keys).filter(cond).drop(_B)
    if how == "left":
        matched = lft.join(rgt, on=keys).filter(cond).drop(_B)
        rpay = [c for c in right.columns if c != on]
        missing = lft.drop(_B).dropDuplicates(left.columns).join(
            matched.select(*left.columns).dropDuplicates(), on=left.columns, how="left_anti"
        )
        for c in rpay:
            missing = missing.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
        return matched.unionByName(missing)
    raise ValueError(f"how must be inner|left, got {how!r}")
