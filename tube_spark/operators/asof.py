"""As-of join — for each left row, the latest right row at-or-before it.

Spark has no ASOF JOIN (DuckDB, Pandas, kdb do).  The naive emulation —
equi-join on key + ``r.t <= l.t`` + argmax — materializes every
(left, right-before-it) pair: quadratic per key, hopeless at scale.

The scalable plan, expressed entirely in DataFrame ops, is the
union-and-carry-forward trick:

1. union right rows (tagged 0) and left rows (tagged 1) into one frame
   aligned on (key, t, tag);
2. one window per key ordered by (t, tag): ``last_value(right payload,
   ignoreNulls)`` carries the most recent right row forward over the
   timeline.  The payload travels as ONE struct — carrying columns
   independently would let a NULL payload column borrow its value from
   an *older* right row, composing a row that never existed (DuckDB
   ASOF returns the matched row's NULL instead);
3. keep only left rows — each now holds exactly the right row that was
   live at its timestamp.

Cost: ONE shuffle of |L|+|R| rows on the join key and a per-key sort —
same shape as a regular sort-merge join, independent of how many right
rows precede each left row.  Ties (r.t == l.t): tag orders right rows
first, so the join is inclusive (<=) — DuckDB ASOF semantics.

Rows whose key never saw an earlier right row keep nulls (left join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG = "_asof_tag"
_T = "_asof_t"
_PAY = "_asof_pay"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: every ``left`` row + the payload of the latest
    ``right`` row with ``right_time <= left_time`` for the same ``on``
    key (``direction="forward"``: earliest right row at-or-after).

    Right payload columns must not collide with left column names
    (rename beforehand) — mirrors ``pandas.merge_asof``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    rpay = [c for c in right.columns if c not in (on, right_time)]
    clash = set(rpay) & set(left.columns)
    if clash:
        raise ValueError(f"right payload columns collide with left: {sorted(clash)}")

    # The whole right payload rides in ONE struct: non-null for every
    # right row (even when all its members are NULL), NULL for left
    # rows.  ``last(_PAY, ignorenulls=True)`` then carries right rows
    # atomically — a NULL member stays NULL instead of being back-filled
    # per-column from an older right row.
    pay_t = right.select(
        F.struct(*[F.col(c) for c in rpay]).alias(_PAY)
    ).schema[0].dataType.simpleString()
    r = right.select(
        F.col(on),
        F.col(right_time).alias(_T),
        F.lit(0).alias(_TAG),
        F.struct(*[F.col(c) for c in rpay]).alias(_PAY),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(f"_l_{c}") for c in left.columns],
    )
    l = left.select(  # noqa: E741
        F.col(on),
        F.col(left_time).alias(_T),
        F.lit(1).alias(_TAG),
        F.lit(None).cast(pay_t).alias(_PAY),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    both = r.unionByName(l)

    order = F.col(_T).asc() if direction == "backward" else F.col(_T).desc()
    w = (
        Window.partitionBy(on)
        .orderBy(order, F.col(_TAG).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(_PAY, ignorenulls=True).over(w).alias(_PAY)

    out = both.select(
        F.col(on), F.col(_T), F.col(_TAG), carried,
        *[F.col(f"_l_{c}") for c in left.columns if c != on],
    ).filter(F.col(_TAG) == 1)
    return out.select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns if c != on],
        F.col(on),
        *[F.col(_PAY).getField(c).alias(c) for c in rpay],
    ).drop(_T, _TAG)
