"""Incremental-ETL merge operators: keyed upsert and SCD2 history.

The reference pipeline rebuilds every index from scratch on each run
(``tube/etl/indexers/base/translator.py`` re-translates the full graph);
there is no incremental path.  At 100 TB a full rebuild per delivery is
the dominant cost, so this module adds the two standard incremental
primitives as plain DataFrame transforms:

``merge_upsert``
    Delta-style MERGE (upsert + optional delete) expressed as
    anti-join + union instead of a full-outer join: the target is
    shuffled once on the key, the (much smaller) delta once, and no
    wide matched-row is ever materialized.  With a bucketed target
    table the anti-join becomes bucket-local and the merge is
    shuffle-free on the big side.

``scd2``
    Slowly-changing-dimension type-2 historization: a change log
    (key, ts, attrs) becomes validity intervals ``[valid_from,
    valid_to)`` with an ``is_current`` flag.  One shuffle + one
    per-partition sort (a single window spec); optional collapse of
    consecutive no-op versions via ``lag`` over the same window, so
    collapsing adds zero extra shuffles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    delete_flag: str | None = None,
) -> DataFrame:
    """Merge ``source`` rows into ``target`` by ``keys``.

    Semantics (same contract as ``MERGE INTO t USING s ON keys``):

    - key in both           -> the source row wins (UPDATE = replace)
    - key only in source    -> row is inserted
    - key only in target    -> row is kept
    - ``delete_flag`` true  -> key is removed from the result

    ``source`` must have at most one row per key (enforced nowhere —
    at 100 TB a global uniqueness check is its own job; see
    ``tube_spark.operators.dedup`` for that) and must carry every
    target column; ``delete_flag`` may be an extra bool column.
    """
    keys = list(keys)
    missing = [c for c in target.columns if c not in source.columns]
    if missing:
        raise ValueError(f"source is missing target columns: {missing}")

    # Only the keys of the delta are needed to suppress stale target
    # rows; pruning to them keeps the anti-join build side narrow (and
    # broadcastable when the delta is small).
    kept = target.join(source.select(*keys), keys, "left_anti")
    incoming = source
    if delete_flag is not None:
        incoming = source.filter(
            ~F.coalesce(F.col(delete_flag), F.lit(False))
        ).drop(delete_flag)
    return kept.unionByName(incoming.select(*target.columns))


def scd2(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    collapse: bool = False,
) -> DataFrame:
    """Build SCD2 validity intervals from a change log.

    Returns one row per version: ``keys + attr_cols + valid_from
    (= ts_col) + valid_to (next version's ts, NULL for the latest) +
    is_current``.  With ``collapse=True``, versions whose ``attr_cols``
    equal the previous version's are dropped first, so intervals span
    no-op deliveries.

    Both the collapse ``lag`` and the interval ``lead`` ride the same
    ``(keys, ts)`` window spec: Catalyst plans ONE Exchange + Sort for
    the whole historization regardless of ``collapse``.
    """
    keys = list(keys)
    attrs = list(attr_cols)
    w = Window.partitionBy(*keys).orderBy(ts_col)

    if collapse:
        payload = F.struct(*[F.col(c) for c in attrs])
        prev = F.lag(payload).over(w)
        # First version per key has prev NULL -> always kept.  A struct
        # equality compares all attrs at once (null-safe via <=>).
        df = (
            df.withColumn("__prev", prev)
            .filter(~F.col("__prev").eqNullSafe(payload))
            .drop("__prev")
        )
        w = Window.partitionBy(*keys).orderBy(ts_col)

    valid_to = F.lead(ts_col).over(w)
    return (
        df.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", valid_to)
        .withColumn("is_current", valid_to.isNull())
        .select(*keys, *attrs, "valid_from", "valid_to", "is_current")
    )
