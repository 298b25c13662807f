"""Distributed global ranking — the scale path for ORDER BY-the-world.

A plain ``row_number() OVER (ORDER BY …)`` (no PARTITION BY) collapses
the whole dataset into ONE task: at 100 TB that single sort partition is
the job.  The classic fix (TeraSort's) is implemented here with
DataFrame ops:

1. ``repartitionByRange`` on the order key — Spark samples range
   boundaries, so partition *p* holds keys strictly before partition
   *p+1*'s;
2. one tiny job counts rows per partition (#partitions rows to the
   driver — KBs even with 10k partitions);
3. every partition ranks **locally** (``row_number`` partitioned by
   ``spark_partition_id()`` — thousands of concurrent windows instead
   of one) and adds its global offset, broadcast-joined on partition id.

The range-partitioned frame is cached so the partition layout the
offsets were counted against is the layout the final plan ranks over
(range boundaries are sampled, so a re-execution could otherwise draw
different partition ids).  That one materialization replaces the
single-reducer global sort — the right trade at any scale.

``ntile_distributed`` derives SQL NTILE semantics from the global rank
arithmetically (first ``n mod k`` tiles get one extra row), so its
output is bit-identical to ``ntile(k) OVER (ORDER BY …)`` while never
shuffling to one partition.

The order columns must form a total order (add a unique tiebreaker);
otherwise ranks among ties are nondeterministic — same as SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tube_spark.functions.localrel import local_df

_PID = "_gr_pid"
_OFF = "_gr_offset"


def _ranked_with_total(
    df: DataFrame,
    order_cols: list[str | Column],
    num_partitions: int | None,
    rank_col: str,
) -> tuple[DataFrame, int]:
    spark = df.sparkSession
    part = (
        df.repartitionByRange(num_partitions, *order_cols)
        if num_partitions
        else df.repartitionByRange(*order_cols)
    )
    part = part.withColumn(_PID, F.spark_partition_id()).cache()

    counts = part.groupBy(_PID).agg(F.count(F.lit(1)).alias("n")).collect()
    offsets, acc = [], 0
    for row in sorted(counts, key=lambda r: r[_PID]):
        offsets.append((row[_PID], acc))
        acc += row["n"]
    if not offsets:  # empty input: rank column only
        return df.withColumn(rank_col, F.lit(None).cast("long")), 0
    off = local_df(spark, offsets, f"{_PID} int, {_OFF} long")

    w = Window.partitionBy(_PID).orderBy(*order_cols)
    ranked = (
        part.join(F.broadcast(off), on=_PID)
        .withColumn(rank_col, F.row_number().over(w) + F.col(_OFF))
        .drop(_PID, _OFF)
    )
    return ranked, acc


def global_ranked(
    df: DataFrame,
    order_cols: list[str | Column],
    num_partitions: int | None = None,
    rank_col: str = "rank",
) -> DataFrame:
    """``df`` + a 1-based global row number over ``order_cols``,
    computed without a single-partition window."""
    ranked, _ = _ranked_with_total(df, order_cols, num_partitions, rank_col)
    return ranked


def ntile_distributed(
    df: DataFrame,
    k: int,
    order_cols: list[str | Column],
    num_partitions: int | None = None,
    tile_col: str = "tile",
) -> DataFrame:
    """SQL ``ntile(k) OVER (ORDER BY order_cols)`` without the global
    window: tile is pure arithmetic on the distributed global rank.

    NTILE remainder rule: with n rows, q = n div k, r = n mod k, tiles
    1..r hold q+1 rows and tiles r+1..k hold q rows.
    """
    ranked, total = _ranked_with_total(df, order_cols, num_partitions, "_gr_rank")
    if total == 0:
        return ranked.withColumn(tile_col, F.lit(None).cast("int")).drop("_gr_rank")
    q, r = divmod(total, k)
    rn = F.col("_gr_rank")
    if q == 0:
        tile = rn  # fewer rows than tiles: row i is tile i
    else:
        big = r * (q + 1)  # rows living in the (q+1)-sized tiles
        tile = (
            F.floor(
                F.when(rn <= F.lit(big), (rn - 1) / F.lit(q + 1)).otherwise(
                    F.lit(r) + (rn - 1 - F.lit(big)) / F.lit(q)
                )
            )
            + 1
        )
    return ranked.withColumn(tile_col, tile.cast("int")).drop("_gr_rank")


def grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    descending: bool = True,
    tiebreak_col: str | None = None,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k rows per group WITHOUT funneling each group through one
    window task.

    ``row_number() OVER (PARTITION BY group ORDER BY v)`` sends every
    row of a group to a single task — the hot group IS the job at
    100 TB.  Here selection is two-phase (the ``stratified_fixed_k``
    pattern generalized to an arbitrary order column):

    1. per-(input-partition, group) top-k via a map-side-complete
       ``groupBy`` keyed on ``spark_partition_id()`` — each group slice
       lives in one partition, so the partial aggregate finishes before
       the shuffle and at most k x partitions (order-key, tiebreak)
       entries move per group;
    2. global top-k per group over that bounded candidate set, then a
       broadcast semi-join retrieves the surviving rows' payloads.

    ``tiebreak_col`` (default: first group-external column — pass one
    explicitly for a guaranteed total order) makes ranks deterministic.
    Result is identical to the naive window (equivalence-tested), and
    stays correct when tiebreak values repeat (ADVICE r4): retrieval
    matches on (group, ORDER VALUE, tiebreak) — not tiebreak alone —
    against the DISTINCT winning tuples, and a final ``row_number``
    over the retrieved subset (≤ ~k rows per group, so the window is
    over candidates, never the full group) assigns ranks and trims
    exact duplicates back to k.  Rows tied on (order, tiebreak) rank
    arbitrarily — the same nondeterminism the naive window has.

    Constraints: ``descending=True`` negates the order key, so the
    order column must be numeric (ascending works for any sortable
    type); rows with NULL order values are excluded (a window would
    rank them after the real top-k — they can never be winners).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if not group_cols:
        raise ValueError("grouped_topk needs at least one group column")
    if tiebreak_col is None:
        candidates = [c for c in df.columns if c not in group_cols and c != order_col]
        if not candidates:
            raise ValueError("no tiebreak column available — pass tiebreak_col")
        tiebreak_col = candidates[0]

    v = F.col(order_col)
    key = (-v if descending else v).alias("__v")
    keyed = df.filter(v.isNotNull()).select(
        *[F.col(c) for c in group_cols],
        key,
        F.col(tiebreak_col).alias("__t"),
        F.spark_partition_id().alias("__pid"),
    )
    topk_local = (
        keyed.groupBy(*group_cols, "__pid")
        .agg(
            F.slice(
                F.sort_array(F.collect_list(F.struct("__v", "__t"))), 1, k
            ).alias("__top")
        )
        .select(*group_cols, F.explode("__top").alias("__e"))
        .select(*group_cols, F.col("__e.__v").alias("__v"), F.col("__e.__t").alias("__t"))
    )
    winners = (
        topk_local.groupBy(*group_cols)
        .agg(
            F.slice(
                F.sort_array(F.collect_list(F.struct("__v", "__t"))), 1, k
            ).alias("__top")
        )
        .select(*group_cols, F.explode("__top").alias("__e"))
        .select(
            *[F.col(c).alias(f"__g_{c}") for c in group_cols],
            F.col("__e.__v").alias("__wv"),
            F.col("__e.__t").alias("__wt"),
        )
        .distinct()
    )
    order_key = -v if descending else F.col(order_col)
    # eqNullSafe on the tiebreak AND the group keys: a NULL tiebreak (or
    # a NULL group key — groupBy keeps NULL groups, so they can win)
    # still identifies its winner row; plain == would silently drop it.
    cond = (order_key == F.col("__wv")) & (
        F.col(tiebreak_col).eqNullSafe(F.col("__wt"))
    )
    for c in group_cols:
        cond = cond & F.col(c).eqNullSafe(F.col(f"__g_{c}"))
    retrieved = df.join(F.broadcast(winners), on=cond, how="inner").drop(
        "__wv", "__wt", *[f"__g_{c}" for c in group_cols]
    )
    # Tiny window: input is the retrieved candidate subset (≤ ~k rows
    # per group), not the full group — this is rank assignment, not
    # the selection the two-phase plan exists to avoid.
    w = Window.partitionBy(*group_cols).orderBy(order_key, F.col(tiebreak_col))
    return (
        retrieved.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= F.lit(k))
    )
