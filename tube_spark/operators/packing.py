"""Sequence packing for LLM training pipelines.

Two packing strategies, both distributed:

``chunk_concat``
    GPT-style concatenation: documents are laid end-to-end in a
    deterministic global order and the token stream is cut every
    ``seq_len`` tokens; documents may straddle sequence boundaries.
    Every document's placement ``[start_seq, end_seq, start_offset]``
    is a closed-form function of the exclusive global running token
    total.  That prefix sum is computed the same way
    ``operators/ranking.py`` computes global ranks: range-partition on
    the order key, per-partition token totals to the driver
    (#partitions rows — KBs), broadcast the cumulative offsets back,
    then a purely partition-local window — never a single-partition
    global sort.

``pack_first_fit``
    Whole-document packing: greedy first-fit-decreasing *within each
    partition* (the standard scale-out compromise — a global first-fit
    is inherently sequential).  Documents land in bins of capacity
    ``seq_len``; bins never overflow unless a single document alone
    exceeds the capacity.  Partitions pack independently, so bin ids
    are (partition, local_bin) pairs and the whole pass is map-only
    after one repartition.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tube_spark.functions.localrel import local_df


def chunk_concat(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    seq_len: int,
    order_col: str | None = None,
) -> DataFrame:
    """Assign each document its span in the concatenated token stream.

    Adds ``start_seq`` / ``end_seq`` (first and last sequence index the
    document's tokens fall into) and ``start_offset`` (position of the
    document's first token inside ``start_seq``).  Zero-token documents
    are dropped (they occupy no span).

    The global order is ``order_col`` (default: ``id_col``) — it must
    be unique for the layout to be well-defined.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    order = order_col or id_col
    n = F.col(token_count_col)
    spark = df.sparkSession

    # Range-partition on the order key and pin the layout (boundaries
    # are sampled; the offsets below are only valid for THIS layout).
    # localCheckpoint (not cache) pins the sampled range-partition
    # layout for both the totals collect and the final join, and its
    # blocks are released when the frame is GC'd — no storage-memory
    # leak across repeated calls in a long-lived session (same pattern
    # as operators/components.py).
    part = (
        df.filter(n > 0)
        .repartitionByRange(order)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    totals = part.groupBy("__pid").agg(F.sum(n).alias("t")).collect()
    offsets, acc = [], 0
    for row in sorted(totals, key=lambda r: r["__pid"]):
        offsets.append((row["__pid"], acc))
        acc += row["t"]
    if not offsets:
        empty = [
            (F.lit(None).cast("bigint").alias(c))
            for c in ("start_seq", "end_seq", "start_offset")
        ]
        return df.filter(n > 0).select(*df.columns, *empty)
    off = local_df(spark, offsets, "__pid int, __off long")

    w = (
        Window.partitionBy("__pid")
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # exclusive prefix sum = partition offset + local inclusive - own
    cum_before = F.col("__off") + F.sum(n).over(w) - n
    return (
        part.join(F.broadcast(off), on="__pid")
        .withColumn("__before", cum_before)
        .select(
            *df.columns,
            (F.col("__before") / seq_len).cast("bigint").alias("start_seq"),
            ((F.col("__before") + n - 1) / seq_len).cast("bigint").alias("end_seq"),
            (F.col("__before") % seq_len).alias("start_offset"),
        )
    )


def pack_first_fit(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    seq_len: int,
    partitions: int | None = None,
) -> DataFrame:
    """Greedy first-fit-decreasing whole-document packing per partition.

    Returns the input columns plus ``bin_id`` (string
    ``"<partition>/<local bin>"``) and ``bin_fill`` (tokens already in
    the bin including this document).  Oversized documents (count >
    ``seq_len``) get a bin of their own.

    Arrow-batched ``mapInPandas`` over hash-repartitioned input: each
    task packs only its own partition — no global coordination, memory
    bounded by the partition's open-bin table.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    import pandas as pd  # local import: only the executor needs it

    part = df.repartition(partitions) if partitions else df
    cols = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in part.schema.fields
    )
    schema = f"{cols}, bin_id string, bin_fill bigint"

    def _pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        chunks = list(batches)
        if not chunks:  # empty partition: pd.concat([]) would raise
            return
        whole = pd.concat(chunks, ignore_index=True)
        if whole.empty:
            return
        whole = whole.sort_values(
            [token_count_col, id_col], ascending=[False, True]
        ).reset_index(drop=True)
        fills: list[int] = []  # current fill per local bin
        bin_ids, bin_fills = [], []
        for cnt in whole[token_count_col].astype("int64"):
            # first-fit over open bins; linear scan is fine because the
            # open-bin list stays small (decreasing sizes fill early
            # bins first and large docs close bins immediately)
            for b, fill in enumerate(fills):
                if fill + cnt <= seq_len:
                    fills[b] = fill + cnt
                    break
            else:
                b = len(fills)
                fills.append(cnt)
            bin_ids.append(f"{pid}/{b}")
            bin_fills.append(fills[b])
        whole["bin_id"] = bin_ids
        whole["bin_fill"] = bin_fills
        yield whole

    return part.mapInPandas(_pack, schema=schema)
