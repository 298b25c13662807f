"""Data-layout optimization: Z-order clustered writes + file skipping.

At 100 TB the fastest scan is the one that never happens: parquet
readers prune whole files/row-groups with footer min/max statistics,
but the statistics only discriminate if the data is CLUSTERED on the
filter columns.  A single ``sortWithinPartitions`` clusters one column;
multi-dimensional workloads (filter sometimes on ``user_id``, sometimes
on ``ts``) need a space-filling curve so BOTH columns stay locally
dense in every file — the Z-order layout popularized by Delta Lake's
``OPTIMIZE ZORDER BY`` and Iceberg's sort orders (public docs; concept
from Morton 1966).

Implementation is pure Catalyst expressions:

* each dimension is normalized to a ``bits``-wide unsigned bucket —
  either min/max linear scaling (one tiny agg, broadcast one-row
  crossJoin) or caller-fixed bounds for append-stable layouts;
* bucket bits are interleaved into the Morton code with a
  ``shiftright``/``shiftleft``/``bitwiseOR`` fold (2·bits·dims terms,
  all inside whole-stage codegen — no UDF);
* ``write_zordered`` range-partitions on the code (even output files,
  each covering a tight Morton range) and sorts within partitions (so
  row-group stats are tight too), then writes plain parquet readable
  by anything.

``file_skipping_report`` measures the payoff: per-file min/max of a
probe column and the fraction of files a band predicate could skip.
(The report scans the column to recompute stats — diagnostic tooling;
a production metastore would read parquet footers instead.)

No reference counterpart: the reference writes whatever row order the
ETL produced (see SURVEY §2 S7 notes); layout management is new scope.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _normalize(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Linear map of ``col`` from [lo, hi] onto [0, 2**bits - 1] as a
    long.  Degenerate ranges (hi == lo) map to 0."""
    top = (1 << bits) - 1
    span = hi.cast("double") - lo.cast("double")
    scaled = F.when(
        span > 0,
        ((col.cast("double") - lo.cast("double")) / span * top),
    ).otherwise(F.lit(0.0))
    clamped = F.least(F.greatest(scaled, F.lit(0.0)), F.lit(float(top)))
    return F.floor(clamped).cast("long")


def morton_code(bucket_cols: list[Column], bits: int) -> Column:
    """Interleave ``bits`` low bits of each (already-bucketized, long)
    column into one Morton code: bit ``i`` of dimension ``d`` lands at
    output position ``i * n_dims + d``."""
    n = len(bucket_cols)
    if n == 0:
        raise ValueError("morton_code needs at least one column")
    z = F.lit(0).cast("long")
    for i in range(bits):
        for d, c in enumerate(bucket_cols):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + d))
    return z


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 10,
    bounds: dict[str, tuple[float, float]] | None = None,
) -> tuple[DataFrame, Column]:
    """Return ``(frame, key_column)`` where ``key_column`` is the Morton
    code over ``cols``.

    Without ``bounds``, per-column min/max come from one aggregate over
    ``df`` (broadcast back as a one-row crossJoin — the repo's standard
    scalar-broadcast pattern).  Pass explicit ``bounds`` for an
    append-stable layout: new batches then share the old batches' code
    space, so incremental writes cluster consistently.
    """
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if len(cols) * bits > 63:
        raise ValueError(
            f"{len(cols)} dims x {bits} bits = {len(cols) * bits} code bits "
            "> 63 (long); lower bits"
        )
    if bounds is not None:
        missing = [c for c in cols if c not in bounds]
        if missing:
            raise ValueError(f"bounds missing for columns: {missing}")
        frame = df
        buckets = [
            _normalize(
                F.col(c), F.lit(float(bounds[c][0])), F.lit(float(bounds[c][1])), bits
            )
            for c in cols
        ]
    else:
        stats = df.agg(
            *[F.min(F.col(c).cast("double")).alias(f"__lo_{c}") for c in cols],
            *[F.max(F.col(c).cast("double")).alias(f"__hi_{c}") for c in cols],
        )
        frame = df.crossJoin(F.broadcast(stats))
        buckets = [
            _normalize(F.col(c), F.col(f"__lo_{c}"), F.col(f"__hi_{c}"), bits)
            for c in cols
        ]
    return frame, morton_code(buckets, bits)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 8,
    bits: int = 10,
    bounds: dict[str, tuple[float, float]] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on the Z-order of ``cols``:
    range-partition on the Morton code (each output file covers a tight
    code band) and sort within partitions (tight row-group stats)."""
    frame, z = zorder_key(df, cols, bits=bits, bounds=bounds)
    keyed = frame.withColumn("__z", z)
    (
        keyed.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .select(*df.columns)
        .write.mode(mode)
        .parquet(path)
    )


def file_skipping_report(
    spark, path: str, col: str, lo, hi
) -> DataFrame:
    """One row: how many parquet files of ``path`` a ``col BETWEEN lo
    AND hi`` scan must read, given per-file min/max (what a stats-based
    planner prunes on).  Diagnostic: recomputes stats by scanning
    ``col`` (production reads footers)."""
    per_file = (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("f"), F.col(col))
        .groupBy("f")
        .agg(F.min(col).alias("mn"), F.max(col).alias("mx"))
    )
    return per_file.agg(
        F.count(F.lit(1)).cast("long").alias("files_total"),
        F.sum(
            ((F.col("mn") <= F.lit(hi)) & (F.col("mx") >= F.lit(lo))).cast("long")
        ).alias("files_read"),
        F.round(
            1
            - F.sum(
                ((F.col("mn") <= F.lit(hi)) & (F.col("mx") >= F.lit(lo))).cast(
                    "long"
                )
            )
            / F.count(F.lit(1)),
            6,
        ).alias("frac_skipped"),
    )


def dir_bytes(spark, path: str) -> int:
    """Total bytes under ``path`` via the Hadoop FileSystem API (works
    for any supported scheme, not just local paths)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.getContentSummary(p).getLength()


def compact(
    spark,
    path: str,
    out_path: str,
    order_cols: list[str],
    target_bytes: int = 512 * 1024 * 1024,
    mode: str = "overwrite",
) -> int:
    """Rewrite a small-files parquet directory into ceil(total/target)
    files, range-partitioned and sorted on ``order_cols`` so footer
    min/max stats stay tight after the rewrite.

    The small-files problem is the chronic failure mode of incremental
    ingestion at scale (every micro-batch appends a few files; a year
    later the table is a million 2 MB files and planning time dwarfs
    scan time).  Compaction is the maintenance half of ``write_zordered``
    — run it on cold partitions, then atomically swap the directory via
    the versioned-publish pattern (``sinks/writer.py``).  Returns the
    output file count."""
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    if not order_cols:
        raise ValueError("compact needs at least one order column")
    total = dir_bytes(spark, path)
    n = max(1, -(-total // target_bytes))
    df = spark.read.parquet(path)
    (
        df.repartitionByRange(n, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .write.mode(mode)
        .parquet(out_path)
    )
    return n
