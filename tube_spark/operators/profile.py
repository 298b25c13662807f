"""Column profiling: the measurement half of data-quality tooling.

``operators/quality_checks.py`` asserts expectations; this module
produces the numbers you write expectations against.  Two shapes:

* ``profile`` — per-column scalar statistics (count, nulls, distinct,
  min/max/mean/stddev), ALL columns in ONE aggregate pass over one
  scan (each column contributes a handful of agg expressions; Spark
  computes them in a single whole-stage-codegen'd partial/final
  aggregate).  Exact ``count(distinct)`` per column costs one expand
  row per profiled column — the honest default for a profile report;
  pass ``approx=True`` for HLL++ when profiling very wide tables.
* ``histogram`` — exact equi-width value histogram with CALLER-FIXED
  bounds: bin = floor((x - lo) / (hi - lo) * bins) clamped to
  [0, bins-1], one groupBy on the (tiny-cardinality) bin id.  Fixed
  bounds keep the result deterministic and append-comparable across
  runs — the same frozen-code-space principle as ``layout.py`` bounds
  and the vector store's frozen centroids.  (Adaptive bounds = one
  extra min/max pass; compose ``profile`` → ``histogram``.)

Everything is deterministic, so both shapes carry DuckDB oracles
(extras queries ``column_profile``, ``value_histogram``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile(
    df: DataFrame, cols: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """One row per profiled column:
    (column, n, n_null, n_distinct, min, max, mean, stddev).

    min/max/mean/stddev are NULL for non-numeric columns (min/max on
    strings are locale-trap territory; profile what sorts stably)."""
    cols = cols or df.columns
    types = {f.name: f.dataType for f in df.schema.fields}
    missing = [c for c in cols if c not in types]
    if missing:
        raise ValueError(f"profile: unknown columns {missing}")

    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        col = F.col(c)
        aggs.append(F.count(col).alias(f"__cnt{i}"))
        distinct = (
            F.approx_count_distinct(c) if approx else F.countDistinct(col)
        )
        aggs.append(distinct.alias(f"__d{i}"))
        if isinstance(types[c], _NUMERIC):
            num = col.cast("double")
            aggs += [
                F.min(num).alias(f"__mn{i}"),
                F.max(num).alias(f"__mx{i}"),
                F.avg(num).alias(f"__av{i}"),
                F.stddev(num).alias(f"__sd{i}"),
            ]
    row = df.agg(*aggs)

    structs = []
    for i, c in enumerate(cols):
        numeric = isinstance(types[c], _NUMERIC)
        null_d = F.lit(None).cast("double")
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n"),
                (F.col("__n") - F.col(f"__cnt{i}")).alias("n_null"),
                F.col(f"__d{i}").cast("long").alias("n_distinct"),
                (F.round(F.col(f"__mn{i}"), 6) if numeric else null_d).alias("min"),
                (F.round(F.col(f"__mx{i}"), 6) if numeric else null_d).alias("max"),
                (F.round(F.col(f"__av{i}"), 6) if numeric else null_d).alias("mean"),
                (F.round(F.col(f"__sd{i}"), 6) if numeric else null_d).alias("stddev"),
            )
        )
    return row.select(F.explode(F.array(*structs)).alias("r")).select("r.*")


def histogram(
    df: DataFrame, col: str, lo: float, hi: float, bins: int = 10
) -> DataFrame:
    """Exact equi-width histogram over [lo, hi): one row per non-empty
    bin — (bin, bin_lo, bin_hi, n).  Values outside the bounds clamp
    into the edge bins (so totals always equal the non-null count);
    NULLs are excluded."""
    if bins <= 0:
        raise ValueError(f"bins must be positive, got {bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    x = F.col(col).cast("double")
    width = (hi - lo) / bins
    raw = F.floor((x - F.lit(float(lo))) / F.lit(width))
    b = F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1)).cast("long")
    return (
        df.filter(x.isNotNull())
        .groupBy(b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            F.round(F.lit(float(lo)) + F.col("bin") * F.lit(width), 6).alias(
                "bin_lo"
            ),
            F.round(F.lit(float(lo)) + (F.col("bin") + 1) * F.lit(width), 6).alias(
                "bin_hi"
            ),
            "n",
        )
        .orderBy("bin")
    )


def iqr_outliers(
    df: DataFrame,
    col: str,
    by: str | None = None,
    k: float = 1.5,
    approx: bool = False,
) -> DataFrame:
    """Tukey-fence outlier flagging: a value is an outlier when it
    falls outside [q1 - k*IQR, q3 + k*IQR], optionally per ``by``
    group.  Returns the input plus (q1, q3, lo_fence, hi_fence,
    is_outlier).

    One aggregate computes the quartiles (grouped or global one-row),
    broadcast back against the stream side.  ``approx=False`` uses
    exact ``percentile`` (sorts each group's values inside the agg
    buffer — fine up to millions of rows per group, and what the
    DuckDB oracle replays); ``approx=True`` switches to
    ``approx_percentile`` (bounded-memory sketch) — the 100 TB
    default, at the cost of oracle-exactness."""
    x = F.col(col).cast("double")
    fn = "approx_percentile" if approx else "percentile"
    qs = F.expr(f"{fn}({col}, array(0.25, 0.75))")
    keys = [by] if by else []
    stats = (df.groupBy(*keys) if keys else df.groupBy()).agg(
        qs[0].alias("q1"), qs[1].alias("q3")
    )
    joined = (
        df.join(F.broadcast(stats), on=keys, how="left")
        if keys
        else df.crossJoin(F.broadcast(stats))  # one-row aggregate
    )
    lo = F.col("q1") - F.lit(float(k)) * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + F.lit(float(k)) * (F.col("q3") - F.col("q1"))
    return joined.select(
        *df.columns,
        F.round("q1", 6).alias("q1"),
        F.round("q3", 6).alias("q3"),
        F.round(lo, 6).alias("lo_fence"),
        F.round(hi, 6).alias("hi_fence"),
        ((x < lo) | (x > hi)).alias("is_outlier"),
    )


def psi_drift(
    old: DataFrame,
    new: DataFrame,
    col: str,
    lo: float,
    hi: float,
    bins: int = 10,
    epsilon: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between two snapshots of a column —
    THE standard drift gauge for score/feature distributions (public
    credit-scoring lore: <0.1 stable, 0.1-0.25 moderate shift, >0.25
    action).  PSI = Σ_bins (p_new - p_old) * ln(p_new / p_old) over the
    SAME frozen-bound histogram both sides (``histogram``), with
    ``epsilon`` floor so empty bins don't blow up the log.

    One row: (psi, n_old, n_new, top_bin, top_contrib) — the bin
    contributing most drift, for triage.  Two scans (one per
    snapshot), tiny joins on the bin id only."""
    ho = histogram(old, col, lo, hi, bins).select(
        "bin", F.col("n").alias("n_old")
    )
    hn = histogram(new, col, lo, hi, bins).select(
        "bin", F.col("n").alias("n_new")
    )
    joined = ho.join(hn, on="bin", how="full_outer").fillna(
        0, subset=["n_old", "n_new"]
    )
    tot = joined.agg(
        F.sum("n_old").alias("t_old"), F.sum("n_new").alias("t_new")
    )
    contrib = (
        joined.crossJoin(F.broadcast(tot))  # one-row totals
        .select(
            "bin",
            "n_old",
            "n_new",
            (
                (F.col("n_new") / F.col("t_new") - F.col("n_old") / F.col("t_old"))
                * F.log(
                    F.greatest(F.col("n_new") / F.col("t_new"), F.lit(epsilon))
                    / F.greatest(F.col("n_old") / F.col("t_old"), F.lit(epsilon))
                )
            ).alias("c"),
        )
    )
    top = contrib.orderBy(F.col("c").desc(), F.col("bin").asc()).limit(1)
    return (
        contrib.agg(
            F.round(F.sum("c"), 6).alias("psi"),
            F.sum("n_old").cast("long").alias("n_old"),
            F.sum("n_new").cast("long").alias("n_new"),
        )
        .crossJoin(
            F.broadcast(
                top.select(
                    F.col("bin").alias("top_bin"),
                    F.round("c", 6).alias("top_contrib"),
                )
            )
        )
    )
