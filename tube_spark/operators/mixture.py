"""Source-weighted data mixtures under a token budget.

Training datasets are assembled as a MIXTURE: "x% web, y% books, z%
code", expressed as token counts, not document counts.  Given per-source
weights and a total token budget, ``mixture_sample`` deterministically
selects documents per source — in salted-hash order, so the choice is a
uniform sample that is stable across runs, partitionings, and appends
(the same guarantees as operators/sampling.py) — until each source's
token allocation is filled.

Scale shape: the per-source running token count is a distributed
two-phase prefix sum (the operators/packing.py pattern), NOT a naive
``Window.partitionBy(source)`` — a per-source window funnels each
source through ONE task, which is exactly the skew that breaks at
100 TB when a source holds billions of documents.  Here the data is
range-partitioned on (source, hash), per-(partition, source) totals are
collected (bounded: partitions x sources rows), and the within-
partition window runs in parallel.

The boundary document (the one that crosses its source's allocation)
is INCLUDED — every selected source therefore meets or slightly
exceeds its allocation, and ``selected_tokens - n_tokens <
allocation`` holds per source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tube_spark.functions.localrel import local_df

from tube_spark.functions.text import portable_hash


def mixture_weights(
    df: DataFrame,
    source_col: str,
    token_count_col: str,
    alpha: float = 0.5,
    total_budget: int | None = None,
) -> DataFrame:
    """Compute the per-source sampling weights a pretraining mixture
    actually uses: temperature-scaled by available token mass,
    ``w_i = n_i^alpha / sum_j n_j^alpha`` (alpha=1 proportional,
    alpha=0 uniform; 0<alpha<1 upsamples small/rare sources — the
    multilingual-pretraining recipe).  Returns one row per source:
    ``(source, n_docs, n_tokens, weight, alloc_tokens)`` —
    ``alloc_tokens = floor(weight * total_budget)`` when a budget is
    given (feed straight into ``mixture_sample``), else null.

    Scale shape: ONE groupBy over the corpus (map-side combinable
    count/sum); the temperature arithmetic runs on the #sources-sized
    aggregate, so this is a corpus scan plus driver-free tiny math.
    Weight floats are rounded (6 dp) AFTER the full-precision
    normalization so the SQL oracle reproduces them."""
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    per = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(token_count_col)).cast("long").alias("n_tokens"),
    )
    scaled = per.withColumn(
        "pw", F.pow(F.col("n_tokens").cast("double"), F.lit(float(alpha)))
    )
    tot = scaled.agg(F.sum("pw")).collect()[0][0]
    out = scaled.withColumn("weight", F.round(F.col("pw") / F.lit(float(tot)), 6))
    if total_budget is not None:
        out = out.withColumn(
            "alloc_tokens",
            F.floor(F.col("pw") / F.lit(float(tot)) * F.lit(int(total_budget))).cast("long"),
        )
    else:
        out = out.withColumn("alloc_tokens", F.lit(None).cast("long"))
    return out.select("source", "n_docs", "n_tokens", "weight", "alloc_tokens")


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    token_count_col: str = "n_tokens",
    salt: str = "mixture",
) -> DataFrame:
    """Input columns + ``cum_before`` (tokens already taken from the
    same source before this document), filtered to the selected docs.

    Sources absent from ``weights`` are dropped; weights are
    normalized, so allocation(s) = budget * w_s / sum(w).
    """
    if token_budget <= 0:
        raise ValueError(f"token_budget must be positive, got {token_budget}")
    bad = {s: w for s, w in weights.items() if w < 0}
    if bad or not weights:
        raise ValueError(f"weights must be non-empty and non-negative: {bad}")
    total_w = sum(weights.values())
    if total_w == 0:
        raise ValueError("all weights are zero")
    spark = df.sparkSession
    alloc = local_df(
        spark,
        [(s, int(token_budget * w / total_w)) for s, w in weights.items()],
        f"{source_col} string, __alloc long",
    )

    n = F.col(token_count_col)
    h = portable_hash(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")))
    part = (
        df.filter(n > 0)
        .join(F.broadcast(alloc), on=source_col)  # drops unweighted sources
        .withColumn("__h", h)
        .repartitionByRange(source_col, "__h", id_col)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    totals = part.groupBy("__pid", source_col).agg(F.sum(n).alias("t")).collect()
    by_source: dict[str, list] = {}
    for row in totals:
        by_source.setdefault(row[source_col], []).append(row)
    offsets = []
    for s, rows in by_source.items():
        acc = 0
        for row in sorted(rows, key=lambda r: r["__pid"]):
            offsets.append((row["__pid"], s, acc))
            acc += row["t"]
    if not offsets:
        return df.limit(0).withColumn("cum_before", F.lit(0).cast("long"))
    off = local_df(
        spark, offsets, f"__pid int, {source_col} string, __off long"
    )

    w = (
        Window.partitionBy("__pid", source_col)
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before = F.col("__off") + F.sum(n).over(w) - n
    return (
        part.join(F.broadcast(off), on=["__pid", source_col])
        .withColumn("cum_before", cum_before)
        # include the boundary doc: selected iff tokens taken so far
        # are strictly inside the allocation
        .filter(F.col("cum_before") < F.col("__alloc"))
        .drop("__pid", "__h", "__off", "__alloc")
    )


def mixture_report(
    df: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    token_count_col: str = "n_tokens",
    salt: str = "mixture",
) -> DataFrame:
    """Per-source summary of the selected mixture: docs, tokens,
    allocation, and realized token share."""
    total_w = sum(weights.values())
    sel = mixture_sample(
        df, weights, token_budget, id_col, source_col, token_count_col, salt
    )
    alloc = F.create_map(
        *[x for s, w in weights.items()
          for x in (F.lit(s), F.lit(int(token_budget * w / total_w)))]
    )
    per = sel.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count_col).alias("n_tokens"),
    )
    grand = per.agg(F.sum("n_tokens").alias("g")).select(
        F.col("g"), F.lit(1).alias("__j")
    )
    return (
        per.withColumn("__j", F.lit(1))
        .join(F.broadcast(grand), "__j")
        .select(
            source_col,
            "n_docs",
            "n_tokens",
            alloc[F.col(source_col)].alias("allocation"),
            F.round(F.col("n_tokens") / F.col("g"), 6).alias("realized_share"),
        )
    )
