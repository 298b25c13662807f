"""User-behavior analytics: event-transition matrices, RFM scoring,
and two-sample A/B test statistics.

Three classic warehouse jobs on an event log, all expressed as
windows + map-side-combinable aggregations (no UDF, no iteration):

* ``event_transitions`` — the first-order Markov view of user
  journeys: P(next event type | current type) from per-user lag
  pairs.  The sequence-mining primitive under funnel analysis; the
  same frame feeds anomaly screens ("error → error probability
  doubled this week").
* ``rfm_scores`` — Recency / Frequency / Monetary quartile scoring
  (Hughes 1994, the standard segmentation): per user, days since
  last conversion, conversion count, total value, each ntile'd 1-4,
  plus the combined segment code.
* ``ab_test`` — per-arm mean/variance and the pooled two-sample
  z-statistic (Welch denominator).  The z-score is plain arithmetic
  (portable); mapping to a p-value is a table lookup the caller owns
  (SQL engines disagree on erf availability).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """(from_type, to_type, n, p) — counts and row-normalized
    probabilities of consecutive event-type pairs within each user's
    (ts, id)-ordered stream.  Deterministic tie-breaks; the first
    event of each user emits no pair.  One lag window (shuffle on
    user) + one count agg; p via a window sum over from_type —
    from_type cardinality is the event-type enum, so that window is
    bounded."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (
        events.select(
            F.lag(F.col(type_col)).over(w).alias("from_type"),
            F.col(type_col).alias("to_type"),
        )
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = F.sum("n").over(Window.partitionBy("from_type"))
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / total, 6).alias("p"),
    )


def rfm_scores(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    conversion_type: str = "purchase",
    quantiles: int = 4,
) -> DataFrame:
    """(user, last_ts, frequency, monetary, r_score, f_score, m_score,
    segment) — quartile (default) scores per converting user.

    Scores are ntile ranks with deterministic (metric, user) ordering:
    r_score ranks by last conversion time ASCENDING (older = 1, most
    recent = ``quantiles``), f/m by their metric ascending — so
    ``quantiles``/``quantiles``/``quantiles`` is the best segment.
    ``segment`` concatenates the three digits ("444").

    Each score is a corpus-wide ordering over the per-user rollup —
    |users| rows, data-scale at 100 TB — so every score comes from
    ``operators/ranking.ntile_distributed`` (range partition →
    per-partition counts → broadcast offsets → partition-local window
    → arithmetic tile), bit-identical to ``ntile(q) OVER (ORDER BY
    metric, user)`` (the SQL oracle replays it as real ntile) while
    never funneling the frame through a single-task global window.
    One events scan → per-user rollup → three rank shuffles.
    """
    from tube_spark.operators.ranking import ntile_distributed

    conv = events.filter(F.col(type_col) == conversion_type)
    out = conv.groupBy(user_col).agg(
        F.max(ts_col).alias("last_ts"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum(value_col), 6).alias("monetary"),
    )
    for order_col, score_col in (
        ("last_ts", "r_score"),
        ("frequency", "f_score"),
        ("monetary", "m_score"),
    ):
        out = ntile_distributed(
            out, quantiles, [order_col, user_col], tile_col=score_col
        )
    return out.select(
        user_col,
        "last_ts",
        "frequency",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
    ).withColumn(
        "segment",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    )


def ab_test(
    df: DataFrame,
    arm_col: str,
    metric_col: str,
    arm_a: str,
    arm_b: str,
) -> DataFrame:
    """One row: per-arm n / mean / variance (population) and the
    two-sample z statistic with the Welch (unpooled) denominator:

        z = (mean_a - mean_b) / sqrt(var_a/n_a + var_b/n_b)

    NULL z when either arm is empty or both variances are zero
    (try_divide semantics).  Plain arithmetic end to end — the
    normal-CDF p-value mapping is the caller's table lookup (erf
    availability differs across engines).  One aggregation with
    conditional sums: single pass, map-side combinable.
    """
    a = F.col(arm_col) == arm_a
    b = F.col(arm_col) == arm_b
    x = F.col(metric_col)
    agg = df.filter(a | b).agg(
        F.sum(F.when(a, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(b, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(a, x).otherwise(F.lit(0.0))).alias("s_a"),
        F.sum(F.when(b, x).otherwise(F.lit(0.0))).alias("s_b"),
        F.sum(F.when(a, x * x).otherwise(F.lit(0.0))).alias("q_a"),
        F.sum(F.when(b, x * x).otherwise(F.lit(0.0))).alias("q_b"),
    )
    mean_a = F.try_divide(F.col("s_a"), F.col("n_a"))
    mean_b = F.try_divide(F.col("s_b"), F.col("n_b"))
    # clamp at 0: E[x²]−E[x]² can go ~-1e-18 in floating point on a
    # constant metric, and sqrt(negative) would poison z with NaN
    var_a = F.greatest(
        F.try_divide(F.col("q_a"), F.col("n_a")) - mean_a * mean_a, F.lit(0.0)
    )
    var_b = F.greatest(
        F.try_divide(F.col("q_b"), F.col("n_b")) - mean_b * mean_b, F.lit(0.0)
    )
    z = F.try_divide(
        mean_a - mean_b,
        F.sqrt(
            F.try_divide(var_a, F.col("n_a"))
            + F.try_divide(var_b, F.col("n_b"))
        ),
    )
    return agg.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(mean_a, 6).alias("mean_a"),
        F.round(mean_b, 6).alias("mean_b"),
        F.round(var_a, 6).alias("var_a"),
        F.round(var_b, 6).alias("var_b"),
        F.round(z, 6).alias("z_stat"),
    )
