"""Distributional data-quality tests: Benford digit analysis, Gini
concentration, chi-square independence.

Three single-pass screens an analytics warehouse runs over fact
columns (the statistical siblings of quality_checks / psi_drift):

* ``benford_digits`` — leading-digit distribution vs Benford's law
  (Newcomb 1881 / Benford 1938: P(d) = log10(1 + 1/d)); gross
  deviation flags fabricated or truncated numeric data.  Chi-square
  statistic included; the significance cut is the caller's table
  lookup.
* ``gini_coefficient`` — concentration of a positive measure over a
  population (Gini 1912), by the rank formula
  G = 2·Σ i·x_(i) / (n·Σx) − (n+1)/n over values sorted ascending
  (ties broken by the key: deterministic, SQL-replayable).
* ``chi_square_independence`` — r×c contingency test of two
  categorical columns: expected counts from the margins, the chi²
  sum, and the degrees of freedom.

All three are one groupBy/window pass + closed-form arithmetic — no
UDFs, no iteration; every number replays in SQL.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def benford_digits(df: DataFrame, value_col: str) -> DataFrame:
    """(digit 1-9, n, observed_p, expected_p, chi2_term) + the same
    ``chi2_total`` on every row (one-frame report).  Rows with NULL,
    zero, or non-finite values are excluded (they have no leading
    digit); negatives contribute their magnitude.

    Leading digit via string arithmetic on the absolute value's
    scientific notation exponent — implemented as
    ``floor(x / 10^floor(log10(x)))``: pure double math both engines
    share.
    """
    x = F.abs(F.col(value_col))
    # x < +inf excludes both infinities (x is the absolute value and
    # NaN is already gone) — an infinite value has no leading digit,
    # and letting it through emitted a digit-0 row with NULL expected_p
    # whose chi2_term silently dropped while its count inflated totals
    ok = df.filter(
        F.col(value_col).isNotNull()
        & (x > 0)
        & ~F.isnan(F.col(value_col))
        & (x < F.lit(float("inf")))
    )
    digit = F.floor(x / F.pow(F.lit(10.0), F.floor(F.log10(x)))).cast("int")
    counts = ok.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    total = F.sum("n").over(Window.partitionBy())
    obs = F.col("n") / total
    expected = {d: math.log10(1 + 1 / d) for d in range(1, 10)}
    exp_col = F.element_at(
        F.create_map(
            *[F.lit(v) for kv in expected.items() for v in kv]
        ),
        F.col("digit"),
    )
    chi_term = total * (obs - exp_col) * (obs - exp_col) / exp_col
    out = counts.select(
        "digit",
        "n",
        F.round(obs, 6).alias("observed_p"),
        F.round(exp_col, 6).alias("expected_p"),
        F.round(chi_term, 6).alias("chi2_term"),
    )
    return out.withColumn(
        "chi2_total", F.round(F.sum("chi2_term").over(Window.partitionBy()), 6)
    )


def gini_coefficient(
    df: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """One row: (n, total, gini) — concentration of the (non-negative)
    per-key measure.  G = 0 when every key holds an equal share, → 1
    as one key holds everything.  Rank formula over values ascending
    with deterministic key tie-break; NULL values count as 0 (a key
    with no measure is a real population member)."""
    per_key = df.groupBy(key_col).agg(
        F.coalesce(F.sum(value_col), F.lit(0.0)).alias("x")
    )
    w = Window.orderBy(F.col("x").asc(), F.col(key_col).asc())
    ranked = per_key.select(
        F.col(key_col), "x", F.row_number().over(w).alias("i")
    )
    # try_divide: an all-zero measure (or empty frame) has no defined
    # concentration — NULL, not an ANSI divide-by-zero
    return ranked.agg(
        F.count(F.lit(1)).alias("n"),
        # totals in the 1e9 range sit at double's ulp near the 6th
        # decimal — round to 2 so summation order can't flip the hash;
        # the gini RATIO normalizes its fp error away and keeps 6
        F.round(F.sum("x"), 2).alias("total"),
        F.round(
            F.try_divide(
                F.lit(2.0) * F.sum(F.col("i") * F.col("x")),
                F.count(F.lit(1)) * F.sum("x"),
            )
            - F.try_divide(F.count(F.lit(1)) + 1, F.count(F.lit(1))),
            6,
        ).alias("gini"),
    )


def chi_square_independence(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """One row: (n, n_a, n_b, dof, chi2) — the r×c contingency test.
    Expected cell count = row_margin · col_margin / n; chi² sums over
    OBSERVED cells plus the structurally-empty cells' expected mass
    (an absent cell contributes its full expected count — omitting
    them understates the statistic).  NULL categories form their own
    level (SQL grouping semantics).  dof = (r−1)(c−1)."""
    cells = df.groupBy(col_a, col_b).agg(F.count(F.lit(1)).alias("__o"))
    wa = Window.partitionBy(col_a)
    wb = Window.partitionBy(col_b)
    wall = Window.partitionBy()
    with_m = cells.select(
        col_a,
        col_b,
        "__o",
        F.sum("__o").over(wa).alias("__ra"),
        F.sum("__o").over(wb).alias("__cb"),
        F.sum("__o").over(wall).alias("__nn"),
    )
    e = F.col("__ra") * F.col("__cb") / F.col("__nn")
    # NULL-inclusive level count: count_distinct skips NULL, but NULL
    # forms its own contingency level here — add it back iff present,
    # so dof = (r-1)(c-1) matches the cells the chi2 actually sums
    def _levels(c: str):
        return F.count_distinct(F.col(c)) + F.coalesce(
            F.max(F.when(F.col(c).isNull(), 1).otherwise(0)), F.lit(0)
        )

    # observed-cell terms: (o - e)^2 / e ... the empty-cell mass is
    # total expected (= n) minus expected mass on observed cells
    agg = with_m.agg(
        F.max("__nn").alias("n"),
        _levels(col_a).alias("n_a"),
        _levels(col_b).alias("n_b"),
        F.sum((F.col("__o") - e) * (F.col("__o") - e) / e).alias(
            "__chi_obs"
        ),
        F.sum(e).alias("__e_obs"),
    )
    chi2 = F.col("__chi_obs") + (F.col("n") - F.col("__e_obs"))
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        ((F.col("n_a") - 1) * (F.col("n_b") - 1)).cast("long").alias("dof"),
        F.round(chi2, 6).alias("chi2"),
    )
