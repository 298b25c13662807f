"""Distributional data-quality tests: Benford digit analysis, Gini
concentration, chi-square independence + mutual information, the
nonparametric rank family (two-sample KS, Mann-Whitney U, Spearman,
Kruskal-Wallis), one-way ANOVA, and MAD outliers.

Single-pass screens an analytics warehouse runs over fact
columns (the statistical siblings of quality_checks / psi_drift).
The rank statistics share ``_value_midranks`` — pooled midranks via
the distributed two-phase prefix sum (range partition → per-partition
totals → broadcast offsets → partition-local window), never a
single-task global window over the data-scale distinct-value frame:

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

* ``mutual_information`` — entropies + MI + normalized MI on the
  same contingency frame: the feature-selection / label-leakage
  screen.
* ``ks_two_sample`` — two-sample Kolmogorov-Smirnov: max ECDF gap
  between two slices of a numeric column, with Smirnov's asymptotic
  95% rejection threshold.  Distribution drift ACROSS slices, where
  ``cusum_drift`` is drift across time.
* ``mann_whitney_u`` / ``spearman_corr`` / ``kruskal_wallis`` — the
  midrank family: two-sample location shift, monotone association,
  and the k-group rank test.
* ``anova_oneway`` — the parametric k-group sibling (conditional
  sums → SSB/SSW → F).
* ``mad_outliers`` — per-group median-absolute-deviation outlier
  screen: the 50%-breakdown robust alternative to mean/stddev
  z-scores.

All are groupBy/window passes + closed-form arithmetic — no UDFs, no
iteration; every number replays in SQL.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tube_spark.functions.localrel import local_df


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
    from tube_spark.sinks.shards import _ranked

    per_key = df.groupBy(key_col).agg(
        F.coalesce(F.sum(value_col), F.lit(0.0)).alias("x")
    )
    # distributed prefix count (range partition -> per-partition totals
    # -> broadcast offsets -> partition-local window): the rank frame is
    # |keys| — data-scale at 100 TB, so never a single-task global
    # row_number.  _ranked orders by (order_col, key_col) = (x asc,
    # key asc), exactly the original window's deterministic order.
    ranked = _ranked(per_key, key_col, None, order_col="x").select(
        F.col(key_col), "x", (F.col("__rank") + 1).alias("i")
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


def mutual_information(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """One row: (n, h_a, h_b, mi, nmi) — entropies, mutual information
    (nats), and the normalized MI = mi/√(h_a·h_b) of two categorical
    columns.  The information-theoretic sibling of
    ``chi_square_independence`` on the identical contingency frame:
    chi² asks "is there dependence?", MI measures HOW MUCH in nats —
    the standard feature-selection / leakage screen (a feature with
    nmi≈1 against the label is a leak, not a signal).

    Everything comes from ONE cells frame (groupBy a,b) + its margins
    as enum-bounded windows:

        H_a = −Σ_cells (o/n)·ln(ra/n)      (Σ_b collapses the margin)
        MI  = Σ_cells (o/n)·ln(o·n/(ra·cb))

    Zero cells contribute 0 to MI by convention (lim p→0 of p·ln p).
    NULL categories form their own level (SQL grouping semantics).
    Degenerate inputs — a constant column has H = 0 — yield NULL nmi
    via try_divide; empty input yields the all-NULL row with n = 0.
    Natural log is data-dependent cross-engine arithmetic (unlike the
    embedded-constant Benford expecteds); the zipf_fit precedent
    (driver-green shared double log) plus 6-decimal rounding covers
    the replay."""
    cells = df.groupBy(col_a, col_b).agg(F.count(F.lit(1)).alias("__o"))
    wa = Window.partitionBy(col_a)
    wb = Window.partitionBy(col_b)
    wall = Window.partitionBy()
    with_m = cells.select(
        "__o",
        F.sum("__o").over(wa).alias("__ra"),
        F.sum("__o").over(wb).alias("__cb"),
        F.sum("__o").over(wall).alias("__nn"),
    )
    o = F.col("__o").cast("double")
    ra = F.col("__ra").cast("double")
    cb = F.col("__cb").cast("double")
    nn = F.col("__nn").cast("double")
    p = o / nn
    h_a = -F.sum(p * F.log(ra / nn))
    h_b = -F.sum(p * F.log(cb / nn))
    mi = F.sum(p * F.log((o * nn) / (ra * cb)))
    return with_m.agg(
        F.coalesce(F.max("__nn"), F.lit(0)).cast("long").alias("n"),
        F.round(h_a, 6).alias("h_a"),
        F.round(h_b, 6).alias("h_b"),
        F.round(mi, 6).alias("mi"),
        F.round(F.try_divide(mi, F.sqrt(h_a * h_b)), 6).alias("nmi"),
    )


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    group_col: str,
    a_value,
    b_value,
) -> DataFrame:
    """One row: (n_a, n_b, ks_d, critical_95, reject_95) — the
    two-sample Kolmogorov-Smirnov test of whether ``value_col`` is
    distributed identically in groups ``a_value`` and ``b_value`` of
    ``group_col``.  The distributional drift screen for SLICES (does
    priority-1 pricing look like priority-5 pricing?), complementing
    ``cusum_drift``'s temporal shift detection.

    D = max over pooled distinct values v of |ECDF_a(v) − ECDF_b(v)|
    (ECDFs are right-continuous, so evaluating at the distinct values
    is exact — ties collapse in the groupBy).  ``critical_95`` is the
    large-sample rejection threshold c(0.05)·√((n_a+n_b)/(n_a·n_b))
    with c(0.05)=1.358 (Smirnov's asymptotic law): pure √ arithmetic,
    no libm beyond IEEE sqrt, so every number replays in SQL.

    Shape: one groupBy on the value, then a DISTRIBUTED two-phase
    prefix sum over the distinct-value order (the shards/packing
    `_ranked` pattern: range partition on the value, per-partition
    totals — one row each — collected, cumulative offsets broadcast
    back, LOCAL cumulative window per partition).  A continuous
    measure's distinct count is itself at data scale, so a
    global-order single-partition window here would be the one-task
    bottleneck the pattern exists to avoid; the per-partition totals
    also hand the driver n_a/n_b for free.  NULL/NaN values and rows
    in neither group are excluded."""
    v = F.col(value_col)
    g = F.col(group_col)
    pts = df.filter(
        v.isNotNull() & ~F.isnan(v.cast("double")) & g.isin(a_value, b_value)
    ).select(
        v.alias("__v"),
        F.when(g == F.lit(a_value), 1).otherwise(0).alias("__a"),
        F.when(g == F.lit(b_value), 1).otherwise(0).alias("__b"),
    )
    per_v = pts.groupBy("__v").agg(
        F.sum("__a").alias("__ca"), F.sum("__b").alias("__cb")
    )
    # pin the sampled range-partition layout: the pid->offset map below
    # is only valid for THIS layout (the _ranked hazard + fix)
    parts = (
        per_v.repartitionByRange("__v")
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    totals = sorted(
        (r["__pid"], int(r["ca"] or 0), int(r["cb"] or 0))
        for r in parts.groupBy("__pid")
        .agg(F.sum("__ca").alias("ca"), F.sum("__cb").alias("cb"))
        .collect()
    )
    offsets, acc_a, acc_b = [], 0, 0
    for pid, ca, cb in totals:
        offsets.append((pid, acc_a, acc_b))
        acc_a += ca
        acc_b += cb
    na, nb = acc_a, acc_b
    spark = df.sparkSession
    off = local_df(
        spark, offsets or [(0, 0, 0)], "__pid int, __offa long, __offb long"
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = parts.join(F.broadcast(off), "__pid").select(
        (F.sum("__ca").over(w) + F.col("__offa")).alias("__cuma"),
        (F.sum("__cb").over(w) + F.col("__offb")).alias("__cumb"),
    )
    lna = F.lit(na).cast("long")
    lnb = F.lit(nb).cast("long")
    d = F.abs(
        F.try_divide(F.col("__cuma"), lna)
        - F.try_divide(F.col("__cumb"), lnb)
    )
    crit = F.lit(1.358) * F.sqrt(
        F.try_divide(
            (lna + lnb).cast("double"), (lna * lnb).cast("double")
        )
    )
    # empty input (or both groups filtered away): the agg over zero
    # rows yields NULLs — pin n_a/n_b to 0 and reject_95 to false so
    # callers branching on reject_95 never read a silent NULL; ks_d /
    # critical_95 stay NULL (no statistic exists).  (ADVICE r13.)
    return cum.agg(
        F.coalesce(F.max(lna), F.lit(0).cast("long")).alias("n_a"),
        F.coalesce(F.max(lnb), F.lit(0).cast("long")).alias("n_b"),
        F.round(F.max(d), 6).alias("ks_d"),
        F.round(F.max(crit), 6).alias("critical_95"),
        F.coalesce(F.max(d) > F.max(crit), F.lit(False)).alias("reject_95"),
    )


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    group_col: str,
    a_value,
    b_value,
) -> DataFrame:
    """One row: (n_a, n_b, u_a, u_b, z, reject_95) — the two-sample
    Mann-Whitney U (Wilcoxon rank-sum) test of whether ``value_col``
    tends larger in group ``a_value`` than in ``b_value``.  Completes
    the nonparametric drift family: KS (``ks_two_sample``) detects ANY
    distributional difference, rank-sum targets a LOCATION shift and
    keeps power under heavy tails where the t/z mean tests
    (``ab_test``) lose theirs.

    Midranks over the pooled sample: a distinct value v with
    c_v = ca_v + cb_v occurrences and C_v pooled count strictly below
    it occupies ranks C_v+1 .. C_v+c_v — midrank C_v + (c_v+1)/2 — so
    the rank-sum R_a = Σ_v ca_v·midrank_v needs exactly the KS ECDF
    machinery: group by value, then the distributed two-phase prefix
    sum (range partition on the value, per-partition totals — one row
    each — collected, cumulative offsets broadcast back, LOCAL window
    per partition; never a single-task global cumulative window over
    the data-scale distinct-value frame).

    U_a = R_a − n_a(n_a+1)/2, U_b = n_a·n_b − U_a; z is the
    tie-corrected normal approximation (Lehmann 1975, no continuity
    correction — keeps every number plain arithmetic a SQL oracle
    replays bit-for-bit):

        var(U) = (n_a·n_b/12)·((N+1) − Σ_v (c_v³−c_v)/(N(N−1)))
        z      = (U_a − n_a·n_b/2) / sqrt(var(U))

    reject_95 = |z| > 1.96 (two-sided).  Midranks are multiples of
    0.5 with magnitudes far below 2^52, so every partial sum is an
    exact double and the result is summation-order independent.
    NULL/NaN values and rows in neither group are excluded; degenerate
    inputs (either group empty, all values tied, or no rows) yield
    NULL u/z and reject_95=false with n_a/n_b pinned to their counts.
    """
    v = F.col(value_col)
    g = F.col(group_col)
    pts = df.filter(
        v.isNotNull() & ~F.isnan(v.cast("double")) & g.isin(a_value, b_value)
    ).select(
        v.alias("__v"),
        F.when(g == F.lit(a_value), 1).otherwise(0).alias("__a"),
        F.when(g == F.lit(b_value), 1).otherwise(0).alias("__b"),
    )
    per_v = pts.groupBy("__v").agg(
        F.sum("__a").alias("__ca"), F.sum("__b").alias("__cb")
    )
    # pin the sampled range-partition layout: the pid->offset map below
    # is only valid for THIS layout (the _ranked hazard + fix)
    parts = (
        per_v.repartitionByRange("__v")
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    totals = sorted(
        (r["__pid"], int(r["ca"] or 0), int(r["cb"] or 0))
        for r in parts.groupBy("__pid")
        .agg(F.sum("__ca").alias("ca"), F.sum("__cb").alias("cb"))
        .collect()
    )
    offsets, acc = [], 0
    for pid, ca, cb in totals:
        offsets.append((pid, acc))
        acc += ca + cb
    na = sum(t[1] for t in totals)
    nb = sum(t[2] for t in totals)
    n = na + nb
    spark = df.sparkSession
    off = local_df(spark, offsets or [(0, 0)], "__pid int, __offn long")
    w = (
        Window.partitionBy("__pid")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = F.col("__ca") + F.col("__cb")
    mid = parts.join(F.broadcast(off), "__pid").select(
        "__ca",
        c.alias("__c"),
        # pooled count strictly BELOW v + midrank offset
        (
            F.sum(F.col("__ca") + F.col("__cb")).over(w)
            + F.col("__offn")
            - c
            + (c + 1) / F.lit(2.0)
        ).alias("__mid"),
    )
    lna = F.lit(na).cast("long")
    lnb = F.lit(nb).cast("long")
    ln = F.lit(n).cast("long")
    ra = F.sum(F.col("__ca") * F.col("__mid"))
    tie = F.sum(F.col("__c") * F.col("__c") * F.col("__c") - F.col("__c"))
    u_a = ra - (lna * (lna + 1)) / F.lit(2.0)
    var_u = (
        (lna * lnb).cast("double")
        / F.lit(12.0)
        * (
            (ln + 1).cast("double")
            - F.try_divide(tie.cast("double"), (ln * (ln - 1)).cast("double"))
        )
    )
    z = F.try_divide(u_a - (lna * lnb).cast("double") / F.lit(2.0), F.sqrt(var_u))
    # n_a/n_b are driver literals (from the totals collect) — coalesced
    # so the empty-frame degenerate row pins 0/0/false, never a silent
    # NULL (the ks_two_sample contract)
    return mid.agg(
        F.coalesce(F.max(lna), F.lit(na).cast("long")).alias("n_a"),
        F.coalesce(F.max(lnb), F.lit(nb).cast("long")).alias("n_b"),
        F.round(u_a, 1).alias("u_a"),
        F.round((lna * lnb).cast("double") - u_a, 1).alias("u_b"),
        F.round(z, 6).alias("z"),
        F.coalesce(F.abs(z) > F.lit(1.96), F.lit(False)).alias("reject_95"),
    )


def _value_midranks(
    pts: DataFrame, value_col: str
) -> "tuple[DataFrame, int]":
    """Pooled MIDRANKS per distinct value of ``value_col`` over ``pts``
    — the shared kernel of the rank statistics (Spearman, Kruskal-
    Wallis; Mann-Whitney inlines the same shape with per-group counts).

    Returns ``(frame, n)``: one row per distinct value with ``__c``
    (occurrence count) and ``__mid`` (midrank — a value occupying
    pooled ranks C+1..C+c has midrank C + (c+1)/2, an exact multiple
    of 0.5), plus the total row count as a driver int.  Distributed
    two-phase prefix sum: range partition on the value, per-partition
    totals (one row each) collected, cumulative offsets broadcast
    back, LOCAL cumulative window per partition — never a single-task
    global window over the data-scale distinct-value frame."""
    per_v = pts.groupBy(F.col(value_col).alias("__v")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    parts = (
        per_v.repartitionByRange("__v")
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    totals = sorted(
        (r["__pid"], int(r["c"] or 0))
        for r in parts.groupBy("__pid").agg(F.sum("__c").alias("c")).collect()
    )
    offsets, acc = [], 0
    for pid, c in totals:
        offsets.append((pid, acc))
        acc += c
    spark = pts.sparkSession
    off = local_df(spark, offsets or [(0, 0)], "__pid int, __off long")
    w = (
        Window.partitionBy("__pid")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    mid = (
        parts.join(F.broadcast(off), "__pid")
        .withColumn(
            "__mid",
            F.sum("__c").over(w)
            + F.col("__off")
            - F.col("__c")
            + (F.col("__c") + 1) / F.lit(2.0),
        )
        .drop("__pid", "__off")
    )
    return mid, acc


def spearman_corr(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """One row: (n, rho, z, reject_95) — Spearman rank correlation
    with midrank tie handling (= Pearson correlation of the pooled
    midranks).  The monotone-association screen: unlike Pearson on raw
    values (``graph_degree_stats``' moment form) it is invariant to
    monotone transforms and robust to heavy tails — the right default
    for corpus-quality-vs-engagement style questions.

    Ranks come from ``_value_midranks`` twice (x and y), each a
    distributed two-phase prefix sum; rows then join their midranks
    back by value (two shuffle equi-joins) and ONE aggregation forms
    the centered sums.  The rank mean is exactly (n+1)/2 (midranks sum
    to n(n+1)/2 by construction), injected as a driver literal, so
    the centered form never suffers the n·Σx²−(Σx)² cancellation:

        rho = Σ dx·dy / sqrt(Σ dx² · Σ dy²),   d = mid − (n+1)/2

    z = rho·√(n−1) is the large-sample normal statistic;
    reject_95 = |z| > 1.96.  Midranks are exact 0.5-multiples, so dx,
    dy are exact and every product is an exact 0.25-multiple — the
    sums are order-independent up to ~2^53 and rho rounds stably to 6
    decimals (the SQL oracle replays midranks as
    avg(row_number) OVER value groups, bit-identical).  NULL/NaN in
    either column excludes the row; n < 2 or a constant column yields
    NULL rho/z and reject_95 = false."""
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    pts = (
        df.filter(
            x.isNotNull() & ~F.isnan(x) & y.isNotNull() & ~F.isnan(y)
        )
        .select(x.alias("__x"), y.alias("__y"))
        # feeds two rank passes plus the final join: pin ONE scan
        .localCheckpoint(eager=False)
    )
    rx, n = _value_midranks(pts, "__x")
    ry, _ = _value_midranks(pts, "__y")
    mean = F.lit((n + 1) / 2.0)
    j = (
        pts.join(rx.select(F.col("__v").alias("__x"), F.col("__mid").alias("__mx")), "__x")
        .join(ry.select(F.col("__v").alias("__y"), F.col("__mid").alias("__my")), "__y")
        .select(
            (F.col("__mx") - mean).alias("__dx"),
            (F.col("__my") - mean).alias("__dy"),
        )
    )
    sxy = F.sum(F.col("__dx") * F.col("__dy"))
    sxx = F.sum(F.col("__dx") * F.col("__dx"))
    syy = F.sum(F.col("__dy") * F.col("__dy"))
    rho = F.try_divide(sxy, F.sqrt(sxx * syy))
    z = rho * F.lit(math.sqrt(n - 1) if n >= 1 else 0.0)
    return j.agg(
        F.coalesce(F.count(F.lit(1)), F.lit(0)).cast("long").alias("n"),
        F.round(rho, 6).alias("rho"),
        F.round(z, 6).alias("z"),
        F.coalesce(F.abs(z) > F.lit(1.96), F.lit(False)).alias("reject_95"),
    )


def kruskal_wallis(
    df: DataFrame, value_col: str, group_col: str
) -> DataFrame:
    """One row: (n, k, h, h_tie_corrected) — the Kruskal-Wallis
    rank-sum test that ``value_col`` has the same distribution across
    ALL levels of ``group_col`` (the k-group generalization of
    ``mann_whitney_u``; with k=2 it equals the squared MWU z up to the
    tie convention).

        H  = 12/(N(N+1)) · Σ_j R_j²/n_j − 3(N+1)
        Hc = H / (1 − Σ_v (c_v³−c_v)/(N³−N))      (tie correction)

    where R_j is the sum of pooled midranks in group j.  Midranks
    depend only on the value, so R_j = Σ_v c_{v,j}·mid_v: the pooled
    midrank frame (``_value_midranks``, the shared prefix-sum kernel)
    joins the per-(value, group) counts by value, the per-group rollup
    aggregates to k rows, and the final sums run over those k rows —
    bounded.  Under H0, H ~ χ²(k−1); the p-value lookup is the
    caller's table (χ² inverse is not plain arithmetic a SQL oracle
    can replay — same contract as ab_test's z).  NULL values are
    excluded; NULL group labels form their own level (SQL grouping
    semantics).  Degenerate inputs: n = 0 yields NULL h; a single
    all-tied value yields h = 0 with NULL h_tie_corrected (the
    correction's ties-variance denominator is zero)."""
    v = F.col(value_col).cast("double")
    pts = (
        df.filter(v.isNotNull() & ~F.isnan(v))
        .select(v.alias("__val"), F.col(group_col).alias("__g"))
        # feeds the rank kernel AND the per-(value, group) rollup: pin
        # ONE scan (the one-row-report branch-replay discipline)
        .localCheckpoint(eager=False)
    )
    mid, n = _value_midranks(pts, "__val")
    # per-(value, group) counts joined to the pooled midrank by value:
    # midranks depend only on the value, so the group rollup never
    # re-ranks
    per_vg = pts.groupBy("__val", "__g").agg(F.count(F.lit(1)).alias("__cg"))
    joined = per_vg.join(
        mid.select(F.col("__v").alias("__val"), "__mid", "__c"), "__val"
    )
    groups = joined.groupBy("__g").agg(
        F.sum("__cg").alias("__nj"),
        F.sum(F.col("__cg") * F.col("__mid")).alias("__rj"),
    )
    ln = F.lit(n).cast("double")
    # try_divide both: n = 0 makes the leading factor 12/0 (ANSI
    # double division throws; the empty frame must yield NULL h)
    h = (
        F.try_divide(F.lit(12.0), ln * (ln + 1))
        * F.sum(
            F.try_divide(
                F.col("__rj") * F.col("__rj"), F.col("__nj").cast("double")
            )
        )
        - F.lit(3.0) * (ln + 1)
    )
    # tie term over the distinct-value frame (its own branch hits the
    # kernel's localCheckpoint, not a re-scan)
    tie_row = mid.agg(
        F.sum(
            F.col("__c") * F.col("__c") * F.col("__c") - F.col("__c")
        ).alias("__tie")
    )
    out = groups.agg(
        F.coalesce(F.sum("__nj"), F.lit(0)).cast("long").alias("n"),
        F.coalesce(F.count(F.lit(1)), F.lit(0)).cast("int").alias("k"),
        F.round(h, 6).alias("h"),
        h.alias("__h_raw"),
    )
    correction = F.lit(1.0) - F.try_divide(
        F.col("__tie").cast("double"), ln * ln * ln - ln
    )
    return (
        out.join(F.broadcast(tie_row))
        .select(
            "n",
            "k",
            "h",
            F.round(
                F.try_divide(F.col("__h_raw"), correction), 6
            ).alias("h_tie_corrected"),
        )
    )


def anova_oneway(
    df: DataFrame, value_col: str, group_col: str
) -> DataFrame:
    """One row: (n, k, ss_between, ss_within, f) — one-way ANOVA of
    ``value_col`` across all levels of ``group_col``: the parametric
    sibling of ``kruskal_wallis`` (same question, mean-based — more
    power when groups are near-normal with equal variance, fragile
    under the heavy tails where the rank test keeps its level).

        SSB = Σ_j s_j²/n_j − S²/N      (between-group)
        SSW = Σ_j (q_j − s_j²/n_j)     (within-group)
        F   = (SSB/(k−1)) / (SSW/(N−k))

    from per-group (n_j, s_j = Σx, q_j = Σx²) — ONE map-side-combinable
    groupBy, then one aggregation over the k group rows.  Under H0,
    F ~ F(k−1, N−k); the p-value lookup is the caller's table (the
    F-inverse is not plain arithmetic a SQL oracle can replay — the
    ab_test/kruskal contract).  NULL/NaN values are excluded; NULL
    group labels form their own level.  Degenerate inputs (k < 2 or
    N ≤ k or zero within-variance) yield NULL f via try_divide.
    Sums of squares round at 2 (large-double ulp discipline), f at 6.
    """
    v = F.col(value_col).cast("double")
    pts = df.filter(v.isNotNull() & ~F.isnan(v)).select(
        v.alias("__val"), F.col(group_col).alias("__g")
    )
    per_g = pts.groupBy("__g").agg(
        F.count(F.lit(1)).alias("__nj"),
        F.sum("__val").alias("__sj"),
        F.sum(F.col("__val") * F.col("__val")).alias("__qj"),
    )
    nj = F.col("__nj").cast("double")
    sj = F.col("__sj")
    qj = F.col("__qj")
    agg = per_g.agg(
        F.coalesce(F.sum("__nj"), F.lit(0)).cast("long").alias("n"),
        F.coalesce(F.count(F.lit(1)), F.lit(0)).cast("int").alias("k"),
        F.sum(sj).alias("__s"),
        F.sum(F.try_divide(sj * sj, nj)).alias("__b"),
        F.sum(qj - F.try_divide(sj * sj, nj)).alias("__w"),
    )
    ln = F.col("n").cast("double")
    lk = F.col("k").cast("double")
    ssb = F.col("__b") - F.try_divide(F.col("__s") * F.col("__s"), ln)
    ssw = F.col("__w")
    f_stat = F.try_divide(
        F.try_divide(ssb, lk - 1), F.try_divide(ssw, ln - lk)
    )
    return agg.select(
        "n",
        "k",
        F.round(ssb, 2).alias("ss_between"),
        F.round(ssw, 2).alias("ss_within"),
        F.round(f_stat, 6).alias("f"),
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Per group: (group, n, med, mad, n_outliers, outlier_share) —
    robust outlier screening by median absolute deviation.  A value is
    an outlier when |x − median| > k·MAD; unlike mean/stddev z-scores
    (``outlier_flags``), the median-based cut does not let the
    outliers themselves inflate the scale estimate (breakdown point
    50% vs 0%).  MAD = 0 (over half the group identical) degrades to
    flagging any x ≠ median — the k·0 boundary, not a special case.

    Shape: ONE scan, ONE hash shuffle on the group — both exact
    percentiles are WINDOW aggregates over the same group
    partitioning, so the deviation pass and the final groupBy reuse
    the partitioning with no further exchange (an agg-and-join-back
    form re-scans the fact table per estimate: 4 scans at 100 TB; the
    plan report pins this one at a single scan).  NULL/NaN values are
    excluded from both the estimates and the counts.  Exact
    ``percentile`` interpolation is the same lower+(upper−lower)·frac
    arithmetic DuckDB's quantile_cont uses, so every number replays in
    SQL."""
    v = F.col(value_col).cast("double")
    ok = df.filter(v.isNotNull() & ~F.isnan(v)).select(
        F.col(group_col), v.alias("__x")
    )
    wg = Window.partitionBy(group_col)
    flagged = (
        ok.withColumn("__med", F.percentile("__x", 0.5).over(wg))
        .withColumn("__adev", F.abs(F.col("__x") - F.col("__med")))
        .withColumn("__mad", F.percentile("__adev", 0.5).over(wg))
    )
    return (
        flagged.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.max("__med"), 6).alias("med"),
            F.round(F.max("__mad"), 6).alias("mad"),
            F.sum(
                (F.col("__adev") > F.lit(k) * F.col("__mad")).cast("long")
            ).alias("n_outliers"),
            F.round(
                F.avg(
                    (F.col("__adev") > F.lit(k) * F.col("__mad")).cast(
                        "double"
                    )
                ),
                6,
            ).alias("outlier_share"),
        )
    )
