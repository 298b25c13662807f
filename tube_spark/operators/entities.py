"""Entity resolution: blocking → fuzzy matching → clusters → canonical
records.

The classic warehouse/MDM problem (public shape: Fellegi-Sunter record
linkage + blocking, as in Splink/dedupe docs): the same real-world
entity appears as multiple records with typos and format drift; find
the groups and elect a canonical representative — without the O(n²)
all-pairs comparison.

Pipeline, all native expressions:

1. **Blocking** — candidate pairs only within equal blocking keys
   (caller-supplied Column: prefix, soundex, zip, …).  The join is the
   inverted-index shape every dedup operator here uses: pair space is
   Σ block², bounded by the key's selectivity, never n².
2. **Scoring** — per-field similarity: strings via normalized
   Levenshtein (1 - dist/maxlen, JVM ``levenshtein``), everything else
   exact-match 0/1; weighted average.  Pure codegen — no UDF.
3. **Clustering** — score ≥ threshold pairs feed the SAME
   large/small-star connected components as document dedup
   (operators/components.py); singletons union back.
4. **Canonical election** — min record id per entity (swap in
   quality-ranked election like ``dedup_keep_best`` when a quality
   column exists).

Deterministic end to end → the ``entity_resolution`` extras query has
a full DuckDB oracle (Levenshtein + recursive-CTE closure).

Skew note: a degenerate blocking key (empty string, 'UNKNOWN') creates
a quadratic block — same hazard class as hot shingles; ``max_block``
drops blocks above a cap, mirroring ``max_shingle_df``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tube_spark.operators.components import connected_components


def candidate_pairs(
    df: DataFrame,
    id_col: str,
    block_key: Column,
    max_block: int | None = None,
) -> DataFrame:
    """(id_a, id_b) with id_a < id_b, within equal blocking keys."""
    keyed = df.select(F.col(id_col), block_key.alias("__bk"))
    if max_block is not None:
        ok = keyed.groupBy("__bk").agg(F.count(F.lit(1)).alias("__n")).filter(
            F.col("__n") <= max_block
        )
        keyed = keyed.join(ok.select("__bk"), on="__bk", how="left_semi")
    a = keyed.select(F.col(id_col).alias("id_a"), "__bk")
    b = keyed.select(F.col(id_col).alias("id_b"), "__bk")
    return (
        a.join(b, on="__bk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def similarity(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    fields: list[tuple[str, float]],
) -> DataFrame:
    """Pairs + ``score`` in [0, 1]: weighted mean of per-field
    similarities (strings: 1 - levenshtein/maxlen; other types:
    equality; NULL on either side scores 0 for that field)."""
    if not fields:
        raise ValueError("similarity needs at least one (field, weight)")
    total_w = sum(w for _, w in fields)
    if total_w <= 0:
        raise ValueError("field weights must sum to a positive value")
    cols = [id_col] + [f for f, _ in fields]
    left = df.select(*[F.col(c).alias(f"a_{c}") for c in cols])
    right = df.select(*[F.col(c).alias(f"b_{c}") for c in cols])
    j = (
        pairs.join(left, on=F.col("id_a") == F.col(f"a_{id_col}"))
        .join(right, on=F.col("id_b") == F.col(f"b_{id_col}"))
    )
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    score = F.lit(0.0)
    for fcol, w in fields:
        a, b = F.col(f"a_{fcol}"), F.col(f"b_{fcol}")
        if types.get(fcol) == "string":
            sim = F.lit(1.0) - F.levenshtein(a, b) / F.greatest(
                F.length(a), F.length(b), F.lit(1)
            )
        else:
            sim = (a == b).cast("double")
        score = score + F.lit(w / total_w) * F.coalesce(sim, F.lit(0.0))
    return j.select("id_a", "id_b", F.round(score, 6).alias("score"))


def resolve_entities(
    df: DataFrame,
    id_col: str,
    block_key: Column,
    fields: list[tuple[str, float]],
    threshold: float = 0.9,
    max_block: int | None = None,
    collapse_exact: bool = False,
) -> DataFrame:
    """(id, entity_id, cluster_size, is_canonical) for every input
    record; entity_id = min record id of the matched cluster
    (singletons are their own entity).

    ``collapse_exact=True`` is the at-scale form: records with
    IDENTICAL field tuples collapse to one representative (min id)
    BEFORE pairing, the fuzzy resolution runs on distinct tuples only,
    and the assignment broadcasts back.  Without it a popular exact
    value (N identical names) costs C(N,2) scored pairs — measured at
    sf1: the naive form ground to a halt on 31k-copy name cliques
    while rep-first resolved the same data in seconds (BENCH_NOTES).

    Results are identical to ``collapse_exact=False`` — including for
    NULLs.  Two guards make that true: (1) a tuple only collapses when
    the naive path would actually have merged its copies — block key
    non-NULL (NULL blocks never pair: the pair join drops them) AND
    self-score ≥ threshold (a NULL field scores 0 against ANYTHING, so
    a record's max achievable score is the weight-share of its
    non-NULL fields; identical NULL-bearing tuples below threshold
    stay singletons in the naive path).  Ineligible records pass
    through as their own representatives.  (2) the join mapping
    records back to their representative is NULL-SAFE (``eqNullSafe``
    per key) — a plain name-list equi-join silently drops every row
    with a NULL field or block key (observed: 4 rows in, 2 rows out)."""
    if not collapse_exact:
        assign = _resolve_core(df, id_col, block_key, fields, threshold, max_block)
    else:
        cols = [f for f, _ in fields]
        total_w = sum(w for _, w in fields)
        self_score = F.lit(0.0)
        for fcol, w in fields:
            self_score = self_score + F.lit(w / total_w) * F.col(
                fcol
            ).isNotNull().cast("double")
        keyed = df.withColumn("__bk", block_key).withColumn(
            "__elig",
            block_key.isNotNull() & (F.round(self_score, 6) >= F.lit(threshold)),
        )
        elig = keyed.filter(F.col("__elig"))
        inelig = keyed.filter(~F.col("__elig"))
        reps_e = elig.groupBy("__bk", *cols).agg(F.min(id_col).alias(id_col))
        reps = reps_e.unionByName(inelig.select("__bk", *cols, F.col(id_col)))
        rep_assign = _resolve_core(
            reps, id_col, F.col("__bk"), fields, threshold, max_block
        )
        rhs = reps_e.select(
            F.col(id_col).alias("__rep"),
            F.col("__bk").alias("__r_bk"),
            *[F.col(c).alias(f"__r_{c}") for c in cols],
        )
        cond = F.col("__bk").eqNullSafe(F.col("__r_bk"))
        for c in cols:
            cond = cond & F.col(c).eqNullSafe(F.col(f"__r_{c}"))
        mapping = (
            elig.select(F.col(id_col).alias("__rid"), "__bk", *cols)
            .join(rhs, on=cond)
            .select("__rid", "__rep")
            .unionByName(
                inelig.select(
                    F.col(id_col).alias("__rid"), F.col(id_col).alias("__rep")
                )
            )
        )
        assign = (
            mapping.join(
                rep_assign.select(F.col(id_col).alias("__rep"), "entity_id"),
                on="__rep",
            )
            .select(F.col("__rid").alias(id_col), "entity_id")
        )
    sizes = assign.groupBy("entity_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        assign.join(sizes, on="entity_id")
        .select(
            id_col,
            "entity_id",
            "cluster_size",
            (F.col(id_col) == F.col("entity_id")).alias("is_canonical"),
        )
    )


def _resolve_core(
    df: DataFrame,
    id_col: str,
    block_key: Column,
    fields: list[tuple[str, float]],
    threshold: float,
    max_block: int | None,
) -> DataFrame:
    """(id, entity_id) via pair → score → connected components."""
    pairs = candidate_pairs(df, id_col, block_key, max_block)
    matched = similarity(df, pairs, id_col, fields).filter(
        F.col("score") >= threshold
    )
    comp = connected_components(matched.select("id_a", "id_b"))
    return (
        df.select(F.col(id_col))
        .join(comp.withColumnRenamed("node", id_col), on=id_col, how="left")
        .select(
            id_col,
            F.coalesce(F.col("component"), F.col(id_col)).alias("entity_id"),
        )
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    sort_key: Column,
    window: int = 4,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernandez & Stolfo 1995): rank all
    records by ``sort_key`` (ties broken by id) and pair every record
    with the ``window - 1`` records that follow it in that order.

    Complements equal-key blocking (``candidate_pairs``): a typo in the
    blocking key's first character moves a record to a different block
    and the pair is lost forever, but under a sort the two variants
    usually stay within a few positions of each other.  Classic MDM
    practice is the multi-pass union of both.

    Output: (id_a, id_b, rank_a, rank_b) with rank_a < rank_b <=
    rank_a + window - 1; exactly (n - w + 1)·(w - 1) + C(w-1, 2) pairs
    — linear in n for fixed w, never n².

    Scale shape: the global rank uses the shard sink's distributed
    prefix count (range partition → per-partition totals → broadcast
    offsets → local window) — never a single-task global window.  The
    neighbor join is an EQUI-join on rank_b generated by exploding the
    offsets 1..w-1 (no range-join, no cartesian).
    """
    from tube_spark.sinks.shards import _ranked

    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    keyed = df.select(F.col(id_col), sort_key.alias("__snk"))
    ranked = _ranked(keyed, id_col, None, order_col="__snk").select(
        F.col(id_col), F.col("__rank").alias("rank_a")
    )
    offsets = F.array(*[F.lit(i) for i in range(1, window)])
    left = (
        ranked.select(
            F.col(id_col).alias("id_a"),
            "rank_a",
            F.explode(offsets).alias("__off"),
        )
        .withColumn("rank_b", F.col("rank_a") + F.col("__off"))
        .drop("__off")
    )
    right = ranked.select(
        F.col(id_col).alias("id_b"), F.col("rank_a").alias("rank_b")
    )
    return left.join(right, on="rank_b").select("id_a", "id_b", "rank_a", "rank_b")
