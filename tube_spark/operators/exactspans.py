"""Exact duplicate-substring extraction over candidate document pairs.

``operators/spandedup.py`` carries the fixed-width WINDOW approximation
of Lee et al. (ACL 2022, arXiv:2107.06499) — the form their released
pipeline uses for distributed runs, and the form that scales to a full
corpus.  This module adds the EXACT variant their main apparatus (a
corpus-wide suffix array) computes: every maximal verbatim shared
substring of character length >= ``min_len`` between two documents,
with its exact positions and length.

A corpus-wide suffix array is a single global sort of every suffix —
the one structure that does NOT map onto a shuffle-bounded engine at
100 TB.  The scale path is the standard two-tier design: a bounded
candidate generator (MinHash-LSH pairs, ``operators/dedup.py``)
nominates document PAIRS, and this module resolves each pair exactly.
Work is O(sum of pair text lengths), linear in the candidate set and
independent of corpus size — the same contract as the ANN verify tier.

Dataflow (all native Catalyst — no Python anywhere):

1. L-gram index per pair side: ``posexplode`` of all character
   ``min_len``-grams of each pair's two texts (1-based positions, the
   SQL ``substr`` convention, so a DuckDB oracle replays positions
   verbatim).
2. Match join on ``(pair, gram)`` — pair-local, so a hot boilerplate
   gram can at worst produce |text_a| x |text_b| matches for ONE pair,
   never a corpus-level blowup.
3. Diagonal islands: a maximal common substring of length M >= L is
   exactly a run of M-L+1 consecutive L-gram matches on one diagonal
   ``pos_a - pos_b``; runs are found with the classic gaps-and-islands
   ``row_number`` trick and reported as ``span_len = run + L - 1``.

Reference anchor: beyond-parity suite (SURVEY.md LLM-pipeline
operators); the window form lives in spandedup.py:62-139 and the two
are cross-checked in tests/test_exactspans.py (every exact span >= L
is covered by window hits at width <= L).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_duplicate_spans(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 40,
    max_pair_matches: int | None = 10_000_000,
) -> DataFrame:
    """``(id_a, id_b, pos_a, pos_b, span_len)`` — one row per MAXIMAL
    shared substring of length >= ``min_len`` (characters) per
    occurrence pair: if the same span of ``id_a`` matches two distinct
    places in ``id_b``, both matches are reported.  Positions are
    1-based (``substr`` convention).  ``pairs`` must carry ``id_a`` /
    ``id_b`` (any extra columns are dropped); a document pair appearing
    twice would double-report, so pairs are distinct-ed defensively.

    Maximality is per diagonal: a reported span cannot be extended left
    or right at those positions.  Containment across DIFFERENT
    occurrence pairs (a long span in one place, its substring somewhere
    else) is preserved — that is information, not noise.

    ``max_pair_matches`` guards the one hostile case: a pair of
    SELF-REPETITIVE documents (runs of one character, a 40-gram looping
    thousands of times) makes its own gram join quadratic — measured:
    two 2,000-char single-char docs are 3.8M matches / ~20 s, 5,000
    chars 25M / ~34 s, growing as |A|x|B| (BENCH_NOTES r11).  When set,
    each pair's EXACT match volume (sum over shared grams of
    count_a x count_b — computed from distinct-gram counts, one row per
    distinct gram, so the hostile doc costs ONE row here) is checked
    first and overweight pairs are SKIPPED ENTIRELY rather than
    partially resolved: every span the operator does report keeps the
    exact-maximality contract.  Use ``exact_spans_overweight_pairs``
    for the quarantine list, or ``exact_spans_with_quarantine`` for
    both halves in one call (such docs are degenerate-repetition cases
    for ``repetition_stats``, not near-dup resolution).  The guard is
    ON BY DEFAULT at the measured 10M budget (the 99M-match hostile
    pair took 190 s; real near-dup pairs at sf0.01 peak at ~500);
    pass ``None`` to explicitly opt out.
    """
    if min_len < 2:
        raise ValueError(f"min_len must be >= 2, got {min_len}")
    L = int(min_len)
    p, t = _participants(docs, pairs, id_col, text_col, L)
    # one L-gram index per DOC (not per pair): docs in many pairs are
    # tokenized once, then the pair join replicates only the rows
    grams = t.select(
        "__id",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, length(__text) - {L} + 1), "
                f"i -> substring(__text, i, {L}))"
            )
        ).alias("__p0", "gram"),
    ).select("__id", (F.col("__p0") + 1).alias("pos"), "gram")
    if max_pair_matches is not None:
        # two-tier guard.  Tier 1 is a driver-side LENGTH screen: the
        # exact match volume sum(ca*cb) over shared grams is bounded
        # by na*nb (the gram-count product), so when even the LONGEST
        # participant pair is under the budget, no pair can be
        # overweight — the final plan is then EXACTLY the unguarded
        # plan (the always-count form re-paid the gram explode and
        # doubled the query at sf0.1; plan-level screening still paid
        # ~18% in empty-stage overhead).  One scalar agg over the
        # participant subset, never the corpus — note this runs AT
        # CONSTRUCTION time (the one eager job the guard costs; pass
        # ``None`` for a fully-lazy plan).
        if _tier1_trips(t, L, max_pair_matches):
            overweight = _overweight_pairs(t, p, L, max_pair_matches)
            p = p.join(
                overweight, ["id_a", "id_b"], "left_anti"
            ).localCheckpoint(eager=False)
    ga = p.join(
        grams.select(
            F.col("__id").alias("id_a"),
            F.col("pos").alias("pos_a"),
            "gram",
        ),
        "id_a",
    )
    gb = grams.select(
        F.col("__id").alias("id_b"), F.col("pos").alias("pos_b"), "gram"
    )
    matches = ga.join(gb, ["id_b", "gram"]).select(
        "id_a", "id_b", "pos_a", "pos_b"
    )
    # gaps-and-islands per diagonal: consecutive pos_a on one diagonal
    # share (pos_a - row_number); each island is one maximal run
    diag = (F.col("pos_a") - F.col("pos_b")).alias("diag")
    w = Window.partitionBy("id_a", "id_b", "diag").orderBy("pos_a")
    runs = matches.select("id_a", "id_b", "pos_a", "pos_b", diag).withColumn(
        "island", F.col("pos_a") - F.row_number().over(w)
    )
    return (
        runs.groupBy("id_a", "id_b", "diag", "island")
        .agg(
            F.min("pos_a").alias("pos_a"),
            F.min("pos_b").alias("pos_b"),
            (F.count(F.lit(1)) + L - 1).cast("long").alias("span_len"),
        )
        .select("id_a", "id_b", "pos_a", "pos_b", "span_len")
    )


def _participants(docs, pairs, id_col, text_col, L):
    """Shared front half: pinned distinct pairs + the pair-participant
    text subset.  The pin matters — the pairs feed several consumers
    (id semi-join build side, gram joins, the guard) and an expensive
    generator upstream (the LSH pipeline) would otherwise be
    re-planned per consumer.  Only PAIR PARTICIPANTS are ever
    tokenized: the candidate set is a tiny fraction of a large corpus,
    and exploding every document's L-grams would make the
    "corpus-size independent" contract a lie at scale."""
    p = pairs.select("id_a", "id_b").distinct().localCheckpoint(eager=False)
    ids = p.select(F.col("id_a").alias("__id")).unionByName(
        p.select(F.col("id_b").alias("__id"))
    ).distinct()
    t = (
        docs.select(
            F.col(id_col).alias("__id"), F.col(text_col).alias("__text")
        )
        .join(ids, "__id", "left_semi")
        .filter(F.length("__text") >= L)
    )
    return p, t


def _tier1_trips(t: DataFrame, L: int, max_pair_matches: int) -> bool:
    """Driver-side length screen: True iff SOME participant pair could
    exceed the budget (max gram count squared clears it).  One scalar
    aggregation over the participant subset."""
    if max_pair_matches < 1:
        raise ValueError(
            f"max_pair_matches must be >= 1, got {max_pair_matches}"
        )
    max_n = t.agg(F.max(F.length("__text") - L + 1).alias("n")).first()["n"]
    return max_n is not None and int(max_n) ** 2 > max_pair_matches


def _overweight_pairs(
    t: DataFrame, p: DataFrame, L: int, max_pair_matches: int
) -> DataFrame:
    """Tier 2 of the guard: ``(id_a, id_b, est_matches)`` for pairs
    whose exact gram-join volume exceeds the budget.  Volumes are
    computed ONLY for length-suspicious pairs (sum(ca*cb) <= na*nb, so
    pairs under the budget by length product need no counting), with
    gram counting semi-joined to the suspicious documents."""
    lens = t.select(
        "__id", (F.length("__text") - L + 1).cast("long").alias("__n")
    )
    pl = p.join(
        lens.select(F.col("__id").alias("id_a"), F.col("__n").alias("__na")),
        "id_a",
    ).join(
        lens.select(F.col("__id").alias("id_b"), F.col("__n").alias("__nb")),
        "id_b",
    )
    suspicious = pl.filter(
        F.col("__na") * F.col("__nb") > max_pair_matches
    ).select("id_a", "id_b")
    sus_ids = suspicious.select(F.col("id_a").alias("__id")).unionByName(
        suspicious.select(F.col("id_b").alias("__id"))
    ).distinct()
    grams = t.join(sus_ids, "__id", "left_semi").select(
        "__id",
        F.explode(
            F.expr(
                f"transform(sequence(1, length(__text) - {L} + 1), "
                f"i -> substring(__text, i, {L}))"
            )
        ).alias("gram"),
    )
    return _pair_volumes(suspicious, grams).filter(
        F.col("est_matches") > max_pair_matches
    )


def _pair_volumes(p: DataFrame, grams: DataFrame) -> DataFrame:
    """EXACT per-pair match-join volume ``(id_a, id_b, est_matches)``
    from distinct-gram counts: sum over shared grams of
    count_a x count_b.  One row per (doc, distinct gram) — a
    pathological single-character document contributes ONE row, so the
    guard itself never pays the quadratic cost it prevents.  Pairs with
    no shared gram emit no row (they produce no spans either way)."""
    cnt = grams.groupBy("__id", "gram").agg(F.count(F.lit(1)).alias("c"))
    va = p.join(
        cnt.select(
            F.col("__id").alias("id_a"), "gram", F.col("c").alias("ca")
        ),
        "id_a",
    )
    return (
        va.join(
            cnt.select(
                F.col("__id").alias("id_b"), "gram", F.col("c").alias("cb")
            ),
            ["id_b", "gram"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("est_matches"))
    )


def exact_spans_overweight_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 40,
    max_pair_matches: int = 10_000_000,
) -> DataFrame:
    """The quarantine list for the ``max_pair_matches`` guard:
    ``(id_a, id_b, est_matches)`` for every candidate pair whose exact
    gram-join volume exceeds the budget — the pairs
    ``exact_duplicate_spans(..., max_pair_matches=...)`` skips.  These
    are degenerate-repetition documents (route them to
    ``repetition_stats`` / quality gates), not near-dup candidates a
    span resolver should chew on."""
    if min_len < 2:
        raise ValueError(f"min_len must be >= 2, got {min_len}")
    L = int(min_len)
    p, t = _participants(docs, pairs, id_col, text_col, L)
    if not _tier1_trips(t, L, max_pair_matches):
        return _empty_overweight(p)
    return _overweight_pairs(t, p, L, max_pair_matches)


def _empty_overweight(p: DataFrame) -> DataFrame:
    return p.limit(0).select(
        "id_a", "id_b", F.lit(0).cast("long").alias("est_matches")
    )


def exact_spans_with_quarantine(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 40,
    max_pair_matches: int = 10_000_000,
) -> tuple[DataFrame, DataFrame]:
    """The curation-pipeline surface: ``(spans, quarantined)`` in one
    call — ``spans`` resolves every candidate pair within the budget
    exactly (``exact_duplicate_spans`` semantics), ``quarantined`` is
    the ``(id_a, id_b, est_matches)`` list of overweight pairs that
    were skipped.  A curation run writes both: spans feed the dedup
    decision, the quarantine list routes its documents to the
    repetition/quality gates instead of silently vanishing.

    The screen is computed ONCE and shared by both halves (the
    resolver gets the pre-filtered pair set and runs unguarded), so
    this costs one guard, not two."""
    if min_len < 2:
        raise ValueError(f"min_len must be >= 2, got {min_len}")
    L = int(min_len)
    p, t = _participants(docs, pairs, id_col, text_col, L)
    if _tier1_trips(t, L, max_pair_matches):
        quarantined = _overweight_pairs(
            t, p, L, max_pair_matches
        ).localCheckpoint(eager=False)
        clean = p.join(quarantined, ["id_a", "id_b"], "left_anti")
    else:
        quarantined = _empty_overweight(p)
        clean = p
    spans = exact_duplicate_spans(
        docs, clean, id_col, text_col, min_len, max_pair_matches=None
    )
    return spans, quarantined


def exact_dup_coverage(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 40,
    max_pair_matches: int | None = 10_000_000,
) -> DataFrame:
    """Per-document EXACT duplicated-character statistics over the
    candidate pair set: ``(id, n_chars, dup_chars, dup_fraction)``
    where ``dup_chars`` counts characters covered by the union of all
    exact shared spans >= ``min_len`` the document participates in (on
    either side of any pair).  The verification tier for
    ``spandedup.span_dup_stats``: the window approximation's
    ``dup_fraction`` upper-bounds noise, this one is exact on the
    nominated pairs.  ``max_pair_matches`` passes through to the span
    resolver (same default guard): a quarantined pair contributes no
    coverage — its documents belong to the repetition gate."""
    spans = exact_duplicate_spans(
        docs, pairs, id_col, text_col, min_len, max_pair_matches
    )
    sides = spans.select(
        F.col("id_a").alias("__id"),
        F.col("pos_a").alias("start"),
        (F.col("pos_a") + F.col("span_len")).alias("end"),
    ).unionAll(
        spans.select(
            F.col("id_b").alias("__id"),
            F.col("pos_b").alias("start"),
            (F.col("pos_b") + F.col("span_len")).alias("end"),
        )
    )
    # interval union per doc: running max of end over start order;
    # covered += end - max(start, prev_max_end) when positive
    w = (
        Window.partitionBy("__id")
        .orderBy("start", "end")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cov = (
        sides.withColumn("prev_end", F.max("end").over(w))
        .select(
            "__id",
            F.greatest(
                F.col("end")
                - F.greatest(F.col("start"), F.coalesce("prev_end", F.col("start"))),
                F.lit(0),
            ).alias("covered"),
        )
        .groupBy("__id")
        .agg(F.sum("covered").cast("long").alias("dup_chars"))
    )
    base = docs.select(
        F.col(id_col).alias("__id"),
        F.length(text_col).cast("long").alias("n_chars"),
    )
    return (
        base.join(cov, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            "n_chars",
            F.coalesce("dup_chars", F.lit(0)).cast("long").alias("dup_chars"),
            F.when(
                F.col("n_chars") > 0,
                F.round(F.coalesce("dup_chars", F.lit(0)) / F.col("n_chars"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_fraction"),
        )
    )
