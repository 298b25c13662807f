"""Deduplication operators for large-scale corpus curation.

Four families, all new scope beyond the reference (its only dedup is
row-level ``drop_duplicates`` after joins, SURVEY U3):

* exact        — hash-groupBy on content (or normalized content)
* minhash_lsh  — MinHash signatures + banded LSH for near-dup *candidate*
                 generation without the O(n²) cross join
* simhash      — 64-bit SimHash + banded blocking, Hamming-distance filter
* ngram_jaccard— exact word-n-gram Jaccard via shingle inverted index

Scale design notes (the point of each implementation):

* Everything is native Catalyst expressions — no Python UDFs; the
  shingle/hash/minhash math runs inside whole-stage codegen.
* The O(n²) pair space is never materialized.  Jaccard joins docs on
  *shingle hash* (inverted index); LSH joins on *band bucket*; both
  shuffle keyed by content, so co-occurring docs land in the same
  partition and pair counts are map-side combinable.
* Shingles are carried as 64-bit ``xxhash64`` values, not strings —
  an 8-byte shuffle key regardless of n-gram width.
* Known skew hazard: an ultra-common shingle (boilerplate) creates a
  quadratic bucket.  ``max_shingle_df`` drops shingles whose document
  frequency exceeds a cap — standard practice (stop-shingles carry no
  discriminative signal) and it bounds every bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tube_spark.functions.text import fingerprint, portable_hash, tokens, word_shingles

# 31-bit Mersenne prime: with a,b,x < 2^31, a*x+b < 2^62 stays inside
# int64 (Spark 4 runs ANSI mode — silent overflow would instead throw)
_MERSENNE = (1 << 31) - 1
# band-fold constants: bh = fold(h_i: (bh*P + h_i) mod M) — reproducible
# in plain SQL (unlike xxhash64).  M < 2^63/P keeps bh*P + h inside int64.
_BAND_P = 1_000_003
_BAND_M = 999_999_999_989  # prime < 1e12


def minhash_coefficients(num_hashes: int, seed: int) -> list[tuple[int, int]]:
    """The (a_i, b_i) permutation constants — exposed so differential
    oracles can embed the identical values."""
    import random

    rnd = random.Random(seed)
    return [
        (rnd.randrange(1, _MERSENNE), rnd.randrange(0, _MERSENNE))
        for _ in range(num_hashes)
    ]


def exact_duplicates(df: DataFrame, id_col: str, text_col: str, normalized: bool = True) -> DataFrame:
    """Group identical documents: one row per distinct content with the
    canonical (minimum) id, the duplicate count, and member ids."""
    key = fingerprint(F.col(text_col)) if normalized else F.md5(F.col(text_col))
    return (
        df.select(F.col(id_col), key.alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.sort_array(F.collect_list(id_col)).alias("member_ids"),
        )
    )


def _shingle_hashes(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    distinct: bool = True,
    portable: bool = False,
) -> DataFrame:
    """(id, shingle_hash) exploded inverted-index rows.

    ``word_shingles`` already dedups within a document, so rows are
    distinct per doc by construction; ``distinct=True`` adds the global
    guarantee Jaccard counting needs.  Min-hashing passes False — min()
    over duplicates is identical and the distinct would cost a full
    shuffle of the exploded rows.

    ``portable=True`` hashes with the md5-derived 32-bit hash instead of
    xxhash64 so a SQL oracle can reproduce the values exactly.
    """
    sh = word_shingles(tokens(F.col(text_col)), n)
    h = portable_hash(F.col("shingle")) if portable else F.xxhash64("shingle")
    out = df.select(F.col(id_col), F.explode(sh).alias("shingle")).select(
        F.col(id_col), h.alias("sh")
    )
    return out.distinct() if distinct else out


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
    prefix_filter: bool = False,
) -> DataFrame:
    """Exact Jaccard over word n-gram sets, via a shingle inverted index.

    |A∩B| comes from the self-join on shingle hash; |A∪B| = |A|+|B|−|A∩B|.
    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.

    ``prefix_filter=True`` switches candidate generation to PPJoin-style
    prefix filtering (Bayardo et al., WWW 2007; Xiao et al., WWW 2008):
    index only each document's first ``sz - ceil(t*sz) + 1`` shingles in
    a global rarest-first order instead of all of them.  LOSSLESS for
    the threshold: order shingles globally and let w be the smallest
    shingle of A∩B — if w were outside A's prefix then ALL of A∩B would
    be (a prefix is downward-closed in the order), leaving
    |A∩B| <= ceil(t|A|) - 1 < t|A| <= t|A∪B|, contradicting J >= t; so
    w sits in BOTH prefixes and the prefix self-join finds every true
    pair.  Candidate volume drops from sum(df^2) over all shingles to
    sum over prefix shingles only (at t=0.8, ~20% of rows enter the
    join, ~4% of the pair volume); rarest-first ordering makes the
    surviving df's the small ones.  Unlike ``max_shingle_df`` this
    prunes NOTHING true — it is the exact-join scale path; the df cap
    remains the lossy emergency brake for adversarial skew."""
    inv = _shingle_hashes(df, id_col, text_col, n)
    if max_shingle_df is not None:
        keep = inv.groupBy("sh").agg(F.count(F.lit(1)).alias("df_")).filter(
            F.col("df_") <= max_shingle_df
        )
        inv = inv.join(keep.select("sh"), on="sh", how="inner")

    if prefix_filter:
        return _jaccard_pairs_prefix(inv, id_col, threshold)

    sizes = inv.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = inv.select(F.col(id_col).alias("id_a"), "sh")
    b = inv.select(F.col(id_col).alias("id_b"), "sh")
    inter = (
        a.join(b, on="sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """(id, sig array<bigint>) MinHash signatures.

    h_i(x) = (a_i·x + b_i) mod M31 over hashed shingle values; the 64
    mins are computed in ONE groupBy with ``num_hashes`` native min()
    aggregates — map-side combinable, no UDFs, no per-doc arrays until
    the final assembly.
    """
    coeffs = minhash_coefficients(num_hashes, seed)
    inv = _shingle_hashes(df, id_col, text_col, n, distinct=False, portable=portable)
    # positive 31-bit base value so a*x+b stays inside int64
    x = F.pmod(F.col("sh"), F.lit(_MERSENNE))
    aggs = [
        F.min(F.pmod(F.lit(a) * x + F.lit(b), F.lit(_MERSENNE))).alias(f"h{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    sig = inv.groupBy(id_col).agg(*aggs)
    return sig.select(
        F.col(id_col), F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_buckets(
    sig: DataFrame, id_col: str, num_hashes: int, bands: int
) -> DataFrame:
    """(id, band, bh) LSH bucket rows from a signature frame.

    Band hash is an arithmetic fold ``(bh*P + h) mod M`` of the band's
    signature slice — SQL-reproducible (unlike xxhash64), so oracles and
    other engines can rebuild the exact buckets.  Shared by the batch
    ``minhash_lsh_pairs`` and the streaming incremental dedup-groups
    maintenance (which buckets each new batch against stored buckets).
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands

    def band_hash(b: int):
        bh = F.col("sig")[b * r]
        for i in range(1, r):
            bh = F.pmod(bh * F.lit(_BAND_P) + F.col("sig")[b * r + i], F.lit(_BAND_M))
        return bh

    band_structs = F.array(
        *[
            F.struct(F.lit(b).alias("band"), band_hash(b).alias("bh"))
            for b in range(bands)
        ]
    )
    return sig.select(F.col(id_col), F.explode(band_structs).alias("bb")).select(
        F.col(id_col), F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh")
    )


def minhash_est_jaccard(num_hashes: int):
    """Column expr: estimated Jaccard from ``sig_a``/``sig_b`` arrays —
    the fraction of matching minhashes (native zip_with/aggregate)."""
    return (
        F.aggregate(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, v: acc + v,
        )
        / F.lit(num_hashes)
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash-LSH.

    Signatures split into ``bands`` bands of r = num_hashes/bands rows;
    docs colliding on any band hash become candidates (probability
    1−(1−j^r)^b — the classic S-curve).  Candidates are then scored by
    estimated Jaccard = fraction of matching minhashes, and filtered.
    Returns (id_a, id_b, est_jaccard).

    Fully deterministic; with ``portable=True`` every intermediate
    (shingle hash, signature, band bucket) is reproducible in plain SQL,
    so an independent engine can verify the entire pipeline — see the
    ``minhash_lsh`` DuckDB oracle in ``__spark_entry__``.
    """
    assert num_hashes % bands == 0
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes, seed, portable).cache()
    # materialize the cache BEFORE the four-way fan-out (band sides a/b,
    # signature sides a/b): with AQE replanning cached plans, each
    # un-materialized consumer branch builds its OWN copy of the cached
    # plan's stages and the signature stage computes 4x concurrently
    # (measured: 4 x 5.3 s identical Generate stages at sf0.1 —
    # tools/profile_query.py, r14).  The count is the one materialization
    # action; every branch then reads InMemoryTableScan blocks.
    sig.count()
    buckets = minhash_buckets(sig, id_col, num_hashes, bands)
    ca = buckets.select(F.col(id_col).alias("id_a"), "band", "bh")
    cb = buckets.select(F.col(id_col).alias("id_b"), "band", "bh")
    cand = (
        ca.join(cb, on=["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sig.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    est = minhash_est_jaccard(num_hashes)
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard"))
    )


def _jaccard_pairs_prefix(
    inv: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Prefix-filtered exact Jaccard (see ngram_jaccard_pairs): join
    only prefix rows, then verify candidates against the FULL shingle
    sets (array_intersect over per-doc arrays — the prefix join
    undercounts intersections by design, so verification re-derives
    |A∩B| exactly)."""
    from pyspark.sql import Window

    t = float(threshold)
    # inv feeds three branches (ranking, both verification sides);
    # prefix feeds both sides of the candidate self-join; sets feeds
    # both verification sides.  Pin each once (localCheckpoint,
    # lazily) — left as one lazy mega-plan the duplicated
    # explode/distinct/window subtrees cost ~28 s of replanning and
    # recompute at ANY sf (measured; pinned: 1.7 s at sf0.01)
    inv = inv.localCheckpoint(eager=False)
    # global rarest-first order: (document frequency, hash) — any total
    # order is correct; rarest-first minimizes candidates
    dfreq = inv.groupBy("sh").agg(F.count(F.lit(1)).alias("df_"))
    w = Window.partitionBy(id_col).orderBy(F.col("df_").asc(), F.col("sh").asc())
    ranked = (
        inv.join(dfreq, on="sh")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("sz", F.count(F.lit(1)).over(Window.partitionBy(id_col)))
    )
    prefix = ranked.filter(
        F.col("rn") <= F.col("sz") - F.ceil(F.lit(t) * F.col("sz")) + 1
    ).localCheckpoint(eager=False)
    a = prefix.select(F.col(id_col).alias("id_a"), "sh", F.col("sz").alias("sz_a"))
    b = prefix.select(F.col(id_col).alias("id_b"), "sh", F.col("sz").alias("sz_b"))
    cands = (
        a.join(b, on="sh")
        .filter(F.col("id_a") < F.col("id_b"))
        # length filter (lossless, epsilon-guarded): J >= t forces
        # min(|A|,|B|) >= |A∩B| >= t * max(|A|,|B|)
        .filter(
            F.least("sz_a", "sz_b")
            >= F.lit(t) * F.greatest("sz_a", "sz_b") - F.lit(1e-9)
        )
        .select("id_a", "id_b")
        .distinct()
    )
    sets = inv.groupBy(id_col).agg(
        F.sort_array(F.collect_list("sh")).alias("arr"),
        F.count(F.lit(1)).alias("sz"),
    ).localCheckpoint(eager=False)
    sa = sets.select(
        F.col(id_col).alias("id_a"), F.col("arr").alias("arr_a"),
        F.col("sz").alias("sz_a"),
    )
    sb = sets.select(
        F.col(id_col).alias("id_b"), F.col("arr").alias("arr_b"),
        F.col("sz").alias("sz_b"),
    )
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("n_inter", F.size(F.array_intersect("arr_a", "arr_b")))
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash_df(
    df: DataFrame, id_col: str, text_col: str, bits: int = 64, portable: bool = False
) -> DataFrame:
    """(id, simhash) — 64-bit (60-bit when portable) SimHash per document.

    Tokens are exploded so the token hash is computed ONCE per
    (doc, token); the per-bit ±1 sums are then native sum() aggregates
    over cheap bit tests of that hash (map-side combinable).  Bit b of
    the result is set iff its sum is positive.  ``portable=True`` uses
    the md5-derived 60-bit hash a SQL oracle can reproduce.
    """
    from tube_spark.functions.text import portable_hash60

    if portable:
        bits = min(bits, 60)
    tok = F.array_distinct(tokens(F.col(text_col)))
    h = portable_hash60(F.col("t")) if portable else F.xxhash64("t")
    exploded = df.select(F.col(id_col), F.explode(tok).alias("t")).select(
        F.col(id_col), h.alias("h")
    )
    sums = exploded.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(bits)
        ]
    )
    out = F.lit(0).cast("long")
    for b in range(bits):
        out = out.bitwiseOR(
            F.when(F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return sums.select(F.col(id_col), out.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bands: int = 4,
    portable: bool = False,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming.

    Blocking: split the hash into ``bands`` chunks; by pigeonhole any
    pair within distance < bands must agree on ≥1 chunk, so the
    candidate join is on (chunk index, chunk value) — never all-pairs.

    A pair colliding on k chunks would surface k times; instead of a
    ``distinct()`` (an extra full shuffle of every candidate pair) each
    pair is emitted only from its FIRST matching chunk — a stateless
    filter computable from xor(sh_a, sh_b) alone.  Measured at sf0.1
    (1.6M output pairs): 4.7s → ~2s end-to-end.
    """
    bits = 60 if portable else 64
    sims = simhash_df(df, id_col, text_col, bits=bits, portable=portable)
    return hamming_pairs(sims, id_col, "simhash", bits, max_hamming, bands)


def hamming_pairs(
    sig_df: DataFrame,
    id_col: str,
    sig_col: str,
    bits: int,
    max_hamming: int,
    bands: int,
) -> DataFrame:
    """Banded Hamming blocking over ANY integer signature column -
    shared by text SimHash and image pHash near-dup.  Returns
    (id_a, id_b, hamming) with hamming <= max_hamming; never all-pairs
    (candidates join on (chunk index, chunk value), pigeonhole-complete
    for distance < bands), one emission per pair via the stateless
    first-matching-band filter."""
    # pigeonhole completeness: a pair at Hamming distance d can disagree
    # on at most d chunks, so it agrees on >=1 chunk only when d < bands -
    # a larger max_hamming would silently lose pairs
    if max_hamming >= bands:
        raise ValueError(
            f"max_hamming ({max_hamming}) must be < bands ({bands}): the "
            "banded blocking only guarantees recall for distance < bands"
        )
    width = bits // bands
    chunk = lambda c, b: F.shiftright(c, b * width).bitwiseAND(F.lit((1 << width) - 1))
    chunks = sig_df.select(
        F.col(id_col),
        F.col(sig_col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("cb"), chunk(F.col(sig_col), b).alias("cv"))
                    for b in range(bands)
                ]
            )
        ).alias("c"),
    ).select(F.col(id_col), sig_col, F.col("c.cb").alias("cb"), F.col("c.cv").alias("cv"))

    a = chunks.select(F.col(id_col).alias("id_a"), F.col(sig_col).alias("sh_a"), "cb", "cv")
    b = chunks.select(F.col(id_col).alias("id_b"), F.col(sig_col).alias("sh_b"), "cb", "cv")
    xor = F.col("sh_a").bitwiseXOR(F.col("sh_b"))
    first_match = F.lit(bands - 1)
    for bb in range(bands - 2, -1, -1):
        first_match = F.when(chunk(xor, bb) == 0, F.lit(bb)).otherwise(first_match)
    return (
        a.join(b, on=["cb", "cv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.col("cb") == first_match)
        .withColumn("hamming", F.bit_count(xor))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact CONTAINMENT over word n-gram sets: |A∩B| / |A| — the
    one-sided cousin of Jaccard that resemblance metrics miss.  A short
    document quoted inside a long one has tiny Jaccard (the union is
    dominated by the long doc) but containment ≈ 1; that asymmetry is
    what quote/subset/boilerplate detection needs (the same
    inverted-index shape as ``ngram_jaccard_pairs`` — shingle-hash
    join, never all-pairs; same ``max_shingle_df`` skew cap).

    Returns (id_a, id_b, containment_a_in_b, containment_b_in_a,
    jaccard) for unordered pairs with max(containment) >= threshold;
    downstreams pick a direction (drop the contained doc, flag the
    quoting one, ...).
    """
    inv = _shingle_hashes(df, id_col, text_col, n)
    if max_shingle_df is not None:
        keep = inv.groupBy("sh").agg(F.count(F.lit(1)).alias("df_")).filter(
            F.col("df_") <= max_shingle_df
        )
        inv = inv.join(keep.select("sh"), on="sh", how="inner")
    sizes = inv.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = inv.select(F.col(id_col).alias("id_a"), "sh")
    b = inv.select(F.col(id_col).alias("id_b"), "sh")
    inter = (
        a.join(b, on="sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    c_ab = F.col("n_inter") / F.col("sz_a")
    c_ba = F.col("n_inter") / F.col("sz_b")
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .filter(F.greatest(c_ab, c_ba) >= threshold)
        .select(
            "id_a",
            "id_b",
            F.round(c_ab, 6).alias("containment_a_in_b"),
            F.round(c_ba, 6).alias("containment_b_in_a"),
            F.round(
                F.col("n_inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
    )


def weighted_jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """EXACT weighted (multiset) Jaccard over candidate pairs:

        J_w(A, B) = sum_t min(tf_A(t), tf_B(t))
                  / sum_t max(tf_A(t), tf_B(t))

    The unweighted set Jaccard treats "the the the the" and one "the"
    identically — wrong for tf-weighted near-dup scoring, where
    repetition IS signal (templates, spam, boilerplate).  This is the
    rescoring/verification tier over any bounded candidate generator
    (MinHash-LSH, SimHash, containment): exact, and pure INTEGER
    arithmetic until the final ratio, so the oracle replays it with no
    floating-point caveats at all.

    One inner join on shared terms is enough:
    sum max = tot_A + tot_B - sum min, so missing terms never need a
    full outer join.  Work is pair-local (a pair's shared-term join is
    bounded by its own vocabularies), linear in the candidate set,
    corpus-size independent — the exactspans contract.

    Returns ``(id_a, id_b, n_common_terms, w_intersection, w_union,
    weighted_jaccard)``; pairs with no shared terms keep a 0.0 score.
    """
    from tube_spark.functions.text import tokens

    # pinned: the pair frame feeds the id semi-join, the term join, and
    # the final left join — an expensive generator upstream (LSH) would
    # otherwise be re-planned per consumer (the plan-pinning rule)
    p = pairs.select("id_a", "id_b").distinct().localCheckpoint(eager=False)
    ids = p.select(F.col("id_a").alias("__id")).unionByName(
        p.select(F.col("id_b").alias("__id"))
    ).distinct()
    # only PAIR PARTICIPANTS are tokenized (left-semi before the
    # explode) — the candidate set is a tiny fraction of the corpus
    tf = (
        docs.select(F.col(id_col).alias("__id"), F.col(text_col))
        .join(ids, "__id", "left_semi")
        .select("__id", F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("__id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    tot = tf.groupBy("__id").agg(F.sum("tf").alias("tot"))
    ta = p.join(
        tf.select(F.col("__id").alias("id_a"), "term", F.col("tf").alias("tf_a")),
        "id_a",
    )
    tb = tf.select(F.col("__id").alias("id_b"), "term", F.col("tf").alias("tf_b"))
    inter = (
        ta.join(tb, ["id_b", "term"])
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("n_common_terms"),
            F.sum(F.least("tf_a", "tf_b")).alias("w_inter"),
        )
    )
    tot_a = tot.select(F.col("__id").alias("id_a"), F.col("tot").alias("tot_a"))
    tot_b = tot.select(F.col("__id").alias("id_b"), F.col("tot").alias("tot_b"))
    out = (
        # totals LEFT-joined: a participant with no tokens at all (empty
        # or non-alpha text, or an id absent from docs) keeps its pair in
        # the output with tot=0 → weighted_jaccard 0.0, matching the
        # "pairs with no shared terms keep a 0.0 score" contract instead
        # of silently dropping the candidate
        p.join(inter, ["id_a", "id_b"], "left")
        .join(tot_a, "id_a", "left")
        .join(tot_b, "id_b", "left")
        .withColumn("tot_a", F.coalesce("tot_a", F.lit(0)))
        .withColumn("tot_b", F.coalesce("tot_b", F.lit(0)))
        .select(
            "id_a",
            "id_b",
            F.coalesce("n_common_terms", F.lit(0)).cast("long").alias(
                "n_common_terms"
            ),
            F.coalesce("w_inter", F.lit(0)).cast("long").alias("w_intersection"),
            (
                F.col("tot_a") + F.col("tot_b") - F.coalesce("w_inter", F.lit(0))
            ).cast("long").alias("w_union"),
        )
    )
    return out.withColumn(
        "weighted_jaccard",
        F.when(
            F.col("w_union") > 0,
            F.round(F.col("w_intersection") / F.col("w_union"), 6),
        ).otherwise(F.lit(0.0)),
    )
