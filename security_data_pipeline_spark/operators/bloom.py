"""Bloom-filter membership and KMV (bottom-k) sketches — the map-only
scale paths for benchmark decontamination and corpus-overlap estimation.

Why these exist next to the join-based forms:

- :func:`~security_data_pipeline_spark.operators.dedup.contaminated_doc_ids`
  broadcasts the benchmark's distinct grams and LEFT-SEMI-joins the
  corpus's exploded grams against them. That already avoids a corpus
  shuffle, but the broadcast grows with the eval suite (every distinct
  gram string rides to every executor) and the probe is a hash join per
  gram. The Bloom form compresses the same membership set into a FIXED
  ``m_bits``-bit array (2^20 bits = 128 KiB regardless of gram count),
  shipped once per executor as a one-row broadcast; the corpus pass is
  then a pure map-only scan — ``k`` md5 probes per gram against an
  in-memory bit array, no join build side, no shuffle anywhere. The
  price is a quantified false-positive rate ((set_bits/m)^k), which for
  decontamination only ever OVER-drops: a Bloom hit set is a superset of
  the exact hit set (property-tested), so no contaminated document can
  slip through.
- Exact corpus-overlap (|A ∩ B| / |A ∪ B| over distinct items) costs a
  distinct + join over both corpora's full item sets. The KMV sketch
  (Bar-Yossef et al. 2002; Beyer et al., SIGMOD'07 "distinct-value
  estimation") answers the same question from two ``k``-row bottom-k
  hash sketches: the bottom-k of A ∪ B is computable from the two
  sketches alone, and the fraction of that union sketch present in both
  sides estimates the Jaccard within ~1/sqrt(k). Comparing a new crawl
  against each existing corpus snapshot becomes a driver-side merge of
  k-row frames instead of a 100 TB join per pair.

Every hash here is the repo's engine-portable 60-bit md5 derivation
(``conv(substr(md5(x), 1, 15), 16, 10)``) so DuckDB oracles reproduce
results bit-for-bit — including the Bloom false positives, which the
oracle models as "all k positions land in the union of set positions"
(exactly the bit-array semantics, no bit arrays needed in SQL).

Parity target: the reference pipeline has no decontamination/overlap
operators (its scope ends at ``transform.py``); these extend the
training-data-pipeline family of SURVEY.md §2.12.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from security_data_pipeline_spark.operators.dedup import shingles

#: Bits of the portable md5-derived hash (15 hex chars).
HASH_BITS = 60
_HASH_SPAN = float(1 << HASH_BITS)


def h60(c: Column) -> Column:
    """Non-negative 60-bit hash of a string column, identical in any
    engine with md5: DuckDB spells it
    ``CAST(CONCAT('0x', substr(md5(x), 1, 15)) AS BIGINT)``."""
    return F.conv(F.substring(F.md5(c.cast("binary")), 1, 15), 16, 10).cast(
        "long"
    )


def _bloom_slice_bits(m_bits: int) -> int:
    """Bits per position slice: ``ceil(log2(m_bits))``."""
    return max(1, (m_bits - 1).bit_length())


def bloom_fits_h60(m_bits: int, k: int) -> bool:
    """Whether ``k`` non-overlapping position slices fit the 60-bit
    :func:`h60` hash (true through the 2^20/k=3 default). Wider filters
    (the streaming corpus gate's 2^24) fall back to hex slices of the
    full 128-bit digest — one md5 but k hex parses per item."""
    return k * _bloom_slice_bits(m_bits) <= HASH_BITS


def bloom_positions_from_hash(h: Column, m_bits: int, k: int) -> Column:
    """The ``k`` bit positions of an item given its 60-bit portable hash
    (:func:`h60`) — ``k`` non-overlapping BIT slices of the one hash
    (the Kirsch–Mitzenmacher observation that independent re-hashing
    buys nothing a single wide digest can't provide). Each probe is a
    shift + mask + mod — pure long arithmetic on an already-computed
    ``h``, safe inside HOF lambdas where every subexpression occurrence
    re-evaluates (earlier forms re-ran a hex parse, or the md5 itself,
    once per probe). DuckDB replays slice ``i`` as
    ``((CAST(CONCAT('0x', substr(md5(x), 1, 15)) AS BIGINT)
    >> (i*bits)) & (2^bits - 1)) % m_bits``."""
    bits = _bloom_slice_bits(m_bits)
    if k * bits > HASH_BITS:
        raise ValueError(
            f"bloom: k={k} slices of {bits} bits exceed the {HASH_BITS}-bit "
            f"hash; use the digest form (bloom_fits_h60 is false)"
        )
    mask = (1 << bits) - 1
    return F.array(
        [
            F.pmod(
                F.shiftright(h, i * bits).bitwiseAND(F.lit(mask)),
                F.lit(m_bits),
            )
            for i in range(k)
        ]
    )


def bloom_positions_from_digest(
    digest: Column, m_bits: int, k: int
) -> Column:
    """Wide-filter fallback: ``k`` non-overlapping HEX slices of the full
    128-bit md5 ``digest``, for ``m_bits`` too wide for
    :func:`bloom_positions_from_hash` (k·bits > 60; e.g. the streaming
    corpus gate's 2^24). Costs k hex→long parses per item instead of
    one — use the hash form whenever :func:`bloom_fits_h60` says it
    fits. DuckDB replays slice ``i`` as ``CAST(CONCAT('0x',
    substr(md5(x), 1 + i*len, len)) AS BIGINT) % m_bits``."""
    hex_len = max(1, (_bloom_slice_bits(m_bits) + 3) // 4)
    if k * hex_len > 32:
        raise ValueError(
            f"bloom: k={k} slices of {hex_len} hex chars exceed one md5 "
            f"digest (32); shrink k or m_bits"
        )
    return F.array(
        [
            F.pmod(
                F.conv(
                    F.substring(digest, 1 + i * hex_len, hex_len), 16, 10
                ).cast("long"),
                F.lit(m_bits),
            )
            for i in range(k)
        ]
    )


def bloom_positions(item: Column, m_bits: int, k: int) -> Column:
    """``k`` bit positions of a raw string ``item`` — one md5, then the
    cheapest slicing that fits (:func:`bloom_fits_h60` dispatch).
    Row-level use only (the hash subtree is repeated per slice, which
    codegen de-dupes in plain projections but interpreted HOF lambdas
    do NOT); inside a lambda, map to hashes/digests FIRST (see
    :func:`flag_bloom_hits`)."""
    if bloom_fits_h60(m_bits, k):
        return bloom_positions_from_hash(h60(item), m_bits, k)
    return bloom_positions_from_digest(
        F.md5(item.cast("binary")), m_bits, k
    )


def bloom_word_rows(
    items: DataFrame, item_col: str, m_bits: int = 1 << 20, k: int = 3
) -> DataFrame:
    """Sparse 64-bit-word rows ``(i, w)`` of the Bloom bit array over the
    distinct values of ``items[item_col]`` — the MERGEABLE form: two
    word-row sets union into one filter via ``groupBy(i).agg(bit_or(w))``
    (the streaming maintainer's fold), and the row count is bounded by
    ``m_bits / 64`` regardless of item count.

    One shuffle of ≤ ``m_bits/64``-cardinality keys (map-side bit_or
    partials make the exchange tiny); the build side is expected to be
    the SMALL side (an eval suite, a denylist) — for corpus-sized builds
    the same plan holds, the explode is the scan.
    """
    c = F.col(item_col)
    pos = items.select(
        F.explode(bloom_positions(c, m_bits, k)).alias("_p")
    )
    return (
        pos.select(
            (F.col("_p") / 64).cast("long").alias("i"),
            F.pmod(F.col("_p"), F.lit(64)).cast("int").alias("_b"),
        )
        .select("i", F.expr("shiftleft(CAST(1 AS BIGINT), _b)").alias("_m"))
        .groupBy("i")
        .agg(F.bit_or("_m").alias("w"))
    )


def bloom_filter_frame(
    items_or_words: DataFrame,
    item_col: str | None = None,
    m_bits: int = 1 << 20,
    k: int = 3,
) -> DataFrame:
    """ONE-ROW frame ``(bloom array<long>, m_bits, k)`` holding the dense
    bit array — the probe-side shape. Built either from raw items
    (``item_col`` given) or from persisted :func:`bloom_word_rows` state
    (``item_col=None``, frame must have columns ``(i, w)``).

    The dense array is assembled with a single-row ``collect_list`` →
    map → ``transform(sequence(...))`` fill — ≤ ``m_bits/64`` entries
    (16 Ki longs = 128 KiB at the 2^20 default), never a driver collect.
    Probes consume it via ``crossJoin(broadcast(...))`` so the array
    ships once per executor instead of living in every serialized plan
    fragment (the same literal-vs-broadcast trade documented on
    ``mixing.importance_weights_fused``).
    """
    words = (
        bloom_word_rows(items_or_words, item_col, m_bits, k)
        if item_col is not None
        else items_or_words.select("i", "w")
    )
    n_words = m_bits // 64
    return (
        words.agg(
            F.map_from_arrays(
                F.collect_list("i"), F.collect_list("w")
            ).alias("_wm")
        )
        .select(
            F.transform(
                F.sequence(F.lit(0).cast("long"), F.lit(n_words - 1)),
                lambda i: F.coalesce(
                    F.element_at(F.col("_wm"), i), F.lit(0).cast("long")
                ),
            ).alias("bloom"),
            F.lit(m_bits).alias("m_bits"),
            F.lit(k).alias("k"),
        )
    )


def bloom_hash_contains(
    h: Column, bloom: Column, m_bits: int, k: int
) -> Column:
    """Membership predicate over a precomputed :func:`h60` hash: all
    ``k`` sliced positions are set in the ``bloom`` word array. Pure
    long/getbit math, lambda-safe — usable inside higher-order
    functions, which is what keeps the corpus pass map-only."""
    return F.forall(
        bloom_positions_from_hash(h, m_bits, k),
        lambda p: F.getbit(
            F.element_at(bloom, (p / 64).cast("int") + 1),
            F.pmod(p, F.lit(64)),
        )
        == 1,
    )


def bloom_digest_contains(
    digest: Column, bloom: Column, m_bits: int, k: int
) -> Column:
    """Membership predicate over a precomputed md5 hex ``digest`` for
    WIDE filters (:func:`bloom_fits_h60` false). Lambda-safe."""
    return F.forall(
        bloom_positions_from_digest(digest, m_bits, k),
        lambda p: F.getbit(
            F.element_at(bloom, (p / 64).cast("int") + 1),
            F.pmod(p, F.lit(64)),
        )
        == 1,
    )


def bloom_contains(
    item: Column, bloom: Column, m_bits: int, k: int
) -> Column:
    """Membership predicate for a raw string ``item`` — one md5, then
    the cheapest slicing that fits (:func:`bloom_fits_h60` dispatch).
    Inside a higher-order lambda prefer transforming the array to
    hashes/digests first (HOF lambda bodies are re-evaluated per
    element, defeating common-subexpression reuse of the hash)."""
    if bloom_fits_h60(m_bits, k):
        return bloom_hash_contains(h60(item), bloom, m_bits, k)
    return bloom_digest_contains(
        F.md5(item.cast("binary")), bloom, m_bits, k
    )


def flag_bloom_hits(
    corpus: DataFrame,
    bloom_frame: DataFrame,
    text_col: str = "text",
    n: int = 4,
    m_bits: int = 1 << 20,
    k: int = 3,
) -> DataFrame:
    """Per-document Bloom contamination counts — the map-only corpus
    pass: adds ``n_grams`` (distinct word n-grams) and ``n_bloom_hits``
    (grams whose k positions are all set) to every corpus row.

    Plan shape for 100 TB: ``corpus CROSS JOIN broadcast(one-row bloom)``
    is a BroadcastNestedLoopJoin against a single row — effectively a
    scan-local column — and both counts are higher-order-function folds
    over the in-row gram array. NO shuffle, NO explode, NO join build
    over corpus data; the whole pass pipelines inside one stage
    (plan-asserted in tests/test_bloom.py). A document is contamination-
    flagged iff ``n_bloom_hits > 0``; by construction the flag is a
    SUPERSET of the exact-join flag (false positives only).
    """
    gs = shingles(text_col, n)
    # hash each gram ONCE in a transform, then probe in the filter —
    # HOF lambda bodies re-evaluate per element, so probing raw grams
    # directly would re-run the hash k times per gram. Narrow filters
    # carry one parsed 60-bit long per gram; wide filters carry the hex
    # digest and pay their k parses inside the probe (bloom_fits_h60)
    b = F.col("_bf.bloom")
    if bloom_fits_h60(m_bits, k):
        keys = F.transform(gs, lambda g: h60(g))
        probe = lambda h: bloom_hash_contains(h, b, m_bits, k)  # noqa: E731
    else:
        keys = F.transform(gs, lambda g: F.md5(g.cast("binary")))
        probe = lambda d: bloom_digest_contains(  # noqa: E731
            d, b, m_bits, k
        )
    return (
        corpus.crossJoin(F.broadcast(bloom_frame.alias("_bf")))
        .withColumn("n_grams", F.size(gs))
        .withColumn("n_bloom_hits", F.size(F.filter(keys, probe)))
        .drop("bloom", "m_bits", "k")
    )


def kmv_sketch(
    df: DataFrame, item_col: str, k: int = 256, h_cap: int | None = None
) -> DataFrame:
    """Bottom-``k`` distinct-hash sketch of ``df[item_col]`` — one
    ``k``-row frame ``(h)`` in ascending order, the KMV summary that
    answers distinct-count and (pairwise) Jaccard questions about the
    whole column.

    Physical shape: ``distinct`` carries map-side partial aggregation, so
    the exchange holds per-partition-distinct hashes; the bottom-k is a
    ``TakeOrderedAndProject`` (per-partition heap + driver merge), never
    a global sort. For a 100 TB column whose distinct cardinality is
    itself huge, pass ``h_cap`` (from :func:`kmv_cap` over any cheap
    distinct estimate, e.g. the HLL sketch the repo already maintains):
    hashes above the cap are dropped MAP-SIDE before the distinct, so the
    exchange shrinks from |distinct| to ~safety·k rows. The cap never
    changes the result while ≥ k distinct hashes survive it (the bottom-k
    all sit below any safe cap — property-tested); the function VERIFIES
    that and raises if the cap proved too tight rather than return a
    silently-biased sketch.
    """
    h = df.select(h60(F.col(item_col)).alias("h")).where(
        F.col("h").isNotNull()
    )
    if h_cap is not None:
        capped = h.filter(F.col("h") <= F.lit(int(h_cap)))
        sk = capped.distinct().orderBy("h").limit(k)
        rows = sk.count()
        if rows < k and h.distinct().limit(k).count() == k:
            raise ValueError(
                f"kmv_sketch: h_cap={h_cap} left only {rows} < k={k} "
                "distinct hashes but the column has ≥ k — the cap is too "
                "tight (stale distinct estimate?); widen the safety "
                "factor or drop the cap"
            )
        return sk
    return h.distinct().orderBy("h").limit(k)


def kmv_cap(est_distinct: int, k: int, safety: int = 8) -> int:
    """Map-side hash cap for :func:`kmv_sketch`: with ``est_distinct``
    uniformly-hashed items, the k-th smallest hash concentrates around
    ``k/est_distinct`` of the hash span; keeping ``safety``× that slice
    retains the true bottom-k with overwhelming probability while
    shrinking the distinct's exchange to ~``safety·k`` rows."""
    frac = min(1.0, (safety * k) / max(est_distinct, 1))
    return int(frac * _HASH_SPAN)


def kmv_overlap(
    a_sketch: DataFrame, b_sketch: DataFrame, k: int = 256
) -> DataFrame:
    """Jaccard / distinct-count estimates from two :func:`kmv_sketch`
    frames — ONE output row ``(n_union_sketch, n_both, jaccard_est,
    est_distinct_a, est_distinct_b)``, computed entirely from the two
    ≤ k-row sketches (the 100 TB corpora are never touched again).

    Estimator (Beyer et al., SIGMOD'07): the bottom-k of A ∪ B is the
    bottom-k of (sketch_A ∪ sketch_B); the fraction of that union sketch
    present in BOTH input sketches estimates J(A, B) with standard error
    ~ sqrt(J(1-J)/k). Distinct counts use the (k-1)/h_k unbiased KMV
    form, falling back to the exact sketch size when a side has < k
    distinct items (the sketch then IS the distinct set). All joins are
    over ≤ k-row frames — broadcast by AQE regardless of hints.

    Each input sketch is referenced three times below (union, membership
    join, side estimate). The references are left LAZY on purpose: the
    expensive upstream subtree (gram distinct) ends in an Exchange that
    Catalyst's ReuseExchange dedupes across all three references inside
    the one plan, so the corpora are scanned once per side anyway — an
    eager ``localCheckpoint`` here was MEASURED ~1.5× SLOWER at sf0.1:
    it splits the DAG into serial jobs and defeats the reuse.
    """
    sa = a_sketch.select(F.col("h").alias("h"))
    sb = b_sketch.select(F.col("h").alias("h"))
    u = sa.union(sb).distinct().orderBy("h").limit(k)
    both = (
        u.join(sa.withColumn("_ina", F.lit(1)), "h", "left")
        .join(sb.withColumn("_inb", F.lit(1)), "h", "left")
        .agg(
            F.count(F.lit(1)).alias("n_union_sketch"),
            F.sum(
                (
                    F.col("_ina").isNotNull() & F.col("_inb").isNotNull()
                ).cast("long")
            ).alias("n_both"),
        )
    )

    def side_est(s: DataFrame, name: str) -> DataFrame:
        return s.agg(
            F.when(
                F.count(F.lit(1)) < k,
                F.count(F.lit(1)).cast("double"),
            )
            .otherwise(
                F.lit(float(k - 1)) * F.lit(_HASH_SPAN) / F.max("h")
            )
            .alias(name)
        )

    return (
        both.crossJoin(side_est(sa, "est_distinct_a"))
        .crossJoin(side_est(sb, "est_distinct_b"))
        .select(
            "n_union_sketch",
            "n_both",
            F.round(
                F.col("n_both")
                / F.greatest(F.col("n_union_sketch"), F.lit(1)).cast(
                    "double"
                ),
                6,
            ).alias("jaccard_est"),
            F.round("est_distinct_a", 2).alias("est_distinct_a"),
            F.round("est_distinct_b", 2).alias("est_distinct_b"),
        )
    )
