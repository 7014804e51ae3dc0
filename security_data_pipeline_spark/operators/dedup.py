"""Deduplication operators, exact → fuzzy, all shuffle-conscious.

The dedup family a training-data pipeline needs (SURVEY.md §2.12):

- :func:`exact_dedup` — hash-groupBy on the chosen key columns.
- :func:`keep_last_dedup` — D2 pattern: keep the latest occurrence by an
  explicit order column (reference ``cleaning.py:52`` keep-last semantics).
- :func:`ngram_jaccard_pairs` — shingle → candidate-pair (equi-join on a
  shared shingle, NOT a cross join) → exact Jaccard verify.
- :func:`minhash_lsh_pairs` — MinHash signatures via ``xxhash64(shingle, i)``
  (JVM-side, zero UDF) banded into buckets; candidates are a bucket
  equi-join. The standard 100 TB near-dup path.
- :func:`simhash` — 64-bit SimHash per document, pure Column math.

Scale notes: every candidate generator is an equi-join on a derived key, so
the work is one shuffle per stage with AQE-managed partitioning; nothing here
is O(n²) except the final verify over candidate pairs, which LSH bounds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from security_data_pipeline_spark.pin import pin, pin_lazy


def exact_dedup(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """Exact duplicate removal (arbitrary survivor) — ``dropDuplicates``:
    map-side partial aggregation, one shuffle on the key hash."""
    return df.dropDuplicates(subset) if subset else df.dropDuplicates()


def keep_last_dedup(
    df: DataFrame, keys: list[str], order_col: str, tiebreak: list[str] | None = None
) -> DataFrame:
    """Keep the last occurrence per key by ``order_col`` (desc), with
    deterministic tiebreaks — the explicit-order form of pandas
    ``drop_duplicates(keep="last")``."""
    order = [F.col(order_col).desc()] + [F.col(c).desc() for c in (tiebreak or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def shingles(col: Column | str, n: int = 5, delim: str = " ") -> Column:
    """Word n-gram shingles as an array<string> (distinct, order-free).

    Documents shorter than ``n`` tokens yield an EMPTY array: the length
    must be guarded because ``sequence(1, 0)`` counts DOWN through 0 and
    ``slice`` rejects a 0 start — a bare ``sequence(1,
    greatest(len-(n-1), 0))`` crashes the whole stage on the first short
    document.

    Construction is an incremental ``zip_with`` chain — length-k grams
    extend the length-(k−1) grams with the k-shifted token array, one
    two-string concat per gram — instead of an indexed
    ``slice`` + ``concat_ws`` transform (measured ~3× cheaper per pass
    at sf0.1; SCALE.md "per-element indexed transforms"). The chain puts
    ``n − 1`` zip nodes in the plan, hence the cap."""
    if n < 1 or n > 64:
        raise ValueError(f"shingles: n must be in [1, 64], got {n}")
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(c, delim)
    length = F.size(toks)
    g = toks
    for k in range(1, n):
        g = F.zip_with(
            g,
            F.slice(toks, k + 1, F.greatest(length - k, F.lit(1))),
            lambda a, b: F.concat(a, F.lit(delim), b),
        )
    return F.array_distinct(
        F.when(length >= n, F.slice(g, 1, length - (n - 1))).otherwise(
            F.array().cast("array<string>")
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.8,
    df_cap: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by exact n-gram Jaccard over candidate pairs.

    Candidates = pairs sharing ≥1 shingle (grouped by shingle hash — a
    bounded shuffle, never a cross join). Jaccard computed from |A∩B|
    (shared-shingle count) and set sizes. Output:
    ``id_a, id_b, jaccard`` with id_a < id_b, jaccard ≥ threshold.

    Shingles are xxhash64'd before the shuffle: it moves 8-byte longs
    instead of multi-word strings (~5× less shuffle IO at scale); 64-bit
    collisions are ~(n_shingles²/2⁶⁴) — negligible at any realistic corpus.

    Physical shape — ONE corpus pass: each doc's set size rides along with
    the exploded shingle rows, docs sharing a shingle are grouped
    (``collect_set`` per shingle — bucket size = the shingle's document
    frequency), pairs are expanded per bucket and counted to get |A∩B|.
    No join-backs, no broadcast of a sizes table, no re-evaluation of the
    shingle pipeline per join side. ``df_cap`` optionally drops shingles
    with document frequency above the cap (the standard "stop-shingle"
    guard for pathological corpora — slightly lowers recall; None = exact).
    """
    from security_data_pipeline_spark.operators.skew import fan_out

    hashed = fan_out(df, id_col).select(
        F.col(id_col).alias("_id"),
        F.transform(shingles(text_col, n), lambda s: F.xxhash64(s)).alias(
            "_hs"
        ),
    )
    # explode the struct-array, not the raw array: Generate with a collapsed
    # projection re-evaluates the inlined shingle pipeline per EMITTED row
    # (O(shingles²) per doc — measured 6× slower); packing (hash, set size)
    # into one generator expression evaluates it once per input row
    sh = hashed.select(
        "_id",
        F.explode(
            F.transform(
                "_hs",
                lambda h: F.struct(
                    h.alias("_sh"), F.size("_hs").alias("_sz")
                ),
            )
        ).alias("_x"),
    ).select(
        "_id", F.col("_x._sh").alias("_sh"), F.col("_x._sz").alias("_sz")
    )
    buckets = (
        sh.groupBy("_sh")
        .agg(F.sort_array(F.collect_set(F.struct("_id", "_sz"))).alias("_ms"))
        .filter(F.size("_ms") >= 2)
    )
    if df_cap is not None:
        buckets = buckets.filter(F.size("_ms") <= df_cap)
    inter = (
        buckets.select(F.explode(_bucket_pairs(F.col("_ms"))).alias("_p"))
        .groupBy(
            F.col("_p.a._id").alias("id_a"),
            F.col("_p.b._id").alias("id_b"),
            F.col("_p.a._sz").alias("_sa"),
            F.col("_p.b._sz").alias("_sb"),
        )
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    # threshold on the UNROUNDED ratio (rounding first would admit pairs
    # up to ~5e-7 below threshold); round only the reported value
    raw = (
        F.col("_inter").cast("double")
        / (F.col("_sa") + F.col("_sb") - F.col("_inter")).cast("double")
    )
    return inter.filter(raw >= threshold).select(
        "id_a", "id_b", F.round(raw, 6).alias("jaccard")
    )


def md5_hex(c: Column, n_chars: int = 16) -> Column:
    """First ``n_chars`` hex chars of md5 — a hash as a lexicographically
    ordered string, IDENTICAL in Spark / DuckDB / Trino / Postgres (the
    cross-engine hashing primitive; same trick as sampling.hash_hex16).
    Used by the ``portable=True`` dedup paths so MinHash/SimHash are
    oracle-checkable; the xxhash64 forms stay the fast default (8-byte
    shuffle keys, no hex materialization). 15 chars (60 bits) when the
    value must round-trip through ``conv(·,16,10) → long`` (16 chars can
    exceed the signed-long range)."""
    return F.substring(F.md5(c.cast("binary")), 1, n_chars)


def md5_hash16(c: Column) -> Column:
    return md5_hex(c, 16)


def minhash_from_hex_hashes(
    hashes: Column | str, num_perm: int = 32, slices_per_md5: int = 8
) -> Column:
    """Portable MinHash signature (array<string>, length num_perm) from an
    ``array<string>`` of fixed-width hex shingle hashes.

    Permutation values come from md5 with a seed-group prefix, SLICED:
    md5 group ``g = i // slices_per_md5`` yields ``slices_per_md5``
    fixed-width values per shingle, so 32 permutations cost 4 md5 calls
    per shingle, not 32. Equal-width hex strings order exactly like the
    ints they encode, so the elementwise min is engine-agnostic (DuckDB:
    ``MIN(substr(md5(g || ':' || h), 1+w*j, w))``).

    ONE pass over the shingle array: per element the group md5s are
    materialized (inner ``transform`` over a sequence), sliced, and folded
    into the running elementwise min via ``zip_with``+``least``. A
    transform-per-permutation formulation re-evaluates its md5 once per
    OUTPUT element — HOF-lambda expressions are excluded from Spark's
    subexpression elimination — measured 2.5× slower end-to-end.
    """
    c = F.col(hashes) if isinstance(hashes, str) else hashes
    width = 32 // slices_per_md5
    n_groups = (num_perm + slices_per_md5 - 1) // slices_per_md5

    def _perm_values(h: Column) -> Column:
        fulls = F.transform(
            F.sequence(F.lit(0), F.lit(n_groups - 1)),
            lambda g: F.md5(
                F.concat(g.cast("string"), F.lit(":"), h).cast("binary")
            ),
        )
        vals = F.flatten(
            F.transform(
                fulls,
                lambda m: F.transform(
                    F.sequence(F.lit(0), F.lit(slices_per_md5 - 1)),
                    lambda j: F.substring(m, 1 + width * j, F.lit(width)),
                ),
            )
        )
        if n_groups * slices_per_md5 == num_perm:
            return vals
        return F.slice(vals, 1, num_perm)

    # 'z' > any hex char, so the init loses every least(); a doc with zero
    # shingles keeps the init signature (callers pre-filter those)
    init = F.array_repeat(F.lit("z" * width), num_perm)
    return F.aggregate(
        c,
        init,
        lambda acc, h: F.zip_with(acc, _perm_values(h), lambda a, b: F.least(a, b)),
    )


def minhash_signature(
    col: Column | str, n: int = 5, num_perm: int = 32
) -> Column:
    """MinHash signature (array<long>, length num_perm) over word shingles.

    NOTE: expressions containing HOF lambdas are excluded from Spark's
    subexpression elimination, so the shingle pipeline embedded here is
    re-evaluated once per permutation. Callers on a hot path should
    materialize hashed shingles as a column first and use
    :func:`minhash_from_hashes` (what :func:`minhash_lsh_pairs` does) —
    same values, shingling work done once.
    """
    return minhash_from_hashes(
        F.transform(shingles(col, n), lambda s: F.xxhash64(s)), num_perm
    )


def minhash_from_hashes(hashes: Column | str, num_perm: int = 32) -> Column:
    """MinHash signature from an ``array<long>`` of hashed shingles.

    Permutation i re-hashes each 8-byte long with seed i
    (``xxhash64(h, i)``) — fixed-width input, so per-permutation cost is
    independent of shingle length; the signature element is the min.
    """
    c = F.col(hashes) if isinstance(hashes, str) else hashes

    def _perm(i: int):
        # closure, not a default arg: pyspark HOFs dispatch on lambda arity
        return lambda h: F.xxhash64(h, F.lit(i))

    return F.array(
        *[F.array_min(F.transform(c, _perm(i))) for i in range(num_perm)]
    )


def _bucket_pairs(ids: Column) -> Column:
    """All ordered pairs (i<j) from a sorted array — `transform × slice`,
    JVM-side. Used to emit candidate pairs per LSH bucket WITHOUT a
    self-join (a self-join evaluates the signature subtree twice; grouping
    bucket members costs one aggregation over rows already being shuffled)."""
    return F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + F.lit(2), F.size(ids)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )


def _minhash_band_frame(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    num_perm: int,
    n_bands: int,
    verify: bool,
    portable: bool,
) -> DataFrame:
    """One corpus scan -> the LSH band frame ``(_id[, _hs], band, bhash)``
    (n_bands rows per doc, shingle hashes carried when verifying) — the
    shared index half of :func:`minhash_lsh_pairs` (self-join pairing) and
    :func:`cross_corpus_neardups` (two-sided equi-join pairing)."""
    rows_per_band = num_perm // n_bands
    # two projections: hash shingle strings ONCE into a concrete column,
    # then num_perm cheap fixed-width rehash permutations over it (see
    # minhash_signature note on HOF-lambda subexpression elimination)
    from security_data_pipeline_spark.operators.skew import fan_out

    # Exclude zero-shingle docs (NULL or shorter than n tokens) with a
    # predicate on the RAW column — they carry no n-gram evidence, yet
    # their all-NULL signatures band-collide with EACH OTHER and the
    # verify ratio divides by an empty union (ANSI divide-by-zero crash);
    # the portable oracle's unnest drops them anyway. NEVER filter on the
    # derived _hs: PushDownPredicate substitutes the alias, so the whole
    # shingle+md5 pipeline lands in a Filter at the scan — BELOW the
    # fan_out exchange, i.e. single-partition on a one-row-group file,
    # then evaluates again in the projection. Measured 3× on this
    # operator.
    df = df.filter(F.size(F.split(F.col(text_col), " ")) >= n)
    shingle_hash = (lambda s: md5_hex(s, 15)) if portable else F.xxhash64
    hashed = fan_out(df, id_col).select(
        F.col(id_col).alias("_id"),
        F.transform(shingles(text_col, n), lambda s: shingle_hash(s)).alias(
            "_hs"
        ),
    )
    sig_expr = (
        minhash_from_hex_hashes("_hs", num_perm)
        if portable
        else minhash_from_hashes("_hs", num_perm)
    )
    if portable and verify:
        # ride the band shuffle as longs, not 15-char strings
        carry = F.transform(
            "_hs", lambda h: F.conv(h, 16, 10).cast("long")
        ).alias("_hs")
        sig = hashed.select("_id", carry, sig_expr.alias("_sig"))
    else:
        sig = hashed.select(
            "_id",
            *(["_hs"] if verify else []),
            sig_expr.alias("_sig"),
        )

    def _band_hash(b: int) -> Column:
        els = [
            F.element_at(F.col("_sig"), b * rows_per_band + j + 1)
            for j in range(rows_per_band)
        ]
        if portable:
            # full 32-hex md5 of the '|'-joined band slice — mirrors the
            # oracle's md5(string_agg(sig, '|' ORDER BY perm))
            return F.md5(F.concat_ws("|", *els).cast("binary"))
        return F.xxhash64(*els)

    return sig.select(
        "_id",
        *(["_hs"] if verify else []),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        _band_hash(b).alias("bhash"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("_b"),
    ).select("_id", *(["_hs"] if verify else []), "_b.band", "_b.bhash")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    num_perm: int = 32,
    n_bands: int = 8,
    verify_threshold: float | None = 0.8,
    portable: bool = False,
    bucket_cap: int | None = None,
) -> DataFrame:
    """MinHash + LSH banding near-dup pairs.

    rows_per_band = num_perm // n_bands; docs colliding in ANY band become
    candidates (equi-join on (band, band_hash)); candidates optionally
    verified with exact n-gram Jaccard. Output: ``id_a, id_b`` (+``jaccard``
    when verifying).

    ``bucket_cap`` drops band buckets holding more than the cap docs
    BEFORE the |bucket|² pair explosion — the banding analogue of
    :func:`ngram_jaccard_pairs`'s stop-shingle ``df_cap``: boilerplate
    corpora give many docs identical band signatures, and recall is
    traded only inside those pathological buckets. None = exact.

    ``portable=True`` derives every hash from md5 (fixed-width hex
    strings) instead of xxhash64, making the whole index reproducible in
    ANSI-ish SQL — the oracle-checked registered form. The verify shingle
    set still shuffles as 8-byte longs (``conv`` of the 15-hex-char hash —
    injective, so intersection counts equal the oracle's string
    intersects); measured within ~25% of the xxhash64 path.
    """
    verify = verify_threshold is not None
    bands = _minhash_band_frame(
        df, id_col, text_col, n, num_perm, n_bands, verify, portable
    )

    # When verifying, each doc's hashed shingle set rides along through the
    # band shuffle (n_bands× replication of ~8 bytes/shingle) so the exact
    # Jaccard check needs NO second pass over the corpus and NO join back —
    # the whole operator is one corpus scan + one banded shuffle. (A
    # join-back verify re-evaluates the shingle pipeline per join side;
    # Spark has no exchange to reuse across differently-aliased subtrees.)
    member = F.struct("_id", *(["_hs"] if verify else []))
    buckets = (
        bands.groupBy("band", "bhash")
        .agg(F.sort_array(F.collect_set(member)).alias("_ms"))
        .filter(F.size("_ms") >= 2)
    )
    if bucket_cap is not None:
        buckets = buckets.filter(F.size("_ms") <= bucket_cap)
    pairs = buckets.select(F.explode(_bucket_pairs(F.col("_ms"))).alias("_p"))
    if not verify:
        return (
            pairs.select(
                F.col("_p.a._id").alias("id_a"), F.col("_p.b._id").alias("id_b")
            ).distinct()
        )
    inter = F.size(F.array_intersect(F.col("_p.a._hs"), F.col("_p.b._hs")))
    union = F.size("_p.a._hs") + F.size("_p.b._hs") - inter
    # filter on the unrounded ratio, round only for output (matches the
    # DuckDB oracle, which already thresholds the raw division)
    raw = inter.cast("double") / union.cast("double")
    return (
        pairs.filter(raw >= verify_threshold)
        .select(
            F.col("_p.a._id").alias("id_a"),
            F.col("_p.b._id").alias("id_b"),
            F.round(raw, 6).alias("jaccard"),
        )
        .distinct()
    )


def cross_corpus_neardups(
    df_new: DataFrame,
    df_ref: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    num_perm: int = 32,
    n_bands: int = 8,
    verify_threshold: float | None = 0.8,
    portable: bool = False,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Near-duplicates of NEW documents against an EXISTING corpus — the
    ingest-time dedup a training pipeline runs on every fresh crawl ("is
    this page already in the training set?"), where the reference side is
    far too large to broadcast (so the n-gram
    :func:`~security_data_pipeline_spark.operators.textops`-style
    broadcast decontamination doesn't apply).

    Both sides build the SAME MinHash band frame
    (:func:`_minhash_band_frame` — identical shingle hash, permutations,
    band hashing, so a doc present on both sides ALWAYS collides with
    itself); candidates are then a plain equi-join on ``(band, bhash)``
    between the sides. Two-sided pairing is STRICTLY CHEAPER than the
    self-join form: no per-bucket pair explosion, no ``id_a < id_b``
    dedup — the join's |new_bucket|×|ref_bucket| work replaces the
    self-join's |bucket|² and never pairs new-with-new or ref-with-ref.
    Output: ``(new_id, ref_id[, jaccard])``, verified against
    ``verify_threshold`` exactly like :func:`minhash_lsh_pairs` (filter
    on the unrounded ratio, round for output).

    Scale shape: one scan + one banded shuffle per side, candidates
    bounded by cross-side bucket co-occupancy. ``bucket_cap`` drops band
    buckets holding more than the cap docs ON EITHER SIDE before the
    join — the banding analogue of ``ngram_jaccard_pairs(df_cap=...)``:
    a boilerplate-heavy corpus (empty pages, templated chrome) can give
    thousands of docs per side an IDENTICAL band signature, and that one
    bucket's join emits |new_bucket|x|ref_bucket| candidates. Capped
    buckets trade recall ONLY among those pathological groups (documented
    recall trade, same as df_cap); None = exact. Ids may overlap between
    corpora (they are different tables); a shared id that is a true
    near-dup simply reports itself.
    """
    verify = verify_threshold is not None
    bn = _minhash_band_frame(
        df_new, id_col, text_col, n, num_perm, n_bands, verify, portable
    )
    br = _minhash_band_frame(
        df_ref, id_col, text_col, n, num_perm, n_bands, verify, portable
    )
    return _band_join_pairs(bn, br, verify_threshold, bucket_cap)


def _band_join_pairs(
    bn: DataFrame,
    br: DataFrame,
    verify_threshold: float | None,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Two-sided candidate pairing over :func:`_minhash_band_frame`
    outputs (``_id[, _hs], band, bhash``): equi-join on (band, bhash),
    optional per-side ``bucket_cap``, optional exact-Jaccard verify on the
    carried shingle sets. Output ``(new_id, ref_id[, jaccard])`` — shared
    by :func:`cross_corpus_neardups` (frames built in-process) and the
    streaming near-dup maintainer (reference side read from the persisted
    band index)."""
    verify = verify_threshold is not None
    bn = bn.withColumnsRenamed(
        {"_id": "new_id", **({"_hs": "_hs_n"} if verify else {})}
    )
    br = br.withColumnsRenamed(
        {"_id": "ref_id", **({"_hs": "_hs_r"} if verify else {})}
    )
    if bucket_cap is not None:
        for side in ("bn", "br"):
            frame = bn if side == "bn" else br
            ok = (
                frame.groupBy("band", "bhash")
                .agg(F.count(F.lit(1)).alias("_cnt"))
                .filter(F.col("_cnt") <= bucket_cap)
                .select("band", "bhash")
            )
            if side == "bn":
                bn = bn.join(ok, ["band", "bhash"], "left_semi")
            else:
                br = br.join(ok, ["band", "bhash"], "left_semi")
    cand = bn.join(br, ["band", "bhash"]).drop("band", "bhash")
    if not verify:
        return cand.select("new_id", "ref_id").distinct()
    cand = cand.dropDuplicates(["new_id", "ref_id"])
    inter = F.size(F.array_intersect(F.col("_hs_n"), F.col("_hs_r")))
    union = F.size("_hs_n") + F.size("_hs_r") - inter
    raw = inter.cast("double") / union.cast("double")
    return (
        cand.filter(raw >= verify_threshold)
        .select("new_id", "ref_id", F.round(raw, 6).alias("jaccard"))
    )


def simhash(col: Column | str, bits: int = 64) -> Column:
    """SimHash over whitespace tokens: bit j is the sign of
    Σ_tokens (±1 by bit j of xxhash64(token)). Pure Column math.

    NOTE: the embedded token-hash pipeline is re-evaluated once per bit
    (HOF-lambda expressions are excluded from subexpression elimination);
    hot paths should materialize token hashes as a column and call
    :func:`simhash_from_hashes` (what :func:`simhash_dup_pairs` does)."""
    c = F.col(col) if isinstance(col, str) else col
    return simhash_from_hashes(
        F.transform(F.split(F.lower(c), " "), lambda t: F.xxhash64(t)), bits
    )


def simhash_from_hashes(hashes: Column | str, bits: int = 64) -> Column:
    """SimHash from an ``array<long>`` of token hashes: ``bits`` sequential
    ±1 folds over the array (shift amounts must be Python ints for the JVM
    shiftright signature)."""
    hashes = F.col(hashes) if isinstance(hashes, str) else hashes

    def _sign_fold(j: int):
        # bind j via closure — pyspark HOFs dispatch on lambda ARITY, so a
        # `j=j` default parameter would receive a third lambda variable
        def merge(acc: Column, h: Column) -> Column:
            return acc + F.when(
                F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1,
                F.lit(1).cast("long"),
            ).otherwise(F.lit(-1).cast("long"))

        return merge

    out = F.lit(0).cast("long")
    for j in range(bits):
        bit_sum = F.aggregate(hashes, F.lit(0).cast("long"), _sign_fold(j))
        mask = (1 << j) if j < 63 else -(1 << 63)  # bit 63 = long sign bit
        out = out.bitwiseOR(
            F.when(bit_sum > 0, F.lit(mask).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return out


def _hex_digit(ch: Column) -> Column:
    """Value of one lowercase hex char — ``ascii`` arithmetic, identical in
    Spark and DuckDB (no conv()/strtol needed)."""
    a = F.ascii(ch)
    return a - F.when(a >= 97, F.lit(87)).otherwise(F.lit(48))


def simhash_bits_from_hex(
    hashes: Column | str, n_tokens: Column
) -> Column:
    """Portable SimHash as an ``array<long>`` of 64 bits (MSB-first) from an
    ``array<string>`` of 16-hex-char token hashes.

    Bit j is set iff more than half the tokens have bit j set in their hash
    (equivalent to the ±1-fold sign of :func:`simhash_from_hashes`, written
    as ``2·Σbit > n`` so the oracle needs no signed fold). One pass over the
    token array: per token the 64 bits are expanded from its 16 hex digits
    (``ascii`` math — engine-agnostic), then zip-summed into a 64-long
    accumulator.
    """
    c = F.col(hashes) if isinstance(hashes, str) else hashes

    def _bits(h: Column) -> Column:
        # materialize the 16 digit values FIRST (16 substring+ascii ops),
        # then expand 4 bits per digit with arithmetic on the lambda-bound
        # value — inlining the digit extraction into the bit lambda costs
        # 64 substring+ascii per token (HOF lambdas get no subexpression
        # elimination); measured ~2× on the whole operator
        digits = F.transform(
            F.sequence(F.lit(1), F.lit(16)),
            lambda p: _hex_digit(F.substring(h, p, F.lit(1))),
        )
        return F.flatten(
            F.transform(
                digits,
                lambda d: F.transform(
                    F.sequence(F.lit(3), F.lit(0), F.lit(-1)),
                    lambda k: (
                        F.floor(d / F.pow(F.lit(2.0), k)).cast("long") % 2
                    ),
                ),
            )
        )

    sums = F.aggregate(
        c,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, h: F.zip_with(acc, _bits(h), lambda a, b: a + b),
    )
    return F.transform(
        sums,
        lambda s: F.when(s * 2 > n_tokens, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        ),
    )


def _simhash_dup_pairs_portable(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int,
    n_blocks: int,
    bucket_cap: int | None = None,
) -> DataFrame:
    """md5-derived SimHash pairs — same pigeonhole block join as the fast
    path, every hash reproducible in the DuckDB oracle (relational form:
    token×bit unnest, grouped sign sums)."""
    from security_data_pipeline_spark.operators.skew import fan_out

    block_bits = 64 // n_blocks
    hashed = fan_out(df, id_col).select(
        F.col(id_col).alias("_id"),
        F.transform(
            F.split(F.lower(F.col(text_col)), " "), lambda t: md5_hash16(t)
        ).alias("_th"),
    )
    h = hashed.select(
        "_id",
        simhash_bits_from_hex("_th", F.size("_th")).alias("_bits"),
    )
    blocks = h.select(
        "_id",
        "_bits",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("block"),
                        F.aggregate(
                            F.slice("_bits", b * block_bits + 1, block_bits),
                            F.lit(0).cast("long"),
                            lambda a, x: a * 2 + x,
                        ).alias("bval"),
                    )
                    for b in range(n_blocks)
                ]
            )
        ).alias("_b"),
    ).select("_id", "_bits", "_b.block", "_b.bval")
    buckets = (
        blocks.groupBy("block", "bval")
        .agg(
            F.sort_array(F.collect_set(F.struct("_id", "_bits"))).alias("_ms")
        )
        .filter(F.size("_ms") >= 2)
    )
    if bucket_cap is not None:
        buckets = buckets.filter(F.size("_ms") <= bucket_cap)
    cand = (
        buckets.select(F.explode(_bucket_pairs(F.col("_ms"))).alias("_p"))
        .select(
            F.col("_p.a._id").alias("id_a"),
            F.col("_p.b._id").alias("id_b"),
            F.col("_p.a._bits").alias("_ba"),
            F.col("_p.b._bits").alias("_bb"),
        )
        .distinct()
    )
    hamming = F.aggregate(
        F.zip_with(F.col("_ba"), F.col("_bb"), lambda x, y: F.abs(x - y)),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return cand.select(
        "id_a", "id_b", hamming.alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


def simhash_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_blocks: int = 4,
    portable: bool = False,
    bucket_cap: int | None = None,
) -> DataFrame:
    """SimHash near-dup pairs via the pigeonhole block trick: split the 64-bit
    hash into ``n_blocks`` blocks; any pair within ``max_hamming <
    n_blocks`` must agree on ≥1 whole block → candidates are a block-value
    equi-join, verified by popcount of XOR.

    ``bucket_cap`` drops block buckets larger than the cap before the
    |bucket|² pair explosion (the stop-shingle/df_cap analogue —
    boilerplate corpora hash to identical blocks; recall traded only
    inside those buckets; None = exact).

    ``portable=True`` switches to md5-derived bit arrays (cross-engine
    reproducible, oracle-checked registered form; see
    :func:`simhash_bits_from_hex`)."""
    if portable:
        return _simhash_dup_pairs_portable(
            df, id_col, text_col, max_hamming, n_blocks, bucket_cap
        )
    block_bits = 64 // n_blocks
    # token hashes materialized once (separate projection), then 64 cheap
    # folds — see simhash() note on HOF-lambda subexpression elimination
    from security_data_pipeline_spark.operators.skew import fan_out

    hashed = fan_out(df, id_col).select(
        F.col(id_col).alias("_id"),
        F.transform(
            F.split(F.lower(F.col(text_col)), " "), lambda t: F.xxhash64(t)
        ).alias("_th"),
    )
    h = hashed.select("_id", simhash_from_hashes("_th").alias("_h"))
    blocks = h.select(
        "_id",
        "_h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("block"),
                        F.shiftrightunsigned(F.col("_h"), b * block_bits)
                        .bitwiseAND(F.lit((1 << block_bits) - 1))
                        .alias("bval"),
                    )
                    for b in range(n_blocks)
                ]
            )
        ).alias("_b"),
    ).select("_id", "_h", "_b.block", "_b.bval")

    buckets = (
        blocks.groupBy("block", "bval")
        .agg(
            F.sort_array(F.collect_set(F.struct("_id", "_h"))).alias("_ms")
        )
        .filter(F.size("_ms") >= 2)
    )
    if bucket_cap is not None:
        buckets = buckets.filter(F.size("_ms") <= bucket_cap)
    cand = (
        buckets.select(F.explode(_bucket_pairs(F.col("_ms"))).alias("_p"))
        .select(
            F.col("_p.a._id").alias("id_a"),
            F.col("_p.b._id").alias("id_b"),
            F.col("_p.a._h").alias("_ha"),
            F.col("_p.b._h").alias("_hb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
    return cand.select(
        "id_a", "id_b", hamming.alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


def contaminated_doc_ids(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
) -> DataFrame:
    """Benchmark decontamination: ids of corpus docs sharing ≥1 word
    n-gram with an evaluation set — the step that keeps test questions out
    of training data.

    Physical shape for 100 TB: the benchmark's distinct grams are a SMALL
    set (eval suites are KBs–MBs) → broadcast; the corpus grams stream
    through a broadcast LEFT SEMI join (no row multiplication, no corpus
    shuffle) and only matching ids survive to the final distinct. The
    corpus side is a PLAIN explode of the gram array — nothing else may
    ride inside the generator: an earlier version packed ``size(gs)``
    into a per-element struct, and the second reference to the shingle
    HOF re-evaluated the whole pipeline once per emitted gram (O(grams²)
    per doc — measured 6.5 s vs 0.9 s for the sf0.1 drop list).
    """
    from security_data_pipeline_spark.operators.skew import fan_out

    bench_grams = benchmark.select(
        F.explode(shingles(text_col, n)).alias("_g")
    ).distinct()
    # fan_out first: a one-row-group documents file would otherwise run
    # the whole gram explode on one core
    corpus_grams = fan_out(corpus, id_col).select(
        F.col(id_col), F.explode(shingles(text_col, n)).alias("_g")
    )
    return (
        corpus_grams.join(F.broadcast(bench_grams), "_g", "left_semi")
        .select(id_col)
        .distinct()
    )


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
) -> DataFrame:
    """Per EVAL-doc leak report — the other direction of
    :func:`contaminated_doc_ids` (which flags TRAINING docs to drop, this
    says which BENCHMARK items are compromised and how badly): for each
    benchmark doc, how many of its distinct word n-grams appear anywhere
    in the corpus, the contamination fraction, and the worst-case corpus
    document frequency among the leaked grams (a gram in 10k corpus docs
    is boilerplate; one in 2 is a verbatim leak).

    Physical shape for 100 TB: the benchmark's distinct grams broadcast
    (eval suites are KBs–MBs); the corpus's grams stream through that
    broadcast as a map-side LEFT SEMI filter BEFORE any aggregation, so
    the document-frequency groupBy only ever shuffles grams that match
    the benchmark (a benchmark-sized set) — the corpus is never shuffled
    and no corpus-wide gram table is built. Output: ``(id_col, n_grams,
    n_hit, contamination_frac, max_corpus_df)`` — one row per benchmark
    doc, zeros for clean ones, frac 0.0 for docs shorter than ``n``
    tokens.
    """
    # plain explode_outer: zero-gram docs keep one NULL row, and nothing
    # else may ride inside the generator (a second reference to the
    # shingle HOF re-evaluates the pipeline per emitted gram — the
    # quadratic contaminated_doc_ids paid before it was measured out)
    bench = benchmark.select(
        F.col(id_col),
        F.explode_outer(shingles(text_col, n)).alias("_g"),
    )
    from security_data_pipeline_spark.operators.skew import fan_out

    bench_set = bench.filter(F.col("_g").isNotNull()).select("_g").distinct()
    # fan_out first: documents tables often land as one row group, and a
    # single-partition scan would run the whole gram explode on one core
    corpus_grams = fan_out(corpus, id_col).select(
        F.explode(shingles(text_col, n)).alias("_g")
    )
    matched = (
        corpus_grams.join(F.broadcast(bench_set), "_g", "left_semi")
        .groupBy("_g")
        .agg(F.count(F.lit(1)).alias("_df"))
    )
    joined = bench.join(F.broadcast(matched), "_g", "left")
    n_grams = F.count(F.col("_g"))
    n_hit = F.count(F.col("_df"))
    return joined.groupBy(id_col).agg(
        n_grams.alias("n_grams"),
        n_hit.alias("n_hit"),
        F.round(
            F.when(n_grams > 0, n_hit / n_grams).otherwise(F.lit(0.0)), 6
        ).alias("contamination_frac"),
        F.coalesce(F.max("_df"), F.lit(0)).alias("max_corpus_df"),
    )


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    id_col: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components by iterative min-label propagation — turns
    near-dup *pairs* into dedup *clusters* (the step that actually shrinks a
    training corpus: keep one canonical doc per component).

    Every node starts labeled with its own id; each round replaces a node's
    label with the min over itself and its neighbors' labels, until a round
    changes nothing (labels are monotone non-increasing, so the sum is a
    convergence witness — one cheap agg per round, no full-frame compare).
    Rounds needed = graph diameter; near-dup graphs are unions of small
    cliques, so 2–3 rounds in practice. Each round is two hash joins on the
    node id plus a groupBy — all AQE-managed shuffles, nothing driver-side
    except the 1-row convergence check. ``localCheckpoint`` truncates the
    lineage so plans don't grow with iteration count.

    Returns ``(id_col, cluster_id)`` for EVERY node (singletons label
    themselves) — cluster_id = min node id in the component.
    """
    sym = edges.select(
        F.col(a_col).alias("_src"), F.col(b_col).alias("_dst")
    ).union(edges.select(F.col(b_col).alias("_src"), F.col(a_col).alias("_dst")))
    labels = (
        nodes.select(F.col(id_col).alias("_id"))
        .distinct()
        .withColumn("_lbl", F.col("_id"))
        .transform(pin)
    )
    prev_sum = labels.agg(F.sum("_lbl")).first()[0]
    for _ in range(max_iter):
        nbr_min = (
            sym.join(
                labels.select(
                    F.col("_id").alias("_dst"), F.col("_lbl").alias("_dlbl")
                ),
                "_dst",
            )
            .groupBy("_src")
            .agg(F.min("_dlbl").alias("_nmin"))
        )
        labels = (
            labels.join(
                nbr_min.withColumnRenamed("_src", "_id"), "_id", "left"
            )
            .select(
                "_id",
                F.least(
                    F.col("_lbl"), F.coalesce("_nmin", F.col("_lbl"))
                ).alias("_lbl"),
            )
            .transform(pin)
        )
        new_sum = labels.agg(F.sum("_lbl")).first()[0]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels.select(
        F.col("_id").alias(id_col), F.col("_lbl").alias("cluster_id")
    )


def connected_components_incremental(
    prev_labels: DataFrame,
    new_edges: DataFrame,
    new_nodes: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    id_col: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """Fold NEW nodes and edges into an existing component labeling
    without re-walking old clusters — the ingest-time companion of
    :func:`cross_corpus_neardups`: every crawl adds documents and
    near-dup edges, and recomputing the closure over the whole corpus
    per crawl is a full-graph job that grows with corpus size, not crawl
    size.

    The trick is standard star contraction: each previously-labeled node
    contributes ONE virtual edge ``(node, its_label)``, collapsing every
    old component to a star of diameter ≤ 2. Min-label propagation over
    (virtual ∪ new) edges then converges in ~(new-edge diameter + 2)
    rounds regardless of how large or stringy the OLD components were —
    and old labels can only merge DOWNWARD when a new edge bridges two
    components, so the result provably equals the full recompute on the
    cumulative graph (label = min node id of the merged component;
    equality property-tested on random graphs).

    ``prev_labels`` = a prior :func:`connected_components` (or this
    function's) output; ``new_nodes`` = this batch's node frame (ids not
    in ``prev_labels`` label themselves before propagation).

    Propagation runs over AFFECTED components only: a component of the
    cumulative graph either contains an endpoint of a new edge or a new
    node — in which case every prior sub-component it merges intersects
    the batch's touched set and is pulled into the propagation — or it
    contains none and provably cannot change (labels are min member ids;
    no new edge reaches it). Untouched labels pass through as a map-side
    anti-join with NO propagation shuffles, so per-batch shuffle volume
    follows |touched components| + |batch|, never corpus size: the old
    corpus is read (one column-pruned scan to split touched from
    untouched), never re-walked. The touched frontier (edge endpoints +
    new nodes, then their cluster ids) is broadcast — batch-bounded in
    the ingest use this exists for; equality with the full recompute is
    property-tested on random graphs either way.
    """
    touched = (
        new_edges.select(F.col(a_col).alias(id_col))
        .unionByName(new_edges.select(F.col(b_col).alias(id_col)))
        .unionByName(new_nodes.select(id_col))
        .distinct()
    )
    affected_cids = (
        prev_labels.join(F.broadcast(touched), id_col, "left_semi")
        .select("cluster_id")
        .distinct()
    )
    affected = prev_labels.join(
        F.broadcast(affected_cids), "cluster_id", "left_semi"
    )
    untouched = prev_labels.join(
        F.broadcast(affected_cids), "cluster_id", "left_anti"
    ).select(id_col, "cluster_id")
    # star contraction over the affected slice only
    virtual = affected.select(
        F.col(id_col).alias(a_col), F.col("cluster_id").alias(b_col)
    ).filter(F.col(a_col) != F.col(b_col))
    all_edges = new_edges.select(a_col, b_col).unionByName(virtual)
    cc_nodes = (
        affected.select(id_col)
        .unionByName(new_nodes.select(id_col))
        .distinct()
    )
    relabeled = connected_components(
        all_edges, cc_nodes, a_col, b_col, id_col, max_iter
    )
    return untouched.unionByName(relabeled)


def pick_cluster_survivors(
    clusters: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    score_col: str = "score",
) -> DataFrame:
    """Quality-aware dedup survivorship: per near-dup cluster keep the
    HIGHEST-SCORING member (ties → lowest id) instead of the arbitrary
    lowest-id canonical — the policy an actual training-data pipeline
    wants ("of these five near-identical pages, keep the cleanest one").

    ``clusters`` = :func:`connected_components` output (id, cluster);
    ``scores`` = any per-doc NUMERIC quality signal (classifier score,
    length, LM perplexity negated). Ids may be any orderable type (the
    string doc ids the rest of this module accepts included): the argmax
    is ONE ``min_by`` aggregate over a lexicographic (null-score flag,
    -score, id) struct per cluster — negation touches only the numeric
    score, never the id — so no window over members, no per-cluster
    sort; the survivor frame (one row per cluster) joins back on the
    cluster key. A NULL score always LOSES to any scored member (struct
    ordering sorts a NULL field first, so a bare ``-score`` key would
    elect the unscored doc); a cluster whose members are all unscored
    falls back to the lowest id. Deterministic: the key is unique per
    member.
    """
    member = clusters.join(scores, id_col)
    best = member.groupBy(cluster_col).agg(
        F.min_by(
            F.col(id_col),
            F.struct(
                F.col(score_col).isNull().cast("int").alias("nl"),
                F.coalesce(
                    -F.col(score_col).cast("double"), F.lit(0.0)
                ).alias("ns"),
                F.col(id_col).alias("id"),
            ),
        ).alias("survivor_id")
    )
    return clusters.join(best, cluster_col).select(
        id_col,
        cluster_col,
        "survivor_id",
        (F.col(id_col) == F.col("survivor_id")).alias("keep"),
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    sort_col: str = "text",
    block_chars: int = 8,
    window: int = 3,
) -> DataFrame:
    """Sorted-neighborhood candidate pairs — the third classic blocking
    family next to shingle equi-joins and LSH bands: sort records by a key,
    compare each record only with its ``window`` successors.

    The textbook method sorts GLOBALLY; a global rank is a scale-killer
    (single-partition window). This form blocks first — records sharing the
    leading ``block_chars`` of the canonicalized sort key land in one
    partition, are ranked there (``row_number`` per block), and pair up via
    a self-equi-join on the block key filtered to rank distance ∈
    [1, window]. Near-dup texts agree on their prefix, so the block
    boundary loses only pairs that already differ in the first
    ``block_chars`` characters — the standard multi-pass answer (vary the
    key) applies. One shuffle on the block key; candidates ≤ |block|·window.

    Output: ``id_a, id_b, rank_gap`` with id_a's key sorting before id_b's.
    """
    canon = F.regexp_replace(
        F.lower(F.trim(F.col(sort_col))), r"\s+", " "
    )
    base = df.select(
        F.col(id_col).alias("_id"),
        canon.alias("_key"),
        F.substring(canon, 1, block_chars).alias("_blk"),
    )
    w = Window.partitionBy("_blk").orderBy("_key", "_id")
    ranked = base.withColumn("_rn", F.row_number().over(w))
    a = ranked.select(
        F.col("_blk"),
        F.col("_id").alias("id_a"),
        F.col("_rn").alias("_rn_a"),
    )
    b = ranked.select(
        F.col("_blk"),
        F.col("_id").alias("id_b"),
        F.col("_rn").alias("_rn_b"),
    )
    gap = F.col("_rn_b") - F.col("_rn_a")
    return (
        a.join(b, "_blk")
        .filter((gap >= 1) & (gap <= window))
        .select("id_a", "id_b", gap.alias("rank_gap"))
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing (rolling-hash) fingerprints, MOSS-style: hash every
    POSITIONAL word k-gram (a rolling hash over the token stream), slide a
    window of ``window`` consecutive k-gram hashes, keep each window's
    minimum — the classic guarantee that any shared run of
    ``k + window - 1`` tokens between two documents yields at least one
    IDENTICAL selected fingerprint, while storing only ~1/window of the
    k-gram hashes.

    Hashes are 16-hex-char md5 prefixes: fixed-width hex strings order
    exactly like the 64-bit ints they encode (min-selection is therefore
    engine-portable — same trick as the portable MinHash path). Documents
    shorter than k tokens emit one fingerprint of their full text, so every
    doc is represented. Output: one (id, fp) row per DISTINCT selected
    fingerprint — the per-doc sketch is O(tokens/window).

    Column-only: the k-gram and window selections are array HOFs inside one
    projection; no shuffle until the caller groups by fingerprint.

    NULL-text documents emit no fingerprints (``concat_ws`` would otherwise
    fold NULL to '' and give every NULL doc the identical md5('')
    fingerprint — pairing all of them; the SQL oracle's NULL-dropping
    equi-join agrees with the filter, not with that).
    """
    from security_data_pipeline_spark.operators.skew import fan_out

    # one md5 PER K-GRAM is the heaviest map kernel in the dedup family
    # and runs before any exchange — fan out so a single-row-group corpus
    # file doesn't serialize it onto one core (no-op at scale)
    df = fan_out(df.filter(F.col(text_col).isNotNull()), id_col)
    toks = F.split(F.col(text_col), " ")
    gidx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1)))
    grams = F.transform(
        gidx, lambda i: F.concat_ws(" ", F.slice(toks, i, k))
    )
    base = df.select(
        F.col(id_col).alias("_id"),
        F.transform(grams, lambda g: md5_hash16(g)).alias("_hs"),
    )
    # two references to _hs (size + slice) below keep the hash pipeline
    # materialized as an attribute instead of re-inlined per window
    widx = F.sequence(
        F.lit(1),
        F.greatest(F.size(F.col("_hs")) - (window - 1), F.lit(1)),
    )
    fps = F.array_distinct(
        F.transform(
            widx, lambda i: F.array_min(F.slice(F.col("_hs"), i, window))
        )
    )
    return base.select("_id", F.explode(fps).alias("fp")).select(
        F.col("_id").alias(id_col), "fp"
    )


def winnow_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
    min_shared: int = 2,
    df_cap: int | None = None,
) -> DataFrame:
    """Near-dup candidate pairs from shared winnowed fingerprints: docs are
    paired inside each fingerprint bucket (bounded by the fingerprint's
    document frequency — never a cross join), shared-fingerprint counts and
    a containment ratio (shared / smaller sketch) come from ONE
    re-aggregation. The winnowing guarantee makes this the standard
    partial-overlap detector (plagiarism / quote / boilerplate reuse) —
    sensitive to any shared run of ``k + window - 1`` tokens, where
    whole-document hashing (exact dedup) and global-similarity indexes
    (MinHash) both miss short embedded overlaps.

    ``df_cap`` drops fingerprint buckets shared by more than that many
    documents before pair explosion — the stop-shingle guard this
    operator's siblings carry (:func:`ngram_jaccard_pairs`). Unlike a
    degenerate LSH band, a hot fingerprint is EXPECTED in real corpora:
    boilerplate (license headers, navigation chrome) is precisely a shared
    ``k + window - 1``-token run across millions of documents, and an
    uncapped bucket of M docs emits M²/2 pairs and materializes an
    M-element ``collect_set`` in one task. The trade is recall on pairs
    whose ONLY shared runs are ubiquitous boilerplate (their shared_fps
    drops by the capped buckets; a pair can fall under ``min_shared``) —
    exactly the pairs a dedup pipeline doesn't want anyway. Default None
    preserves exact semantics; at scale set it to a few hundred.
    """
    from security_data_pipeline_spark.operators.skew import fan_out

    fps = winnow_fingerprints(
        fan_out(df, id_col), id_col=id_col, text_col=text_col, k=k,
        window=window,
    ).select(F.col(id_col).alias("_id"), "fp")
    sized = fps.groupBy("_id").agg(F.count(F.lit(1)).alias("_sz"))
    sh = fps.join(sized, "_id")
    buckets = (
        sh.groupBy("fp")
        .agg(F.sort_array(F.collect_set(F.struct("_id", "_sz"))).alias("_ms"))
        .filter(F.size("_ms") >= 2)
    )
    if df_cap is not None:
        buckets = buckets.filter(F.size("_ms") <= df_cap)
    inter = (
        buckets.select(F.explode(_bucket_pairs(F.col("_ms"))).alias("_p"))
        .groupBy(
            F.col("_p.a._id").alias("id_a"),
            F.col("_p.b._id").alias("id_b"),
            F.col("_p.a._sz").alias("_sa"),
            F.col("_p.b._sz").alias("_sb"),
        )
        .agg(F.count(F.lit(1)).alias("shared_fps"))
    )
    return (
        inter.filter(F.col("shared_fps") >= min_shared)
        .select(
            "id_a",
            "id_b",
            "shared_fps",
            F.round(
                F.col("shared_fps").cast("double")
                / F.least(F.col("_sa"), F.col("_sb")).cast("double"),
                6,
            ).alias("containment"),
        )
    )


def jaccard_prefix_join(
    df: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int | None = None,
) -> DataFrame:
    """EXACT threshold set-similarity self-join via prefix filtering — the
    PPJoin-family candidate strategy (Xiao et al., WWW'08; public
    algorithm): every pair whose token-set Jaccard ≥ ``threshold`` is
    returned, with NO recall loss, and candidate generation stays far from
    quadratic. This is the exactness tier above the bucketed/approximate
    forms (:func:`ngram_jaccard_pairs` trades recall via ``df_cap``,
    MinHash via banding).

    How the bound works: order the vocabulary by (document frequency ASC,
    token ASC) — a total order that puts the RAREST tokens first — and
    sort each document's distinct tokens by it. If two sets with sizes
    na, nb satisfy jaccard ≥ t, their intersection exceeds
    ``t/(1+t)·(na+nb)``, so each side must hit the other inside its first
    ``n - ceil(t·n) + 1`` tokens (the prefix): two sets with disjoint
    prefixes cannot reach the threshold. Candidates = pairs sharing ≥ 1
    PREFIX token (rare by construction — the hot stop-words sit at the
    END of the order and never enter short prefixes), pre-pruned by the
    length filter ``t·na ≤ nb ≤ na/t``, then verified with the exact
    Jaccard on the carried token arrays.

    Scale shape: token DF is one groupBy over exploded distinct tokens;
    the per-doc sort is an ``array_sort`` of (df, token) structs — NO
    global rank window, so nothing single-partitions; prefix explosion
    emits ~(1-t)·|tokens| rows/doc; the candidate equi-join shuffles on
    the prefix token; verification is per-pair Column math. Work scales
    with how many near-pairs EXIST, the PPJoin property.

    Output: ``id_a < id_b, jaccard`` (round 6). Set elements are
    whitespace word tokens by default; ``ngram=n`` switches to word
    n-gram shingles (the :func:`ngram_jaccard_pairs` universe — on
    low-vocabulary corpora word SETS are all near-identical and the
    n-gram sets are what discriminate), making this the exact,
    recall-lossless sibling of the bucketed form: same pairs, pruned
    candidates.
    """
    elems = (
        shingles(text_col, ngram)
        if ngram is not None
        else F.array_distinct(
            F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))
        )
    )
    base = df.select(
        F.col(id_col).alias("_id"), elems.alias("_ts")
    ).filter(F.size("_ts") > 0)

    toks = base.select("_id", F.explode("_ts").alias("_t"))
    dfreq = toks.groupBy("_t").agg(F.count(F.lit(1)).alias("_df"))
    # per-doc tokens sorted by the global (df ASC, token ASC) rarity order,
    # assembled WITHOUT a global rank: the (df, token) pair IS the order.
    # localCheckpoint: ranked feeds FOUR consumers (both prefix-join sides
    # + both verify join-backs) — pinning it runs the tokenize + df-count +
    # sort pipeline once instead of four corpus scans.
    ranked = (
        toks.join(dfreq, "_t")
        .groupBy("_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_df"), F.col("_t")))
            ).alias("_sorted")
        )
        .select(
            "_id",
            F.transform("_sorted", lambda s: s["_t"]).alias("_ord"),
        )
        .transform(pin_lazy)
    )
    n = F.size("_ord")
    prefix_len = n - F.ceil(n.cast("double") * F.lit(float(threshold))).cast(
        "int"
    ) + F.lit(1)
    # the candidate join ships only (id, set size, prefix token) — the
    # token arrays do NOT ride the prefix explosion (that would copy each
    # doc's array once per prefix token); the verify fetches them by two
    # narrow join-backs against the checkpointed frame
    pref = ranked.select(
        "_id",
        n.alias("_n"),
        F.explode(F.slice("_ord", 1, prefix_len)).alias("_p"),
    )
    a = pref.toDF("_id_a", "_n_a", "_p")
    b = pref.toDF("_id_b", "_n_b", "_p")
    t = float(threshold)
    cand = (
        a.join(b, "_p")
        .filter(F.col("_id_a") < F.col("_id_b"))
        .filter(
            (F.col("_n_b").cast("double") >= F.col("_n_a") * F.lit(t))
            & (F.col("_n_a").cast("double") >= F.col("_n_b") * F.lit(t))
        )
        .select("_id_a", "_id_b", "_n_a", "_n_b")
        .dropDuplicates(["_id_a", "_id_b"])
    )
    cand = cand.join(
        ranked.select(F.col("_id").alias("_id_a"), F.col("_ord").alias("_toks_a")),
        "_id_a",
    ).join(
        ranked.select(F.col("_id").alias("_id_b"), F.col("_ord").alias("_toks_b")),
        "_id_b",
    )
    inter = F.size(F.array_intersect("_toks_a", "_toks_b"))
    jac = inter.cast("double") / (
        F.col("_n_a") + F.col("_n_b") - inter
    ).cast("double")
    # EXACT threshold: compare the unrounded jaccard (round-then-filter
    # would admit pairs up to ~5e-7 below t); round only the output
    return (
        cand.filter(jac >= F.lit(t))
        .select(
            F.col("_id_a").alias("id_a"),
            F.col("_id_b").alias("id_b"),
            F.round(jac, 6).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Exact duplicated-SUBSTRING dedup (span level) — the "dedup inside the
# document" family from Lee et al., "Deduplicating Training Data Makes
# Language Models Better" (ACL 2022). MinHash/SimHash above find *document
# pairs*; these find the shared *token runs* themselves and cut them out,
# which is what a pre-training corpus needs for boilerplate (license
# headers, navigation chrome, quoted reply chains) that rides inside
# otherwise-unique documents.
# ---------------------------------------------------------------------------


def positional_grams(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 8
) -> DataFrame:
    """``(id, pos, gram)`` — POSITIONAL token n-grams (0-based start).

    Unlike :func:`shingles` this keeps every occurrence and its position:
    span reconstruction needs to know *where* a duplicated gram sits, not
    just that the document contains it. Documents shorter than ``n``
    tokens contribute no rows (the branch-guarded ``sequence`` below —
    see :func:`shingles` for why the guard is per-branch). NULL text is
    treated as empty.
    """
    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return df.select(
        F.col(id_col),
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    (i - 1).cast("bigint").alias("pos"),
                    F.concat_ws(" ", F.slice(toks, i, n)).alias("gram"),
                ),
            )
        ).alias("_pg"),
    ).select(id_col, F.col("_pg.pos").alias("pos"), F.col("_pg.gram").alias("gram"))


def duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
    scope: str = "cross_doc",
    gram_key: str = "text",
) -> DataFrame:
    """Maximal duplicated token spans per document.

    A token position is *duplicated* when the n-gram starting there also
    occurs elsewhere (``scope="cross_doc"``: in ≥ ``min_docs`` distinct
    documents; ``scope="any"``: ≥ ``min_docs`` total occurrences, which
    also catches within-document self-repetition). Overlapping/adjacent
    duplicated grams are merged gaps-and-islands style into maximal
    spans. Output: ``(id, span_start, span_end, span_tokens)`` with
    inclusive 0-based token bounds; every span is ≥ ``n`` tokens.

    Physical shape (the 100 TB pass):

    1. positional grams — narrow, no shuffle;
    2. the duplicated-gram set — ONE hash aggregation on the gram. For
       the default ``min_docs=2`` cross-doc form the test is
       ``min(id) <> max(id)``: plain min/max partials (full map-side
       combine, one shuffle) instead of ``countDistinct``'s two-round
       expand. General ``min_docs`` falls back to ``countDistinct``;
3. grams ⋈ dup-set — co-partitioned equi-join on the gram (both
       sides hash-shuffle on the same key; the dup side is typically
       ≪ corpus, and AQE broadcasts it when it fits);
    4. island merge — per-document window, partition-local after one
       shuffle on the id.

    ``gram_key="hash"`` shuffles ``xxhash64(gram)`` (8-byte longs)
    instead of gram strings for steps 2-3 — the production knob (~5×
    less shuffle IO; 64-bit collision odds are negligible but nonzero,
    so the oracle-checked registered form uses exact ``"text"`` keys).
    """
    if scope not in ("cross_doc", "any"):
        raise ValueError(f"scope must be cross_doc|any, got {scope!r}")
    if gram_key not in ("text", "hash"):
        raise ValueError(f"gram_key must be text|hash, got {gram_key!r}")
    from security_data_pipeline_spark.operators.skew import fan_out

    # the positional-gram expansion (tokenize + per-position slice +
    # concat_ws, O(L·n) per doc) is the heavy map work and runs BEFORE
    # the first exchange — on a single-row-group corpus file it
    # serializes onto one core; a no-op at scale (round-12 measurement)
    grams = positional_grams(fan_out(df, id_col), id_col, text_col, n)
    if gram_key == "hash":
        grams = grams.withColumn("gram", F.xxhash64("gram"))
    if scope == "any":
        occ = F.lit(1)
        witness = F.count(occ) >= min_docs
        dup = grams.groupBy("gram").agg(witness.alias("_dup"))
    elif min_docs == 2:
        dup = grams.groupBy("gram").agg(
            (F.min(id_col) != F.max(id_col)).alias("_dup")
        )
    else:
        dup = grams.groupBy("gram").agg(
            (F.countDistinct(id_col) >= min_docs).alias("_dup")
        )
    hits = (
        grams.join(dup.filter("_dup").select("gram"), "gram")
        .select(id_col, "pos")
    )
    return merge_gram_islands(hits, id_col, n)


def merge_gram_islands(hits: DataFrame, id_col: str, n: int) -> DataFrame:
    """Gaps-and-islands merge of duplicated gram START positions into
    maximal spans: ``(id, pos)`` hit rows in, ``(id, span_start,
    span_end, span_tokens)`` out. Two grams chain into one island when
    their starts are ≤ n apart — overlapping coverage (gap ≤ n-1) AND
    exactly-abutting coverage (gap == n, the gram at ``pos`` starts on
    the token right after the previous gram's last covered token), so
    the emitted intervals are truly maximal: no two output spans touch.
    One doc_id shuffle; the final aggregate reuses the window's
    partitioning. Shared by the batch operator and the streaming
    maintainer so their span semantics cannot diverge."""
    w = Window.partitionBy(id_col).orderBy("pos")
    prev = F.lag("pos").over(w)
    flagged = hits.withColumn(
        "_gap",
        F.when(prev.isNull() | (F.col("pos") > prev + n), 1).otherwise(0),
    )
    island = F.sum("_gap").over(
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        flagged.withColumn("_island", island)
        .groupBy(id_col, "_island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (n - 1)).alias("span_end"),
            (F.max("pos") - F.min("pos") + n).alias("span_tokens"),
        )
        .drop("_island")
    )


def remove_duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
    scope: str = "cross_doc",
    gram_key: str = "text",
) -> DataFrame:
    """Cut every duplicated span out of each document.

    Output: ``(id, clean_text, n_tokens_removed)`` — one row per input
    document (untouched documents pass through with 0 removed; a fully
    duplicated document survives with ``clean_text = ''``).

    The rebuild is per-document array math, NOT an explode/re-aggregate:
    spans are collected to one small array per affected document
    (``collect_list`` after the islands agg — bounded by spans-per-doc),
    LEFT-joined onto the corpus by id, and each document filters its own
    token array with an indexed HOF lambda (``F.filter(toks, (t, i) ->
    ...)``) against its span array. One shuffle (the join); the token
    stream itself never explodes. Removing a span can CREATE a new
    adjacent n-gram where the cut edges meet — single-pass semantics,
    same as the reference algorithm; iterate to fixpoint externally if
    that matters.
    """
    spans = duplicated_spans(df, id_col, text_col, n, min_docs, scope, gram_key)
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    in_span = lambda i: F.exists(  # noqa: E731
        F.col("_spans"),
        lambda s: (i >= s["span_start"]) & (i <= s["span_end"]),
    )
    kept = F.when(
        F.col("_spans").isNull(), toks
    ).otherwise(F.filter(toks, lambda t, i: ~in_span(i.cast("bigint"))))
    return (
        df.join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.concat_ws(" ", kept).alias("clean_text"),
            (F.size(toks) - F.size(kept)).cast("bigint").alias(
                "n_tokens_removed"
            ),
        )
    )


def duplicated_span_stats(
    df: DataFrame,
    by: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
    scope: str = "cross_doc",
    gram_key: str = "text",
) -> DataFrame:
    """Per-group boilerplate report: what fraction of each group's tokens
    sits inside cross-document duplicated spans. The curation signal that
    decides which sources need substring dedup at all. Output:
    ``(by, n_docs, n_docs_affected, total_tokens, dup_tokens,
    dup_token_frac)``."""
    spans = duplicated_spans(df, id_col, text_col, n, min_docs, scope, gram_key)
    per_doc = spans.groupBy(id_col).agg(
        F.sum("span_tokens").alias("_dup_toks"),
    )
    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    joined = df.select(
        F.col(by), F.col(id_col), F.size(toks).cast("bigint").alias("_n_toks")
    ).join(per_doc, id_col, "left")
    return (
        joined.groupBy(by)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("_dup_toks").alias("n_docs_affected"),
            F.sum("_n_toks").alias("total_tokens"),
            F.coalesce(F.sum("_dup_toks"), F.lit(0)).cast("bigint").alias(
                "dup_tokens"
            ),
            (
                F.coalesce(F.sum("_dup_toks"), F.lit(0)).cast("double")
                / F.sum("_n_toks").cast("double")
            ).alias("dup_token_frac"),
        )
    )


# --- line-level dedup (CCNet) ----------------------------------------------

# ASCII punctuation as explicit code ranges — identical semantics in Java
# regex (Spark) and RE2 (DuckDB), unlike [[:punct:]] whose class membership
# differs between engines.
_PUNCT_RE = r"[!-/:-@\[-`{-~]"


def normalized_line_key(line: Column, normalize: str = "none") -> Column:
    """The comparison key CCNet-style line dedup hashes: the raw line
    (``normalize="none"``) or its CCNet normalization (``"ccnet"``:
    lowercase, strip digits and ASCII punctuation, collapse runs of
    spaces, trim — Wenzek et al. 2020 §4.1's hash normalization, minus
    the unicode NFD fold this container can't verify cross-engine).
    Pure Column math, mirrored token-for-token in oracle SQL."""
    if normalize == "none":
        return line
    if normalize != "ccnet":
        raise ValueError(f"normalize must be none|ccnet, got {normalize!r}")
    k = F.lower(line)
    k = F.regexp_replace(k, "[0-9]", "")
    k = F.regexp_replace(k, _PUNCT_RE, "")
    k = F.regexp_replace(k, " +", " ")
    return F.trim(k)


def positional_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delim: str = "\n",
) -> DataFrame:
    """``(id, pos, line)`` — every line of every document with its
    0-based position. NULL text is treated as empty (one empty line, so
    reassembly round-trips). Narrow (one explode, no shuffle)."""
    lines = F.split(F.coalesce(F.col(text_col), F.lit("")), delim, -1)
    return df.select(
        F.col(id_col),
        F.posexplode(lines).alias("pos", "line"),
    ).select(id_col, F.col("pos").cast("bigint").alias("pos"), "line")


def duplicated_line_positions(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delim: str = "\n",
    min_ids: int = 2,
    scope: str = "any",
    normalize: str = "none",
    line_key: str = "text",
) -> DataFrame:
    """``(id, pos)`` of every line whose key occurs ≥ ``min_ids`` times —
    across distinct documents (``scope="cross_doc"``) or counting repeats
    within one document too (``scope="any"``, the CCNet default: a
    boilerplate header repeated inside one page is still boilerplate).

    Physical shape (the 100 TB pass, same stages as
    :func:`duplicated_spans`): narrow line explode → ONE hash aggregation
    on the line key (min<>max witness for the cross-doc min_ids=2 form;
    plain count otherwise — both full map-side combine, one shuffle) →
    co-partitioned equi-join back. ``line_key="hash"`` shuffles
    ``xxhash64`` longs instead of line strings — the production knob;
    the oracle-checked registered form uses exact text keys.
    """
    if scope not in ("cross_doc", "any"):
        raise ValueError(f"scope must be cross_doc|any, got {scope!r}")
    if line_key not in ("text", "hash"):
        raise ValueError(f"line_key must be text|hash, got {line_key!r}")
    lines = positional_lines(df, id_col, text_col, delim).withColumn(
        "_k", normalized_line_key(F.col("line"), normalize)
    )
    if line_key == "hash":
        lines = lines.withColumn("_k", F.xxhash64("_k"))
    if scope == "any":
        dup = lines.groupBy("_k").agg(
            (F.count(F.lit(1)) >= min_ids).alias("_dup")
        )
    elif min_ids == 2:
        dup = lines.groupBy("_k").agg(
            (F.min(id_col) != F.max(id_col)).alias("_dup")
        )
    else:
        dup = lines.groupBy("_k").agg(
            (F.countDistinct(id_col) >= min_ids).alias("_dup")
        )
    return (
        lines.join(dup.filter("_dup").select("_k"), "_k")
        .select(id_col, "pos")
    )


def remove_duplicated_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delim: str = "\n",
    min_ids: int = 2,
    scope: str = "any",
    normalize: str = "none",
    line_key: str = "text",
) -> DataFrame:
    """CCNet-style line-level dedup (Wenzek et al. 2020 §4.1): drop every
    line whose (optionally normalized) content occurs ≥ ``min_ids`` times
    in the corpus, keeping each document's surviving lines in order.

    Output: ``(id, clean_text, n_lines, n_lines_removed)`` — one row per
    input document; untouched documents pass through with 0 removed, a
    fully boilerplate document survives with ``clean_text = ''``.

    The rebuild mirrors :func:`remove_duplicated_spans`: removed
    POSITIONS are collected to one small array per affected document
    (bounded by removed-lines-per-doc), LEFT-joined onto the corpus by
    id, and each document filters its own line array with an indexed HOF
    — the line stream never re-explodes and never re-shuffles.
    """
    hits = duplicated_line_positions(
        df, id_col, text_col, delim, min_ids, scope, normalize, line_key
    )
    return rebuild_docs_without_lines(df, hits, id_col, text_col, delim)


def rebuild_docs_without_lines(
    df: DataFrame,
    hits: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delim: str = "\n",
) -> DataFrame:
    """``(id, clean_text, n_lines, n_lines_removed)`` given ``(id, pos)``
    rows naming the lines to drop — the rebuild half of
    :func:`remove_duplicated_lines`, shared with the streaming
    maintainer so removal semantics cannot diverge (the
    :func:`merge_gram_islands` precedent). Positions collect to one
    small per-doc array; each doc filters its own line array with an
    indexed HOF — no re-explode, one doc-id join."""
    per_doc = hits.groupBy(id_col).agg(
        F.collect_list("pos").alias("_rm")
    )
    lines = F.split(F.coalesce(F.col(text_col), F.lit("")), delim, -1)
    kept = F.when(F.col("_rm").isNull(), lines).otherwise(
        F.filter(
            lines,
            lambda t, i: ~F.array_contains(F.col("_rm"), i.cast("bigint")),
        )
    )
    return df.join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.concat_ws(delim, kept).alias("clean_text"),
        F.size(lines).cast("bigint").alias("n_lines"),
        (F.size(lines) - F.size(kept)).cast("bigint").alias(
            "n_lines_removed"
        ),
    )


def duplicated_line_stats(
    df: DataFrame,
    by: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    delim: str = "\n",
    min_ids: int = 2,
    scope: str = "any",
    normalize: str = "none",
    line_key: str = "text",
) -> DataFrame:
    """Per-group boilerplate-line report: what fraction of each group's
    lines is duplicated — the signal that decides which sources need
    line-level dedup. Output: ``(by, n_docs, n_docs_affected,
    total_lines, dup_lines, dup_line_frac)``."""
    hits = duplicated_line_positions(
        df, id_col, text_col, delim, min_ids, scope, normalize, line_key
    )
    per_doc = hits.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_dup_lines")
    )
    lines = F.split(F.coalesce(F.col(text_col), F.lit("")), delim, -1)
    joined = df.select(
        F.col(by),
        F.col(id_col),
        F.size(lines).cast("bigint").alias("_n_lines"),
    ).join(per_doc, id_col, "left")
    return joined.groupBy(by).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count("_dup_lines").alias("n_docs_affected"),
        F.sum("_n_lines").alias("total_lines"),
        F.coalesce(F.sum("_dup_lines"), F.lit(0)).cast("bigint").alias(
            "dup_lines"
        ),
        (
            F.coalesce(F.sum("_dup_lines"), F.lit(0)).cast("double")
            / F.sum("_n_lines").cast("double")
        ).alias("dup_line_frac"),
    )
