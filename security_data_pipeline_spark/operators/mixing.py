"""Corpus mixing / dataset-composition operators for training-data
pipelines: hashed-n-gram importance resampling (DSIR-style), per-key
document caps, and deterministic mixture upsampling.

These are the operators that decide WHAT a 100 TB corpus contributes to a
training run, as opposed to the cleaning/dedup operators that decide what
survives at all:

- **Importance resampling** (Xie et al. 2023, "Data Selection for Language
  Models via Importance Resampling" — public arXiv:2302.03169): score every
  raw document by how target-like its hashed-n-gram distribution is
  (log-likelihood ratio of two smoothed bag-of-hashed-bigrams models), then
  draw a fixed-size sample ∝ exp(score) with deterministic Gumbel top-k.
- **Per-key caps** (per-domain / per-source caps, the standard crawl
  curation step): keep at most ``cap`` documents per key, best-first.
- **Mixture upsampling**: replicate each source by a fractional epoch
  weight (the "data mixture" table every LLM paper publishes), with the
  fractional part resolved per-document by key hash — deterministic,
  engine-independent, re-run-stable.

Cross-engine determinism (the module's oracle discipline): n-gram buckets
are md5-derived (identical hex on Spark/DuckDB), log-ratio terms are
rounded to 9 decimals and summed as DECIMAL (order-free, exact — the
`hour_of_day_entropy` convention from operators/anomaly.py), and all
sampling randomness is md5-hash-derived, never RNG.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from security_data_pipeline_spark.operators.sampling import _hex4, hash_hex16

# terms are |ln ratio| ≤ ~40, so precision 20 scale 9 holds any single term
# and any corpus-sized accumulation (11 integer digits); crucially
# (20,9)+(20,9) → (21,9) stays UNDER Spark's 38-precision cap, so the fused
# fold accumulates exactly — at (38,9) the addition would overflow to
# (38,8) and silently shed the 9th decimal
_TERM_DEC = "decimal(20,9)"
# 2^32 as an exact double: the hash-uniform denominator
_U32_SPAN = 4294967296.0


def _text(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _toks(text_col: Column | str) -> Column:
    """Lowercased whitespace tokens, empties dropped — the module-wide
    tokenization, shared verbatim with the DuckDB oracles
    (``list_filter(string_split(lower(text), ' '), t -> t <> '')``)."""
    return F.filter(
        F.split(F.lower(_text(text_col)), " "), lambda t: t != F.lit("")
    )


def gram_bucket(gram: Column, num_buckets: int) -> Column:
    """Uniform bucket id in ``[0, num_buckets)`` for one n-gram string:
    first 8 md5 hex chars as an integer, mod the bucket count. md5 keeps
    the bucketing reproducible on any engine (DuckDB:
    ``CAST(CONCAT('0x', substr(md5(g),1,8)) AS BIGINT) % B``)."""
    return (
        F.conv(F.substring(F.md5(gram.cast("binary")), 1, 8), 16, 10).cast(
            "bigint"
        )
        % num_buckets
    )


def bigram_buckets(
    text_col: Column | str, num_buckets: int = 512
) -> Column:
    """``array<bigint>`` of hashed word-bigram bucket ids for a document.

    Bigrams are built by zipping the token array with itself shifted by
    one (``zip_with(slice(tk,1,m), slice(tk,2,m), concat)``) — pure array
    math fused into the scan, no explode, no UDF; a 0- or 1-token document
    yields an empty array (``greatest(size-1, 0)`` keeps the slice length
    legal, so no conditional branch ever evaluates an out-of-range index).
    """
    tk = _toks(text_col)
    m = F.greatest(F.size(tk) - F.lit(1), F.lit(0))
    grams = F.zip_with(
        F.slice(tk, 1, m),
        F.slice(tk, 2, m),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.transform(grams, lambda g: gram_bucket(g, num_buckets))


def bucket_counts(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    num_buckets: int = 512,
) -> DataFrame:
    """Partial hashed-bigram bucket counts for the two corpora:
    ``(bucket, tcnt, rcnt)``, rows only for buckets actually seen
    (``ratio_from_bucket_counts`` treats absent/NULL as 0). These counts
    are a commutative monoid under per-bucket addition — exactly the
    state the streaming maintainer folds per micro-batch.

    Scale shape: each corpus contributes one explode→count aggregation
    (map-side combined — the shuffle carries ≤ ``num_buckets`` rows per
    partition, not tokens).
    """

    def counts(df: DataFrame, cnt_name: str) -> DataFrame:
        return (
            df.select(
                F.explode(bigram_buckets(text_col, num_buckets)).alias(
                    "bucket"
                )
            )
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(cnt_name))
        )

    return (
        counts(target, "tcnt")
        .join(counts(raw, "rcnt"), "bucket", "full_outer")
        .select("bucket", "tcnt", "rcnt")
    )


def ratio_from_bucket_counts(
    counts: DataFrame, num_buckets: int, lam: float = 1.0
) -> DataFrame:
    """Finalize ``(bucket, tcnt, rcnt)`` partial counts into the
    full-domain ``(bucket, term)`` ratio frame:
    ``term = round(ln p_target(b) - ln p_raw(b), 9)`` as decimal, where
    each ``p`` is the add-λ-smoothed distribution implied by the counts.
    Exactly ``num_buckets`` rows — bounded, broadcastable, collectable.
    Shared by the batch form (:func:`bucket_log_ratio`) and the
    streaming state reader, so the two CANNOT diverge.

    Rounding each term to 9 decimals BEFORE any accumulation makes every
    downstream sum order-free and bit-equal across engines (the libm-ulp
    discipline used by ``hour_of_day_entropy``).
    """
    spark = counts.sparkSession
    # counts is referenced twice below (totals agg + domain join); both
    # references share the identical aggregation subtree, whose Exchange
    # Catalyst's ReuseExchange dedupes inside the one plan — the bigram
    # pass runs once. (An eager localCheckpoint pin here was MEASURED
    # SLOWER at sf0.1 — it serializes the DAG and defeats that reuse.)
    # a side with zero bigrams sums to NULL — coalesce to 0 so the smoothed
    # model degrades to uniform instead of poisoning every term with NULL
    tot = counts.agg(
        F.coalesce(F.sum("tcnt"), F.lit(0)).alias("tt"),
        F.coalesce(F.sum("rcnt"), F.lit(0)).alias("rr"),
    )
    dom = spark.range(num_buckets).select(F.col("id").alias("bucket"))
    denom_add = float(lam * num_buckets)
    term = F.round(
        F.log(
            (F.coalesce(F.col("tcnt"), F.lit(0)) + F.lit(lam))
            / (F.col("tt") + F.lit(denom_add))
        )
        - F.log(
            (F.coalesce(F.col("rcnt"), F.lit(0)) + F.lit(lam))
            / (F.col("rr") + F.lit(denom_add))
        ),
        9,
    ).cast(_TERM_DEC)
    return (
        dom.join(counts, "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select("bucket", term.alias("term"))
    )


def bucket_log_ratio(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    num_buckets: int = 512,
    lam: float = 1.0,
) -> DataFrame:
    """Per-bucket importance term over the FULL bucket domain — the batch
    composition of :func:`bucket_counts` + :func:`ratio_from_bucket_counts`
    (see those for the scale shape and determinism discipline)."""
    return ratio_from_bucket_counts(
        bucket_counts(target, raw, text_col, num_buckets), num_buckets, lam
    )


def importance_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 512,
    lam: float = 1.0,
    out_col: str = "importance",
) -> DataFrame:
    """DSIR importance weight per raw document: the sum of per-bigram
    log-likelihood-ratio terms under the target-vs-raw hashed-bigram
    models. Returns ``raw`` + ``out_col`` (double; a document with no
    bigrams scores 0.0).

    Plan shape: the ratio frame is ``num_buckets`` rows → BROADCAST to the
    exploded (id, bucket) frame (rows = corpus bigram count — the same
    scale as any tokenization pass); one groupBy on the doc id sums exact
    decimals. For the shuffle-free form see
    :func:`importance_weights_fused` (bounded collect of the same ratio
    frame, scoring fused into the scan) — the two are property-tested
    equal.
    """
    ratio = bucket_log_ratio(target, raw, text_col, num_buckets, lam)
    exploded = raw.select(
        F.col(id_col),
        F.explode(bigram_buckets(text_col, num_buckets)).alias("bucket"),
    )
    per_doc = (
        exploded.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(F.sum("term").alias("_imp_dec"))
    )
    return (
        raw.join(per_doc, id_col, "left")
        .withColumn(
            out_col,
            F.coalesce(F.col("_imp_dec").cast("double"), F.lit(0.0)),
        )
        .drop("_imp_dec")
    )


def importance_weights_fused(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 512,
    lam: float = 1.0,
    out_col: str = "importance",
) -> DataFrame:
    """Shuffle-free :func:`importance_weights`: the bounded ratio frame
    (``num_buckets`` rows) is collected once and baked into the plan as a
    literal decimal array; each document's weight is then
    ``aggregate(buckets, 0, (acc, b) -> acc + terms[b+1])`` — map-side
    only, fused into the corpus scan, zero joins and zero shuffles over
    the raw side (the BM25 "corpus statistics collapse to driver
    literals" pattern). Identical output to the join form (decimal
    accumulation is exact in both), property-tested in
    tests/test_mixing.py.

    Use this form when the raw side is the 100 TB corpus: the only
    distributed work is the scan itself. The literal array puts
    ``num_buckets`` constants in the plan — fine through a few thousand
    buckets (the DSIR regime); for an unusually wide model prefer the
    broadcast-join form, whose ratio side ships once per executor
    instead of living in every serialized plan fragment.
    """
    ratio_rows = bucket_log_ratio(
        target, raw, text_col, num_buckets, lam
    ).collect()
    terms: list[Decimal] = [Decimal(0)] * num_buckets
    for row in ratio_rows:
        terms[row["bucket"]] = row["term"]
    arr = F.array(
        *[F.lit(str(t)).cast(_TERM_DEC) for t in terms]
    )
    zero = F.lit("0").cast(_TERM_DEC)
    imp = F.aggregate(
        bigram_buckets(text_col, num_buckets),
        zero,
        lambda acc, b: (
            acc + F.element_at(arr, (b + F.lit(1)).cast("int"))
        ).cast(_TERM_DEC),
    )
    return raw.withColumn(out_col, imp.cast("double"))


def gumbel_topk(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "gumbel",
    key_col: str = "samp_key",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: top-``k`` rows
    by ``weight + Gumbel(hash-uniform)`` — the Gumbel-top-k trick draws a
    sample ∝ exp(weight) (exactly the DSIR resampling step), but with the
    noise derived from ``md5(salt || id)`` instead of an RNG, so the draw
    is reproducible on any engine, any partitioning, any rerun.

    ``u = (hash32 + 0.5) / 2^32`` is an exact dyadic rational strictly
    inside (0, 1) (no log-of-zero edge); the key is rounded to 6 decimals
    before ranking with the id as the total tie-break. ``orderBy + limit``
    compiles to TakeOrdered — per-partition top-k then a k-row driver
    merge, never a global sort.
    """
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(salt), F.col(id_col).cast("string")
                ).cast("binary")
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("double")
    u = (h + F.lit(0.5)) / F.lit(_U32_SPAN)
    key = F.round(F.col(weight_col) - F.log(-F.log(u)), 6)
    return (
        df.withColumn(key_col, key)
        .orderBy(F.desc(key_col), id_col)
        .limit(k)
    )


def cap_per_key(
    df: DataFrame,
    key_cols: list[str],
    cap: int,
    order_by: list[Column],
) -> DataFrame:
    """Per-key document cap (per-domain caps, best-first): keep at most
    ``cap`` rows per key, ranked by ``order_by`` (a TOTAL order — end it
    with an id column, or survivors are partitioning-dependent).

    One row_number window — and that is the SCALE-CORRECT form on this
    engine, not a naive baseline: Spark rewrites ``rank-limit`` windows
    with a WindowGroupLimit pair, the partial node running BEFORE the
    exchange, so every map partition forwards at most ``cap`` rows per
    over-cap key. A 10^9-row hot domain shuffles ≤ cap·n_partitions
    rows, not 10^9 — the skew resistance window functions normally lack
    is built in for exactly this shape (plan-pinned in
    tests/test_mixing.py). The hand-rolled alternative that windows only
    over-cap keys (:func:`cap_per_key_bypass`) measured SLOWER at every
    tested shape — see its docstring before reaching for it.
    """
    if cap < 1:
        raise ValueError("cap must be >= 1")
    w = Window.partitionBy(*key_cols).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


def cap_per_key_bypass(
    df: DataFrame,
    key_cols: list[str],
    cap: int,
    order_by: list[Column],
) -> DataFrame:
    """Variant of :func:`cap_per_key` that windows ONLY over-cap keys:
    a map-side-combined groupBy finds the over-cap key list, under-cap
    rows leave through a broadcast LEFT ANTI (no shuffle, no sort), and
    only over-cap rows ride the row_number window. Output is identical
    (property-tested).

    MEASURED SLOWER than the plain window on every local shape tried
    (2M narrow rows: 0.49 s vs 0.80 s; 500k wide ~512 B rows, 90 %
    under-cap: 0.69 s vs 1.10 s; same wide frame fully cached: 0.41 s
    vs 0.80 s): WindowGroupLimit already prunes the over-cap shuffle,
    so the bypass only saves shuffling the UNDER-cap rows — and pays a
    counts pass plus two broadcast probes over the full input for it.
    Its remaining domain is a network-bound cluster shuffle where
    bytes-over-fabric for the under-cap majority dominate two extra
    (column-pruned, co-located) scans; measure there before preferring
    it. Kept as the measured control of that trade, per the
    ``skew_counts`` control-pair discipline.
    """
    if cap < 1:
        raise ValueError("cap must be >= 1")
    over = (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > cap)
        .select(*key_cols)
    )
    under_rows = df.join(F.broadcast(over), key_cols, "left_anti")
    over_rows = df.join(F.broadcast(over), key_cols, "left_semi")
    capped = cap_per_key(over_rows, key_cols, cap, order_by)
    return under_rows.unionByName(capped)


def mixture_upsample(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    default_weight: float = 1.0,
    salt: str = "mix",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Deterministic data-mixture replication: each row appears
    ``floor(w)`` times plus one extra copy for a ``frac(w)`` hash-share of
    its source's rows, where ``w`` is the source's mixture weight (epochs
    over that source). Weight 0 drops the source; weight 2.5 yields every
    row twice and half the rows (chosen by id hash, not RNG) a third
    time. Output gains ``epoch_col`` (1-based bigint copy index).

    This is the upsampling step of the published LLM mixture tables
    (e.g. several epochs over a small high-quality source per one epoch
    of crawl). Map-side only: a bounded CASE over sources picks the copy
    count, ``explode(sequence(1, n))`` emits the copies — no shuffle, no
    join, stable under re-partitioning and appends.
    """
    if any(w < 0 for w in weights.values()) or default_weight < 0:
        raise ValueError("mixture weights must be >= 0")

    def _per_source(fn) -> Column:
        expr = None
        for src, w in weights.items():
            val = fn(w)
            expr = (
                F.when(F.col(source_col) == src, val)
                if expr is None
                else expr.when(F.col(source_col) == src, val)
            )
        dflt = fn(default_weight)
        return dflt if expr is None else expr.otherwise(dflt)

    n_int = _per_source(lambda w: F.lit(int(w)))
    thr = _per_source(lambda w: F.lit(_hex4(w - int(w))))
    extra = (hash_hex16(id_col, salt) < thr).cast("int")
    n = (n_int + extra).alias("_n")
    return (
        df.withColumn("_n", n)
        .filter(F.col("_n") >= 1)
        .withColumn(
            epoch_col, F.explode(F.sequence(F.lit(1), F.col("_n")))
        )
        .withColumn(epoch_col, F.col(epoch_col).cast("bigint"))
        .drop("_n")
    )


def training_order(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 64,
    salt: str = "shuffle",
    shard_col: str = "shard",
    key_col: str = "sort_key",
) -> DataFrame:
    """Deterministic global shuffle for training order — the step that
    turns a curated corpus into the randomized-but-reproducible sequence
    a trainer consumes. Each row gets a ``shard`` (md5-hash mod
    ``n_shards``) and a ``sort_key`` (the full md5 hex): reading the
    shards in shard order, each sorted by ``(sort_key, id)``, yields a
    uniform pseudorandom permutation of the corpus that is identical on
    any engine, any partitioning, any rerun — change ``salt`` for a new
    epoch's permutation.

    This is how a 100 TB corpus shuffles WITHOUT a global sort: the
    assignment is map-side Column math, and each shard orders
    independently at write time (:func:`write_training_shards`), so the
    largest sort is corpus/n_shards — sized to fit one task by choosing
    ``n_shards``, with no cross-shard coordination at all.
    """
    h = F.md5(
        F.concat(F.lit(salt), F.col(id_col).cast("string")).cast("binary")
    )
    shard = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % n_shards
    )
    return df.withColumn(shard_col, shard).withColumn(key_col, h)


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    n_shards: int = 64,
    salt: str = "shuffle",
) -> None:
    """Materialize :func:`training_order` as one directory per shard
    (``shard=<i>/``), rows inside each shard's files sorted by
    ``(sort_key, id)`` — the on-disk layout a data loader streams in
    order. ``repartition(n_shards, shard)`` + ``sortWithinPartitions``
    does the per-shard sort task-locally (no global exchange beyond the
    one shard shuffle); ``partitionBy`` splits the directories."""
    ordered = training_order(df, id_col, n_shards, salt)
    (
        ordered.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "sort_key", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def temperature_weights(
    df: DataFrame,
    key_col: str = "source",
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled mixture weights over a corpus key (source,
    language, domain): ``p_temp(s) ∝ n_s^alpha`` — the standard
    multilingual/multi-source rebalancing (alpha=1 keeps the empirical
    mix, alpha→0 approaches uniform; published pipelines typically use
    alpha in [0.2, 0.7] to lift low-resource keys without letting tiny
    sources dominate). Output per key: ``n_docs``, ``p_raw`` (empirical
    share), ``p_temp`` (temperature share), and ``factor`` — the
    up/downsampling multiple (``p_temp/p_raw``) to feed straight into
    :func:`mixture_upsample` as that key's epoch weight.

    One counts-only aggregation (map-side combine, |keys| rows) plus a
    single-row total broadcast back — nothing scans the corpus twice.
    Engine-portable determinism: only ``alpha=0.5`` is offered the exact
    path (``sqrt`` is IEEE-correctly-rounded in every engine, unlike
    ``pow`` whose libm differs in the last ulp), and the temperature
    denominator sums DECIMAL-quantized sqrt values so the total is exact
    and order-free — the same trick as the repo's decimal revenue sums.
    For other alphas the math still runs (``pow``), with the documented
    cross-engine last-ulp caveat.
    """
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n_docs"))
    if alpha == 0.5:
        s = F.sqrt(F.col("n_docs").cast("double"))
    else:
        s = F.pow(F.col("n_docs").cast("double"), F.lit(float(alpha)))
    scored = counts.withColumn(
        "_s", s.cast("decimal(18,9)")
    )
    totals = scored.agg(
        F.sum("n_docs").alias("_n_total"),
        F.sum("_s").alias("_s_total"),
    )
    return (
        scored.crossJoin(F.broadcast(totals))
        .select(
            key_col,
            "n_docs",
            F.round(
                F.col("n_docs").cast("double") / F.col("_n_total"), 6
            ).alias("p_raw"),
            F.round(
                F.col("_s").cast("double") / F.col("_s_total").cast("double"),
                6,
            ).alias("p_temp"),
            F.round(
                F.col("_s").cast("double")
                * F.col("_n_total")
                / (F.col("_s_total").cast("double") * F.col("n_docs")),
                6,
            ).alias("factor"),
        )
    )


def source_divergence(
    df: DataFrame,
    by: str = "source",
    text_col: str = "text",
    num_buckets: int = 256,
    lam: float = 1.0,
) -> DataFrame:
    """Pairwise Jensen–Shannon divergence between per-``by`` hashed
    UNIGRAM distributions — the "which sources are near-duplicates of
    each other distributionally" input to mixture design (complementing
    :func:`...bloom.kmv_overlap`'s SET overlap with a probability-mass
    view). Output: ``(src_a, src_b, js_divergence)`` for every unordered
    pair, ``src_a < src_b``; JS ∈ [0, ln 2], 0 = identical.

    Model discipline matches DSIR: tokens hash into ``num_buckets``
    md5 buckets (engine-portable), each side's distribution is
    add-λ-smoothed over the full bucket domain, and every pair term
    rounds to 9 decimals BEFORE an exact decimal sum — order-free,
    bit-equal across engines up to libm's ``ln`` ulps, absorbed by the
    rounding (the entropy convention of ``hour_of_day_entropy`` /
    ``value_drift``).

    Scale shape: ONE token-level aggregation whose exchange is bounded
    by ``|sources| × num_buckets`` partial rows per task (map-side
    combine over a bounded domain); everything after operates on the
    ``S × B`` dense frame — the pair join is ``S² × B`` rows, driver-
    irrelevant for realistic source counts (document the S² term when
    S reaches thousands; bucket the join key if it ever matters).
    """
    return divergence_from_source_counts(
        source_bucket_counts(df, by, text_col, num_buckets),
        num_buckets,
        lam,
    )


def source_bucket_counts(
    df: DataFrame,
    by: str = "source",
    text_col: str = "text",
    num_buckets: int = 256,
) -> DataFrame:
    """Per-group hashed-unigram bucket counts ``(_src, bucket, c)`` — the
    model state behind :func:`source_divergence`. A commutative monoid
    under per-(src, bucket) addition, so the streaming maintainer folds
    micro-batch summaries into a state bounded by |sources|·num_buckets
    rows forever (the DSIR-model argument). One map-side-combined
    explode→count; the exchange carries ≤ |sources|·num_buckets partial
    rows per task."""
    toks = df.select(
        F.col(by).alias("_src"),
        F.explode(_toks(text_col)).alias("_t"),
    )
    return (
        toks.select("_src", gram_bucket(F.col("_t"), num_buckets).alias("bucket"))
        .groupBy("_src", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def divergence_from_source_counts(
    counts: DataFrame, num_buckets: int, lam: float = 1.0
) -> DataFrame:
    """Finalize :func:`source_bucket_counts` state into the pairwise JS
    matrix — shared by the batch form and the streaming state reader, so
    the two CANNOT diverge (the ``ratio_from_bucket_counts`` pattern)."""
    spark = counts.sparkSession
    totals = counts.groupBy("_src").agg(F.sum("c").alias("t"))
    dom = spark.range(num_buckets).select(F.col("id").alias("bucket"))
    denom_add = float(lam * num_buckets)
    dense = (
        totals.crossJoin(dom)
        .join(counts, ["_src", "bucket"], "left")
        .select(
            "_src",
            "bucket",
            (
                (F.coalesce(F.col("c"), F.lit(0)) + F.lit(lam))
                / (F.col("t") + F.lit(denom_add))
            ).alias("p"),
        )
    )
    a = dense.select(
        F.col("_src").alias("src_a"), "bucket", F.col("p").alias("pa")
    )
    b = dense.select(
        F.col("_src").alias("src_b"), "bucket", F.col("p").alias("pb")
    )
    m = (F.col("pa") + F.col("pb")) / F.lit(2.0)
    term = F.round(
        F.lit(0.5)
        * (
            F.col("pa") * F.log(F.col("pa") / m)
            + F.col("pb") * F.log(F.col("pb") / m)
        ),
        9,
    ).cast(_TERM_DEC)
    return (
        a.join(b, "bucket")
        .filter(F.col("src_a") < F.col("src_b"))
        .select("src_a", "src_b", term.alias("_term"))
        .groupBy("src_a", "src_b")
        .agg(
            F.round(F.sum("_term").cast("double"), 6).alias("js_divergence")
        )
    )


def length_bucketed_batches(
    df: DataFrame,
    id_col: str = "doc_id",
    len_col: str = "n_tokens",
    batch_size: int = 8,
    bucket_width: int = 16,
    n_shards: int = 4,
    salt: str = "batch",
) -> DataFrame:
    """Dynamic batching by length: assign rows to fixed-size batches of
    similar sequence length so pad-to-max waste inside each batch is
    small — the batching step in front of any padded inference or
    finetune pass.

    Every row's length rounds UP to a ``bucket_width`` multiple
    (``bucket_len``); within each (bucket, shard) rows order by
    (length desc, id) and cut into ``batch_size``-row batches. Output is
    one row per BATCH: ``(bucket_len, shard, batch_id, n_docs,
    batch_max_tokens, token_sum, pad_frac)`` where ``pad_frac`` is the
    fraction of the padded token grid (`batch_max × n_docs`) that is
    padding.

    Scale shape: the only ordered work is a row_number per
    (bucket_len, shard) — buckets are bounded by max-length/width and the
    md5-derived shard (the :func:`training_order` idiom, engine-exact)
    splits each bucket's stream ``n_shards`` ways, so the largest sort is
    |bucket|/n_shards and NOTHING is globally ordered. Sharding costs at
    most one under-filled tail batch per (bucket, shard); choose
    ``n_shards`` so that cost stays ≪ batch count.
    """
    w_ = int(bucket_width)
    blen = (F.floor((F.col(len_col) + (w_ - 1)) / w_) * w_).cast("long")
    h = F.md5(
        F.concat(F.lit(salt), F.col(id_col).cast("string")).cast("binary")
    )
    shard = F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % n_shards
    base = df.select(
        F.col(id_col),
        F.col(len_col).cast("long").alias("_n"),
        blen.alias("bucket_len"),
        shard.alias("shard"),
    )
    win = Window.partitionBy("bucket_len", "shard").orderBy(
        F.desc("_n"), F.asc(id_col)
    )
    batched = base.withColumn(
        "batch_id",
        F.floor((F.row_number().over(win) - 1) / batch_size).cast("long"),
    )
    out = batched.groupBy("bucket_len", "shard", "batch_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("_n").alias("batch_max_tokens"),
        F.sum("_n").cast("long").alias("token_sum"),
    )
    return out.withColumn(
        "pad_frac",
        F.lit(1.0)
        - (
            F.col("token_sum").cast("double")
            / (F.col("batch_max_tokens") * F.col("n_docs")).cast("double")
        ),
    )


def token_budget_waterfill(
    counts: DataFrame,
    budget: float,
    weights: dict[str, float] | None = None,
    key_col: str = "source",
    avail_col: str = "avail_tokens",
) -> DataFrame:
    """Water-filling token-budget allocation — the mixture-planning step
    between "we want source weights w" and "sample each source at rate
    r": given each source's AVAILABLE token count and a total training
    budget ``B``, allocate ``alloc_i = min(avail_i, θ·w_i)`` with the
    water level θ chosen so Σ alloc = min(B, Σ avail). Sources too small
    for their weight saturate (you take everything they have) and their
    unused share redistributes over the rest — exactly what a
    published-mixture replication does when a source runs out of tokens.

    Closed form, no iteration: sort sources by ``avail/w`` ascending
    (saturation order — the waterfill lemma makes the saturated set a
    prefix), take running prefix sums of avail and weight, and mark row
    j saturated iff ``avail_j · remw_{j-1} ≤ (B − cumavail_{j-1}) · w_j``
    (the cross-multiplied form of ``avail_j/w_j ≤ θ_j``, written
    identically in the oracle so IEEE comparison agrees); a running
    ``bool_and`` guards float-tie monotonicity. θ then comes from the
    saturated count in one conditional aggregate attached back as a
    one-row broadcast scalar.

    Input: one row per source (``key_col``, ``avail_col``). The frame is
    mixture-domain-sized (≤ thousands of rows at any corpus scale — the
    heavy part, counting tokens per source, is the caller's one
    aggregation over the corpus). Output: ``(key, weight, avail_tokens,
    saturated, alloc_tokens, sampling_rate)``.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget!r}")
    if weights is not None:
        w = F.lit(None).cast("double")
        for k_, v in sorted(weights.items()):
            w = F.when(F.col(key_col) == k_, F.lit(float(v))).otherwise(w)
        w = F.coalesce(w, F.lit(1.0))
    else:
        w = F.lit(1.0)
    base = counts.select(
        F.col(key_col),
        F.col(avail_col).cast("double").alias("avail_tokens"),
        w.alias("weight"),
    ).filter(F.col("weight") > 0)
    ws = Window.orderBy(
        (F.col("avail_tokens") / F.col("weight")).asc(), F.col(key_col)
    )
    pre = base.select(
        key_col,
        "avail_tokens",
        "weight",
        (
            F.sum("avail_tokens").over(
                ws.rowsBetween(Window.unboundedPreceding, -1)
            )
        ).alias("_cum_avail"),
        (
            F.sum("weight").over(
                ws.rowsBetween(Window.unboundedPreceding, -1)
            )
        ).alias("_cum_w"),
    ).withColumn("_cum_avail", F.coalesce(F.col("_cum_avail"), F.lit(0.0))
    ).withColumn("_cum_w", F.coalesce(F.col("_cum_w"), F.lit(0.0)))
    tot = pre.agg(
        F.sum("avail_tokens").alias("_tot_avail"),
        F.sum("weight").alias("_tot_w"),
    )
    pre = pre.crossJoin(F.broadcast(tot))
    cond = (
        F.col("avail_tokens") * (F.col("_tot_w") - F.col("_cum_w"))
        <= (F.lit(float(budget)) - F.col("_cum_avail")) * F.col("weight")
    )
    sat = pre.withColumn(
        "saturated",
        F.min(F.when(cond, True).otherwise(False)).over(
            ws.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    theta_row = sat.agg(
        F.coalesce(
            F.sum(F.when(F.col("saturated"), F.col("avail_tokens"))),
            F.lit(0.0),
        ).alias("_sat_avail"),
        F.coalesce(
            F.sum(F.when(~F.col("saturated"), F.col("weight"))), F.lit(0.0)
        ).alias("_free_w"),
    ).select(
        F.when(
            F.col("_free_w") > 0,
            (F.lit(float(budget)) - F.col("_sat_avail")) / F.col("_free_w"),
        )
        .otherwise(F.lit(0.0))
        .alias("_theta")
    )
    out = sat.crossJoin(F.broadcast(theta_row))
    alloc = F.when(F.col("saturated"), F.col("avail_tokens")).otherwise(
        F.col("_theta") * F.col("weight")
    )
    return out.select(
        key_col,
        "weight",
        "avail_tokens",
        "saturated",
        alloc.alias("alloc_tokens"),
        F.when(
            F.col("avail_tokens") > 0,
            alloc / F.col("avail_tokens"),
        ).otherwise(F.lit(0.0)).alias("sampling_rate"),
    )


def stratified_split(
    df: DataFrame,
    id_col: str = "doc_id",
    strata_col: str = "source",
    fractions: tuple[float, ...] = (0.8, 0.1, 0.1),
    names: tuple[str, ...] = ("train", "val", "test"),
    salt: str = "split",
) -> DataFrame:
    """Deterministic per-stratum train/val/test assignment: every
    stratum (source, domain, language) contributes the SAME proportions
    to each split, so eval sets are not silently dominated by whichever
    source is biggest — the complement of :func:`leakage-safe splitting
    <security_data_pipeline_spark.operators.dedup>`: that one keeps
    near-dup CLUSTERS un-straddled, this one keeps per-source RATES
    equal. Compose by splitting on the cluster representative id.

    Assignment is pure map-side Column math on an md5-derived bucket in
    [0, 1e6) (identical hex cross-engine — the :func:`training_order`
    discipline; never sample()/RNG, so membership is stable under
    reruns, repartitioning, and engine choice), cut at the cumulative
    fraction boundaries WITHIN each stratum's hash space by salting the
    hash with the stratum value — a stratum is its own uniform
    hash universe, so proportions hold per stratum, not just globally.
    Adds ``split``; rows with NULL strata hash under the empty stratum
    and still split at the same rates. Rows with a NULL ``id_col`` hash
    under a reserved sentinel (they cannot be told apart, so they all
    receive the same deterministic split within their stratum) — before
    this coalesce, a NULL id made the md5 NULL and every NULL-id row
    silently fell through to ``names[-1]``, skewing the eval split
    (ADVICE r10).
    """
    if len(fractions) != len(names):
        raise ValueError("fractions and names must align")
    if abs(sum(fractions) - 1.0) > 1e-9:
        raise ValueError("fractions must sum to 1")
    h = F.md5(
        F.concat(
            F.lit(salt),
            F.lit("|"),
            F.coalesce(F.col(strata_col).cast("string"), F.lit("")),
            F.lit("|"),
            # \x00-prefixed sentinel: no real string id collides with it
            F.coalesce(
                F.col(id_col).cast("string"), F.lit("\x00null_id")
            ),
        ).cast("binary")
    )
    bucket = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % 1_000_000
    expr = F.lit(names[-1])
    cum = 0.0
    cuts = []
    for frac, name in zip(fractions[:-1], names[:-1]):
        cum += frac
        cuts.append((int(round(cum * 1_000_000)), name))
    for cut, name in reversed(cuts):
        expr = F.when(bucket < F.lit(cut), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)
