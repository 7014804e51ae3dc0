"""Temporal joins the reference lacks but the oracle suite needs
(SURVEY.md §2.7 "not implemented in the reference": as-of joins, range joins).

Both operators are built for the 100 TB path:

- :func:`asof_join` uses the **union + running-``last()`` idiom**: tag both
  inputs, union them, and carry the most recent right-side row forward with
  ``last(..., ignoreNulls)`` over a single ``(keys, ts)`` window. One shuffle
  of |L|+|R| rows, O(1) state per row — versus the naive range-join
  formulation whose candidate set is O(|L|·|R|) per key.
- :func:`bucketed_range_join` makes a bounded time-range join a hash
  equi-join: the right side is bucketed by ``floor(ts / width)``, the left
  side explodes to the (few) buckets its window can reach, and the exact
  range predicate filters after the equi-join. Candidate pairs are bounded
  by bucket occupancy, not by key cardinality — the classic bucketed /
  "bin" range-join strategy.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from security_data_pipeline_spark.pin import pin_lazy


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_seconds: float | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of left join: for each left row, attach the right row with
    the greatest ``right_ts`` ≤ ``left_ts`` within the same ``on`` keys.

    Right-side value columns (everything except ``on`` + ``right_ts``) are
    appended; the matched timestamp arrives as ``{right_ts}{suffix}``. A
    value column whose name collides with a left column also gets
    ``suffix``. Unmatched left rows keep NULLs (left-join semantics).
    ``tolerance_seconds`` nulls out matches older than the window.

    Ties: among right rows sharing the match timestamp the LAST one in
    ``(right_ts)`` window order wins — pre-aggregate the right side to
    unique ``(keys, ts)`` for full determinism (the registered query does).
    """
    on = list(on)
    left_payload = [c for c in left.columns if c not in on]
    rvals = [c for c in right.columns if c not in on and c != right_ts]

    rstruct = F.struct(
        F.col(right_ts).alias("_ts_r"), *[F.col(c) for c in rvals]
    )
    rstruct_type = right.select(rstruct.alias("_rv")).schema["_rv"].dataType
    left_types = {f.name: f.dataType for f in left.schema.fields}

    lrows = left.select(
        *on,
        *left_payload,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rstruct_type).alias("_rv"),
    )
    rrows = right.select(
        *on,
        *[
            F.lit(None).cast(left_types[c]).alias(c)
            for c in left_payload
        ],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        rstruct.alias("_rv"),
    )

    # Right rows sort before left rows at equal ts (_side 0 < 1), so an
    # exactly-simultaneous right row is visible to the left row (ts <= ts).
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        lrows.unionByName(rrows)
        .withColumn("_m", F.last("_rv", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if tolerance_seconds is not None:
        tol_us = int(tolerance_seconds * 1_000_000)
        in_window = (
            F.unix_micros(F.col("_ts")) - F.unix_micros(F.col("_m._ts_r"))
        ) <= F.lit(tol_us)
        matched = matched.withColumn(
            "_m", F.when(in_window, F.col("_m"))
        )

    out_cols: list[Column] = [F.col(c) for c in on + left_payload]
    out_cols.append(F.col("_m._ts_r").alias(f"{right_ts}{suffix}"))
    for c in rvals:
        alias = f"{c}{suffix}" if c in on + left_payload else c
        out_cols.append(F.col(f"_m.{c}").alias(alias))
    return matched.select(*out_cols)


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_seconds: float = 0.0,
    upper_seconds: float = 600.0,
    bucket_seconds: float | None = None,
) -> DataFrame:
    """Pairs where ``right_ts - left_ts`` ∈ [lower, upper] seconds (inclusive),
    within equal ``on`` keys, via bucket-equi-join instead of a theta join.

    Right columns colliding with left names (beyond ``on``) get an ``_r``
    suffix. Bucket width defaults to the window span, so each left row
    explodes to at most 2 buckets; pass ``bucket_seconds`` to trade
    duplication against bucket occupancy for skewed timelines.
    """
    if upper_seconds < lower_seconds:
        raise ValueError("upper_seconds must be >= lower_seconds")
    on = list(on)
    span = upper_seconds - lower_seconds
    width_us = int((bucket_seconds if bucket_seconds else max(span, 1.0)) * 1e6)
    lo_us = int(lower_seconds * 1_000_000)
    hi_us = int(upper_seconds * 1_000_000)

    def bucket_of(us_col: Column) -> Column:
        return F.floor(us_col / F.lit(width_us)).cast("long")

    collide = {
        c for c in right.columns if c in left.columns and c not in on
    }
    r = right.select(
        *on,
        *[
            F.col(c).alias(f"{c}_r" if c in collide else c)
            for c in right.columns
            if c not in on
        ],
    )
    r_ts_out = f"{right_ts}_r" if right_ts in collide else right_ts
    r = r.withColumn("_b", bucket_of(F.unix_micros(F.col(r_ts_out))))

    l_us = F.unix_micros(F.col(left_ts))
    l = left.withColumn(
        "_bs",
        F.sequence(bucket_of(l_us + F.lit(lo_us)), bucket_of(l_us + F.lit(hi_us))),
    ).withColumn("_b", F.explode("_bs")).drop("_bs")

    diff = F.unix_micros(F.col(r_ts_out)) - F.unix_micros(F.col(left_ts))
    return (
        l.join(r, on + ["_b"])
        .filter((diff >= F.lit(lo_us)) & (diff <= F.lit(hi_us)))
        .drop("_b")
    )


def fuzzy_string_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_distance: int = 2,
    block: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """Approximate string join: pairs whose edit distance is ≤
    ``max_distance``, candidate-generated through a **blocking key** so the
    join is a hash equi-join, never a cross join.

    ``block`` is a callable mapping each side's join column to its blocking
    key (default: the first space-delimited token — robust to typos later in
    the string; literal single-space split so DuckDB ``string_split(c, ' ')``
    tokenizes identically, including empty tokens at consecutive spaces).
    Rows agreeing on the block key meet in one shuffle partition; the exact
    ``levenshtein`` predicate then filters the candidates. Recall is bounded
    by the blocking choice (a typo inside the block key hides the pair) —
    the standard record-linkage trade; run multiple passes with different
    keys for higher recall, exactly like LSH bands.

    At 100 TB: candidate count is Σ|block|·|block'| over matching blocks, so
    block granularity is the knob; the bounded 3-arg ``levenshtein`` returns
    -1 past the threshold, letting the DP short-circuit instead of filling
    the full matrix. Output: all left columns plus right columns (colliding
    names suffixed ``_m``) plus ``edit_distance``.
    """

    def block_of(c: Column) -> Column:
        return block(c) if block is not None else F.split(c, " ")[0]

    collide = {c for c in right.columns if c in left.columns}
    r = right.select(
        *[F.col(c).alias(f"{c}_m" if c in collide else c) for c in right.columns]
    )
    r_col = f"{right_col}_m" if right_col in collide else right_col
    l = left.withColumn("_blk", block_of(F.col(left_col)))
    r = r.withColumn("_blk", block_of(F.col(r_col)))
    dist = F.levenshtein(F.col(left_col), F.col(r_col), max_distance)
    return (
        l.join(r, "_blk")
        .withColumn("edit_distance", dist)
        .filter(F.col("edit_distance") >= 0)
        .drop("_blk")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_seconds: float = 86400.0 * 30,
) -> DataFrame:
    """Interval-overlap join (``l.start ≤ r.end AND r.start ≤ l.end``,
    inclusive) as a bucketed hash equi-join instead of a theta join.

    Both sides explode their interval to the fixed-width time buckets it
    covers; overlapping intervals necessarily share ≥1 bucket, so the
    candidate set is one equi-join on the bucket id. A pair sharing several
    buckets would duplicate — the bucket-equality guard (the overlap's
    FIRST shared bucket: the later of the two interval-start buckets) keeps
    exactly one copy, shuffle-free. The exact predicate filters after the
    join; ``bucket_seconds`` trades per-row fan-out (long intervals → more
    buckets) against bucket occupancy (wide buckets → more candidates), the
    classic bin-join knob. Catalyst broadcasts the exploded small side.

    Right columns colliding with left names get an ``_r`` suffix.
    """
    width_us = int(bucket_seconds * 1e6)

    def bucket_of(c: Column) -> Column:
        # cast: TIMESTAMP_NTZ is not accepted by unix_micros; the session
        # runs UTC so NTZ -> TZ is value-preserving.
        return F.floor(
            F.unix_micros(c.cast("timestamp")) / F.lit(width_us)
        ).cast("long")

    def explode_buckets(df: DataFrame, start: str, end: str) -> DataFrame:
        return df.withColumn(
            "_b",
            F.explode(
                F.sequence(bucket_of(F.col(start)), bucket_of(F.col(end)))
            ),
        )

    collide = {c for c in right.columns if c in left.columns}
    r = right.select(
        *[F.col(c).alias(f"{c}_r" if c in collide else c) for c in right.columns]
    )
    r_start = f"{right_start}_r" if right_start in collide else right_start
    r_end = f"{right_end}_r" if right_end in collide else right_end

    l = explode_buckets(left, left_start, left_end)
    r = explode_buckets(r, r_start, r_end)

    overlap = (F.col(left_start) <= F.col(r_end)) & (
        F.col(r_start) <= F.col(left_end)
    )
    first_shared = F.greatest(
        bucket_of(F.col(left_start)), bucket_of(F.col(r_start))
    )
    return (
        l.join(r, "_b")
        .filter(overlap & (F.col("_b") == first_shared))
        .drop("_b")
    )


def _tag_rows(facts: DataFrame, id_col: str | None, rid: str) -> DataFrame:
    """Attach (or reuse) the surrogate row id the LPM joins reduce on.

    With no ``id_col``, ``monotonically_increasing_id`` is attached and the
    result is ``localCheckpoint(eager=False)``-ed: the id expression is
    NON-deterministic across recomputations, and the tagged frame is
    consumed by two plan branches (candidate fan-out + join-back) — without
    pinning, a task retry or AQE replan could recompute one branch under a
    different partition layout and the branches' ids would diverge,
    silently dropping or mis-enriching rows. The checkpoint materializes
    the ids exactly once (lazily, inside the first action) and both
    branches read the same frozen blocks.
    """
    if id_col is not None:
        return facts
    return facts.withColumn(
        rid, F.monotonically_increasing_id()
    ).transform(pin_lazy)


# \A/\z anchors, NOT ^/$: Java's $ matches before a trailing newline, and
# raw traffic logs routinely carry line terminators — "1.2.3.4\n" must be
# malformed, matching the stdlib oracle
IPV4_RE = r"\A(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)(\.(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3}\z"


def ip_to_long(col: Column | str) -> Column:
    """Dotted-quad IPv4 string → unsigned-32 value in a long; NULL for
    anything that is not a well-formed address (wrong octet count,
    out-of-range octet, junk). Pure Column arithmetic (regex gate +
    split + fold), reproducible in any SQL dialect. The gate matters
    under ANSI mode: a bare ``cast('not-an-ip' AS BIGINT)`` is a
    STAGE-FATAL error, and real traffic logs always contain malformed
    addresses — a NULL key simply never matches any prefix, so the LPM
    join leaves the row unenriched instead of killing the job."""
    c = F.col(col) if isinstance(col, str) else col
    o = F.split(c, r"\.")
    return F.when(
        c.rlike(IPV4_RE),
        o[0].cast("long") * F.lit(16777216)
        + o[1].cast("long") * F.lit(65536)
        + o[2].cast("long") * F.lit(256)
        + o[3].cast("long"),
    )


def ip_lpm_join(
    facts: DataFrame,
    cidrs: DataFrame,
    ip_col: str = "ip",
    prefix_col: str = "prefix",
    len_col: str = "prefix_len",
    how: str = "left",
    id_col: str | None = None,
) -> DataFrame:
    """Longest-prefix-match join: each fact row gets the MOST SPECIFIC CIDR
    range containing its IP — the IP→threat-feed / IP→geo lookup of every
    security pipeline, and a classic non-equi join SQL engines handle badly
    (a BETWEEN theta join degenerates to nested loops).

    Strategy: the distinct prefix lengths present in ``cidrs`` (≤33 values,
    driver-collected — the dim table is small by definition) key a bounded
    fan-out: each fact row emits one candidate key ``ip >> (32-len)`` per
    length, the dim side is keyed the same way once, and the candidates meet
    in ONE broadcast hash equi-join on ``(len, key)``. The most specific hit
    wins via ``max_by`` over prefix length — no window, the reduction rides
    the join output. Work per fact row = |distinct lengths|, independent of
    |cidrs| and of range overlap — versus the unbounded candidate sets of a
    range theta join.

    ``facts`` keeps all columns; matched rows gain the dim's non-key
    columns. ``cidrs`` columns: ``prefix`` (network address as u32 long),
    ``prefix_len`` (0-32), plus any payload columns.

    The most-specific reduction keys on a SURROGATE ROW ID, never on the
    fact columns themselves: only ``(id, ip)`` rides the fan-out, the
    ``max_by`` aggregation and the join-back both shuffle one narrow
    8-byte key, duplicate fact rows survive (a whole-row groupBy would
    collapse them), NULLs in payload columns can't null-eliminate the
    join-back, and non-comparable column types (maps) never enter a key.
    Pass ``id_col`` to reuse an existing unique key (e.g. the ingest
    ``_ordinal``); otherwise a ``monotonically_increasing_id`` is attached
    for the duration of the join. Because the tagged frame feeds BOTH the
    candidate fan-out and the enrichment join-back, and
    ``monotonically_increasing_id`` is partition-layout-dependent (task
    retries or an AQE replan can recompute the two branches with different
    layouts, silently diverging the ids), the auto-id path pins the ids
    with ``localCheckpoint`` before reuse — one materialization of the
    fact columns. At 100 TB pass ``id_col`` instead and skip that cost.
    """
    lens = sorted(
        r[0] for r in cidrs.select(len_col).distinct().collect()
    )
    if not lens:
        raise ValueError("cidrs has no prefix lengths")
    payload = [
        c for c in cidrs.columns if c not in (prefix_col, len_col)
    ]
    # dynamic shift amounts need the SQL form: F.shiftright only accepts a
    # Python int for numBits
    dim = cidrs.select(
        F.col(len_col).alias("_len"),
        F.expr(
            f"shiftright(cast({prefix_col} as bigint),"
            f" 32 - cast({len_col} as int))"
        ).alias("_key"),
        *payload,
    )
    rid = id_col if id_col is not None else "_lpm_rid"
    tagged = _tag_rows(facts, id_col, rid)
    cand = tagged.select(rid, ip_col).withColumn(
        "_len", F.explode(F.array(*[F.lit(l) for l in lens]))
    ).withColumn(
        "_key",
        F.expr(f"shiftright(cast({ip_col} as bigint), 32 - cast(_len as int))"),
    )
    joined = cand.join(F.broadcast(dim), ["_len", "_key"], "inner")
    best = joined.groupBy(rid).agg(
        F.max(F.col("_len")).alias("matched_len"),
        *[F.max_by(F.col(c), F.col("_len")).alias(c) for c in payload],
    )
    out = tagged.join(best, rid, "inner" if how == "inner" else "left")
    if id_col is None:
        out = out.drop(rid)
    return out.select(*facts.columns, "matched_len", *payload)


def ip6_to_longs(col: Column | str) -> Column:
    """IPv6 string → ``struct(hi long, lo long)`` — the canonical two-long
    (128-bit) key for :func:`ip6_lpm_join`. Handles full 8-group form and
    one ``::`` zero-run compression; each long holds 64 bits of the
    address in two's complement (addresses ≥ 2^63 in a half map to
    negative longs — all downstream ops are bitwise/equality, so the sign
    is representation only). Pure Column ops (split, conv, bit shifts).
    IPv4-mapped / dotted-tail forms (``::ffff:1.2.3.4``) are handled by
    folding the dotted quad into the low 32 bits — what a dual-stack feed
    actually ships.

    Malformed addresses (non-hex groups, wrong group count, bad dotted
    tail) yield a NULL struct — ``conv`` silently maps junk hex to 0, so
    an ungated parse would alias garbage onto ``::`` and falsely match
    any ``::/n`` feed prefix; a NULL key matches nothing instead.
    """
    c0 = F.col(col) if isinstance(col, str) else col
    v4_re = r"([0-9]+\.[0-9]+\.[0-9]+\.[0-9]+)$"
    v4_str = F.regexp_extract(c0, v4_re, 1)
    has_v4 = v4_str != ""
    # the dotted tail always occupies the last 32 bits: parse the address
    # with the tail as "0:0", then OR the IPv4 value into lo
    c = F.when(has_v4, F.regexp_replace(c0, v4_re, "0:0")).otherwise(c0)
    v4_val = F.when(has_v4, ip_to_long(v4_str)).otherwise(F.lit(0))
    halves = F.split(c, "::", -1)
    nonempty = lambda x: x != F.lit("")  # noqa: E731
    left = F.filter(F.split(halves[0], ":"), nonempty)
    right = F.when(
        F.size(halves) > 1, F.filter(F.split(halves[1], ":"), nonempty)
    ).otherwise(F.array().cast("array<string>"))
    pad = F.array_repeat(
        F.lit("0"), F.lit(8) - F.size(left) - F.size(right)
    )
    groups = F.transform(
        F.concat(left, pad, right),
        lambda x: F.conv(x, 16, 10).cast("long"),
    )

    def pack(a: Column, b: Column, c2: Column, d: Column) -> Column:
        return (
            F.shiftleft(a, 48)
            .bitwiseOR(F.shiftleft(b, 32))
            .bitwiseOR(F.shiftleft(c2, 16))
            .bitwiseOR(d)
        )

    hi = pack(groups[0], groups[1], groups[2], groups[3])
    lo = pack(groups[4], groups[5], groups[6], groups[7]).bitwiseOR(v4_val)
    hexg = "[0-9A-Fa-f]{1,4}"
    v6_re = (
        "\\A(({h}(:{h}){{7}})"
        "|(({h}(:{h})*)?::({h}(:{h})*)?))\\z"
    ).format(h=hexg)
    # a '::' must stand for AT LEAST one zero group (RFC 4291): with 8
    # explicit groups the pad is empty and the size check alone would
    # accept '1:2:3:4:5:6:7:8::' et al. — the stdlib rejects them
    compress_ok = F.when(
        F.size(halves) > 1, (F.size(left) + F.size(right)) <= 7
    ).otherwise(F.lit(True))
    valid = (
        c.rlike(v6_re)
        & (F.size(F.concat(left, pad, right)) == 8)
        & compress_ok
        & (~has_v4 | v4_str.rlike(IPV4_RE))
    )
    return F.when(valid, F.struct(hi.alias("hi"), lo.alias("lo")))


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _mask64(nbits: Column) -> Column:
    """Top-``nbits`` bit mask as a signed long, via a literal when-chain
    (``nbits`` ∈ [0, 64]) — no dynamic shift expression, so the mask works
    on ANY Column input, not just named columns."""
    out = F.when(nbits <= 0, F.lit(0))
    for n in range(1, 65):
        out = out.when(
            nbits == n, F.lit(_signed64((1 << 64) - (1 << (64 - n))))
        )
    return out


def parse_cidr6(col: Column | str, strict: bool = True) -> Column:
    """``"2001:db8::/32"`` → ``struct(prefix_hi long, prefix_lo long,
    prefix_len int)`` with host bits zeroed, feeding :func:`ip6_lpm_join`
    directly. The mask rides a 65-branch literal when-chain (bitwise AND,
    no dynamic shifts), exact for every prefix length 0-128.

    ``strict`` (default): a malformed row — no ``/``, a prefix length
    outside [0, 128], or an address that doesn't parse to two longs —
    raises at execution time instead of silently becoming a NULL prefix
    struct; a corrupt threat-feed row should fail the load loudly, not
    dissolve into a key that matches nothing. ``strict=False`` restores
    NULL-passthrough for feeds where partial loads are acceptable.
    """
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, "/")
    plen = F.get(parts, 1).try_cast("int")  # see parse_cidr
    addr = ip6_to_longs(parts[0])
    hi_bits = F.least(plen, F.lit(64))
    lo_bits = F.greatest(plen - F.lit(64), F.lit(0))
    out = F.struct(
        addr["hi"].bitwiseAND(_mask64(hi_bits)).alias("prefix_hi"),
        addr["lo"].bitwiseAND(_mask64(lo_bits)).alias("prefix_lo"),
        plen.alias("prefix_len"),
    )
    if not strict:
        return out
    valid = (
        plen.isNotNull()
        & (plen >= 0)
        & (plen <= 128)
        & addr["hi"].isNotNull()
        & addr["lo"].isNotNull()
    )
    return F.when(valid, out).otherwise(
        F.raise_error(F.concat(F.lit("malformed IPv6 CIDR: "), c))
    )


def ip6_lpm_join(
    facts: DataFrame,
    cidrs: DataFrame,
    hi_col: str = "ip_hi",
    lo_col: str = "ip_lo",
    prefix_hi_col: str = "prefix_hi",
    prefix_lo_col: str = "prefix_lo",
    len_col: str = "prefix_len",
    how: str = "left",
    id_col: str | None = None,
) -> DataFrame:
    """128-bit longest-prefix-match join — :func:`ip_lpm_join` for
    dual-stack feeds. Addresses arrive as two longs (``hi``/``lo``, see
    :func:`ip6_to_longs`); prefix lengths span 0-128, so the candidate key
    is the pair ``(khi, klo)``: the hi half shifted for lengths ≤ 64 (lo
    zeroed), the full hi plus the shifted lo half for lengths > 64.
    Shift-by-64 never reaches the JVM (Java shifts are mod 64) — the CASE
    arms route lengths 0 and 64 to literal keys instead.

    Same scale shape as the IPv4 form: work per fact row = |distinct
    prefix lengths| (≤129), one broadcast equi-join on ``(_len, khi,
    klo)``, and a most-specific ``max_by`` reduction keyed on a surrogate
    row id (duplicates and NULL fact columns survive; one narrow shuffle).
    """
    lens = sorted(r[0] for r in cidrs.select(len_col).distinct().collect())
    if not lens:
        raise ValueError("cidrs has no prefix lengths")
    if lens[0] < 0 or lens[-1] > 128:
        raise ValueError(f"prefix lengths out of range: {lens[0]}..{lens[-1]}")
    payload = [
        c
        for c in cidrs.columns
        if c not in (prefix_hi_col, prefix_lo_col, len_col)
    ]

    def khi(hi_name: str) -> Column:
        return F.expr(
            f"CASE WHEN _len = 0 THEN 0L"
            f" WHEN _len <= 64 THEN shiftrightunsigned({hi_name}, 64 - _len)"
            f" ELSE {hi_name} END"
        )

    def klo(lo_name: str) -> Column:
        return F.expr(
            f"CASE WHEN _len <= 64 THEN 0L"
            f" ELSE shiftrightunsigned({lo_name}, 128 - _len) END"
        )

    dim = cidrs.select(
        F.col(len_col).alias("_len"), prefix_hi_col, prefix_lo_col, *payload
    ).select(
        "_len",
        khi(prefix_hi_col).alias("_khi"),
        klo(prefix_lo_col).alias("_klo"),
        *payload,
    )
    rid = id_col if id_col is not None else "_lpm_rid"
    tagged = _tag_rows(facts, id_col, rid)
    cand = (
        tagged.select(rid, hi_col, lo_col)
        .withColumn("_len", F.explode(F.array(*[F.lit(l) for l in lens])))
        .select(
            rid,
            "_len",
            khi(hi_col).alias("_khi"),
            klo(lo_col).alias("_klo"),
        )
    )
    joined = cand.join(F.broadcast(dim), ["_len", "_khi", "_klo"], "inner")
    best = joined.groupBy(rid).agg(
        F.max(F.col("_len")).alias("matched_len"),
        *[F.max_by(F.col(c), F.col("_len")).alias(c) for c in payload],
    )
    out = tagged.join(best, rid, "inner" if how == "inner" else "left")
    if id_col is None:
        out = out.drop(rid)
    return out.select(*facts.columns, "matched_len", *payload)


def parse_cidr(col: Column | str, strict: bool = True) -> Column:
    """``"10.1.0.0/16"`` → ``struct(prefix long, prefix_len int)`` with the
    network address masked down to the prefix (host bits zeroed), so a dim
    table ingested from raw CIDR strings feeds :func:`ip_lpm_join` directly.

    The mask is ``floor(ip / 2^(32-len)) * 2^(32-len)`` — dividing by a
    power of two only adjusts the float exponent, so the arithmetic is
    EXACT in doubles up to 2^53 (no dynamic-shift expression needed; the
    built-in ``shiftright`` only takes literal shift amounts). Pure Column
    arithmetic, reproducible in any SQL dialect.

    ``strict`` (default): malformed rows — non-dotted-quad address, an
    octet > 255, or a prefix length outside [0, 32] — raise at execution
    time instead of silently becoming NULL keys (see :func:`parse_cidr6`).
    """
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, "/")
    # try_cast: a non-numeric length ("1.2.3.0/ab") must reach the NAMED
    # raise_error below (or NULL passthrough), not die as an anonymous
    # ANSI cast failure inside the validity predicate itself
    plen = F.get(parts, 1).try_cast("int")
    raw = ip_to_long(parts[0])
    p = F.pow(F.lit(2.0), (F.lit(32) - plen).cast("double"))
    masked = (
        F.floor(raw.cast("double") / p) * p
    ).cast("long")
    out = F.struct(masked.alias("prefix"), plen.alias("prefix_len"))
    if not strict:
        return out
    octets_ok = F.forall(
        F.split(parts[0], r"\."),
        lambda o: o.rlike("^[0-9]{1,3}$") & (o.cast("int") <= 255),
    )
    valid = (
        plen.isNotNull()
        & (plen >= 0)
        & (plen <= 32)
        & (F.size(F.split(parts[0], r"\.")) == 4)
        & octets_ok
    )
    return F.when(valid, out).otherwise(
        F.raise_error(F.concat(F.lit("malformed IPv4 CIDR: "), c))
    )
