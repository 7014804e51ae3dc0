"""Security-analytics operators over the event stream: beaconing detection,
per-entity volume anomalies, consecutive-failure runs, and funnel analysis.

These extend the reference's feature/sessionization surface
(`/root/reference/src/features.py`) with the detections a security data
pipeline actually ships: the reference computes the building blocks
(inter-event gaps, session ids, per-user baselines); these operators compose
them into verdict-shaped outputs.

Scale design: every operator is one window pass plus one (partial-agg)
shuffle on the natural entity key — `(user_id)` or `(user_id, event_type)` —
which is exactly the key the 100 TB event stream is already bucketed/sorted
by in a production layout, so the ordered windows sort partition-locally
without a global exchange. No self-joins, no collect, no Python.

Cross-engine determinism (driver hash-compares values vs DuckDB): moments
are accumulated as EXACT integers/decimals (gap microseconds as BIGINT,
squared gaps as DECIMAL(38,0)) and only converted to DOUBLE for one
token-identical IEEE expression on both engines — never an engine `avg` /
`stddev` over doubles, whose accumulation order is nondeterministic under
Spark's shuffled partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def inter_arrival_stats(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("user_id", "event_type"),
    ts_col: str = "ts",
    id_col: str = "event_id",
    min_gaps: int = 10,
) -> DataFrame:
    """Per-key inter-arrival moments: n_gaps, mean gap, coefficient of
    variation (cv = stddev/mean).

    Low cv = metronome-like regularity — the classic beacon / heartbeat /
    cron-job signature (an automated callback fires on a timer; a human
    clicks on a heavy-tailed schedule with cv ≈ 1).

    Gaps are captured as exact BIGINT microseconds from one ordered window
    pass; the group-by then sums `gap` (BIGINT) and `gap²` (DECIMAL(38,0) —
    gap² overflows BIGINT for day-scale gaps) map-side-combined, and the
    mean/variance come from one token-identical double expression:
    ``var = (ss - s*s/n) / (n - 1)``.

    ``min_gaps`` must be ≥ 2 (sample variance divides by n−1). A stream
    whose every gap is ZERO (events batch-logged with one timestamp)
    has an undefined cv (0/0) and reports NULL —
    :func:`beacon_candidates` ranks those LAST, so timestamp artifacts
    can't crowd genuine beacons out of the triage list.
    """
    if min_gaps < 2:
        raise ValueError(
            f"min_gaps must be >= 2 (sample variance needs n-1 > 0), "
            f"got {min_gaps}"
        )
    w = Window.partitionBy(*key_cols).orderBy(ts_col, id_col)
    us = F.unix_micros(F.col(ts_col))
    gap = (us - F.lag(us).over(w)).alias("gap_us")
    gaps = events.select(*key_cols, gap).filter(F.col("gap_us").isNotNull())
    gd = F.col("gap_us").cast("decimal(19,0)")
    agged = (
        gaps.groupBy(*key_cols)
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum("gap_us").alias("_s"),
            F.sum(gd * gd).alias("_ss"),
        )
        .filter(F.col("n_gaps") >= min_gaps)
    )
    n = F.col("n_gaps").cast("double")
    s = F.col("_s").cast("double")
    ss = F.col("_ss").cast("double")
    mean_us = s / n
    var_us2 = (ss - s * s / n) / (n - F.lit(1.0))
    return agged.select(
        *key_cols,
        "n_gaps",
        F.round(mean_us / F.lit(1_000_000.0), 6).alias("mean_gap_seconds"),
        F.round(
            F.when(mean_us > 0.0, F.sqrt(var_us2) / mean_us), 6
        ).alias("gap_cv"),
    )


def beacon_candidates(
    events: DataFrame,
    top_k: int = 20,
    min_gaps: int = 10,
    key_cols: tuple[str, ...] = ("user_id", "event_type"),
) -> DataFrame:
    """The `top_k` most regular (lowest-cv) entity/type streams — beaconing
    candidates ranked for triage. TakeOrdered (per-partition top-k + driver
    merge) — never a global sort of the stats table."""
    stats = inter_arrival_stats(events, key_cols=key_cols, min_gaps=min_gaps)
    # nulls LAST: an all-zero-gap stream (NULL cv, a timestamp artifact)
    # must not outrank real low-cv beacons
    return stats.orderBy(
        F.col("gap_cv").asc_nulls_last(), *key_cols
    ).limit(top_k)


def volume_zscores(
    events: DataFrame,
    z_threshold: float = 2.0,
    ts_col: str = "ts",
    entity_col: str = "user_id",
) -> DataFrame:
    """Per-entity daily-volume anomalies: days whose event count sits
    ``z_threshold`` sample standard deviations above that entity's own
    mean daily volume (self-baselined, so chatty entities don't drown
    quiet ones).

    Two-level aggregate: per-(entity, day) counts, then per-entity moments
    as WINDOW sums over the entity partition — the baseline rides the same
    exchange as the daily counts instead of a groupBy + join-back. Counts
    are exact integers, so the z expression is deterministic cross-engine.
    Entities need >= 2 observed days and nonzero variance.
    """
    daily = events.groupBy(
        entity_col, F.date_trunc("day", F.col(ts_col)).alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy(entity_col)
    daily = (
        daily.withColumn("_days", F.count(F.lit(1)).over(w))
        .withColumn("_s", F.sum("n_events").over(w))
        .withColumn(
            "_ss", F.sum(F.col("n_events") * F.col("n_events")).over(w)
        )
        .filter(F.col("_days") >= 2)
    )
    d = F.col("_days").cast("double")
    s = F.col("_s").cast("double")
    ss = F.col("_ss").cast("double")
    mu = s / d
    var = (ss - s * s / d) / (d - F.lit(1.0))
    z = (F.col("n_events").cast("double") - mu) / F.sqrt(var)
    return (
        daily.filter(var > 0.0)
        .withColumn("z_score", z)
        .filter(F.col("z_score") >= F.lit(z_threshold))
        .select(
            entity_col,
            "day",
            "n_events",
            F.round("z_score", 6).alias("z_score"),
        )
    )


def error_runs(
    events: DataFrame,
    run_len: int = 3,
    match_type: str = "error",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Rows that complete a run of ``run_len`` CONSECUTIVE ``match_type``
    events for one user (no intervening other-type event) — the
    brute-force / crash-loop / retry-storm detector.

    One ordered window pass with ``run_len - 1`` lags; emits the run's last
    event plus the run's wall-clock span. Fixed small ``run_len`` keeps the
    lag count constant — runs of unknown length are `sessionize`-shaped
    (boundary flag + running sum) instead.
    """
    if run_len < 2:
        raise ValueError("run_len must be >= 2")
    w = Window.partitionBy("user_id").orderBy(ts_col, id_col)
    us = F.unix_micros(F.col(ts_col))
    cond = F.col("event_type") == match_type
    for i in range(1, run_len):
        cond = cond & (F.lag("event_type", i).over(w) == match_type)
    span_s = (us - F.lag(us, run_len - 1).over(w)) / F.lit(1_000_000.0)
    return (
        events.withColumn("_hit", cond)
        .withColumn("_span", span_s)
        .filter(F.col("_hit"))
        .select(
            "user_id",
            "event_id",
            F.col(ts_col).alias("run_end_ts"),
            F.round("_span", 6).alias("run_span_seconds"),
        )
    )


def emergent_behavior(
    events: DataFrame,
    warmup_hours: float = 24.0,
    key_cols: tuple[str, ...] = ("user_id", "event_type"),
    ts_col: str = "ts",
) -> DataFrame:
    """First occurrence of each ``key_cols`` combination that appears only
    AFTER the entity's warm-up window — "this user started doing something
    new, well past onboarding", the classic lateral-movement / account-
    takeover precursor signal (a user's action vocabulary is stable; late
    additions are review-worthy).

    One groupBy to per-key first timestamps (map-side combined), then the
    entity baseline as a window over the already-small firsts table — no
    join-back, no second pass over the fact table. The elapsed-hours math
    is integer microseconds divided once, token-identical cross-engine.
    """
    entity = key_cols[0]
    firsts = events.groupBy(*key_cols).agg(
        F.min(ts_col).alias("first_ts")
    )
    w = Window.partitionBy(entity)
    hours = (
        F.unix_micros(F.col("first_ts"))
        - F.unix_micros(F.min("first_ts").over(w))
    ) / F.lit(3_600_000_000.0)
    return (
        firsts.withColumn("hours_after_onboarding", F.round(hours, 6))
        .filter(F.col("hours_after_onboarding") >= F.lit(warmup_hours))
        .select(*key_cols, "first_ts", "hours_after_onboarding")
    )


def hour_of_day_entropy(
    events: DataFrame,
    min_events: int = 50,
    entity_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-entity Shannon entropy of the hour-of-day activity histogram.

    A human's diurnal rhythm concentrates activity (moderate entropy); a
    cron job hits one hour (entropy → 0); a 24/7 bot spreads uniformly
    (entropy → ln 24 ≈ 3.18). Both tails are triage-worthy, so this
    returns the full scored table and callers rank from either end.

    Determinism: entropy is ``ln n − (Σ c·ln c)/n`` over EXACT hour counts;
    each ``c·ln c`` term is rounded to 9 dp and summed as DECIMAL(38,9)
    (exact, order-free), so Spark's shuffled partial aggregation and the
    DuckDB oracle agree bit-for-bit. Two cheap aggregations: per-(entity,
    hour) counts — at most 24 rows per entity — then per-entity.
    """
    per_hour = events.groupBy(
        entity_col, F.hour(F.col(ts_col)).alias("_hr")
    ).agg(F.count(F.lit(1)).alias("_c"))
    c = F.col("_c").cast("double")
    term = F.round(c * F.log(c), 9).cast("decimal(38,9)")
    agged = per_hour.groupBy(entity_col).agg(
        F.sum("_c").alias("n_events"),
        F.count(F.lit(1)).alias("active_hours"),
        F.sum(term).alias("_sterm"),
    )
    n = F.col("n_events").cast("double")
    ent = F.log(n) - F.col("_sterm").cast("double") / n
    return agged.filter(F.col("n_events") >= min_events).select(
        entity_col,
        "n_events",
        "active_hours",
        F.round(ent, 6).alias("hour_entropy"),
    )


def value_outliers(
    events: DataFrame,
    z_threshold: float = 3.0,
    value_col: str = "value",
    group_col: str = "event_type",
) -> DataFrame:
    """Events whose ``value_col`` sits ``z_threshold`` sample standard
    deviations above their ``group_col`` population mean — the metric-spike
    detector (exfil byte counts, request sizes, transfer amounts).

    Scale shape: per-group moments via groupBy (map-side combined — NOT a
    window partitioned by the handful of group values, which would funnel
    the whole table through ≤ |groups| tasks), then a broadcast join-back
    of the tiny stats table. Values are rounded to 6 dp and summed as
    DECIMAL (exact, order-free); the z expression is one token-identical
    double formula per engine.
    """
    vdec = F.round(F.col(value_col), 6).cast("decimal(18,6)")
    stats = events.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(vdec).alias("_s"),
        F.sum(vdec * vdec).alias("_ss"),
    )
    n = F.col("_n").cast("double")
    s = F.col("_s").cast("double")
    ss = F.col("_ss").cast("double")
    mu = s / n
    var = (ss - s * s / n) / (n - F.lit(1.0))
    z = (F.round(F.col(value_col), 6) - mu) / F.sqrt(var)
    return (
        events.join(F.broadcast(stats), on=group_col)
        .filter(F.col("_n") >= 2)
        .filter(var > 0.0)
        .withColumn("z_score", z)
        .filter(F.col("z_score") >= F.lit(z_threshold))
        .select(
            "event_id",
            group_col,
            F.col(value_col),
            F.round("z_score", 6).alias("z_score"),
        )
    )


def rolling_volume_baseline(
    events: DataFrame,
    window_days: int = 7,
    entity_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-entity daily counts with a trailing ``window_days``-day average
    baseline and the day's ratio against it — the rolling-baseline form of
    :func:`volume_zscores` (reacts to drift; the z-score form assumes a
    stationary per-entity rate).

    A RANGE window frame over an integer day index (not ROWS — gap days
    must widen the frame, and absent days contribute nothing), on top of
    per-(entity, day) pre-aggregated counts, so the frame scan is over
    ≤ days rows per entity, never raw events. Counts are exact integers;
    the average is one sum/count division, token-identical cross-engine.
    """
    daily = events.groupBy(
        entity_col, F.date_trunc("day", F.col(ts_col)).alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    day_idx = F.floor(
        F.unix_micros(F.col("day")) / F.lit(86_400_000_000.0)
    ).cast("long")
    w = (
        Window.partitionBy(entity_col)
        .orderBy(day_idx)
        .rangeBetween(-(window_days - 1), 0)
    )
    avg = F.sum("n_events").over(w).cast("double") / F.count(
        F.lit(1)
    ).over(w).cast("double")
    return daily.select(
        entity_col,
        "day",
        "n_events",
        F.round(avg, 6).alias("trailing_avg"),
        F.round(F.col("n_events").cast("double") / avg, 6).alias(
            "volume_ratio"
        ),
    )


def session_funnel(
    with_session_ids: DataFrame,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    ts_col: str = "timestamp",
) -> DataFrame:
    """Ordered-stage funnel conversion over sessionized events: one summary
    row counting sessions that reached each prefix of ``stages`` IN ORDER
    (first view strictly before first click strictly before first
    purchase, ...).

    Input is any frame carrying (user_id, session_id, event_type, ts) —
    i.e. the output of `features.add_session_features`. Per-session
    conditional MIN timestamps in one groupBy (map-side combined), then a
    single global row; stage attainment is monotone by construction
    (stage k requires stages 1..k-1), so the output reads as a funnel.
    """
    firsts = [
        F.min(F.when(F.col("event_type") == st, F.col(ts_col))).alias(
            f"_t{i}"
        )
        for i, st in enumerate(stages)
    ]
    per_session = with_session_ids.groupBy("user_id", "session_id").agg(
        *firsts
    )
    reached = F.col("_t0").isNotNull()
    out = [
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(reached.cast("bigint")).alias(f"reached_{stages[0]}"),
    ]
    for i in range(1, len(stages)):
        reached = reached & (F.col(f"_t{i - 1}") < F.col(f"_t{i}"))
        out.append(F.sum(reached.cast("bigint")).alias(f"reached_{stages[i]}"))
    return per_session.agg(*out)


def robust_value_outliers(
    events: DataFrame,
    z_threshold: float = 3.5,
    value_col: str = "value",
    group_col: str = "event_type",
) -> DataFrame:
    """:func:`value_outliers`' ROBUST form: modified z-score on median /
    MAD (Iglewicz & Hoaglin 1993 — public technique) instead of mean /
    stddev. The mean-based detector has a masking problem at exactly the
    moment it matters — a burst of extreme values inflates the stddev it
    is judged against, hiding all but the first spike; median and MAD
    have a 50% breakdown point, so the baseline stands still while the
    burst sticks out.

    Modified z = (x − median) / (1.4826·MAD), flagged TWO-SIDED at
    ``|z| > z_threshold`` — the paper's criterion, strict inequality
    (sudden drops flag the same as spikes); groups whose MAD is 0
    (over half the values identical) yield NULL z and flag nothing —
    surfaced, not crashed. Scale shape: exact per-group median and MAD
    via TWO groupBy aggregations (percentile is a map-side-combinable
    aggregate — never a window over ≤|groups| partitions), the second
    over |x − median| after a broadcast join-back of the tiny median
    table; the final flag pass is another broadcast probe. Values round
    to 6 dp before every percentile so the interpolated midpoints are
    cross-engine exact.
    """
    v = F.round(F.col(value_col).cast("double"), 6)
    base = events.filter(F.col(value_col).isNotNull())
    med = base.groupBy(group_col).agg(
        F.round(F.percentile(v, F.lit(0.5)), 6).alias("_med")
    )
    withmed = base.join(F.broadcast(med), group_col)
    mad = withmed.groupBy(group_col).agg(
        F.round(
            F.percentile(F.abs(v - F.col("_med")), F.lit(0.5)), 6
        ).alias("_mad")
    )
    stats = med.join(mad, group_col)
    rz = F.round(
        (v - F.col("_med"))
        / F.nullif(F.lit(1.4826) * F.col("_mad"), F.lit(0.0)),
        6,
    )
    return (
        base.join(F.broadcast(stats), group_col)
        .select(
            "event_id",
            group_col,
            v.alias("value"),
            F.col("_med").alias("group_median"),
            F.col("_mad").alias("group_mad"),
            rz.alias("robust_z"),
        )
        # |z| > threshold, both tails — Iglewicz & Hoaglin's modified
        # z-score criterion is two-sided (|M_i| > 3.5); a sudden DROP is
        # as anomalous as a spike (ADVICE r10: the old one-sided
        # `robust_z > t` never flagged negative-direction anomalies).
        # Strict > (not >=) is the paper's rule; value_outliers' >= is
        # its own documented convention.
        .filter(F.abs(F.col("robust_z")) > F.lit(float(z_threshold)))
    )
