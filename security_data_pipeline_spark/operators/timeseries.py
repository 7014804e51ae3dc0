"""Time-series densification: regular-grid resampling with gap zero-fill,
and forward fill over ordered NULL runs — the telemetry prep every
security/metrics pipeline does before rate math or charting ("no events in
that hour" must be a row saying 0, not a missing row; a sensor's last
reading carries forward until the next one).

Scale shape: resampling aggregates FIRST (one partial-agged groupBy to one
row per (key, bucket)) and only then densifies — the grid explosion works
on per-key bucket RANGES (two longs per key), never on raw rows, so grid
cost is Σ_key span/step rows regardless of input volume. Forward fill is
one ordered window per key with O(1) state (``last(ignorenulls)``) — the
same running-value idiom the as-of join uses. Both are pure Column/window
math, replicated verbatim in the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_counts(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    step_seconds: int,
    value_col: str | None = None,
) -> DataFrame:
    """Per-key regular time grid at ``step_seconds``: one row for EVERY
    bucket between each key's first and last event, with ``n_events``
    zero-filled on empty buckets and (optionally) an exact DECIMAL-summed
    ``value_sum`` that stays NULL on empty buckets (so a downstream
    :func:`forward_fill` can distinguish "no data" from 0.0).

    Output: ``keys + (bucket_ts timestamp, n_events long[, value_sum
    double])``, one row per (key, grid bucket).
    """
    step_us = int(step_seconds) * 1_000_000
    # floor(double division): epoch micros < 2^53 are exact in doubles and
    # bucket-boundary values divide exactly, so this matches integer
    # division for every representable timestamp — and replicates verbatim
    # in engines whose `/` is float division (DuckDB oracle)
    bucket = F.floor(F.unix_micros(F.col(ts_col)) / F.lit(step_us)).cast(
        "long"
    )
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(38,12)"))
            .cast("double")
            .alias("value_sum")
        )
    per_bucket = df.groupBy(*keys, bucket.alias("_b")).agg(*aggs)
    spans = per_bucket.groupBy(*keys).agg(
        F.min("_b").alias("_b0"), F.max("_b").alias("_b1")
    )
    grid = spans.select(
        *keys, F.explode(F.sequence("_b0", "_b1")).alias("_b")
    )
    out = grid.join(per_bucket, keys + ["_b"], "left").select(
        *keys,
        F.timestamp_micros(F.col("_b") * F.lit(step_us)).alias("bucket_ts"),
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        *([F.col("value_sum")] if value_col is not None else []),
    )
    return out


def forward_fill(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    cols: list[str],
    suffix: str = "_ffill",
) -> DataFrame:
    """Carry each column's most recent non-NULL value forward in
    ``order_col`` order within each key (classic LOCF). Appends
    ``{col}{suffix}`` columns; rows before a key's first observation stay
    NULL. One ordered window per key, O(1) running state.

    ``order_col`` must be a TOTAL order per key: on ties LOCF is
    ill-defined and the filled value follows partition-internal row
    order (non-deterministic under retries/AQE — the same caveat as any
    ordered window; registered queries order by unique ids)."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in cols:
        out = out.withColumn(
            f"{c}{suffix}", F.last(F.col(c), ignorenulls=True).over(w)
        )
    return out


def interpolate_linear(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    value_col: str,
    suffix: str = "_interp",
) -> DataFrame:
    """Linear interpolation of NULL gaps between observations per key —
    the companion to :func:`forward_fill` when the series is a sampled
    continuous quantity (sensor readings, rates) rather than a state
    that holds until changed.

    For each NULL row the nearest non-NULL neighbors on both sides
    (within the key, ordered by ``order_col``, which must be NUMERIC —
    the interpolation ratio is arithmetic on it) define the line::

        v = prev_v + (next_v - prev_v) * (o - prev_o) / (next_o - prev_o)

    Non-NULL rows keep their value exactly (both neighbors collapse to
    the row itself). Rows before a key's first observation or after its
    last have only one neighbor and stay NULL — extrapolation is a
    policy decision, so it is left to the caller (chain
    :func:`forward_fill` after for flat extrapolation).

    Appends ``{value_col}{suffix}``. Physical shape: two O(1)-state
    ordered windows per key (a backward ``last(ignorenulls)`` and a
    forward ``first(ignorenulls)`` over (order, value) structs sharing
    ONE sort/exchange — same partitioning, mirrored frames), then pure
    row-local IEEE math; the float expression is written operand-for-
    operand identically in the DuckDB oracle so values hash-match.
    """
    obs = F.when(
        F.col(value_col).isNotNull(),
        F.struct(
            F.col(order_col).cast("double").alias("o"),
            F.col(value_col).cast("double").alias("v"),
        ),
    )
    w_back = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prev = F.last(obs, ignorenulls=True).over(w_back)
    nxt = F.first(obs, ignorenulls=True).over(w_fwd)
    o = F.col(order_col).cast("double")
    interp = prev["v"] + (nxt["v"] - prev["v"]) * (
        (o - prev["o"]) / (nxt["o"] - prev["o"])
    )
    filled = (
        F.when(F.col(value_col).isNotNull(), F.col(value_col).cast("double"))
        .when(
            prev.isNotNull() & nxt.isNotNull() & (prev["o"] != nxt["o"]),
            interp,
        )
    )
    return df.withColumn(f"{value_col}{suffix}", filled)


def forward_fill_bucketed(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    cols: list[str],
    bucket_width: float,
    suffix: str = "_ffill",
) -> DataFrame:
    """LOCF identical to :func:`forward_fill`, but skew-resistant — the
    ordered window runs per (key, order-bucket), then a compact per-bucket
    carry-in merge crosses bucket boundaries (the same decomposition
    :func:`~security_data_pipeline_spark.operators.features.add_session_features_bucketed`
    applies to the running session sum).

    The plain form sorts each key's ENTIRE history in one task — for the
    hot key of a skewed feed (NAT gateway, service account) that is one
    straggler task holding the stage at 100×. Here the hot key's timeline
    splits into ``bucket_width``-sized slices of ``order_col`` (which must
    be numeric — pass ``unix_micros(ts)`` for timestamps) that fill in
    parallel, and the only per-key sequential work is ONE ROW PER ACTIVE
    BUCKET:

    1. local pass — ``last(col, ignorenulls)`` within (key, bucket),
       exactly the plain algorithm;
    2. bucket summary — each bucket's last non-NULL value per column
       (a lexicographic max over (order, value) structs: one groupBy row
       per (key, bucket), map-side combined);
    3. carry pass — forward-fill the summaries per key over the bucket
       index EXCLUSIVE of the current bucket (unboundedPreceding → -1):
       the value entering each bucket from everything before it;
    4. join the carry-in back on (key, bucket) and
       ``coalesce(local, carry_in)``.

    Rows before a key's first observation stay NULL through every stage,
    matching the plain form (including its total-order requirement on
    ``order_col`` — see :func:`forward_fill`). Equivalence on random gap
    patterns is property-tested in tests/test_timeseries.py and under
    hypothesis in tests/test_properties.py.
    """
    b = F.floor(F.col(order_col) / F.lit(float(bucket_width))).cast("long")
    out = df.withColumn("_fb", b)
    w_local = (
        Window.partitionBy(*keys, "_fb")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in cols:
        out = out.withColumn(
            f"{c}{suffix}", F.last(F.col(c), ignorenulls=True).over(w_local)
        )
    # one row per (key, active bucket): the bucket's last non-NULL value
    # per column, as a lexicographic max over (order, value) structs so
    # NULL values never win
    summaries = out.groupBy(*keys, "_fb").agg(
        *[
            F.max(
                F.when(
                    F.col(c).isNotNull(),
                    F.struct(
                        F.col(order_col).alias("o"), F.col(c).alias("v")
                    ),
                )
            )["v"].alias(f"_last_{c}")
            for c in cols
        ]
    )
    w_carry = (
        Window.partitionBy(*keys)
        .orderBy("_fb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = summaries.select(
        *keys,
        "_fb",
        *[
            F.last(F.col(f"_last_{c}"), ignorenulls=True)
            .over(w_carry)
            .alias(f"_carry_{c}")
            for c in cols
        ],
    )
    out = out.join(carry, keys + ["_fb"])
    for c in cols:
        out = out.withColumn(
            f"{c}{suffix}",
            F.coalesce(F.col(f"{c}{suffix}"), F.col(f"_carry_{c}")),
        )
    return out.drop("_fb", *[f"_carry_{c}" for c in cols])


def forward_fill_bounded(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    value_col: str,
    max_gap: float,
    suffix: str = "_ffill",
) -> DataFrame:
    """LOCF with a staleness bound: carry the most recent non-NULL value
    forward ONLY while the gap back to its observation is ≤ ``max_gap``
    (in ``order_col`` units, which must therefore be numeric) — the
    telemetry rule that a sensor's last reading may stand in for a
    missed poll but must not paper over an outage.

    Same single O(1)-state ordered window as :func:`forward_fill`, run
    over (order, value) structs so the carried value and ITS observation
    time travel together; the bound is then row-local math. Rows beyond
    the bound (and before a key's first observation) stay NULL. Appends
    ``{value_col}{suffix}``.
    """
    obs = F.when(
        F.col(value_col).isNotNull(),
        F.struct(
            F.col(order_col).cast("double").alias("o"),
            F.col(value_col).cast("double").alias("v"),
        ),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev = F.last(obs, ignorenulls=True).over(w)
    filled = F.when(
        F.col(value_col).isNotNull(), F.col(value_col).cast("double")
    ).when(
        prev.isNotNull()
        & (
            (F.col(order_col).cast("double") - prev["o"])
            <= F.lit(float(max_gap))
        ),
        prev["v"],
    )
    return df.withColumn(f"{value_col}{suffix}", filled)


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen period,
    tracked by how many are still active N periods later — the
    engagement surface behind "is the week-3 crawl source still
    contributing documents?" / "do users onboarded in week 1 keep
    producing events?".

    Scale shape: (1) per-user first-seen period = one hash aggregation
    (min of the period index — exact integer floor-division of epoch
    days, no timezone arithmetic); (2) distinct (user, period) activity
    = one hash aggregation; (3) the two are joined co-partitioned on the
    user key (both sides are per-user reductions — never the fact
    table); (4) the final (cohort, offset) rollup counts rows of an
    already-distinct frame, so no COUNT DISTINCT shuffle survives to the
    wide stage. Retention rate = n_active / cohort size via one window
    over the triangle (≤ periods² rows).

    Output: ``cohort_period, period_offset, n_active, cohort_size,
    retention`` (6 dp) — offset 0 rows carry retention 1.0 by
    construction (a self-check the oracle inherits).
    """
    return retention_from_activity(user_activity_periods(
        df, user_col, ts_col, period_days
    ))


def user_activity_periods(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """The retention sufficient statistic: distinct ``(_u, _p)`` activity
    pairs (period = exact integer floor-division of epoch days). This
    frame determines the whole triangle — first-seen is min(_p) per user
    WITHIN it — and merges by DISTINCT UNION (idempotent), which is what
    makes retention streamable
    (:func:`...streaming.pipeline.maintain_retention_stream`)."""
    period = F.floor(
        F.unix_micros(F.col(ts_col)) / F.lit(86_400_000_000 * period_days)
    ).cast("long")
    return (
        df.filter(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(F.col(user_col).alias("_u"), period.alias("_p"))
        .distinct()
    )


def retention_from_activity(active: DataFrame) -> DataFrame:
    """Cohort triangle from the distinct activity pairs — shared
    verbatim by the batch operator and the streaming maintainer's
    reader, so their reports are identical on equal activity sets."""
    from pyspark.sql import Window

    first_seen = active.groupBy("_u").agg(F.min("_p").alias("_cohort"))
    joined = active.join(first_seen, "_u")
    tri = joined.groupBy(
        F.col("_cohort").alias("cohort_period"),
        (F.col("_p") - F.col("_cohort")).alias("period_offset"),
    ).agg(F.count(F.lit(1)).alias("n_active"))
    w = Window.partitionBy("cohort_period")
    size = F.max(
        F.when(F.col("period_offset") == 0, F.col("n_active"))
    ).over(w)
    return tri.select(
        "cohort_period",
        "period_offset",
        "n_active",
        size.alias("cohort_size"),
        F.round(
            F.col("n_active").cast("double") / size.cast("double"), 6
        ).alias("retention"),
    )
