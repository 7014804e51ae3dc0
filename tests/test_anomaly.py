"""Semantic unit tests for operators/anomaly.py on hand-built frames —
edge cases the sf-oracle comparison can't isolate (interrupted runs, strict
funnel ordering, warm-up boundaries, single-hour entropy), plus plan-shape
assertions for the scale-critical choices (broadcast join-back, TakeOrdered
top-k)."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from security_data_pipeline_spark.operators import anomaly, features

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def _ts(seconds):
    return T0 + dt.timedelta(seconds=seconds)


def _events(spark, rows):
    """rows: (event_id, user_id, event_type, seconds_offset)"""
    return spark.createDataFrame(
        [(eid, uid, et, _ts(s)) for eid, uid, et, s in rows],
        "event_id long, user_id long, event_type string, ts timestamp",
    )


# -- inter_arrival_stats / beacon_candidates --------------------------------


def test_beacon_cv_zero_for_metronome(spark):
    rows = [(i, 1, "ping", 60 * i) for i in range(12)]  # exact 60s cadence
    rows += [(100 + i, 2, "click", [0, 3, 9, 10, 40, 41, 300, 310, 500,
                                    900, 1000, 1500][i]) for i in range(12)]
    stats = anomaly.inter_arrival_stats(
        _events(spark, rows), min_gaps=10
    ).collect()
    by_user = {r.user_id: r for r in stats}
    assert by_user[1].gap_cv == 0.0
    assert by_user[1].mean_gap_seconds == 60.0
    assert by_user[1].n_gaps == 11
    assert by_user[2].gap_cv > 0.5  # bursty human-ish stream

    top = anomaly.beacon_candidates(
        _events(spark, rows), top_k=1, min_gaps=10
    ).collect()
    assert [(r.user_id, r.event_type) for r in top] == [(1, "ping")]


def test_beacon_min_gaps_excludes_short_streams(spark):
    rows = [(i, 1, "ping", 60 * i) for i in range(5)]  # only 4 gaps
    out = anomaly.inter_arrival_stats(_events(spark, rows), min_gaps=10)
    assert out.count() == 0


def test_beacon_topk_is_take_ordered(spark):
    rows = [(i, 1, "ping", 60 * i) for i in range(12)]
    plan = (
        anomaly.beacon_candidates(_events(spark, rows), top_k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan  # never a global sort


# -- volume_zscores ---------------------------------------------------------


def test_volume_zscore_flags_spike_day(spark):
    rows = []
    eid = 0
    # user 1: 9 quiet days of 2 events, one day of 30
    for d in range(9):
        for k in range(2):
            rows.append((eid, 1, "view", d * 86400 + k))
            eid += 1
    for k in range(30):
        rows.append((eid, 1, "view", 9 * 86400 + k))
        eid += 1
    # user 2: flat -> zero variance -> excluded
    for d in range(5):
        rows.append((eid, 2, "view", d * 86400))
        eid += 1
    out = anomaly.volume_zscores(_events(spark, rows), z_threshold=2.0)
    got = out.collect()
    assert len(got) == 1
    (r,) = got
    assert r.user_id == 1 and r.n_events == 30
    # z = (30 - 4.8) / sqrt(var); var = (sum(x^2) - s^2/n)/(n-1)
    s, ss, n = 48, 9 * 4 + 900, 10
    var = (ss - s * s / n) / (n - 1)
    assert r.z_score == pytest.approx((30 - 4.8) / math.sqrt(var), abs=1e-6)


# -- error_runs -------------------------------------------------------------


def test_error_runs_requires_consecutive(spark):
    rows = [
        (0, 1, "error", 0),
        (1, 1, "error", 10),
        (2, 1, "view", 20),  # interrupts the run
        (3, 1, "error", 30),
        (4, 1, "error", 40),
        (5, 1, "error", 50),  # completes a fresh run of 3
        (6, 1, "error", 60),  # runs overlap: 3-4-5 and 4-5-6 both count
    ]
    out = anomaly.error_runs(_events(spark, rows), run_len=3).collect()
    assert sorted(r.event_id for r in out) == [5, 6]
    spans = {r.event_id: r.run_span_seconds for r in out}
    assert spans[5] == 20.0 and spans[6] == 20.0


def test_error_runs_never_cross_users(spark):
    rows = [(0, 1, "error", 0), (1, 2, "error", 10), (2, 1, "error", 20),
            (3, 2, "error", 30), (4, 1, "error", 40), (5, 2, "error", 50)]
    out = anomaly.error_runs(_events(spark, rows), run_len=3).collect()
    assert sorted(r.event_id for r in out) == [4, 5]


def test_error_runs_rejects_run_len_1(spark):
    with pytest.raises(ValueError):
        anomaly.error_runs(_events(spark, [(0, 1, "error", 0)]), run_len=1)


# -- session_funnel ---------------------------------------------------------


def _funnel(spark, rows):
    ev = _events(spark, rows).select(
        "event_id", "user_id", "event_type", F.col("ts").alias("timestamp")
    )
    with_ids = features.add_session_features(
        ev, gap_minutes=30, tiebreak_cols=("event_id",), include_stats=False
    )
    return anomaly.session_funnel(with_ids).collect()[0]


def test_funnel_counts_strictly_ordered_stages(spark):
    rows = [
        # session A (user 1): full ordered funnel
        (0, 1, "view", 0), (1, 1, "click", 10), (2, 1, "purchase", 20),
        # session B (user 2): purchase BEFORE click -> reaches click
        # (first view < first click) but NOT purchase (click !< purchase)
        (3, 2, "view", 0), (4, 2, "purchase", 10), (5, 2, "click", 20),
        # session C (user 3): no view at all -> reaches nothing
        (6, 3, "click", 0),
        # session D (user 1, later): view then click only
        (7, 1, "view", 10_000), (8, 1, "click", 10_005),
    ]
    r = _funnel(spark, rows)
    assert r.n_sessions == 4
    assert r.reached_view == 3
    assert r.reached_click == 3
    assert r.reached_purchase == 1


def test_funnel_monotone(spark):
    rows = [(i, i, "purchase", 0) for i in range(5)]
    r = _funnel(spark, rows)
    assert r.n_sessions == 5
    assert r.reached_view == r.reached_click == r.reached_purchase == 0


# -- emergent_behavior ------------------------------------------------------


def test_emergent_behavior_warmup_boundary(spark):
    rows = [
        (0, 1, "login", 0),
        (1, 1, "upload", 23 * 3600),       # inside warm-up: suppressed
        (2, 1, "delete_all", 25 * 3600),   # emergent
        (3, 1, "upload", 30 * 3600),       # NOT first occurrence
        (4, 1, "export", 24 * 3600),       # exactly at boundary: included
        (5, 2, "login", 0),                # lone first event: baseline row
    ]
    out = anomaly.emergent_behavior(
        _events(spark, rows), warmup_hours=24.0
    ).collect()
    got = sorted((r.user_id, r.event_type) for r in out)
    assert got == [(1, "delete_all"), (1, "export")]
    hours = {r.event_type: r.hours_after_onboarding for r in out}
    assert hours["delete_all"] == 25.0 and hours["export"] == 24.0


# -- hour_of_day_entropy ----------------------------------------------------


def test_hour_entropy_extremes(spark):
    rows = []
    eid = 0
    # user 1: all 60 events at hour 3 -> entropy 0
    for k in range(60):
        rows.append((eid, 1, "ping", 3 * 3600 + k))
        eid += 1
    # user 2: 48 events uniform over 24 hours -> entropy ln 24
    for h in range(24):
        for k in range(2):
            rows.append((eid, 2, "view", h * 3600 + k))
            eid += 1
    # user 3: below min_events -> excluded
    rows.append((eid, 3, "view", 0))
    out = anomaly.hour_of_day_entropy(
        _events(spark, rows), min_events=48
    ).collect()
    by_user = {r.user_id: r for r in out}
    assert set(by_user) == {1, 2}
    assert by_user[1].hour_entropy == 0.0
    assert by_user[1].active_hours == 1
    assert by_user[2].hour_entropy == pytest.approx(math.log(24), abs=1e-6)
    assert by_user[2].active_hours == 24


# -- value_outliers ---------------------------------------------------------


def test_value_outliers_flags_extreme_and_broadcasts(spark):
    rows = [(i, 1, "transfer", float(10 + (i % 3))) for i in range(50)]
    rows.append((99, 1, "transfer", 1000.0))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double"
    )
    out = anomaly.value_outliers(df, z_threshold=3.0)
    got = out.collect()
    assert [r.event_id for r in got] == [99]
    assert got[0].z_score > 3.0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # stats join back never shuffles facts


def test_value_outliers_zero_variance_group_silent(spark):
    rows = [(i, 1, "ping", 5.0) for i in range(10)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double"
    )
    assert anomaly.value_outliers(df, z_threshold=1.0).count() == 0


# -- rolling_volume_baseline ------------------------------------------------


def test_rolling_baseline_range_frame_skips_gap_days(spark):
    # user 1: 3 events day 0, 1 event day 1, then a 10-day gap, 5 on day 11
    rows, eid = [], 0
    for d, n in [(0, 3), (1, 1), (11, 5)]:
        for k in range(n):
            rows.append((eid, 1, "view", d * 86400 + k))
            eid += 1
    out = anomaly.rolling_volume_baseline(
        _events(spark, rows), window_days=7
    ).collect()
    by_day = {r.day.day: r for r in out}
    assert by_day[1].trailing_avg == 3.0  # day 0 alone in frame
    assert by_day[2].trailing_avg == 2.0  # days 0+1
    # day 11 is > 6 days past both prior active days -> frame is itself only
    assert by_day[12].trailing_avg == 5.0
    assert by_day[12].volume_ratio == 1.0


# -- stratified_sample ------------------------------------------------------


def test_stratified_sample_fixed_k_per_group_and_deterministic(spark):
    from security_data_pipeline_spark.operators.sampling import (
        stratified_sample,
    )

    rows = [(i, "a" if i % 2 else "b") for i in range(200)]
    df = spark.createDataFrame(rows, "id long, grp string")
    s1 = stratified_sample(df, "grp", 10, "id")
    counts = {r.grp: r.n for r in
              s1.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"a": 10, "b": 10}
    # deterministic across plans and unaffected by partitioning
    ids1 = sorted(r.id for r in s1.collect())
    s2 = stratified_sample(df.repartition(7), "grp", 10, "id")
    assert sorted(r.id for r in s2.collect()) == ids1
    # different salt -> different draw
    s3 = stratified_sample(df, "grp", 10, "id", salt="v2")
    assert sorted(r.id for r in s3.collect()) != ids1


def test_stratified_sample_small_group_returns_all(spark):
    from security_data_pipeline_spark.operators.sampling import (
        stratified_sample,
    )

    df = spark.createDataFrame([(1, "x"), (2, "x")], "id long, grp string")
    assert stratified_sample(df, "grp", 10, "id").count() == 2
    with pytest.raises(ValueError):
        stratified_sample(df, "grp", 0, "id")


def test_inter_arrival_degenerate_streams(spark):
    """A stream whose every gap is zero (batch-logged timestamps) reports
    NULL cv instead of dividing by zero, and ranks LAST in
    beacon_candidates so timestamp artifacts can't outrank real beacons;
    min_gaps < 2 is rejected (sample variance needs n-1 > 0)."""
    import datetime as dt

    import pytest

    T0 = dt.datetime(2024, 1, 1)
    rows = [("dup", T0, "login", i) for i in range(12)] + [
        ("beacon", T0 + dt.timedelta(seconds=7 * i), "ping", 100 + i)
        for i in range(12)
    ]
    ev = spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_type string, event_id long"
    )
    stats = {
        r["user_id"]: (r["mean_gap_seconds"], r["gap_cv"])
        for r in anomaly.inter_arrival_stats(
            ev, ts_col="ts", id_col="event_id"
        ).collect()
    }
    assert stats["dup"] == (0.0, None)
    assert stats["beacon"][1] == 0.0  # perfectly regular, cv defined
    top = anomaly.beacon_candidates(
        ev, min_gaps=5, key_cols=("user_id", "event_type")
    ).first()
    assert top["user_id"] == "beacon"
    with pytest.raises(ValueError, match="min_gaps"):
        anomaly.inter_arrival_stats(
            ev, ts_col="ts", id_col="event_id", min_gaps=1
        )


def test_robust_outliers_resist_masking(spark):
    """A burst of extreme values must still be flagged by the median/MAD
    gate even when it inflates the stddev enough to hide itself from the
    mean-based z-score — the masking failure mode the robust form exists
    for."""
    from security_data_pipeline_spark.operators.anomaly import (
        robust_value_outliers,
        value_outliers,
    )

    base = [(i, "click", 100.0 + (i % 7)) for i in range(200)]
    burst = [(1000 + i, "click", 50000.0) for i in range(30)]
    df = spark.createDataFrame(
        base + burst, "event_id long, event_type string, value double"
    )
    robust = robust_value_outliers(df, z_threshold=3.5)
    got = {r["event_id"] for r in robust.collect()}
    assert got == {1000 + i for i in range(30)}
    # the mean/std gate is partially masked: the 30-spike burst drags
    # mean up and stddev wide enough that z(50000) < z_threshold * margin
    masked = value_outliers(df, z_threshold=3.0)
    assert masked.count() <= len(got)


def test_robust_outliers_mad_zero_flags_nothing(spark):
    from security_data_pipeline_spark.operators.anomaly import (
        robust_value_outliers,
    )

    rows = [(i, "x", 5.0) for i in range(10)] + [(99, "x", 9e9)]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    )
    # median 5, MAD 0 -> robust z NULL everywhere, nothing flagged
    assert robust_value_outliers(df).count() == 0


def test_robust_outliers_flag_both_tails(spark):
    """ADVICE r10: the one-sided `robust_z > 3.5` never flagged
    negative-direction anomalies (sudden drops). Iglewicz & Hoaglin's
    modified z-score criterion is |z| > 3.5 — a deep drop must flag
    exactly like an equally-sized spike."""
    from security_data_pipeline_spark.operators.anomaly import (
        robust_value_outliers,
    )

    rows = [(f"e{i}", "t", 100.0 + (i % 7) - 3) for i in range(60)]
    rows.append(("spike", "t", 500.0))
    rows.append(("drop", "t", -300.0))
    df = spark.createDataFrame(rows, "event_id string, event_type string, value double")
    got = {r["event_id"]: r["robust_z"] for r in robust_value_outliers(df).collect()}
    assert "spike" in got and got["spike"] > 3.5
    assert "drop" in got and got["drop"] < -3.5, got
    assert set(got) == {"spike", "drop"}
