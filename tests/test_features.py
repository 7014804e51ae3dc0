"""Unit tests for feature operators (SURVEY.md §2.5/§2.6/§2.7)."""

from __future__ import annotations

from pyspark.sql import Row

from security_data_pipeline_spark.operators import features


def _events(spark, rows):
    return spark.createDataFrame(
        [Row(event_id=i, user_id=u, timestamp=t, severity=s)
         for i, (u, t, s) in enumerate(rows)],
        schema="event_id long, user_id string, timestamp string, severity string",
    ).selectExpr("event_id", "user_id", "cast(timestamp as timestamp) timestamp",
                 "severity")


def test_severity_score_mapping_and_null(spark):
    df = _events(
        spark,
        [("a", "2025-01-01 00:00:00", s)
         for s in ["info", "low", "medium", "high", "critical", "unknown", "ultra"]],
    )
    out = features.add_severity_score(df).orderBy("event_id").collect()
    assert [r.severity_score for r in out] == [0.0, 1.0, 2.0, 3.0, 4.0, None, None]


def test_user_event_frequency(spark):
    df = _events(
        spark,
        [("a", "2025-01-01 00:00:00", "info"),
         ("a", "2025-01-01 00:05:00", "info"),
         ("b", "2025-01-01 00:00:00", "info")],
    )
    out = features.add_user_event_frequency(df).orderBy("event_id").collect()
    assert [r.user_event_count_total for r in out] == [2, 2, 1]


def test_user_daily_avg_utc_day_floor(spark):
    # 3 events on day 1, 1 event on day 2 → avg 2.0; midnight straddle counts
    # toward the UTC day of the event
    df = _events(
        spark,
        [("a", "2025-01-01 23:50:00", "info"),
         ("a", "2025-01-01 23:55:00", "info"),
         ("a", "2025-01-01 23:59:59", "info"),
         ("a", "2025-01-02 00:00:01", "info")],
    )
    out = features.add_user_activity_baseline(df).collect()
    assert all(abs(r.user_daily_avg_events - 2.0) < 1e-12 for r in out)


def test_sessionization_gap_boundaries(spark):
    # gaps: 29m59s (same), exactly 30m (same — strict >), 30m01s (new)
    df = _events(
        spark,
        [("a", "2025-01-01 00:00:00", "info"),
         ("a", "2025-01-01 00:29:59", "info"),
         ("a", "2025-01-01 00:59:59", "info"),
         ("a", "2025-01-01 01:30:00", "info"),
         ("b", "2025-01-01 00:00:00", "info")],
    )
    out = features.add_session_features(df, gap_minutes=30).orderBy("event_id").collect()
    assert [r.session_id for r in out] == [1, 1, 1, 2, 1]
    by_id = {r.event_id: r for r in out}
    assert by_id[0].session_event_count == 3
    assert abs(by_id[0].session_duration_seconds - 3599.0) < 1e-9
    assert by_id[3].session_event_count == 1
    assert by_id[3].session_duration_seconds == 0.0
    assert by_id[4].session_id == 1  # ids restart per user


def test_session_ids_start_at_one_per_user(spark):
    df = _events(
        spark,
        [("a", "2025-01-01 00:00:00", "info"),
         ("a", "2025-01-01 05:00:00", "info"),
         ("a", "2025-01-01 10:00:00", "info")],
    )
    out = features.add_session_features(df, gap_minutes=30).orderBy("event_id").collect()
    assert [r.session_id for r in out] == [1, 2, 3]


def test_run_all_produces_reference_columns(spark):
    df = _events(spark, [("a", "2025-01-01 00:00:00", "high")])
    out = features.run_all(df)
    for col in ("severity_score", "user_event_count_total", "user_daily_avg_events",
                "session_id", "session_event_count", "session_duration_seconds"):
        assert col in out.columns
