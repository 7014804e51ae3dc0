"""Unit tests for cleaning operators (SURVEY.md §2.2/§2.3/§2.9)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from security_data_pipeline_spark.operators import cleaning

COLS = "event_id timestamp user_id event_type status severity source_ip".split()


def _raw(spark, rows):
    return spark.createDataFrame(
        [Row(**dict(zip(COLS, r))) for r in rows],
        schema="event_id long, timestamp string, user_id string, event_type string,"
        " status string, severity string, source_ip string",
    ).withColumn("_ordinal", F.monotonically_increasing_id())


def test_validate_required_columns_raises(spark):
    df = spark.createDataFrame([Row(event_id=1)])
    with pytest.raises(ValueError, match="Missing required columns"):
        cleaning.validate_required_columns(df)


def test_validate_required_columns_passes(spark):
    df = _raw(spark, [(1, "2025-01-01 00:00:00", "a", "login", "ok", "high", "1.1.1.1")])
    assert cleaning.validate_required_columns(df) is df


def test_handle_missing_drops_null_id_fills_and_trims(spark):
    df = _raw(
        spark,
        [
            (None, "2025-01-01 00:00:00", "a", "login", "ok", "high", "1.1.1.1"),
            (2, " 2025-01-01 00:00:00 ", None, None, None, None, None),
            (3, "2025-01-01 00:00:00", "  bob ", "login", " ok ", "high ", " 1.1.1.1 "),
        ],
    )
    out = cleaning.handle_missing_values(df).orderBy("event_id").collect()
    assert [r.event_id for r in out] == [2, 3]
    r2, r3 = out
    assert (r2.user_id, r2.event_type, r2.status, r2.severity) == (
        "unknown", "unknown", "unknown", "unknown",
    )
    assert r2.source_ip == "0.0.0.0"
    # fill runs BEFORE trim: raw timestamp string is trimmed too
    assert r2.timestamp == "2025-01-01 00:00:00"
    assert (r3.user_id, r3.status, r3.severity, r3.source_ip) == (
        "bob", "ok", "high", "1.1.1.1",
    )


def test_whitespace_only_field_survives_fill_then_trims_to_empty(spark):
    df = _raw(spark, [(1, "2025-01-01 00:00:00", "a", "login", " ", " ", "1.1.1.1")])
    r = cleaning.handle_missing_values(df).collect()[0]
    assert r.status == "" and r.severity == ""


def test_remove_duplicates_keep_last_payload(spark):
    # same event_id, DIFFERENT payloads → the later row must survive
    # (SURVEY.md §4.3 trap 2 — golden data never exercises this)
    df = _raw(
        spark,
        [
            (1, "2025-01-01 00:00:00", "a", "login", "ok", "high", "1.1.1.1"),
            (1, "2025-01-01 00:00:00", "a", "login", "failed", "low", "2.2.2.2"),
            (2, "2025-01-01 00:01:00", "b", "login", "ok", "high", "1.1.1.1"),
            (2, "2025-01-01 00:01:00", "b", "login", "ok", "high", "1.1.1.1"),
        ],
    )
    out = cleaning.remove_duplicates(df).orderBy("event_id").collect()
    assert len(out) == 2
    assert out[0].status == "failed" and out[0].source_ip == "2.2.2.2"
    assert out[1].event_id == 2


def test_remove_duplicates_without_ordinal_falls_back(spark):
    df = _raw(
        spark,
        [
            (1, "t", "a", "login", "ok", "high", "1.1.1.1"),
            (1, "t", "a", "login", "ok", "high", "1.1.1.1"),
        ],
    ).drop("_ordinal")
    assert cleaning.remove_duplicates(df).count() == 1


def test_validate_schema_reports_issues(spark):
    from security_data_pipeline_spark.operators import normalization

    df = _raw(
        spark,
        [(1, "2025-01-01 00:00:00", "a", "login", "partial-success", "ultra", "1.1.1.1")],
    )
    df = normalization.standardize_timestamps(df)
    df = normalization.normalize_categoricals(df)
    issues = cleaning.validate_schema(df)
    assert issues["invalid_status_values"] == ["partial_success"]
    assert issues["invalid_severity_values"] == ["ultra"]


def test_validate_schema_clean_data_no_issues(spark):
    from security_data_pipeline_spark.operators import normalization

    df = _raw(spark, [(1, "2025-01-01 00:00:00", "a", "login", "ok", "high", "1.1.1.1")])
    df = normalization.standardize_timestamps(df)
    df = normalization.normalize_categoricals(df)
    assert cleaning.validate_schema(df) == {}
