"""Unit tests for normalization operators (SURVEY.md §2.4, §4.3 traps)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from security_data_pipeline_spark.operators import normalization


def _df(spark, **cols):
    n = len(next(iter(cols.values())))
    rows = [Row(**{k: v[i] for k, v in cols.items()}) for i in range(n)]
    schema = ", ".join(f"{k} string" for k in cols)
    return spark.createDataFrame(rows, schema=schema)


def test_multi_format_timestamp_parse(spark):
    raw = [
        "2025-12-17 08:00:00",
        "12/17/2025 08:05:00",
        "2025-12-17T08:10:00Z",
        "2025/12/17 08:15:00",
        "Dec 17 2025 08:20:00",
        "17-12-2025 08:25:00",
    ]
    df = _df(spark, timestamp=raw)
    out = normalization.standardize_timestamps(df).orderBy("timestamp").collect()
    assert [r.timestamp for r in out] == [
        datetime(2025, 12, 17, 8, 0),
        datetime(2025, 12, 17, 8, 5),
        datetime(2025, 12, 17, 8, 10),
        datetime(2025, 12, 17, 8, 15),
        datetime(2025, 12, 17, 8, 20),
        datetime(2025, 12, 17, 8, 25),
    ]


def test_unparseable_timestamp_dropped(spark):
    df = _df(spark, timestamp=["invalid", "2025-12-17 08:00:00", None])
    assert normalization.standardize_timestamps(df).count() == 1


def test_unparseable_kept_as_null_when_not_dropping(spark):
    df = _df(spark, timestamp=["invalid", "2025-12-17 08:00:00"])
    out = normalization.standardize_timestamps(df, drop_invalid=False)
    assert out.filter(F.col("timestamp").isNull()).count() == 1


def test_first_format_only_mode_drops_other_formats(spark):
    # pandas-2.x parity: format locked from first value in input order
    df = _df(
        spark,
        timestamp=["2025-12-17 08:00:00", "12/17/2025 08:05:00", "2025-12-17 09:00:00"],
    ).withColumn("_ordinal", F.monotonically_increasing_id())
    out = normalization.standardize_timestamps(df, first_format_only=True)
    assert out.count() == 2


def test_event_type_canonicalization(spark):
    df = _df(
        spark,
        event_type=["Login", "log-in", "LOG IN", "log_out", "FILE ACCESS",
                    "File-Delete", "password   reset", None],
    )
    out = [r.event_type for r in normalization.normalize_categoricals(df).collect()]
    assert out == ["login", "log_in", "log_in", "log_out", "file_access",
                   "file_delete", "password_reset", "unknown"]


def test_status_map_and_passthrough(spark):
    df = _df(
        spark,
        status=["ok", "Passed", "allowed", "blocked", "denied ", "unauthorized",
                "succeeded", "partial-success", "", None],
    )
    out = [r.status for r in normalization.normalize_categoricals(df).collect()]
    assert out == ["success", "success", "success", "failure", "failure",
                   "failure", "success", "partial_success", "unknown", "unknown"]


def test_severity_map_and_passthrough(spark):
    df = _df(
        spark,
        severity=["CRIT", "severe", "warn", "notice", "informational", "ultra",
                  " ", None],
    )
    out = [r.severity for r in normalization.normalize_categoricals(df).collect()]
    assert out == ["critical", "high", "medium", "low", "info", "ultra",
                   "unknown", "unknown"]


def test_user_id_empty_to_unknown_null_stays_null(spark):
    df = _df(spark, user_id=["  Bob ", "", None])
    out = [r.user_id for r in normalization.normalize_categoricals(df).collect()]
    assert out == ["bob", "unknown", None]


def test_source_ip_trim_no_validation(spark):
    df = _df(spark, source_ip=[" 10.0.0.3 ", "fe80::1", "invalid_ip", ""])
    out = [r.source_ip for r in normalization.normalize_categoricals(df).collect()]
    assert out == ["10.0.0.3", "fe80::1", "invalid_ip", "0.0.0.0"]


def test_time_bucket_arbitrary_widths(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from security_data_pipeline_spark.functions.timeparse import time_bucket

    rows = [
        (dt.datetime(2024, 1, 1, 0, 7, 30),),
        (dt.datetime(2024, 1, 1, 0, 15, 0),),
        (dt.datetime(2024, 1, 1, 11, 59, 59),),
    ]
    df = spark.createDataFrame(rows, "ts timestamp")
    b15 = [r["b"] for r in df.select(time_bucket("ts", 900).alias("b")).collect()]
    assert b15 == [
        dt.datetime(2024, 1, 1, 0, 0),
        dt.datetime(2024, 1, 1, 0, 15),
        dt.datetime(2024, 1, 1, 11, 45),
    ]
    # a 6-hour width date_trunc cannot express
    b6h = [
        r["b"] for r in df.select(time_bucket("ts", 6 * 3600).alias("b")).collect()
    ]
    assert b6h == [
        dt.datetime(2024, 1, 1, 0, 0),
        dt.datetime(2024, 1, 1, 0, 0),
        dt.datetime(2024, 1, 1, 6, 0),
    ]
    # pre-1970 instants floor toward -inf (pmod keeps the math in the long
    # domain — no double rounding at any magnitude)
    neg = spark.createDataFrame(
        [(dt.datetime(1969, 12, 31, 23, 50, 1),)], "ts timestamp"
    )
    bneg = [r["b"] for r in neg.select(time_bucket("ts", 900).alias("b")).collect()]
    assert bneg == [dt.datetime(1969, 12, 31, 23, 45)]
    try:
        df.select(time_bucket("ts", 0))
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
