"""Cleaning operators: required-column validation, missing values, dedup.

Parity targets: ``/root/reference/src/cleaning.py`` (V1 validate columns
:29-40, missing values :58-88, dedup :43-55, schema validation :91-132).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from security_data_pipeline_spark.sources.raw_events import ORDINAL_COL

REQUIRED_COLUMNS: tuple[str, ...] = (
    "event_id",
    "timestamp",
    "user_id",
    "event_type",
    "status",
    "severity",
    "source_ip",
)

TEXT_COLUMNS: tuple[str, ...] = (
    "user_id",
    "event_type",
    "status",
    "severity",
    "source_ip",
)

FILL_VALUES: dict[str, str] = {
    "user_id": "unknown",
    "event_type": "unknown",
    "status": "unknown",
    "severity": "unknown",
    "source_ip": "0.0.0.0",
}

ALLOWED_STATUS: frozenset[str] = frozenset({"success", "failure", "unknown"})
ALLOWED_SEVERITY: frozenset[str] = frozenset(
    {"info", "low", "medium", "high", "critical", "unknown"}
)


def validate_required_columns(
    df: DataFrame, required_columns: Iterable[str] | None = None
) -> DataFrame:
    """Raise ValueError if any required column is missing (metadata-only —
    no job runs; parity with cleaning.py:29-40)."""
    required = (
        list(required_columns) if required_columns is not None else list(REQUIRED_COLUMNS)
    )
    missing = [c for c in required if c not in df.columns]
    if missing:
        raise ValueError(f"Missing required columns: {missing}")
    return df


def handle_missing_values(df: DataFrame) -> DataFrame:
    """Drop null-id rows, cast text cols, fill placeholders, trim all text.

    Stage order is semantic (cleaning.py:58-88): fill runs BEFORE trim, so a
    whitespace-only field survives fill and trims to "" — normalization later
    maps "" → unknown. The raw (unparsed) timestamp string is trimmed too.
    """
    df = df.filter(F.col("event_id").isNotNull())

    for c in TEXT_COLUMNS:
        if c in df.columns:
            df = df.withColumn(c, F.col(c).cast("string"))

    fills = {c: v for c, v in FILL_VALUES.items() if c in df.columns}
    if fills:
        df = df.fillna(fills)

    for field in df.schema.fields:
        if isinstance(field.dataType, T.StringType):
            df = df.withColumn(field.name, F.trim(F.col(field.name)))
    return df


def remove_duplicates(df: DataFrame, ordinal_col: str = ORDINAL_COL) -> DataFrame:
    """Full-row dedup then by-``event_id`` dedup, both keep-LAST in input order.

    Spark DataFrames have no inherent row order, so "last" is keyed on the
    explicit ``ordinal_col`` captured at ingest (SURVEY.md §7.3 hard part 2);
    without it we fall back to ``dropDuplicates`` (arbitrary survivor —
    identical to the reference only when duplicate payloads are identical).
    """
    if ordinal_col not in df.columns:
        # arbitrary-survivor fallback; D2 subsumes D1 (see below)
        return df.dropDuplicates(["event_id"])

    # D1 (full-row keep-last) composed with D2 (by-id keep-last) reduces to
    # D2 alone: identical rows share an event_id, and both formulations keep
    # the max-ordinal survivor per id — so one shuffle on event_id replaces
    # the reference's two passes (and the wide all-columns shuffle D1 needs).
    w = Window.partitionBy("event_id").orderBy(F.col(ordinal_col).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def validate_schema(df: DataFrame) -> dict:
    """Post-normalization validation → issues dict (cleaning.py:91-132).

    Metadata checks read ``df.schema`` driver-side; data checks (NaT count,
    invalid value sets) run as ONE aggregation job.
    """
    issues: dict = {}
    try:
        validate_required_columns(df)
    except ValueError as e:
        issues["missing_columns"] = str(e)
        return issues

    ts_type = df.schema["timestamp"].dataType
    is_ts = isinstance(ts_type, (T.TimestampType, T.TimestampNTZType, T.DateType))
    if not is_ts:
        issues["timestamp_dtype"] = ts_type.simpleString()

    aggs = []
    if is_ts:
        aggs.append(
            F.sum(F.col("timestamp").isNull().cast("long")).alias("_nat_count")
        )
    if "status" in df.columns:
        aggs.append(
            F.sort_array(
                F.collect_set(
                    F.when(
                        ~F.col("status").isin(*ALLOWED_STATUS), F.col("status")
                    )
                )
            ).alias("_bad_status")
        )
    if "severity" in df.columns:
        aggs.append(
            F.sort_array(
                F.collect_set(
                    F.when(
                        ~F.col("severity").isin(*ALLOWED_SEVERITY),
                        F.col("severity"),
                    )
                )
            ).alias("_bad_severity")
        )
    if not aggs:
        return issues

    row = df.agg(*aggs).collect()[0].asDict()
    if row.get("_nat_count"):
        issues["timestamp_NaT_count"] = int(row["_nat_count"])
    if row.get("_bad_status"):
        issues["invalid_status_values"] = list(row["_bad_status"])
    if row.get("_bad_severity"):
        issues["invalid_severity_values"] = list(row["_bad_severity"])
    return issues
