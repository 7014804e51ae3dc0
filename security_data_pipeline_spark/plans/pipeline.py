"""Batch security-event pipeline: CLI + orchestration + summary report.

Parity target: ``/root/reference/src/pipeline.py`` (run_pipeline :18-69,
parse_args :72-108). Same stage order — it is semantic (SURVEY.md §3.1): the
optional severity filter runs after normalization (synonyms canonical) and
before features (dropped rows don't count toward sessions/baselines).

The whole chain is ONE lazy DataFrame DAG; nothing executes until the sink
action (and the summary's aggregations, which are separate small jobs).
"""

from __future__ import annotations

import argparse
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from security_data_pipeline_spark.operators import cleaning, features, normalization
from security_data_pipeline_spark.sources.raw_events import (
    ORDINAL_COL,
    read_raw_events_csv,
)
from security_data_pipeline_spark.sources.sinks import write_csv

OUTPUT_COLUMNS: tuple[str, ...] = (
    "event_id",
    "timestamp",
    "user_id",
    "event_type",
    "status",
    "severity",
    "source_ip",
    "severity_score",
    "user_event_count_total",
    "user_daily_avg_events",
    "session_id",
    "session_event_count",
    "session_duration_seconds",
)


def transform(
    df: DataFrame,
    session_gap_minutes: float = 30,
    drop_unknown_severity: bool = False,
    first_format_only: bool = False,
) -> DataFrame:
    """The pure transform chain (no I/O): clean → normalize → filter → features.

    ``first_format_only`` replicates the reference's pandas-2.x single-format
    timestamp parse (golden parity); default multi-format parse keeps all
    well-formed rows (documented improvement).
    """
    cleaning.validate_required_columns(df)
    df = cleaning.handle_missing_values(df)
    df = cleaning.remove_duplicates(df)
    df = normalization.standardize_timestamps(
        df, first_format_only=first_format_only
    )
    df = normalization.normalize_categoricals(df)
    if drop_unknown_severity:
        df = df.filter(F.col("severity") != "unknown")
    df = features.run_all(df, gap_minutes=session_gap_minutes)
    if ORDINAL_COL in df.columns:
        df = df.drop(ORDINAL_COL)
    return df.select(*[c for c in OUTPUT_COLUMNS if c in df.columns])


def summarize(df: DataFrame) -> dict[str, Any]:
    """Summary report (pipeline.py:53-67): row count, time range, distinct
    counts, per-column nulls, top-5 value counts. Column-wise aggregations in
    two jobs; top-k via sort+limit (TakeOrdered — no full sort)."""
    aggs = [
        F.count(F.lit(1)).alias("_rows"),
        F.min("timestamp").alias("_ts_min"),
        F.max("timestamp").alias("_ts_max"),
        F.countDistinct("user_id").alias("_users"),
        F.countDistinct("event_type").alias("_event_types"),
    ]
    for c in df.columns:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{c}"))
    row = df.agg(*aggs).collect()[0].asDict()

    null_counts = sorted(
        ((c, row[f"_null_{c}"]) for c in df.columns),
        key=lambda kv: (-kv[1], kv[0]),
    )[:8]
    top_values: dict[str, list[tuple[Any, int]]] = {}
    for c in ("event_type", "status", "severity"):
        if c in df.columns:
            top = (
                df.groupBy(c)
                .count()
                .orderBy(F.desc("count"), F.col(c))
                .limit(5)
                .collect()
            )
            top_values[c] = [(r[c], r["count"]) for r in top]
    return {
        "rows": row["_rows"],
        "columns": len(df.columns),
        "time_range": (row["_ts_min"], row["_ts_max"]),
        "distinct_users": row["_users"],
        "distinct_event_types": row["_event_types"],
        "null_counts_top8": null_counts,
        "top5_values": top_values,
    }


def run_pipeline(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    session_gap_minutes: float = 30,
    summary: bool = False,
    validate_mode: str = "warn",
    drop_unknown_severity: bool = False,
    single_file: bool = False,
) -> DataFrame:
    """End-to-end: CSV scan → transform → validate → CSV sink → summary."""
    # V1 on the *file's* header (with an enforced schema the DataFrame always
    # carries all 7 columns, so the check must look at the raw header to give
    # the reference's clean ValueError — cleaning.py:29-40).
    header = spark.read.option("header", True).csv(input_path)
    cleaning.validate_required_columns(header)
    raw = read_raw_events_csv(spark, input_path)
    out = transform(
        raw,
        session_gap_minutes=session_gap_minutes,
        drop_unknown_severity=drop_unknown_severity,
    )

    if validate_mode != "off":
        issues = cleaning.validate_schema(out)
        if issues:
            if validate_mode == "strict":
                raise ValueError(f"Schema validation failed: {issues}")
            print(f"[validate] issues: {issues}")

    write_csv(out, output_path, single_file=single_file)

    if summary:
        report = summarize(out)
        for key, value in report.items():
            print(f"[summary] {key}: {value}")
    return out


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="Security event pipeline (PySpark)")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--session-gap-minutes", type=float, default=30)
    p.add_argument("--summary", action="store_true")
    p.add_argument(
        "--validate", choices=["off", "warn", "strict"], default="warn"
    )
    p.add_argument("--drop-unknown-severity", action="store_true")
    p.add_argument("--single-file", action="store_true")
    return p.parse_args(argv)


def main(argv: list[str] | None = None) -> None:
    from security_data_pipeline_spark.session import get_spark

    args = parse_args(argv)
    spark = get_spark(app_name="security-pipeline-batch")
    run_pipeline(
        spark,
        input_path=args.input,
        output_path=args.output,
        session_gap_minutes=args.session_gap_minutes,
        summary=args.summary,
        validate_mode=args.validate,
        drop_unknown_severity=args.drop_unknown_severity,
        single_file=args.single_file,
    )


if __name__ == "__main__":
    main()
