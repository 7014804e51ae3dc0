"""Golden end-to-end parity vs the reference's committed output.

The reference's only correctness artifact is ``data/processed_events.csv``,
which reproduces only under ``--drop-unknown-severity --session-gap-minutes
≥45`` AND pandas-2.x first-format-only timestamp parsing (SURVEY.md §5.1).
Order-insensitive row-set comparison; event_id cast (reference degrades to
float, we keep long — SURVEY.md §1.2).
"""

from __future__ import annotations

import pandas as pd
import pytest

from security_data_pipeline_spark.plans.pipeline import transform
from security_data_pipeline_spark.sources.raw_events import read_raw_events_csv

RAW = "/root/reference/data/raw_events.csv"
GOLDEN = "/root/reference/data/processed_events.csv"

FLOAT_COLS = ("severity_score", "user_daily_avg_events", "session_duration_seconds")


@pytest.fixture(scope="module")
def golden() -> pd.DataFrame:
    exp = pd.read_csv(GOLDEN)
    exp["timestamp"] = pd.to_datetime(exp["timestamp"], utc=True).dt.tz_localize(None)
    exp["event_id"] = exp["event_id"].astype("int64")
    return exp.sort_values(["user_id", "timestamp", "event_id"]).reset_index(drop=True)


def test_golden_parity(spark, golden):
    raw = read_raw_events_csv(spark, RAW)
    out = transform(
        raw,
        session_gap_minutes=60,
        drop_unknown_severity=True,
        first_format_only=True,
    )
    got = (
        out.toPandas()
        .sort_values(["user_id", "timestamp", "event_id"])
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(golden.columns)
    assert len(got) == len(golden) == 27
    for c in golden.columns:
        g, e = got[c], golden[c]
        if c in FLOAT_COLS:
            assert ((g.isna() == e.isna()).all()), c
            assert ((g.fillna(0) - e.fillna(0)).abs() < 1e-9).all(), c
        else:
            assert (g.astype(str) == e.astype(str)).all(), c


def test_multiformat_mode_keeps_more_rows(spark):
    # default (improved) parse keeps the 5 non-ISO-format rows the reference
    # silently drops
    raw = read_raw_events_csv(spark, RAW)
    strict = transform(raw, 60, True, first_format_only=True).count()
    multi = transform(raw, 60, True, first_format_only=False).count()
    assert strict == 27
    assert multi == 32
