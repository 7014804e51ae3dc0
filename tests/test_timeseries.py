"""Resampling/gap-fill and forward-fill: dense grids, zero vs NULL
semantics, LOCF behavior."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from security_data_pipeline_spark.operators import timeseries

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)


def _ts(hours: float) -> dt.datetime:
    return T0 + dt.timedelta(hours=hours)


def test_resample_fills_gaps_with_zero_counts(spark):
    rows = [
        ("a", _ts(0), 1.0),
        ("a", _ts(0.5), 2.0),   # same hour as above
        ("a", _ts(3), 4.0),     # hours 1-2 missing
        ("b", _ts(10), 8.0),    # single-bucket key
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = {
        (r["k"], r["bucket_ts"]): (r["n_events"], r["value_sum"])
        for r in timeseries.resample_counts(
            df, "ts", ["k"], 3600, value_col="v"
        ).collect()
    }
    assert out[("a", _ts(0))] == (2, 3.0)
    assert out[("a", _ts(1))] == (0, None)  # gap: zero count, NULL sum
    assert out[("a", _ts(2))] == (0, None)
    assert out[("a", _ts(3))] == (1, 4.0)
    assert out[("b", _ts(10))] == (1, 8.0)
    assert len(out) == 5  # a: hours 0-3 inclusive; b: one bucket


def test_forward_fill_locf_per_key(spark):
    rows = [
        ("a", 1, None), ("a", 2, 5.0), ("a", 3, None), ("a", 4, None),
        ("a", 5, 7.0), ("b", 1, None),
    ]
    df = spark.createDataFrame(rows, "k string, o long, v double")
    out = {
        (r["k"], r["o"]): r["v_ffill"]
        for r in timeseries.forward_fill(df, ["k"], "o", ["v"]).collect()
    }
    assert out[("a", 1)] is None  # before first observation
    assert out[("a", 2)] == 5.0
    assert out[("a", 3)] == 5.0
    assert out[("a", 4)] == 5.0
    assert out[("a", 5)] == 7.0
    assert out[("b", 1)] is None  # keys independent


def test_resample_grid_size_is_span_not_rows(spark):
    # 10k rows inside ONE hour must produce ONE grid row, not 10k
    rows = [("a", _ts(i / 20000.0), 1.0) for i in range(10000)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    dense = timeseries.resample_counts(df, "ts", ["k"], 3600, value_col="v")
    got = dense.collect()
    assert len(got) == 1
    assert got[0]["n_events"] == 10000


def test_forward_fill_bucketed_equals_plain_on_random_gaps(spark):
    """Property: the bucketed decomposition must reproduce the plain LOCF
    exactly — across bucket boundaries, leading-NULL runs, all-NULL keys,
    and multiple fill columns — on randomized gap patterns."""
    import random

    rng = random.Random(11)
    rows = []
    for k in ("hot", "warm", "allnull"):
        n = 400 if k == "hot" else 60
        for i in range(n):
            v = None if (k == "allnull" or rng.random() < 0.7) else float(i)
            u = None if rng.random() < 0.8 else i * 10
            rows.append((k, float(i), v, u))
    df = spark.createDataFrame(
        rows, "k string, o double, v double, u long"
    ).repartition(8)

    from security_data_pipeline_spark.operators import timeseries

    plain = timeseries.forward_fill(df, ["k"], "o", ["v", "u"])
    # width 7 => the hot key spans ~58 buckets, none aligned to gap edges
    bucketed = timeseries.forward_fill_bucketed(
        df, ["k"], "o", ["v", "u"], bucket_width=7.0
    )

    def snap(d):
        return sorted(
            (r["k"], r["o"], r["v_ffill"], r["u_ffill"]) for r in d.collect()
        )

    assert snap(bucketed) == snap(plain)
    # sanity: the plain fill actually carried values (not vacuous)
    filled = [t for t in snap(plain) if t[2] is not None]
    assert len(filled) > 100


def test_forward_fill_bucketed_carry_frame_is_compact(spark):
    """The only per-key sequential pass runs over ONE ROW PER ACTIVE
    BUCKET — the property that breaks the hot key's single-task sort."""
    from security_data_pipeline_spark.operators import timeseries

    rows = [("hot", float(i), float(i) if i % 5 == 0 else None) for i in range(10_000)]
    df = spark.createDataFrame(rows, "k string, o double, v double")
    out = timeseries.forward_fill_bucketed(
        df, ["k"], "o", ["v"], bucket_width=100.0
    )
    assert out.count() == 10_000
    # the summaries frame the carry window sorts is bounded by bucket count
    b = df.groupBy("k", (F.floor(F.col("o") / 100.0)).alias("_fb")).count()
    assert b.count() == 100  # 10k rows -> 100 carry rows for the hot key


def test_interpolate_linear_fills_interior_gaps_only(spark):
    from security_data_pipeline_spark.operators import timeseries

    rows = [
        # key a: edges NULL, interior gap linearly filled
        ("a", 0, None),
        ("a", 1, 10.0),
        ("a", 2, None),
        ("a", 3, None),
        ("a", 4, 40.0),
        ("a", 5, None),
        # key b: isolated from a; uneven spacing
        ("b", 0, 2.0),
        ("b", 4, 10.0),
        ("b", 2, None),
    ]
    df = spark.createDataFrame(rows, "k string, o long, v double")
    out = {
        (r["k"], r["o"]): r["v_interp"]
        for r in timeseries.interpolate_linear(df, ["k"], "o", "v").collect()
    }
    assert out[("a", 0)] is None  # before first observation
    assert out[("a", 1)] == 10.0  # observed rows pass through exactly
    assert out[("a", 2)] == 20.0
    assert out[("a", 3)] == 30.0
    assert out[("a", 4)] == 40.0
    assert out[("a", 5)] is None  # after last observation
    assert out[("b", 2)] == 6.0  # midpoint of (0, 2.0) .. (4, 10.0)


def test_interpolate_linear_all_null_key_stays_null(spark):
    from security_data_pipeline_spark.operators import timeseries

    df = spark.createDataFrame(
        [("k", 0, None), ("k", 1, None)], "k string, o long, v double"
    )
    vals = [
        r["v_interp"]
        for r in timeseries.interpolate_linear(df, ["k"], "o", "v").collect()
    ]
    assert vals == [None, None]


def test_forward_fill_bounded_respects_max_gap(spark):
    from security_data_pipeline_spark.operators import timeseries

    rows = [
        ("k", 0, 5.0),
        ("k", 1, None),   # gap 1 <= 2: carried
        ("k", 2, None),   # gap 2 <= 2: carried
        ("k", 3, None),   # gap 3 > 2: outage, stays NULL
        ("k", 4, 9.0),
        ("k", 5, None),   # fresh observation resets the clock
        ("x", 0, None),   # before first observation: NULL
    ]
    df = spark.createDataFrame(rows, "k string, o long, v double")
    out = {
        (r["k"], r["o"]): r["v_ffill"]
        for r in timeseries.forward_fill_bounded(
            df, ["k"], "o", "v", max_gap=2.0
        ).collect()
    }
    assert out[("k", 0)] == 5.0
    assert out[("k", 1)] == 5.0
    assert out[("k", 2)] == 5.0
    assert out[("k", 3)] is None
    assert out[("k", 4)] == 9.0
    assert out[("k", 5)] == 9.0
    assert out[("x", 0)] is None


def test_retention_cohorts_bruteforce(spark):
    """retention_cohorts vs hand-computed triangle: staggered first-seen
    days, gaps, duplicate same-day events, and NULL users/timestamps."""
    import datetime as dt

    from security_data_pipeline_spark.operators.timeseries import (
        retention_cohorts,
    )

    def ts(day, hour=3):
        return dt.datetime(2024, 1, 1 + day, hour)

    rows = [
        # u1: first day 0, active 0,1,3 (twice on day 1)
        ("u1", ts(0)), ("u1", ts(1)), ("u1", ts(1, 9)), ("u1", ts(3)),
        # u2: first day 0, active 0 only
        ("u2", ts(0)),
        # u3: first day 1, active 1,3
        ("u3", ts(1)), ("u3", ts(3)),
        # noise rows excluded
        (None, ts(0)), ("u4", None),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    got = {
        (r["cohort_period"], r["period_offset"]): (
            r["n_active"],
            r["cohort_size"],
            r["retention"],
        )
        for r in retention_cohorts(df, "user_id", "ts", 1).collect()
    }
    day0 = 19723  # 2024-01-01 epoch-day index
    want = {
        (day0, 0): (2, 2, 1.0),      # u1, u2
        (day0, 1): (1, 2, 0.5),      # u1
        (day0, 3): (1, 2, 0.5),      # u1
        (day0 + 1, 0): (1, 1, 1.0),  # u3
        (day0 + 1, 2): (1, 1, 1.0),  # u3 on day 3 = offset 2
    }
    assert got == want
