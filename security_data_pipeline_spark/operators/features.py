"""Feature engineering: severity score, per-user frequency/baseline, sessions.

Parity targets: ``/root/reference/src/feature_engineering.py`` (severity
score :19-32, frequency :35-39, baseline :42-58, sessions :61-95).

Spark-first choices (SURVEY.md §4.2):
- A1 per-user totals and A3 session stats are WINDOW functions over the same
  ``user_id`` partitioning the sessionization already shuffles on — no joins,
  no extra shuffle, and Catalyst reuses the exchange.
- The per-user daily baseline keeps the aggregate-then-join shape (two-level
  agg is not window-expressible without a distinct) but broadcasts the tiny
  per-user aggregate.
- First-event gap is NULL (``lag`` semantics), playing the role of the
  reference's ``np.inf`` sentinel (feature_engineering.py:76).

Skew note (100 TB): a single hyperactive user serializes into one task in the
ordered session window. The unordered stat windows tolerate salting, but the
running-sum session id cannot be salted without breaking cumsum semantics —
monitor, and pre-bucket the table by user_id so at least the sort is local.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from security_data_pipeline_spark.functions.maps import SEVERITY_SCORE


def add_severity_score(df: DataFrame, col: str = "severity") -> DataFrame:
    """Ordinal severity encoding {info:0..critical:4}; unmapped → NULL
    (feature_engineering.py:19-32)."""
    if col not in df.columns:
        return df
    pairs: list[Column] = []
    for key, value in SEVERITY_SCORE.items():
        pairs.append(F.lit(key))
        pairs.append(F.lit(value))
    score_map = F.create_map(*pairs)
    return df.withColumn(
        "severity_score", F.try_element_at(score_map, F.col(col)).cast("double")
    )


def add_user_event_frequency(
    df: DataFrame, user_col: str = "user_id", id_col: str = "event_id"
) -> DataFrame:
    """Per-user total event count broadcast to every row — unordered window,
    map-side partial aggregation, no join (feature_engineering.py:35-39)."""
    if user_col not in df.columns:
        return df
    w = Window.partitionBy(user_col)
    return df.withColumn(
        "user_event_count_total", F.count(id_col).over(w)
    )


def _epoch_seconds(col: Column) -> Column:
    # microsecond-precision epoch seconds as double (reference uses
    # .dt.total_seconds() which is float seconds)
    return F.unix_micros(col.cast("timestamp")) / F.lit(1_000_000.0)


def add_user_activity_baseline(
    df: DataFrame, user_col: str = "user_id", ts_col: str = "timestamp"
) -> DataFrame:
    """Average events per UTC day per user (feature_engineering.py:42-58).
    Day flooring is UTC — semantic (SURVEY.md §4.3 trap 4).

    mean-of-daily-counts ≡ total_events / distinct_days exactly (the day
    counts sum to the total), so instead of the reference's two-level
    aggregate + join-back this is pure windows over the ONE ``user_id``
    exchange the feature stage already shuffles on: ``dense_rank`` over
    day order gives each row its day's ordinal, its per-user max is the
    distinct-day count, and one double division yields the identical value
    (same operands as sum-of-counts / n-days on any engine).
    """
    if ts_col not in df.columns or user_col not in df.columns:
        return df
    if not isinstance(
        df.schema[ts_col].dataType, (T.TimestampType, T.TimestampNTZType, T.DateType)
    ):
        return df
    w_u = Window.partitionBy(user_col)
    w_day = Window.partitionBy(user_col).orderBy(
        F.date_trunc("DAY", F.col(ts_col))
    )
    df = df.withColumn("_day_rank", F.dense_rank().over(w_day))
    return df.withColumn(
        "user_daily_avg_events",
        F.count(F.lit(1)).over(w_u).cast("double")
        / F.max("_day_rank").over(w_u).cast("double"),
    ).drop("_day_rank")


def add_session_features(
    df: DataFrame,
    gap_minutes: float = 30,
    user_col: str = "user_id",
    ts_col: str = "timestamp",
    id_col: str = "event_id",
    tiebreak_cols: tuple[str, ...] = (),
    include_stats: bool = True,
) -> DataFrame:
    """Gap-based sessionization + per-session stats, all in two window passes
    over ONE ``user_id`` exchange (feature_engineering.py:61-95).

    - new session when strict ``gap > gap_minutes*60`` seconds OR first event
      (NULL lag gap — replaces the np.inf sentinel)
    - ``session_id`` = running sum of boundary flags, starts at 1 per user
    - stats via unordered window over (user, session): count / min / max /
      duration — no join-back (W5 note in SURVEY.md §2.6)
    """
    if ts_col not in df.columns or user_col not in df.columns:
        return df
    gap_seconds = float(gap_minutes) * 60.0

    w_ord = Window.partitionBy(user_col).orderBy(
        F.col(ts_col), *[F.col(c) for c in tiebreak_cols]
    )
    ts_sec = _epoch_seconds(F.col(ts_col))
    gap = ts_sec - F.lag(ts_sec).over(w_ord)
    boundary = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    df = df.withColumn(
        "session_id",
        F.sum(boundary).over(
            w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )

    if not include_stats:
        return df

    w_sess = Window.partitionBy(user_col, "session_id")
    df = df.withColumn(
        "session_event_count", F.count(id_col).over(w_sess)
    ).withColumn(
        "session_duration_seconds",
        _epoch_seconds(F.max(ts_col).over(w_sess))
        - _epoch_seconds(F.min(ts_col).over(w_sess)),
    )
    return df


def add_session_features_bucketed(
    df: DataFrame,
    gap_minutes: float = 30,
    bucket_hours: float = 24.0,
    user_col: str = "user_id",
    ts_col: str = "timestamp",
    id_col: str = "event_id",
    tiebreak_cols: tuple[str, ...] = (),
    include_stats: bool = True,
) -> DataFrame:
    """Sessionization identical to :func:`add_session_features`, but
    skew-resistant: the ordered window runs per (user, time-bucket), then a
    tiny per-user chain pass stitches sessions across bucket boundaries.

    The plain form serializes each user into ONE task (SURVEY.md §7.3(5):
    a running sum can't be salted); here a hyperactive user's timeline
    splits across ``bucket_hours`` buckets that sort/scan in parallel, and
    the only per-user sequential work is one row per ACTIVE bucket:

    1. local pass — boundary flags + running session ids within
       (user, bucket), exactly the plain algorithm;
    2. bucket summary — (#local sessions, first/last event ts) per bucket;
    3. chain pass — per user over bucket summaries (orderBy bucket): a
       bucket MERGES into its predecessor when the boundary gap
       ``first_ts − prev_last_ts ≤ gap`` (same strict-`>` rule, same float
       math as the local pass), contributing ``n_local − merged`` new
       sessions; a running sum of contributions gives each bucket's id
       offset;
    4. join the (user, bucket) offsets back and renumber:
       ``session_id = offset_before + local_id − merged``.
    """
    if ts_col not in df.columns or user_col not in df.columns:
        return df
    gap_seconds = float(gap_minutes) * 60.0
    bucket_us = int(bucket_hours * 3600.0 * 1e6)

    ts_sec = _epoch_seconds(F.col(ts_col))
    df = df.withColumn(
        "_bkt", F.floor(F.unix_micros(F.col(ts_col)) / F.lit(bucket_us))
    )
    w_local = Window.partitionBy(user_col, "_bkt").orderBy(
        F.col(ts_col), *[F.col(c) for c in tiebreak_cols]
    )
    gap = ts_sec - F.lag(ts_sec).over(w_local)
    boundary = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    df = df.withColumn(
        "_lsid",
        F.sum(boundary).over(
            w_local.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )

    summary = df.groupBy(user_col, "_bkt").agg(
        F.max("_lsid").alias("_n_local"),
        F.min(ts_col).alias("_first_ts"),
        F.max(ts_col).alias("_last_ts"),
    )
    w_chain = Window.partitionBy(user_col).orderBy("_bkt")
    prev_last_sec = F.lag(_epoch_seconds(F.col("_last_ts"))).over(w_chain)
    boundary_gap = _epoch_seconds(F.col("_first_ts")) - prev_last_sec
    merged = F.when(
        prev_last_sec.isNotNull() & ~(boundary_gap > gap_seconds), 1
    ).otherwise(0)
    contrib = F.col("_n_local") - merged
    offsets = (
        summary.withColumn("_merged", merged)
        .withColumn(
            "_off",
            F.sum(contrib).over(
                w_chain.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            - contrib,
        )
        .select(user_col, "_bkt", "_merged", "_off")
    )

    df = (
        df.join(offsets, [user_col, "_bkt"])
        .withColumn(
            "session_id", F.col("_off") + F.col("_lsid") - F.col("_merged")
        )
        .drop("_bkt", "_lsid", "_merged", "_off")
    )
    if not include_stats:
        return df
    w_sess = Window.partitionBy(user_col, "session_id")
    return df.withColumn(
        "session_event_count", F.count(id_col).over(w_sess)
    ).withColumn(
        "session_duration_seconds",
        _epoch_seconds(F.max(ts_col).over(w_sess))
        - _epoch_seconds(F.min(ts_col).over(w_sess)),
    )


def run_all(df: DataFrame, gap_minutes: float = 30) -> DataFrame:
    """Full feature stage in reference order (feature_engineering.py:98-103)."""
    df = add_severity_score(df)
    df = add_user_event_frequency(df)
    df = add_user_activity_baseline(df)
    df = add_session_features(df, gap_minutes=gap_minutes)
    return df
