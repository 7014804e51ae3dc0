"""Streaming sessionization.

Two formulations (SURVEY.md §7.3 hard part 3):

- :func:`session_window_stats` — the idiomatic one: ``F.session_window``
  (gap-based dynamic windows) + watermark. Emits per-session AGGREGATES keyed
  by (user, window); late events within the watermark merge sessions
  retroactively — semantics batch never had. State is bounded by the
  watermark; this is the 100 TB-safe default.
- :func:`sessionize_with_state` — per-row monotonically numbered session ids
  (1, 2, 3… per user) exactly like the batch reference
  (``feature_engineering.py:81``), via ``applyInPandasWithState``: per-user
  state carries (last_ts, current_session_id). Requires events per user to
  arrive time-ordered within a batch (the function sorts each batch); truly
  late data would mis-assign — documented trade-off vs the window form.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def session_window_stats(
    df: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = "1 hour",
    ts_col: str = "timestamp",
    user_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-session aggregates via native session windows.

    Works on both streaming and batch DataFrames (batch ignores the
    watermark) — the batch form is how tests cross-check streaming output.
    Pass ``watermark=None`` when an upstream operator already defined one
    (re-defining a watermark is disallowed in a streaming plan).
    """
    if df.isStreaming and watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.col(user_col), F.session_window(F.col(ts_col), gap))
        .agg(
            F.count(id_col).alias("session_event_count"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .select(
            user_col,
            F.col("session_window.start").alias("window_start"),
            F.col("session_window.end").alias("window_end"),
            "session_event_count",
            "session_start",
            "session_end",
            (
                F.unix_micros(F.col("session_end")) / F.lit(1_000_000.0)
                - F.unix_micros(F.col("session_start")) / F.lit(1_000_000.0)
            ).alias("session_duration_seconds"),
        )
    )


def windowed_event_counts(
    df: DataFrame,
    window: str = "1 day",
    slide: str | None = None,
    watermark: str | None = "1 hour",
    ts_col: str = "timestamp",
    user_col: str = "user_id",
) -> DataFrame:
    """A2's per-(user, day) counts re-hosted on tumbling/sliding windows.

    Batch equivalence: a tumbling "1 day" window aligned at epoch equals the
    UTC ``date_trunc('DAY', ts)`` bucketing the batch baseline uses — tested
    against it. On streams the watermark bounds state; late rows beyond it
    are dropped (batch has no such concept — document, don't hide).

    Late-drop timing (verified on Spark 4.1): the late-event filter uses the
    PREVIOUS batch's watermark, one batch behind the state-eviction
    watermark (the two values are visible on ``StateStoreSave`` in the
    plan). A row can therefore still be accepted one batch after its window
    fell behind the eviction watermark — sinks must tolerate that
    one-batch grace, and exactly-once consumers should key on
    (user, window_start) upserts rather than assume a closed window never
    updates.
    """
    if df.isStreaming and watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    win = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    return (
        df.groupBy(F.col(user_col), win)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            user_col,
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_events",
        )
    )


_STATE_SCHEMA = StructType(
    [
        StructField("last_ts_us", LongType()),
        StructField("session_id", LongType()),
    ]
)

_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("event_id", LongType()),
        StructField("timestamp", TimestampType()),
        StructField("session_id", LongType()),
    ]
)


def _make_session_assigner(gap_seconds: float):
    def assign(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            last_ts_us, session_id = state.get
        else:
            last_ts_us, session_id = None, 0

        batch = pd.concat(list(pdfs)).sort_values(["timestamp", "event_id"])
        ts_us = batch["timestamp"].astype("int64") // 1000  # ns → µs
        ids = []
        for t in ts_us:
            is_new = (
                last_ts_us is None
                or (t / 1_000_000.0 - last_ts_us / 1_000_000.0) > gap_seconds
            )
            if is_new:
                session_id += 1
            ids.append(session_id)
            last_ts_us = int(t)

        state.update((last_ts_us, session_id))
        yield pd.DataFrame(
            {
                "user_id": str(user_id),
                "event_id": batch["event_id"].to_numpy(),
                "timestamp": batch["timestamp"].to_numpy(),
                "session_id": ids,
            }
        )

    return assign


def tws_runtime_available() -> bool:
    """True when the ``transformWithStateInPandas`` Python runtime can run:
    its state (de)serializer imports ``google.protobuf`` at plan time."""
    try:
        import google.protobuf.descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def sessionize_with_state_v2(
    df: DataFrame,
    gap_minutes: float = 30,
    output_mode: str = "append",
) -> DataFrame:
    """Per-row session ids via ``transformWithStateInPandas`` — Spark 4's
    successor to ``applyInPandasWithState`` (typed value state, timers,
    RocksDB-backed). Same semantics/output as :func:`sessionize_with_state`;
    kept side by side so deployments can migrate per Spark version.

    Runtime contract — the ``applyInPandasWithState`` form IS the
    documented primary: the TWS Python runner imports ``google.protobuf``
    at plan time (absent from this environment; this package pins no
    extra deps), so on runtimes without it this function returns
    :func:`sessionize_with_state` directly — identical semantics and
    output schema, stream≡batch-tested, no warning (the dispatch is the
    documented behavior, not an error path). On protobuf-equipped
    runtimes the TWS leg runs instead and additionally requires the
    RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``). Probe
    :func:`tws_runtime_available` to know which leg a deployment gets.
    """
    if not tws_runtime_available():
        return sessionize_with_state(
            df, gap_minutes=gap_minutes, output_mode=output_mode
        )

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    gap_seconds = float(gap_minutes) * 60.0

    class _SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("sess", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            if self._state.exists():
                last_ts_us, session_id = self._state.get()
            else:
                last_ts_us, session_id = None, 0
            batch = pd.concat(list(rows)).sort_values(
                ["timestamp", "event_id"]
            )
            ts_us = batch["timestamp"].astype("int64") // 1000
            ids = []
            for t in ts_us:
                is_new = (
                    last_ts_us is None
                    or (t / 1_000_000.0 - last_ts_us / 1_000_000.0)
                    > gap_seconds
                )
                if is_new:
                    session_id += 1
                ids.append(session_id)
                last_ts_us = int(t)
            self._state.update((last_ts_us, session_id))
            yield pd.DataFrame(
                {
                    "user_id": str(user_id),
                    "event_id": batch["event_id"].to_numpy(),
                    "timestamp": batch["timestamp"].to_numpy(),
                    "session_id": ids,
                }
            )

        def close(self) -> None:
            pass

    return (
        df.select(
            F.col("user_id").cast("string").alias("user_id"),
            F.col("event_id").cast("long").alias("event_id"),
            F.col("timestamp"),
        )
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_SessionProcessor(),
            outputStructType=_OUTPUT_SCHEMA,
            outputMode=output_mode,
            timeMode="None",
        )
    )


def sessionize_with_state(
    df: DataFrame,
    gap_minutes: float = 30,
    output_mode: str = "append",
) -> DataFrame:
    """Per-row session ids on a stream: ``applyInPandasWithState`` keyed by
    user, state = (last event time µs, running session counter).

    Input must have columns (user_id, event_id, timestamp). Arbitrary-scale
    safe: state is O(1) per user; per-batch work is O(batch) after a
    per-user sort.
    """
    assign = _make_session_assigner(float(gap_minutes) * 60.0)
    return (
        df.select(
            F.col("user_id").cast("string").alias("user_id"),
            F.col("event_id").cast("long").alias("event_id"),
            F.col("timestamp"),
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            assign,
            outputStructType=_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode=output_mode,
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
