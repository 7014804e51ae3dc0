"""Streaming retention maintainer (streaming/pipeline.py:
maintain_retention_stream): streamed triangle equals batch
retention_cohorts over the cumulative input; replays are no-ops;
per-batch IO follows the batch."""

from __future__ import annotations

import datetime as dt
import os
import pathlib
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq

from security_data_pipeline_spark.operators.timeseries import (
    retention_cohorts,
    retention_from_activity,
)
from security_data_pipeline_spark.streaming.pipeline import (
    maintain_retention_stream,
    retention_state_activity,
)


def _t(day, hour=4):
    return dt.datetime(2024, 1, 1 + day, hour)


BATCHES = [
    [("u1", _t(0)), ("u2", _t(0)), ("u1", _t(1))],
    [("u1", _t(1, 9)), ("u3", _t(2)), ("u2", _t(3)), ("u1", _t(3))],
]


def _write(src, batches):
    src.mkdir()
    base = time.time() - 100
    for bi, rows in enumerate(batches):
        f = src / f"b{bi}.parquet"
        pq.write_table(
            pa.table(
                {
                    "user_id": [r[0] for r in rows],
                    "ts": [r[1] for r in rows],
                }
            ),
            f,
        )
        os.utime(f, (base + bi, base + bi))


def _run(spark, src, state, ckpt, pfx_mod=8):
    q = maintain_retention_stream(
        spark.readStream.schema("user_id string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src)),
        state,
        ckpt,
        user_col="user_id",
        ts_col="ts",
        period_days=1,
        pfx_mod=pfx_mod,
    )
    q.awaitTermination(120)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streamed_retention_equals_batch(spark, tmp_path):
    src = tmp_path / "in"
    _write(src, BATCHES)
    state = str(tmp_path / "ret")
    _run(spark, src, state, str(tmp_path / "ckpt"))

    all_rows = [r for b in BATCHES for r in b]
    cumulative = spark.createDataFrame(
        all_rows, "user_id string, ts timestamp"
    )
    got = _rows(
        retention_from_activity(retention_state_activity(spark, state))
    )
    want = _rows(retention_cohorts(cumulative, "user_id", "ts", 1))
    assert got == want
    # cross-batch first-seen: u1's cohort is day 0 even though batch 1
    # re-reports day-1/day-3 activity
    rep = {
        (r["cohort_period"], r["period_offset"]): r["n_active"]
        for r in retention_from_activity(
            retention_state_activity(spark, state)
        ).collect()
    }
    day0 = 19723
    assert rep[(day0, 0)] == 2 and rep[(day0, 1)] == 1 and rep[(day0, 3)] == 2


def test_retention_replay_is_noop(spark, tmp_path):
    src = tmp_path / "in"
    _write(src, BATCHES)
    state = str(tmp_path / "ret")
    ckpt = str(tmp_path / "ckpt")
    _run(spark, src, state, ckpt)
    first = _rows(retention_state_activity(spark, state))
    shutil.rmtree(ckpt)
    _run(spark, src, state, ckpt)  # distinct union: full replay no-op
    assert _rows(retention_state_activity(spark, state)) == first


def test_retention_rewrites_touched_prefixes_only(spark, tmp_path):
    from security_data_pipeline_spark.streaming.pipeline import (
        locf_key_prefix,
    )

    probe = spark.createDataFrame(
        [(f"user{i}",) for i in range(32)], "_u string"
    ).select("_u", locf_key_prefix(["_u"], 8).alias("_kp"))
    by_pfx = {}
    for r in probe.collect():
        by_pfx.setdefault(r["_kp"], []).append(r["_u"])
    (p1, (u1, *_)), (p2, (u2, *_)) = list(by_pfx.items())[:2]

    src = tmp_path / "in"
    state = str(tmp_path / "ret")
    ckpt = str(tmp_path / "ckpt")

    _write(src, [[(u1, _t(0)), (u2, _t(0))]])
    _run(spark, src, state, ckpt)

    def listing(pfx):
        d = pathlib.Path(state) / f"_kp={pfx}"
        return {
            f.name: (f.stat().st_size, f.stat().st_mtime_ns)
            for f in d.iterdir()
            if f.name.startswith("part-")
        }

    before_p1, before_p2 = listing(p1), listing(p2)
    assert before_p1 and before_p2

    f = src / "b1.parquet"
    pq.write_table(
        pa.table({"user_id": [u1], "ts": [_t(2)]}), f
    )
    os.utime(f, (time.time() - 50, time.time() - 50))
    _run(spark, src, state, ckpt)

    assert listing(p2) == before_p2, "untouched prefix dir was rewritten"
    assert listing(p1) != before_p1
    got = _rows(retention_state_activity(spark, state))
    day0 = 19723
    assert got == sorted(
        [(u1, day0), (u1, day0 + 2), (u2, day0)]
    )
