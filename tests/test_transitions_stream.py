"""Streaming transition-matrix maintenance (streaming/pipeline.py:
maintain_transitions_stream): the streamed (prev_type, event_type)
counts equal the batch event_type_transitions matrix over cumulative
in-order input (boundary transitions across micro-batches included),
the per-user last-event state rewrites only touched prefix
directories, and a wiped-checkpoint full replay folds nothing twice.
"""

from __future__ import annotations

import datetime
import os
import pathlib
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import Window
from pyspark.sql import functions as F

from security_data_pipeline_spark.streaming.pipeline import (
    maintain_transitions_stream,
    transition_matrix_from_counts,
)

_T0 = datetime.datetime(2026, 1, 1, 8, 0, 0)


def _ts(minutes: int) -> datetime.datetime:
    return _T0 + datetime.timedelta(minutes=minutes)


# (event_id, ts, user_id, event_type) — per-user in-order ACROSS batches
BATCHES = [
    [
        (1, _ts(0), 1, "login"),
        (2, _ts(1), 1, "read"),
        (3, _ts(0), 2, "login"),
    ],
    [
        (4, _ts(2), 1, "write"),
        (5, _ts(3), 2, "logout"),
    ],
    [
        (6, _ts(4), 1, "logout"),
        (7, _ts(5), 3, "login"),
    ],
]

_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


def _write(src, batches):
    src.mkdir()
    base = time.time() - 100
    for bi, rows in enumerate(batches):
        f = src / f"b{bi}.parquet"
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(
                        [r[0] for r in rows], type=pa.int64()
                    ),
                    "ts": pa.array(
                        [r[1] for r in rows], type=pa.timestamp("us")
                    ),
                    "user_id": pa.array(
                        [r[2] for r in rows], type=pa.int64()
                    ),
                    "event_type": pa.array(
                        [r[3] for r in rows], type=pa.string()
                    ),
                }
            ),
            f,
        )
        os.utime(f, (base + bi, base + bi))


def _run(spark, src, state, ckpt):
    q = maintain_transitions_stream(
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src)),
        state,
        ckpt,
    )
    q.awaitTermination(120)


def _batch_matrix(spark, rows):
    """The registered event_type_transitions math over an in-memory
    frame, minus the n_users column the streaming form documents away."""
    ev = spark.createDataFrame(rows, _SCHEMA)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    tr = seq.groupBy("prev_type", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wt = Window.partitionBy("prev_type")
    return tr.select(
        "prev_type",
        "event_type",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(wt).cast("double"),
            6,
        ).alias("prob"),
    )


def test_streamed_transitions_equal_batch(spark, tmp_path):
    src = tmp_path / "in"
    _write(src, BATCHES)
    state = str(tmp_path / "trans")
    ckpt = str(tmp_path / "ckpt")
    _run(spark, src, state, ckpt)

    got = {
        (r["prev_type"], r["event_type"], r["n"], r["prob"])
        for r in transition_matrix_from_counts(spark, state).collect()
    }
    # boundary transitions (read->write, write->logout for u1 across
    # batches 0->1->2; login->logout for u2 across batches 0->1) are the
    # rows a within-batch-only fold would miss
    assert got == {
        ("login", "read", 1, 0.5),
        ("read", "write", 1, 1.0),
        ("write", "logout", 1, 1.0),
        ("login", "logout", 1, 0.5),
    }, got

    all_rows = [r for b in BATCHES for r in b]
    want = {
        (r["prev_type"], r["event_type"], r["n"], r["prob"])
        for r in _batch_matrix(spark, all_rows).collect()
    }
    assert got == want


def test_transitions_last_state_touches_batch_prefixes_only(
    spark, tmp_path
):
    """The 100 TB contract of the |users|-sized half of the state: a
    batch touching one user's prefix rewrites exactly that last/ prefix
    directory; every untouched directory's file listing is
    byte-identical after the fold. (counts/ is |types|^2-bounded
    whole-swap state — it rewrites every batch by design.)"""
    from security_data_pipeline_spark.streaming.pipeline import (
        locf_key_prefix,
    )

    # find two user ids living in DIFFERENT last-state prefixes
    probe = spark.createDataFrame(
        [(i,) for i in range(1, 33)], "user_id long"
    ).select("user_id", locf_key_prefix(["user_id"], 256).alias("_kp"))
    by_pfx = {}
    for r in probe.collect():
        by_pfx.setdefault(r["_kp"], []).append(r["user_id"])
    (p1, (u1, *_)), (p2, (u2, *_)) = list(by_pfx.items())[:2]

    src = tmp_path / "in"
    state = str(tmp_path / "trans")
    ckpt = str(tmp_path / "ckpt")

    # batch 0 touches BOTH prefixes
    _write(
        src,
        [[(1, _ts(0), u1, "login"), (2, _ts(0), u2, "login")]],
    )
    _run(spark, src, state, ckpt)

    def listing(pfx):
        d = pathlib.Path(state) / "last" / f"_kp={pfx}"
        return {
            f.name: (f.stat().st_size, f.stat().st_mtime_ns)
            for f in d.iterdir()
            if f.name.startswith("part-")
        }

    before_p1, before_p2 = listing(p1), listing(p2)
    assert before_p1 and before_p2

    # batch 1 touches ONLY u1's prefix
    f = src / "b1.parquet"
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([3], type=pa.int64()),
                "ts": pa.array([_ts(1)], type=pa.timestamp("us")),
                "user_id": pa.array([u1], type=pa.int64()),
                "event_type": pa.array(["read"], type=pa.string()),
            }
        ),
        f,
    )
    os.utime(f, (time.time() - 50, time.time() - 50))
    _run(spark, src, state, ckpt)

    assert listing(p2) == before_p2, "untouched last/ prefix was rewritten"
    assert listing(p1) != before_p1
    got = {
        (r["prev_type"], r["event_type"], r["n"])
        for r in transition_matrix_from_counts(spark, state)
        .drop("prob")
        .collect()
    }
    assert got == {("login", "read", 1)}


def test_transitions_wiped_checkpoint_replay_folds_nothing_twice(
    spark, tmp_path
):
    """Same checkpoint path wiped → every batch replays under the same
    lineage tag with restarting ids; the counts guard skips every
    re-fold (no double counting) and the idempotent last merge heals to
    the identical state."""
    src = tmp_path / "in"
    _write(src, BATCHES)
    state = str(tmp_path / "trans")
    ckpt = str(tmp_path / "ckpt")
    _run(spark, src, state, ckpt)
    first = {
        (r["prev_type"], r["event_type"], r["n"])
        for r in transition_matrix_from_counts(spark, state)
        .drop("prob")
        .collect()
    }

    shutil.rmtree(ckpt)
    _run(spark, src, state, ckpt)
    replay = {
        (r["prev_type"], r["event_type"], r["n"])
        for r in transition_matrix_from_counts(spark, state)
        .drop("prob")
        .collect()
    }
    assert replay == first, "replay double-counted transitions"
    last = spark.read.parquet(f"{state}/last")
    assert last.count() == 3  # one carried row per user
