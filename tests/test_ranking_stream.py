"""Streaming ranking-evaluation maintainer (streaming/pipeline.py:
maintain_ranking_counts_stream): the streamed AUC/Brier report equals the
batch ranking_report over the cumulative input, replays fold exactly-once
per prefix, and per-batch IO follows the batch."""

from __future__ import annotations

import os
import pathlib
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq

from security_data_pipeline_spark.operators import evaluation as ev
from security_data_pipeline_spark.streaming.pipeline import (
    maintain_ranking_counts_stream,
    ranking_state_counts,
)

BATCHES = [
    [("a", 0.9, 1), ("a", 0.5, 0), ("a", 0.5, 1), ("b", 0.3, 0)],
    [("a", 0.7, 1), ("a", 0.5, 0), ("b", 0.8, 1), ("b", 0.2, 0)],
]


def _write(src, batches):
    src.mkdir()
    base = time.time() - 100
    for bi, rows in enumerate(batches):
        f = src / f"b{bi}.parquet"
        pq.write_table(
            pa.table(
                {
                    "grp": [r[0] for r in rows],
                    "score": [r[1] for r in rows],
                    "label": [r[2] for r in rows],
                }
            ),
            f,
        )
        os.utime(f, (base + bi, base + bi))


def _run(spark, src, state, ckpt):
    q = maintain_ranking_counts_stream(
        spark.readStream.schema("grp string, score double, label long")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src)),
        state,
        ckpt,
        score_col="score",
        label_col="label",
        group_cols=["grp"],
        pfx_mod=16,
    )
    q.awaitTermination(120)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streamed_ranking_equals_batch(spark, tmp_path):
    src = tmp_path / "in"
    _write(src, BATCHES)
    state = str(tmp_path / "rank")
    _run(spark, src, state, str(tmp_path / "ckpt"))

    all_rows = [r for b in BATCHES for r in b]
    cumulative = spark.createDataFrame(
        all_rows, "grp string, score double, label long"
    )
    got = _rows(
        ev.ranking_from_score_counts(
            ranking_state_counts(spark, state), ["grp"]
        )
    )
    want = _rows(ev.ranking_report(cumulative, "score", "label", ["grp"]))
    assert got == want


def test_ranking_replay_exactly_once(spark, tmp_path):
    src = tmp_path / "in"
    _write(src, BATCHES)
    state = str(tmp_path / "rank")
    ckpt = str(tmp_path / "ckpt")
    _run(spark, src, state, ckpt)
    first = _rows(ranking_state_counts(spark, state))
    shutil.rmtree(ckpt)
    _run(spark, src, state, ckpt)  # full replay: per-prefix stamps skip
    assert _rows(ranking_state_counts(spark, state)) == first


def test_ranking_state_rewrites_touched_prefixes_only(spark, tmp_path):
    from security_data_pipeline_spark.streaming.pipeline import (
        locf_key_prefix,
    )

    # two (grp, score) keys in different prefixes (mod 16)
    probe = spark.createDataFrame(
        [("g", round(0.01 * i, 6)) for i in range(64)],
        "grp string, _s double",
    ).select("grp", "_s", locf_key_prefix(["grp", "_s"], 16).alias("_kp"))
    by_pfx = {}
    for r in probe.collect():
        by_pfx.setdefault(r["_kp"], []).append(r["_s"])
    (p1, (s1, *_)), (p2, (s2, *_)) = list(by_pfx.items())[:2]

    src = tmp_path / "in"
    state = str(tmp_path / "rank")
    ckpt = str(tmp_path / "ckpt")

    # batch 0 touches BOTH prefixes
    _write(src, [[("g", s1, 1), ("g", s2, 0)]])
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

    # batch 1 touches ONLY s1's prefix
    f = src / "b1.parquet"
    pq.write_table(
        pa.table({"grp": ["g"], "score": [s1], "label": [1]}), f
    )
    os.utime(f, (time.time() - 50, time.time() - 50))
    _run(spark, src, state, ckpt)

    assert listing(p2) == before_p2, "untouched prefix dir was rewritten"
    assert listing(p1) != before_p1
    got = {
        (r["grp"], r["_s"]): (r["_n"], r["_np"])
        for r in ranking_state_counts(spark, state).collect()
    }
    assert got == {("g", s1): (2, 2), ("g", s2): (1, 0)}
