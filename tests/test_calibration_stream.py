"""Streaming calibration maintainer and per-group top-k maintainer
(streaming/pipeline.py): streamed state equals the batch operator over
the cumulative input, replays fold exactly-once, and per-batch IO
follows the batch, not the state."""

from __future__ import annotations

import os
import pathlib
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq

from security_data_pipeline_spark.operators import evaluation as ev
from security_data_pipeline_spark.streaming.pipeline import (
    calibration_state_counts,
    group_topk_from_state,
    maintain_calibration_stream,
    maintain_group_topk_stream,
)

CAL_BATCHES = [
    [(0.05, 0), (0.15, 0), (0.27, 1), (0.98, 1)],
    [(0.12, 1), (0.33, 0), (0.95, 1), (1.0, 1), (0.27, 0)],
]


def _write_cal(src, batches):
    src.mkdir()
    base = time.time() - 100
    for bi, rows in enumerate(batches):
        f = src / f"b{bi}.parquet"
        pq.write_table(
            pa.table(
                {
                    "score": [r[0] for r in rows],
                    "label": [r[1] for r in rows],
                }
            ),
            f,
        )
        os.utime(f, (base + bi, base + bi))


def _run_cal(spark, src, state, ckpt):
    q = maintain_calibration_stream(
        spark.readStream.schema("score double, label long")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src)),
        state,
        ckpt,
        score_col="score",
        label_col="label",
        n_bins=10,
    )
    q.awaitTermination(120)


def _report_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streamed_calibration_equals_batch(spark, tmp_path):
    src = tmp_path / "in"
    _write_cal(src, CAL_BATCHES)
    state = str(tmp_path / "cal")
    _run_cal(spark, src, state, str(tmp_path / "ckpt"))

    all_rows = [r for b in CAL_BATCHES for r in b]
    cumulative = spark.createDataFrame(all_rows, "score double, label long")

    streamed_bins = calibration_state_counts(spark, state)
    got_rel = _report_rows(ev.reliability_from_bin_counts(streamed_bins))
    want_rel = _report_rows(
        ev.reliability_report(cumulative, "score", "label", n_bins=10)
    )
    assert got_rel == want_rel

    got_ece = _report_rows(ev.ece_from_bin_counts(streamed_bins))
    want_ece = _report_rows(
        ev.ece_report(cumulative, "score", "label", n_bins=10)
    )
    assert got_ece == want_ece


def test_calibration_replay_exactly_once(spark, tmp_path):
    src = tmp_path / "in"
    _write_cal(src, CAL_BATCHES)
    state = str(tmp_path / "cal")
    ckpt = str(tmp_path / "ckpt")
    _run_cal(spark, src, state, ckpt)
    first = _report_rows(calibration_state_counts(spark, state))
    shutil.rmtree(ckpt)
    _run_cal(spark, src, state, ckpt)  # full replay, same lineage tag
    assert _report_rows(calibration_state_counts(spark, state)) == first


def test_calibration_fold_replay_direct(spark, tmp_path):
    """The at-least-once crash scenario at fold granularity: the same
    batch id folded twice leaves the state row-identical."""
    from security_data_pipeline_spark.streaming.pipeline import (
        _calibration_fold,
    )

    state = str(tmp_path / "cal")
    fold = _calibration_fold(state, "score", "label", 10, "tX")
    b0 = spark.createDataFrame(CAL_BATCHES[0], "score double, label long")
    fold(b0, 0)
    once = _report_rows(calibration_state_counts(spark, state))
    fold(b0, 0)
    assert _report_rows(calibration_state_counts(spark, state)) == once


TOPK_BATCHES = [
    [("s1", 1, 0.9), ("s1", 2, 0.5), ("s2", 3, 0.7), ("s1", 4, 0.5)],
    [("s1", 5, 0.95), ("s2", 6, 0.1), ("s3", 7, 0.4), ("s1", 8, 0.5)],
]


def _write_topk(src, batches):
    src.mkdir()
    base = time.time() - 100
    for bi, rows in enumerate(batches):
        f = src / f"b{bi}.parquet"
        pq.write_table(
            pa.table(
                {
                    "source": [r[0] for r in rows],
                    "doc_id": [r[1] for r in rows],
                    "score": [r[2] for r in rows],
                }
            ),
            f,
        )
        os.utime(f, (base + bi, base + bi))


def _run_topk(spark, src, state, ckpt, k=2, pfx_mod=8):
    q = maintain_group_topk_stream(
        spark.readStream.schema("source string, doc_id long, score double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src)),
        state,
        ckpt,
        group_cols=["source"],
        order_col="score",
        id_col="doc_id",
        k=k,
        pfx_mod=pfx_mod,
    )
    q.awaitTermination(120)


def _batch_topk(spark, rows, k=2):
    from security_data_pipeline_spark.streaming.pipeline import (
        _group_topk_merge,
    )

    df = spark.createDataFrame(
        rows, "source string, doc_id long, score double"
    )
    return _group_topk_merge(df, ["source"], "score", "doc_id", k, True)


def test_streamed_group_topk_equals_batch(spark, tmp_path):
    src = tmp_path / "in"
    _write_topk(src, TOPK_BATCHES)
    state = str(tmp_path / "topk")
    _run_topk(spark, src, state, str(tmp_path / "ckpt"))

    all_rows = [r for b in TOPK_BATCHES for r in b]
    got = sorted(tuple(r) for r in group_topk_from_state(spark, state).collect())
    want = sorted(tuple(r) for r in _batch_topk(spark, all_rows).collect())
    assert got == want
    # ties at score 0.5 in s1 break on doc_id ASC: after batch 0 the
    # state holds (1, 0.9) and (2, 0.5); batch 1's (5, 0.95) evicts 2
    by_src = {}
    for s, d, _ in got:
        by_src.setdefault(s, []).append(d)
    assert sorted(by_src["s1"]) == [1, 5]
    assert sorted(by_src["s2"]) == [3, 6]
    assert sorted(by_src["s3"]) == [7]


def test_group_topk_replay_is_noop(spark, tmp_path):
    """Top-k-of-union is idempotent: a wiped-checkpoint full replay
    re-merges the same batches into the same state."""
    src = tmp_path / "in"
    _write_topk(src, TOPK_BATCHES)
    state = str(tmp_path / "topk")
    ckpt = str(tmp_path / "ckpt")
    _run_topk(spark, src, state, ckpt)
    first = sorted(
        tuple(r) for r in group_topk_from_state(spark, state).collect()
    )
    shutil.rmtree(ckpt)
    _run_topk(spark, src, state, ckpt)
    assert (
        sorted(tuple(r) for r in group_topk_from_state(spark, state).collect())
        == first
    )


def test_group_topk_rewrites_touched_prefixes_only(spark, tmp_path):
    """The 100 TB contract: a batch touching one group-hash prefix
    rewrites exactly that prefix directory; untouched directories are
    byte-identical after the fold."""
    from security_data_pipeline_spark.streaming.pipeline import (
        locf_key_prefix,
    )

    # find two group values living in DIFFERENT state prefixes (mod 8)
    probe = spark.createDataFrame(
        [(f"src{i}",) for i in range(32)], "source string"
    ).select("source", locf_key_prefix(["source"], 8).alias("_kp"))
    by_pfx = {}
    for r in probe.collect():
        by_pfx.setdefault(r["_kp"], []).append(r["source"])
    (p1, (g1, *_)), (p2, (g2, *_)) = list(by_pfx.items())[:2]

    src = tmp_path / "in"
    state = str(tmp_path / "topk")
    ckpt = str(tmp_path / "ckpt")

    # batch 0 touches BOTH prefixes
    _write_topk(src, [[(g1, 1, 0.9), (g2, 2, 0.8)]])
    _run_topk(spark, src, state, ckpt, k=2, pfx_mod=8)

    def listing(pfx):
        d = pathlib.Path(state) / f"_kp={pfx}"
        return {
            f.name: (f.stat().st_size, f.stat().st_mtime_ns)
            for f in d.iterdir()
            if f.name.startswith("part-")
        }

    before_p1, before_p2 = listing(p1), listing(p2)
    assert before_p1 and before_p2

    # batch 1 touches ONLY g1's prefix
    f = src / "b1.parquet"
    pq.write_table(
        pa.table({"source": [g1], "doc_id": [3], "score": [0.99]}), f
    )
    os.utime(f, (time.time() - 50, time.time() - 50))
    _run_topk(spark, src, state, ckpt, k=2, pfx_mod=8)

    assert listing(p2) == before_p2, "untouched prefix dir was rewritten"
    assert listing(p1) != before_p1
    got = sorted(
        (r["source"], r["doc_id"])
        for r in group_topk_from_state(spark, state).collect()
    )
    assert got == [(g1, 1), (g1, 3), (g2, 2)]


def test_group_topk_state_width_is_enforced(spark, tmp_path):
    """A wide stream column NOT named in carry_cols must not reach the
    persisted state (the bound is enforced by projection, not advised in
    the docstring); naming it via carry_cols keeps it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "in"
    src.mkdir()
    pq.write_table(
        pa.table(
            {
                "source": ["a", "a", "b"],
                "doc_id": [1, 2, 3],
                "score": [0.9, 0.5, 0.7],
                "wide_text": ["x" * 10, "y" * 10, "z" * 10],
            }
        ),
        src / "b0.parquet",
    )

    def run(state, ckpt, carry):
        q = maintain_group_topk_stream(
            spark.readStream.schema(
                "source string, doc_id long, score double, wide_text string"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src)),
            state,
            ckpt,
            group_cols=["source"],
            order_col="score",
            id_col="doc_id",
            k=2,
            pfx_mod=8,
            carry_cols=carry,
        )
        q.awaitTermination(120)

    run(str(tmp_path / "s1"), str(tmp_path / "c1"), None)
    cols1 = spark.read.parquet(str(tmp_path / "s1")).columns
    assert "wide_text" not in cols1
    assert {"source", "doc_id", "score"} <= set(cols1)

    run(str(tmp_path / "s2"), str(tmp_path / "c2"), ["wide_text"])
    st2 = spark.read.parquet(str(tmp_path / "s2"))
    assert "wide_text" in st2.columns
    assert st2.filter(st2.wide_text.isNull()).count() == 0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="absent from stream"):
        maintain_group_topk_stream(
            spark.readStream.schema("source string, doc_id long, score double")
            .parquet(str(src)),
            str(tmp_path / "s3"),
            str(tmp_path / "c3"),
            group_cols=["source"],
            order_col="score",
            id_col="doc_id",
            carry_cols=["nope"],
        )


def test_calibration_recovers_from_scratch_generation(spark, tmp_path):
    """Fresh checkpoint over kept scratch-only state (crash during the
    final overwrite) must FOLD into the recovered generation — the lazily-
    read-scratch-then-overwrite-scratch pattern raised 'Cannot overwrite a
    path that is also being read from' before _read_state completed the
    swap at read time (ADVICE r9)."""
    import json
    import shutil

    from security_data_pipeline_spark.streaming.pipeline import (
        maintain_calibration_stream,
    )

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    (in_dir / "f1.json").write_text(
        json.dumps({"score": 0.25, "label": 1})
    )
    state = str(tmp_path / "state")

    def run(ckpt):
        q = maintain_calibration_stream(
            spark.readStream.schema("score double, label int").json(
                str(in_dir)
            ),
            state,
            str(tmp_path / ckpt),
            score_col="score",
            label_col="label",
        )
        q.awaitTermination(120)

    run("ckpt1")
    shutil.rmtree(state)
    assert (tmp_path / "state__next").exists()

    (in_dir / "f2.json").write_text(
        json.dumps({"score": 0.75, "label": 0})
    )
    # fresh checkpoint folds BOTH files as its first batch into the
    # recovered scratch (1 row in bin 2) — a silent reset would leave
    # n=2 total; recovery must give n=3
    run("ckpt2")
    got = spark.read.parquet(state)
    assert got.agg({"n": "sum"}).first()[0] == 3


def test_emb_cov_stream_equals_batch_and_replay_guard(spark, tmp_path):
    """Streamed covariance statistics must equal the one-shot batch
    aggregation bit-for-bit (DECIMAL sums — batch boundaries can't
    drift the fold), and a replayed batch id must be a no-op."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from security_data_pipeline_spark.operators.similarity import (
        _exact_cov_sums,
    )
    from security_data_pipeline_spark.streaming.pipeline import (
        _emb_cov_fold,
        emb_cov_state_sums,
        maintain_emb_cov_stream,
    )

    import random

    rng = random.Random(37)
    dim = 4
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(40)
    ]
    src = tmp_path / "in"
    src.mkdir()
    for bi in (0, 1):
        half = rows[bi * 20 : (bi + 1) * 20]
        f = src / f"b{bi}.parquet"
        pq.write_table(
            pa.table(
                {
                    "vec_id": [r[0] for r in half],
                    "embedding": pa.array(
                        [r[1] for r in half], pa.list_(pa.float32())
                    ),
                }
            ),
            f,
        )
        os.utime(f, (1_700_000_000 + bi, 1_700_000_000 + bi))

    state = str(tmp_path / "cov")
    q = maintain_emb_cov_stream(
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src)),
        state,
        str(tmp_path / "ckpt"),
        dim=dim,
    )
    q.awaitTermination(120)

    got = {
        (r["i"], r["j"]): (r["s"], r["_n"])
        for r in emb_cov_state_sums(spark, state).collect()
    }
    df = spark.read.parquet(str(src))
    want = {
        (r["i"], r["j"]): (r["s"], r["_n"])
        for r in _exact_cov_sums(df, "embedding", dim).collect()
    }
    assert got == want  # bit-for-bit: exact decimal sums

    # replaying the last batch id directly must not change the state
    from security_data_pipeline_spark.streaming.pipeline import (
        _lineage_tag,
    )

    fold = _emb_cov_fold(
        state, "embedding", dim, _lineage_tag(str(tmp_path / "ckpt"))
    )
    fold(df, 1)
    again = {
        (r["i"], r["j"]): (r["s"], r["_n"])
        for r in emb_cov_state_sums(spark, state).collect()
    }
    assert again == want
