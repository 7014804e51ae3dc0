"""Streaming linear interpolation (streaming/pipeline.py:
maintain_interpolate_stream): emit-on-next-observation lookahead — the
emitted rows equal the batch interpolate_linear over the cumulative
input, the withheld set is exactly the trailing NULLs with no forward
neighbor yet, and a checkpoint replay re-delivers nothing."""

from __future__ import annotations

import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq

from security_data_pipeline_spark.operators.timeseries import (
    interpolate_linear,
)
from security_data_pipeline_spark.streaming.pipeline import (
    maintain_interpolate_stream,
)

# batch 0: k1 opens a gap (obs 10 @1, NULLs @2,@3 buffer);
#          k2 is a leading NULL with no prior obs ever (emits NULL now);
#          k3 closes its own gap in-batch (NULL @2 between obs @1 and @3)
# batch 1: k1's next obs @5 arrives -> the buffered @2,@3 emit
#          (10 + 40*(1/4), 10 + 40*(2/4)); k2 gets its first obs
# batch 2: k1 trailing NULL @6 buffers and never finalizes
BATCHES = [
    [("k1", 1, 10.0), ("k1", 2, None), ("k1", 3, None), ("k2", 1, None),
     ("k3", 1, 1.0), ("k3", 2, None), ("k3", 3, 3.0)],
    [("k1", 5, 50.0), ("k2", 2, 20.0)],
    [("k1", 6, None)],
]
WITHHELD = {("k1", 6.0)}


def _write(src, batches):
    src.mkdir()
    base = time.time() - 100
    for bi, rows in enumerate(batches):
        f = src / f"b{bi}.parquet"
        pq.write_table(
            pa.table(
                {
                    "k": [r[0] for r in rows],
                    "o": pa.array([r[1] for r in rows], type=pa.int64()),
                    "v": pa.array([r[2] for r in rows], type=pa.float64()),
                }
            ),
            f,
        )
        os.utime(f, (base + bi, base + bi))


def _run(spark, src, state, ckpt, out):
    def sink(df, batch_id):
        df.write.mode("append").parquet(out)

    q = maintain_interpolate_stream(
        spark.readStream.schema("k string, o long, v double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src)),
        state,
        ckpt,
        sink,
        keys=["k"],
        order_col="o",
        value_col="v",
    )
    q.awaitTermination(180)


def _emitted(spark, out):
    return {
        (r["k"], r["o"]): r["v_interp"]
        for r in spark.read.parquet(out).collect()
    }


def test_stream_equals_batch_on_finalized_rows(spark, tmp_path):
    src = tmp_path / "in"
    _write(src, BATCHES)
    out = str(tmp_path / "out")
    _run(spark, src, str(tmp_path / "state"), str(tmp_path / "ckpt"), out)

    got = _emitted(spark, out)
    all_rows = [r for b in BATCHES for r in b]
    cumulative = spark.createDataFrame(all_rows, "k string, o long, v double")
    want = {
        (r["k"], float(r["o"])): r["v_interp"]
        for r in interpolate_linear(cumulative, ["k"], "o", "v").collect()
    }
    # withheld = exactly the trailing NULLs with no forward neighbor yet
    assert set(want) - set(got) == WITHHELD
    assert set(got) == set(want) - WITHHELD
    for key, v in got.items():
        assert v == want[key], (key, v, want[key])
    # spot-check the semantics: the buffered gap interpolated linearly,
    # the in-batch gap too, the never-observed key stayed NULL
    assert got[("k1", 2.0)] == 20.0 and got[("k1", 3.0)] == 30.0
    assert got[("k3", 2.0)] == 2.0
    assert got[("k2", 1.0)] is None
    # no row emitted twice across batches
    emitted_rows = spark.read.parquet(out).count()
    assert emitted_rows == len(got)


def test_interpolate_replay_redelivers_nothing(spark, tmp_path):
    src = tmp_path / "in"
    _write(src, BATCHES)
    out = str(tmp_path / "out")
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    _run(spark, src, state, ckpt, out)
    first = _emitted(spark, out)
    n_first = spark.read.parquet(out).count()
    shutil.rmtree(ckpt)
    _run(spark, src, state, ckpt, out)  # full replay: stamp guard skips
    assert _emitted(spark, out) == first
    assert spark.read.parquet(out).count() == n_first, "replay re-delivered"
