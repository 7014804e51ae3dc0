"""Streaming token-count maintenance (streaming/pipeline.py:
maintain_token_counts_stream): the streamed vocabulary equals the batch
vocab_topk over the cumulative input, counts fold exactly-once under
replay, and oov_stats against the live vocab matches the batch pass."""

from __future__ import annotations

import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from security_data_pipeline_spark.operators import textops
from security_data_pipeline_spark.streaming.pipeline import (
    maintain_token_counts_stream,
)

BATCHES = [
    [(1, "alpha alpha beta"), (2, "beta gamma")],
    [(3, "alpha delta delta delta"), (4, None)],
]


def _write(src, batches):
    src.mkdir()
    base = time.time() - 100
    for bi, rows in enumerate(batches):
        f = src / f"b{bi}.parquet"
        pq.write_table(
            pa.table(
                {"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}
            ),
            f,
        )
        os.utime(f, (base + bi, base + bi))


def _run(spark, src, state, ckpt):
    q = maintain_token_counts_stream(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src)),
        state,
        ckpt,
    )
    q.awaitTermination(120)


def test_streamed_vocab_equals_batch(spark, tmp_path):
    src = tmp_path / "in"
    _write(src, BATCHES)
    state = str(tmp_path / "counts")
    ckpt = str(tmp_path / "ckpt")
    _run(spark, src, state, ckpt)

    counts = spark.read.parquet(state).drop("_last_batch_id", "_fold_tag")
    got = {(r["token"], r["c"]) for r in counts.collect()}
    assert got == {
        ("alpha", 3),
        ("beta", 2),
        ("gamma", 1),
        ("delta", 3),
    }, got

    all_rows = [r for b in BATCHES for r in b]
    cumulative = spark.createDataFrame(all_rows, "doc_id long, text string")
    assert textops.vocab_topk_from_counts(counts, k=3) == textops.vocab_topk(
        cumulative, k=3
    )
    # oov_stats against the live vocab: top-2 = [alpha, delta] (both
    # count 3, alpha wins the tie; delta beats beta)
    vocab = textops.vocab_topk_from_counts(counts, k=2)
    assert vocab == ["alpha", "delta"]
    live = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"])
        for r in textops.oov_stats(cumulative, vocab).collect()
    }
    assert live[1] == (3, 1)  # 'beta' is OOV
    assert live[2] == (2, 2)  # 'beta gamma': both OOV
    assert live[3] == (4, 0)  # alpha + delta x3: all in vocab
    assert live[4] == (0, 0)  # NULL text: zero tokens


def test_streamed_token_counts_replay_exactly_once(spark, tmp_path):
    src = tmp_path / "in"
    _write(src, BATCHES)
    state = str(tmp_path / "counts")
    ckpt = str(tmp_path / "ckpt")
    _run(spark, src, state, ckpt)
    first = sorted(
        (r["token"], r["c"])
        for r in spark.read.parquet(state)
        .drop("_last_batch_id", "_fold_tag")
        .collect()
    )
    shutil.rmtree(ckpt)
    _run(spark, src, state, ckpt)  # full replay: stamped guard skips folds
    replay = sorted(
        (r["token"], r["c"])
        for r in spark.read.parquet(state)
        .drop("_last_batch_id", "_fold_tag")
        .collect()
    )
    assert replay == first, "replay double-counted tokens"
