"""Streaming token-count maintenance (streaming/pipeline.py:
maintain_token_counts_stream): the streamed vocabulary equals the batch
vocab_topk over the cumulative input, counts fold exactly-once under
replay, and oov_stats against the live vocab matches the batch pass."""

from __future__ import annotations

import os
import pathlib
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


def test_token_counts_state_rewrites_touched_prefixes_only(spark, tmp_path):
    """The 100 TB contract of maintain_token_counts_stream: per-batch IO
    follows the BATCH, not the state. A batch touching k prefixes
    rewrites exactly those k prefix directories — every untouched
    directory's file listing (names + contents) is byte-identical after
    the fold, and the state read is pruned to the touched prefixes."""
    from security_data_pipeline_spark.streaming.pipeline import (
        token_key_prefix,
    )

    # find two tokens living in DIFFERENT state prefixes
    probe = spark.createDataFrame(
        [(f"tok{i}",) for i in range(32)], "token string"
    ).select("token", token_key_prefix(256).alias("_kp"))
    by_pfx = {}
    for r in probe.collect():
        by_pfx.setdefault(r["_kp"], []).append(r["token"])
    (p1, (t1, *_)), (p2, (t2, *_)) = list(by_pfx.items())[:2]

    src = tmp_path / "in"
    state = str(tmp_path / "counts")
    ckpt = str(tmp_path / "ckpt")

    # batch 0 touches BOTH prefixes
    _write(src, [[(1, f"{t1} {t2}")]])
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

    # batch 1 touches ONLY t1's prefix
    f = src / "b1.parquet"
    pq.write_table(pa.table({"doc_id": [2], "text": [f"{t1} {t1}"]}), f)
    os.utime(f, (time.time() - 50, time.time() - 50))
    _run(spark, src, state, ckpt)

    # untouched prefix directory: byte-identical file listing
    assert listing(p2) == before_p2, "untouched prefix dir was rewritten"
    # touched prefix directory: rewritten (new part files)
    assert listing(p1) != before_p1
    # no prefix directories beyond the two touched ones
    dirs = {
        d.name
        for d in pathlib.Path(state).iterdir()
        if d.name.startswith("_kp=")
    }
    assert dirs == {f"_kp={p1}", f"_kp={p2}"}
    # and the counts are right
    counts = {
        r["token"]: r["c"]
        for r in spark.read.parquet(state).collect()
    }
    assert counts == {t1: 3, t2: 1}, counts


def test_folded_prefixes_per_prefix_lineage_guard(spark):
    """_folded_prefixes: only CURRENT-lineage stamps at/above the batch
    id mark a prefix folded — other-lineage stamps, lower stamps, and
    pre-guard state (no stamp columns) all fold normally."""
    from security_data_pipeline_spark.streaming.pipeline import (
        _folded_prefixes,
    )

    state = spark.createDataFrame(
        [
            ("p1", "alpha", 3, 1, "tNEW"),   # folded through batch 1
            ("p2", "beta", 2, 0, "tNEW"),    # folded through batch 0 only
            ("p3", "gamma", 1, 7, "tOLD"),   # old lineage: never "done"
        ],
        "_kp string, token string, c long, _last_batch_id long,"
        " _fold_tag string",
    )
    assert _folded_prefixes(state, 1, "tNEW") == {"p1"}
    assert _folded_prefixes(state, 0, "tNEW") == {"p1", "p2"}
    assert _folded_prefixes(state, 2, "tNEW") == set()
    assert _folded_prefixes(state, 0, "tELSEWHERE") == set()
    assert _folded_prefixes(None, 0, "tNEW") == set()
    unstamped = state.drop("_last_batch_id", "_fold_tag")
    assert _folded_prefixes(unstamped, 0, "tNEW") == set()


def test_compact_token_counts_bit_equal_one_file_per_prefix(spark, tmp_path):
    """Compaction folds each prefix directory to ONE file with rows —
    token counts AND replay stamps — verbatim, so the guard and every
    reader behave identically on compacted state; vocab_topk_from_counts
    is unchanged. A second compaction is a no-op by the same test."""
    from security_data_pipeline_spark.streaming.pipeline import (
        compact_token_counts,
    )

    src = tmp_path / "in"
    _write(src, BATCHES)
    state = str(tmp_path / "counts")
    _run(spark, src, state, str(tmp_path / "ckpt"))

    def snapshot():
        return sorted(
            tuple(r)
            for r in spark.read.parquet(state)
            .select("token", "c", "_last_batch_id", "_fold_tag", "_kp")
            .collect()
        )

    def files_per_prefix():
        return {
            d.name: sum(1 for f in d.iterdir() if f.name.startswith("part-"))
            for d in pathlib.Path(state).iterdir()
            if d.name.startswith("_kp=")
        }

    before = snapshot()
    vocab_before = textops.vocab_topk_from_counts(
        spark.read.parquet(state).drop("_last_batch_id", "_fold_tag"), k=3
    )
    compact_token_counts(spark, state)
    assert snapshot() == before
    assert all(n == 1 for n in files_per_prefix().values()), files_per_prefix()
    assert (
        textops.vocab_topk_from_counts(
            spark.read.parquet(state).drop("_last_batch_id", "_fold_tag"),
            k=3,
        )
        == vocab_before
    )
    compact_token_counts(spark, state)  # idempotent
    assert snapshot() == before


def test_token_counts_state_report(spark, tmp_path):
    from security_data_pipeline_spark.streaming.pipeline import (
        compact_token_counts,
        token_counts_state_report,
    )

    src = tmp_path / "in"
    _write(src, BATCHES)
    state = str(tmp_path / "counts")
    _run(spark, src, state, str(tmp_path / "ckpt"))

    rep = {
        r["prefix"]: r
        for r in token_counts_state_report(spark, state).collect()
    }
    # totals reconcile with the state itself
    n_tokens = sum(r["n_tokens"] for r in rep.values())
    total = sum(r["total_count"] for r in rep.values())
    assert n_tokens == 4 and total == 9  # alpha 3, beta 2, gamma 1, delta 3
    assert all(r["last_batch_id"] is not None for r in rep.values())
    # after compaction every prefix is single-file: no compact hints
    compact_token_counts(spark, state)
    rep2 = token_counts_state_report(spark, state).collect()
    assert all(r["n_files"] == 1 and not r["compact_hint"] for r in rep2)


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


def test_streamed_counts_feed_zipf_fit(spark, tmp_path):
    """The live corpus-naturalness gate: zipf_fit_from_counts over the
    streamed token-count state equals the batch zipf_fit over the
    cumulative input (same counts, same total order, same moments)."""
    src = tmp_path / "in"
    _write(src, BATCHES)
    state = str(tmp_path / "counts")
    _run(spark, src, state, str(tmp_path / "ckpt"))

    counts = spark.read.parquet(state).drop("_last_batch_id", "_fold_tag")
    streamed = textops.zipf_fit_from_counts(counts, top_k=10).collect()[0]
    cumulative = spark.createDataFrame(
        [r for b in BATCHES for r in b], "doc_id long, text string"
    )
    batch = textops.zipf_fit(cumulative, "text", top_k=10).collect()[0]
    assert tuple(streamed) == tuple(batch)
    assert streamed["n_ranked"] == 4
