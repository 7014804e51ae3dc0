"""Streaming line-level dedup maintenance (streaming/pipeline.py:
maintain_line_dedup_stream).

The contract under test: a batch-k document's emitted cleaned text equals
the batch operator (`dedup.remove_duplicated_lines`, scope="any",
min_ids=2) run over the CUMULATIVE corpus through batch k, restricted to
batch-k docs; replays of committed batches never re-deliver; the line-key
index never duplicates keys and stays Bloom-visible; and a batch whose
every line is already indexed (an empty per-batch index dir — _SUCCESS,
no footers) does not wedge the next batch's index read.
"""

from __future__ import annotations

import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from security_data_pipeline_spark.operators import bloom, dedup
from security_data_pipeline_spark.streaming.pipeline import (
    maintain_line_dedup_stream,
)

BATCHES = [
    # within-batch dup: docs 1 and 2 share the line "BOILER"
    [(1, "keep one\nBOILER\nmine"), (2, "BOILER\nsecond doc")],
    # cross-batch dup: doc 3 repeats doc 1's "keep one"; doc 4 is fresh
    [(3, "fresh\nkeep one"), (4, "totally new\nlines here")],
    # doc 5 repeats doc 4 wholesale; doc 6 is fresh
    [(5, "totally new\nlines here"), (6, "solo")],
]


def _write_batches(src, batches):
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


def _run(spark, src, state, ckpt, out):
    def sink(df, batch_id):
        df.withColumn("_bid", F.lit(batch_id)).write.mode("append").parquet(
            out
        )

    q = maintain_line_dedup_stream(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src)),
        state,
        ckpt,
        sink,
        pfx_mod=16,
        m_bits=1 << 12,
    )
    q.awaitTermination(180)


def test_streaming_lines_equal_cumulative_prefix_recompute(spark, tmp_path):
    src = tmp_path / "in"
    _write_batches(src, BATCHES)
    out = str(tmp_path / "out")
    _run(spark, src, str(tmp_path / "lines"), str(tmp_path / "ckpt"), out)

    got = spark.read.parquet(out)
    doc_batch = {r[0]: bi for bi, rows in enumerate(BATCHES) for r in rows}
    for bi in range(len(BATCHES)):
        prefix = [r for b in BATCHES[: bi + 1] for r in b]
        cumulative = spark.createDataFrame(prefix, ["doc_id", "text"])
        expect = {
            (r["doc_id"], r["clean_text"], r["n_lines"], r["n_lines_removed"])
            for r in dedup.remove_duplicated_lines(
                cumulative, scope="any", min_ids=2
            ).collect()
            if doc_batch[r["doc_id"]] == bi
        }
        batch_got = {
            (r["doc_id"], r["clean_text"], r["n_lines"], r["n_lines_removed"])
            for r in got.filter(F.col("_bid") == bi).collect()
        }
        assert batch_got == expect, (bi, batch_got, expect)
    # spelled out: the within-batch boilerplate goes at batch 0; doc 3
    # loses the cross-batch repeat; doc 5 is wholesale boilerplate; docs
    # 4 and 6 are never retro-edited
    all_got = {
        (r["doc_id"], r["clean_text"]) for r in got.collect()
    }
    assert all_got == {
        (1, "keep one\nmine"),
        (2, "second doc"),
        (3, "fresh"),
        (4, "totally new\nlines here"),
        (5, ""),
        (6, "solo"),
    }, all_got


def test_streaming_line_replay_skips_sink_index_stays_distinct(
    spark, tmp_path
):
    src = tmp_path / "in"
    _write_batches(src, BATCHES)
    out = str(tmp_path / "out")
    state = str(tmp_path / "lines")
    ckpt = str(tmp_path / "ckpt")
    _run(spark, src, state, ckpt, out)
    first = sorted(
        (r["doc_id"], r["clean_text"])
        for r in spark.read.parquet(out).collect()
    )

    shutil.rmtree(ckpt)
    _run(spark, src, state, ckpt, out)
    replay = sorted(
        (r["doc_id"], r["clean_text"])
        for r in spark.read.parquet(out).collect()
    )
    assert replay == first, "replay re-delivered cleaned docs"

    keys = spark.read.parquet(state).select("gram")
    assert keys.count() == keys.distinct().count()
    # every indexed key is Bloom-visible (the superset invariant)
    words = spark.read.parquet(state + "__bloom").select("i", "w")
    bf = bloom.bloom_filter_frame(words, None, 1 << 12, 3)
    missed = (
        keys.crossJoin(F.broadcast(bf))
        .filter(
            ~bloom.bloom_contains(F.col("gram"), F.col("bloom"), 1 << 12, 3)
        )
        .count()
    )
    assert missed == 0


def test_all_duplicate_batch_leaves_index_readable(spark, tmp_path):
    """A batch whose EVERY line is already in the corpus writes an empty
    per-batch index dir (_SUCCESS, zero parquet footers — the same
    committed-but-empty shape as the span stream's all-short-docs batch).
    The guarded index read must treat it as contributing nothing and the
    stream must keep matching afterwards."""
    src = tmp_path / "in"
    batches = [
        [(1, "alpha\nbeta")],
        [(2, "alpha\nbeta")],  # both lines already indexed -> 0 new keys
        [(3, "beta\ngamma")],  # still matches the corpus after batch 2
    ]
    _write_batches(src, batches)
    out = str(tmp_path / "out")
    _run(spark, src, str(tmp_path / "lines"), str(tmp_path / "ckpt"), out)
    got = {
        (r["doc_id"], r["clean_text"], r["n_lines_removed"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {
        (1, "alpha\nbeta", 0),
        (2, "", 2),
        (3, "gamma", 1),
    }, got


def test_ccnet_normalization_in_stream(spark, tmp_path):
    """normalize='ccnet' keys match across case/digit/punct variants —
    the later variant is dropped even though its raw text is new."""
    src = tmp_path / "in"
    batches = [
        [(1, "Hello, World 123!\nmine")],
        [(2, "hello world\nyours")],
    ]
    _write_batches(src, batches)
    out = str(tmp_path / "out")

    def sink(df, batch_id):
        df.write.mode("append").parquet(out)

    q = maintain_line_dedup_stream(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src)),
        str(tmp_path / "lines"),
        str(tmp_path / "ckpt"),
        sink,
        normalize="ccnet",
        pfx_mod=16,
        m_bits=1 << 12,
    )
    q.awaitTermination(180)
    got = {
        (r["doc_id"], r["clean_text"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {(1, "Hello, World 123!\nmine"), (2, "yours")}, got


def test_consolidated_line_index_keeps_matching(spark, tmp_path):
    """The generic streamed-index compaction works on the line-key index:
    after folding the per-batch dirs into one generation, a resumed
    stream still matches against everything ingested before compaction."""
    from security_data_pipeline_spark.streaming.pipeline import (
        consolidate_stream_index,
    )

    src = tmp_path / "in"
    _write_batches(src, BATCHES[:2])
    out = str(tmp_path / "out")
    state = str(tmp_path / "lines")
    ckpt = str(tmp_path / "ckpt")
    _run(spark, src, state, ckpt, out)

    report = consolidate_stream_index(spark, state, "_pfx", distinct=True)
    assert report["files_after"] <= report["files_before"]
    assert report["rows"] > 0

    # batch 2 arrives after compaction; doc 5 repeats doc 4's lines from
    # the PRE-compaction corpus and must still be fully cleaned
    f = src / "b2.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": [r[0] for r in BATCHES[2]],
                "text": [r[1] for r in BATCHES[2]],
            }
        ),
        f,
    )
    os.utime(f, None)
    _run(spark, src, state, ckpt, out)
    got = {
        (r["doc_id"], r["clean_text"])
        for r in spark.read.parquet(out).collect()
        if r["doc_id"] in (5, 6)
    }
    assert got == {(5, ""), (6, "solo")}, got
