"""Streaming span-dedup maintenance (streaming/pipeline.py:
maintain_span_dedup_stream + span_corpus_matches).

The contract under test: a batch-k document's emitted spans equal the
batch operator (`dedup.duplicated_spans`) run over the CUMULATIVE corpus
through batch k, restricted to batch-k docs; replays of committed
batches never re-deliver; the gram index never duplicates grams; and the
100 TB plan shape holds — the persisted gram index is read with
directory pruning bounded by the Bloom-positive candidate set and no
Exchange ever holds the index.
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
    _gram_pfx,
    maintain_span_dedup_stream,
    span_corpus_matches,
)

N = 4

BATCHES = [
    # within-batch dup: docs 1 and 2 share "a b c d"
    [(1, "a b c d e f"), (2, "a b c d z w")],
    # cross-batch dup: doc 3 embeds doc 1's "a b c d e"; doc 4 is fresh
    [(3, "x y a b c d e q"), (4, "fresh words only here now")],
    # doc 5 repeats doc 4 wholesale; doc 6 is fresh and short
    [(5, "fresh words only here now"), (6, "tiny")],
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
        # pin strictly increasing mtimes so file-source batch order (and
        # therefore first-seen semantics) is deterministic
        os.utime(f, (base + bi, base + bi))


def _run(spark, src, state, ckpt, out):
    def sink(df, batch_id):
        df.withColumn("_bid", F.lit(batch_id)).write.mode("append").parquet(
            out
        )

    q = maintain_span_dedup_stream(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src)),
        state,
        ckpt,
        sink,
        n=N,
        pfx_mod=16,
        m_bits=1 << 12,
    )
    q.awaitTermination(180)


def test_streaming_spans_equal_cumulative_prefix_recompute(spark, tmp_path):
    src = tmp_path / "in"
    _write_batches(src, BATCHES)
    out = str(tmp_path / "out")
    state = str(tmp_path / "grams")
    _run(spark, src, state, str(tmp_path / "ckpt"), out)

    got = spark.read.parquet(out)
    # batch ids may be assigned in arrival order 0..2; map doc->batch
    doc_batch = {r[0]: bi for bi, rows in enumerate(BATCHES) for r in rows}
    for bi in range(len(BATCHES)):
        prefix = [r for b in BATCHES[: bi + 1] for r in b]
        cumulative = spark.createDataFrame(prefix, ["doc_id", "text"])
        expect = {
            (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
            for r in dedup.duplicated_spans(cumulative, n=N).collect()
            if doc_batch[r["doc_id"]] == bi
        }
        batch_got = {
            (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
            for r in got.filter(F.col("_bid") == bi).collect()
        }
        assert batch_got == expect, (bi, batch_got, expect)
    # the concrete expectations, spelled out: batch 0 finds the shared
    # 4-token prefix; batch 1 annotates doc 3's embedded 5-token run;
    # batch 2 flags doc 5 wholesale and never retro-annotates doc 4
    all_got = {
        (r["doc_id"], r["span_start"], r["span_end"]) for r in got.collect()
    }
    assert all_got == {
        (1, 0, 3),
        (2, 0, 3),
        (3, 2, 6),
        (5, 0, 4),
    }, all_got


def test_streaming_span_replay_skips_sink_index_stays_distinct(
    spark, tmp_path
):
    src = tmp_path / "in"
    _write_batches(src, BATCHES)
    out = str(tmp_path / "out")
    state = str(tmp_path / "grams")
    ckpt = str(tmp_path / "ckpt")
    _run(spark, src, state, ckpt, out)
    first = sorted(
        (r["doc_id"], r["span_start"]) for r in spark.read.parquet(out).collect()
    )

    # full replay: checkpoint wiped, same path (same lineage) — committed
    # batch dirs skip the sink, the idempotent index dirs overwrite
    # themselves, the Bloom fold's stamped guard skips re-folds
    shutil.rmtree(ckpt)
    _run(spark, src, state, ckpt, out)
    replay = sorted(
        (r["doc_id"], r["span_start"]) for r in spark.read.parquet(out).collect()
    )
    assert replay == first, "replay re-delivered spans"

    # the gram index holds each distinct corpus gram exactly once
    grams = spark.read.parquet(state).select("gram")
    assert grams.count() == grams.distinct().count()
    # every indexed gram is Bloom-visible (the superset invariant that
    # makes the candidate gate safe)
    words = spark.read.parquet(state + "__bloom").select("i", "w")
    bf = bloom.bloom_filter_frame(words, None, 1 << 12, 3)
    missed = (
        grams.crossJoin(F.broadcast(bf))
        .filter(
            ~bloom.bloom_contains(F.col("gram"), F.col("bloom"), 1 << 12, 3)
        )
        .count()
    )
    assert missed == 0


def test_all_short_doc_batches_leave_index_readable(spark, tmp_path):
    """Committed-but-empty index state must not wedge the stream: a batch
    of only sub-n-token docs writes a gram dir holding just _SUCCESS (a
    partitioned write of zero rows emits no parquet footers) while the
    non-partitioned Bloom state keeps a schema file — so the NEXT batch's
    unguarded index read would die on UNABLE_TO_INFER_SCHEMA and every
    replay would re-crash on the same line. The guarded read treats the
    schemaless index as empty (exact, by the Bloom ⊇ index invariant) and
    the stream keeps running; once real grams land, cross-batch matching
    works as usual."""
    src = tmp_path / "in"
    batches = [
        [(1, "ab"), (2, "x y z")],  # all shorter than N=4 tokens: 0 grams
        [(3, "p q r s t"), (4, "p q r s u")],  # within-batch 4-gram dup
        [(5, "m p q r s t m")],  # cross-batch: repeats doc 3's run
    ]
    _write_batches(src, batches)
    out = str(tmp_path / "out")
    _run(spark, src, str(tmp_path / "grams"), str(tmp_path / "ckpt"), out)
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {(3, 0, 3), (4, 0, 3), (5, 1, 5)}, got


def test_span_gram_probe_prunes_and_never_shuffles_index(spark, tmp_path):
    """The 100 TB contract of the gram-index probe: directory pruning via
    the candidates' bounded prefix list (PartitionFilters on _pfx), the
    candidate set broadcast, and NO shuffle Exchange anywhere — the
    token-scale index is only ever a map-side scan."""
    corpus = spark.createDataFrame(
        [(i, f"g{i} h{i} j{i} k{i}") for i in range(64)],
        "doc_id long, text string",
    )
    all_grams = (
        dedup.positional_grams(corpus, n=N).select("gram").distinct()
    )
    root = str(tmp_path / "grams")
    all_grams.withColumn("_pfx", _gram_pfx(16)).write.partitionBy(
        "_pfx"
    ).parquet(root + "/_tag=tabc/batch=0")
    index = spark.read.parquet(root)

    cand = spark.createDataFrame(
        [("g3 h3 j3 k3",), ("nope nope nope nope",)], ["gram"]
    ).localCheckpoint()
    matched = span_corpus_matches(cand, index, 16)
    plan = matched._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "BroadcastHashJoin" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
    pruned_scans = [
        line
        for line in plan.splitlines()
        if "PartitionFilters" in line
        and "_pfx" in line
        and (" IN " in line or "INSET" in line)
    ]
    assert pruned_scans, plan
    assert [r["gram"] for r in matched.collect()] == ["g3 h3 j3 k3"]
