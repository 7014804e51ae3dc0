"""Streaming edge-set state (maintain_edge_set_stream): the graph
diagnostics read folded state instead of rescanning the corpus. The fold
must equal the batch recompute over the cumulative edge appends, replays
must be no-ops (distinct union is idempotent), and per-batch IO must
touch only the batch's prefixes."""

from __future__ import annotations

import os
import pathlib
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from security_data_pipeline_spark.operators import graph
from security_data_pipeline_spark.streaming.pipeline import (
    edge_state_edges,
    maintain_edge_set_stream,
)

# raw per-crawl appends: duplicates and reversed directions straddle the
# batch split on purpose — the canonical set union must neither drop nor
# double them
BATCHES = [
    [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("x", "x")],
    [("b", "a"), ("c", "e"), ("d", "e"), ("a", "c"), ("e", "c")],
]


def _write(src, batches):
    src.mkdir(parents=True, exist_ok=True)
    base = 1_700_000_000
    for bi, rows in enumerate(batches):
        f = src / f"b{bi}.parquet"
        pq.write_table(
            pa.table(
                {
                    "src": [r[0] for r in rows],
                    "dst": [r[1] for r in rows],
                }
            ),
            f,
        )
        os.utime(f, (base + bi, base + bi))


def _run(spark, src, state, ckpt, pfx_mod=8):
    q = maintain_edge_set_stream(
        spark.readStream.schema("src string, dst string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src)),
        state,
        ckpt,
        pfx_mod=pfx_mod,
    )
    q.awaitTermination(120)


def _batch_edges(spark, batches):
    rows = [r for b in batches for r in b]
    return graph.undirected_edges(
        spark.createDataFrame(rows, "src string, dst string")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streamed_edge_set_equals_batch(spark, tmp_path):
    src = tmp_path / "in"
    _write(src, BATCHES)
    state = str(tmp_path / "edges")
    _run(spark, src, state, str(tmp_path / "ckpt"))
    got = _rows(edge_state_edges(spark, state))
    want = _rows(_batch_edges(spark, BATCHES))
    assert got == want


def test_graph_diagnostics_from_state_equal_recompute(spark, tmp_path):
    """Triangles / clustering coefficients and PageRank over the folded
    state must be row-identical to the batch recompute over all appends —
    the read-state-instead-of-rescan contract."""
    src = tmp_path / "in"
    _write(src, BATCHES)
    state = str(tmp_path / "edges")
    _run(spark, src, state, str(tmp_path / "ckpt"))
    st = edge_state_edges(spark, state)
    full = _batch_edges(spark, BATCHES)

    got_cc = _rows(graph.clustering_coefficients(st, "u", "v"))
    want_cc = _rows(graph.clustering_coefficients(full, "u", "v"))
    assert got_cc == want_cc and len(got_cc) > 0

    got_pr = _rows(graph.pagerank(st, "u", "v", n_iter=3))
    want_pr = _rows(graph.pagerank(full, "u", "v", n_iter=3))
    assert got_pr == want_pr


def test_edge_set_replay_is_noop(spark, tmp_path):
    src = tmp_path / "in"
    _write(src, BATCHES)
    state = str(tmp_path / "edges")
    ckpt = str(tmp_path / "ckpt")
    _run(spark, src, state, ckpt)
    first = _rows(edge_state_edges(spark, state))
    shutil.rmtree(ckpt)
    _run(spark, src, state, ckpt)  # full replay: distinct union no-op
    assert _rows(edge_state_edges(spark, state)) == first


def test_edge_set_rewrites_touched_prefixes_only(spark, tmp_path):
    from security_data_pipeline_spark.streaming.pipeline import (
        locf_key_prefix,
    )

    probe = spark.createDataFrame(
        [(f"n{i}",) for i in range(32)], "u string"
    ).select("u", locf_key_prefix(["u"], 8).alias("_kp"))
    by_pfx = {}
    for r in probe.collect():
        by_pfx.setdefault(r["_kp"], []).append(r["u"])
    (p1, (u1, *_)), (p2, (u2, *_)) = list(by_pfx.items())[:2]

    src = tmp_path / "in"
    state = str(tmp_path / "edges")
    ckpt = str(tmp_path / "ckpt")

    # batch 0 touches both prefixes (u1 and u2 each own an edge)
    _write(src, [[(u1, "zz"), (u2, "zz")]])
    _run(spark, src, state, ckpt)

    def listing(pfx):
        d = pathlib.Path(state) / f"_kp={pfx}"
        return {
            f.name: (f.stat().st_size, f.stat().st_mtime_ns)
            for f in d.iterdir()
            if f.name.startswith("part-")
        }

    before_p1, before_p2 = listing(p1), listing(p2)

    # batch 1 touches ONLY u1's prefix: u2's directory must be untouched
    f = src / "b1.parquet"
    pq.write_table(pa.table({"src": [u1], "dst": ["zz2"]}), f)
    os.utime(f, (1_700_000_005, 1_700_000_005))
    _run(spark, src, state, ckpt)

    assert listing(p2) == before_p2, "untouched prefix was rewritten"
    assert listing(p1) != before_p1, "touched prefix was not rewritten"
