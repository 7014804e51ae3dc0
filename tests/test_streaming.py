"""Structured Streaming tests: session windows, stateful session ids, e2e
pipeline with foreachBatch — file source + availableNow trigger so runs are
deterministic and bounded."""

from __future__ import annotations

import pathlib

import pytest
from pyspark.sql import functions as F

from security_data_pipeline_spark.operators import features
from security_data_pipeline_spark.sources.raw_events import RAW_EVENTS_SCHEMA
from security_data_pipeline_spark.streaming import (
    read_raw_events_stream,
    run_streaming_pipeline,
    sessionize_with_state,
    session_window_stats,
)

CSV_HEADER = "event_id,timestamp,user_id,event_type,status,severity,source_ip"

ROWS_FILE1 = [
    "1,2025-01-01 00:00:00,alice,login,ok,high,1.1.1.1",
    "2,2025-01-01 00:10:00,alice,logout,ok,low,1.1.1.1",
    "3,2025-01-01 02:00:00,alice,login,ok,high,1.1.1.1",
    "4,2025-01-01 00:05:00,bob,login,ok,info,2.2.2.2",
]
ROWS_FILE2 = [
    "5,2025-01-01 02:05:00,alice,logout,ok,low,1.1.1.1",
    "6,2025-01-01 03:00:00,bob,login,ok,info,2.2.2.2",
    "2,2025-01-01 00:10:00,alice,logout,ok,low,1.1.1.1",  # duplicate id
]


@pytest.fixture()
def input_dir(tmp_path: pathlib.Path) -> str:
    d = tmp_path / "in"
    d.mkdir()
    (d / "f1.csv").write_text(CSV_HEADER + "\n" + "\n".join(ROWS_FILE1) + "\n")
    (d / "f2.csv").write_text(CSV_HEADER + "\n" + "\n".join(ROWS_FILE2) + "\n")
    return str(d)


def test_streaming_pipeline_end_to_end(spark, input_dir, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = run_streaming_pipeline(
        spark, input_dir, out, ckpt, gap="30 minutes", watermark="20 minutes"
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    rows = {
        (r.user_id, str(r.session_start), r.session_event_count)
        for r in got.collect()
    }
    # append semantics: a session emits once the watermark (max_ts - 20min =
    # 02:40) passes its window end. alice (00:00,00:10)→end 00:40 ✓,
    # alice (02:00,02:05)→02:35 ✓, bob 00:05→00:35 ✓; bob's 03:00 session
    # (window end 03:30) is still open when the availableNow run drains and
    # is correctly NOT emitted. Duplicate event 2 deduped.
    assert ("alice", "2025-01-01 00:00:00", 2) in rows
    assert ("alice", "2025-01-01 02:00:00", 2) in rows
    assert ("bob", "2025-01-01 00:05:00", 1) in rows
    assert len(rows) == 3


def test_session_window_stats_matches_batch_sessionization(spark, input_dir):
    # the same gap on the same data: session_window aggregates must agree
    # with the batch cumulative-sum sessionization stats
    batch = (
        spark.read.schema(RAW_EVENTS_SCHEMA)
        .option("header", True)
        .csv(input_dir)
        .dropDuplicates(["event_id"])
        .withColumn("timestamp", F.col("timestamp").cast("timestamp"))
    )
    win = session_window_stats(batch, gap="30 minutes")
    feat = features.add_session_features(batch, gap_minutes=30)
    batch_stats = (
        feat.groupBy("user_id", "session_id")
        .agg(
            F.count("event_id").alias("n"),
            F.min("timestamp").alias("start"),
        )
    )
    win_set = {
        (r.user_id, str(r.session_start), r.session_event_count)
        for r in win.collect()
    }
    batch_set = {
        (r.user_id, str(r.start), r.n) for r in batch_stats.collect()
    }
    assert win_set == batch_set


def test_sessionize_with_state_per_row_ids(spark, tmp_path):
    # dup-free, time-ordered files: the stateful sessionizer asserts exact
    # per-row ids and has no dedup of its own (that's an upstream stage)
    d = tmp_path / "in_state"
    d.mkdir()
    (d / "f1.csv").write_text(CSV_HEADER + "\n" + "\n".join(ROWS_FILE1) + "\n")
    (d / "f2.csv").write_text(
        CSV_HEADER + "\n"
        + "5,2025-01-01 02:05:00,alice,logout,ok,low,1.1.1.1\n"
        + "6,2025-01-01 03:00:00,bob,login,ok,info,2.2.2.2\n"
    )
    stream = read_raw_events_stream(spark, str(d), max_files_per_trigger=1)
    stream = stream.withColumn("timestamp", F.col("timestamp").cast("timestamp"))
    with_ids = sessionize_with_state(stream, gap_minutes=30)
    q = (
        with_ids.writeStream.format("memory")
        .queryName("sess_state")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.event_id): r.session_id
        for r in spark.sql("select * from sess_state").collect()
    }
    # file1 then file2 (maxFilesPerTrigger=1): alice 1,2 → session 1;
    # 3 (2h later) → session 2; 5 (02:05, next batch) → still session 2.
    assert got[("alice", 1)] == 1
    assert got[("alice", 2)] == 1
    assert got[("alice", 3)] == 2
    assert got[("alice", 5)] == 2
    assert got[("bob", 4)] == 1
    assert got[("bob", 6)] == 2


def test_windowed_counts_match_batch_daily(spark, sf_smoke):
    """Tumbling 1-day windows ≡ UTC date_trunc('DAY') bucketing (batch)."""
    from pyspark.sql import functions as F

    from security_data_pipeline_spark.sources.catalog import load_table
    from security_data_pipeline_spark.streaming.sessionize import (
        windowed_event_counts,
    )

    ev = load_table(spark, sf_smoke, "events").select(
        F.col("user_id"), F.col("ts").alias("timestamp")
    )
    win = {
        (r["user_id"], r["window_start"]): r["n_events"]
        for r in windowed_event_counts(ev, window="1 day").collect()
    }
    ref = {
        (r["user_id"], r["d"]): r["n"]
        for r in ev.groupBy(
            "user_id", F.date_trunc("DAY", "timestamp").alias("d")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert win == ref


def test_sessionize_with_state_v2_matches_v1(spark, tmp_path):
    """transformWithStateInPandas form: same per-row ids as the
    applyInPandasWithState form on the same two-batch stream. When the TWS
    python runtime is unavailable (protobuf not installed) v2 must
    dispatch to the v1 operator — the documented primary — with identical
    results and NO warning; this test runs and asserts the same ids on
    EITHER runtime, so the contract (not the import) is what's verified."""
    from security_data_pipeline_spark.streaming.sessionize import (
        sessionize_with_state_v2,
        tws_runtime_available,
    )

    d = tmp_path / "in_state_v2"
    d.mkdir()
    (d / "f1.csv").write_text(CSV_HEADER + "\n" + "\n".join(ROWS_FILE1) + "\n")
    (d / "f2.csv").write_text(
        CSV_HEADER + "\n"
        + "5,2025-01-01 02:05:00,alice,logout,ok,low,1.1.1.1\n"
        + "6,2025-01-01 03:00:00,bob,login,ok,info,2.2.2.2\n"
    )
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    try:
        if tws_runtime_available():
            # the TWS operator requires the RocksDB state store provider
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass",
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider",
            )
        stream = read_raw_events_stream(spark, str(d), max_files_per_trigger=1)
        stream = stream.withColumn(
            "timestamp", F.col("timestamp").cast("timestamp")
        )
        with_ids = sessionize_with_state_v2(stream, gap_minutes=30)
        q = (
            with_ids.writeStream.format("memory")
            .queryName("sess_state_v2")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_v2"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r.user_id, r.event_id): r.session_id
            for r in spark.sql("select * from sess_state_v2").collect()
        }
        assert got[("alice", 1)] == 1
        assert got[("alice", 2)] == 1
        assert got[("alice", 3)] == 2
        assert got[("alice", 5)] == 2
    finally:
        if prev is not None:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_dedup_stream_by_content_drops_refetched_doc(spark, tmp_path):
    """Content-fingerprint streaming dedup: a re-ingested document whose
    text canonicalizes to an already-seen fingerprint is dropped (first
    arrival survives); distinct docs pass through."""
    import json

    from pyspark.sql import types as T

    from security_data_pipeline_spark.streaming.pipeline import (
        dedup_stream_by_content,
    )

    d = tmp_path / "docs_in"
    d.mkdir()
    f1 = [
        {"doc_id": 1, "text": "alpha beta", "timestamp": "2025-01-01 01:00:00"},
        {"doc_id": 2, "text": "gamma delta", "timestamp": "2025-01-01 01:05:00"},
    ]
    f2 = [
        # same fingerprint as doc 1 after canonicalization (case + spaces)
        {"doc_id": 3, "text": " Alpha  BETA ", "timestamp": "2025-01-01 01:10:00"},
        {"doc_id": 4, "text": "epsilon", "timestamp": "2025-01-01 01:15:00"},
    ]
    (d / "f1.json").write_text("\n".join(json.dumps(r) for r in f1) + "\n")
    (d / "f2.json").write_text("\n".join(json.dumps(r) for r in f2) + "\n")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("timestamp", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(str(d))
        .withColumn("timestamp", F.col("timestamp").cast("timestamp"))
    )
    out = dedup_stream_by_content(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("docs_dedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dd"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ids = {r.doc_id for r in spark.sql("select * from docs_dedup").collect()}
    assert ids == {1, 2, 4}


def test_enrich_stream_static_broadcast_join(spark, input_dir, tmp_path):
    from security_data_pipeline_spark.streaming import (
        enrich_stream,
        read_raw_events_stream,
    )

    dim = spark.createDataFrame(
        [("alice", "eng"), ("bob", "sales")], ["user_id", "org"]
    )
    stream = read_raw_events_stream(spark, input_dir)
    enriched = enrich_stream(stream, dim, on="user_id")
    q = (
        enriched.writeStream.format("memory")
        .queryName("enriched_mem")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT user_id, org FROM enriched_mem").collect()
    got = {(r.user_id, r.org) for r in rows}
    assert ("alice", "eng") in got and ("bob", "sales") in got
    assert all(org in ("eng", "sales") for _, org in got)


def test_enrich_stream_with_cidrs_picks_up_feed_update(spark, tmp_path):
    """Streaming LPM enrichment re-reads the CIDR feed every micro-batch:
    a feed rewrite landing between triggers must show in the next batch's
    labels without restarting the query (the threat-feed refresh path)."""
    import os

    from security_data_pipeline_spark.streaming import enrich_stream_with_cidrs

    events_dir = tmp_path / "events"
    feed_dir = str(tmp_path / "feed")
    events_dir.mkdir()

    # two input files with distinct mtimes → availableNow processes them as
    # two ordered micro-batches (file source sorts by modification time)
    spark.createDataFrame([(1, 100)], "event_id long, ip long").coalesce(
        1
    ).write.parquet(str(events_dir / "f0"))
    spark.createDataFrame([(2, 200)], "event_id long, ip long").coalesce(
        1
    ).write.parquet(str(events_dir / "f1"))
    now = 1_700_000_000
    for i, d in enumerate(("f0", "f1")):
        for root, _, files in os.walk(events_dir / d):
            for f in files:
                os.utime(os.path.join(root, f), (now + i * 10, now + i * 10))

    def write_feed(label: str) -> None:
        spark.createDataFrame(
            [(0, 1, label)], "prefix long, prefix_len int, label string"
        ).coalesce(1).write.mode("overwrite").parquet(feed_dir)

    write_feed("feed-v1")
    seen: list[tuple[int, int, str]] = []

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            seen.append((batch_id, r["event_id"], r["label"]))
        write_feed("feed-v2")  # refresh lands after this batch commits

    stream = (
        spark.readStream.schema("event_id long, ip long")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(events_dir) + "/*")
    )
    q = enrich_stream_with_cidrs(
        stream,
        cidr_path=feed_dir,
        checkpoint_path=str(tmp_path / "ckpt"),
        sink=sink,
    )
    q.awaitTermination(120)
    by_event = {e: (b, label) for b, e, label in seen}
    assert by_event[1] == (0, "feed-v1")
    assert by_event[2] == (1, "feed-v2")


def test_enrich_stream_with_cidrs_ipv6_family(spark, tmp_path):
    """family='ipv6' routes each micro-batch through the 128-bit LPM join
    (hi/lo long keys) with the same zero-state foreachBatch shape."""
    from security_data_pipeline_spark.streaming import enrich_stream_with_cidrs

    events_dir = tmp_path / "events6"
    feed_dir = str(tmp_path / "feed6")
    events_dir.mkdir()
    # 2001:db8::5 → hi = 0x20010db8 << 32, lo = 5
    hi = 0x20010DB8 << 32
    spark.createDataFrame(
        [(1, hi, 5), (2, -(1 << 63), 0)],
        "event_id long, ip_hi long, ip_lo long",
    ).coalesce(1).write.parquet(str(events_dir / "f0"))
    spark.createDataFrame(
        [(hi, 0, 32, "site")],
        "prefix_hi long, prefix_lo long, prefix_len int, label string",
    ).coalesce(1).write.parquet(feed_dir)

    seen: dict[int, str] = {}

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            seen[r["event_id"]] = r["label"]

    q = enrich_stream_with_cidrs(
        spark.readStream.schema("event_id long, ip_hi long, ip_lo long")
        .parquet(str(events_dir) + "/*"),
        cidr_path=feed_dir,
        checkpoint_path=str(tmp_path / "ckpt6"),
        sink=sink,
        family="ipv6",
    )
    q.awaitTermination(120)
    assert seen == {1: "site", 2: None}


def test_windowed_counts_drop_data_later_than_watermark(spark, tmp_path):
    """A row arriving after the watermark passed its window is dropped —
    the state-bounding semantics batch never exercises (SURVEY §2.10)."""
    import os
    import time

    from security_data_pipeline_spark.streaming.pipeline import (
        read_raw_events_stream,
    )
    from security_data_pipeline_spark.streaming.sessionize import (
        windowed_event_counts,
    )

    d = tmp_path / "late_in"
    d.mkdir()
    f1 = d / "f1.csv"
    f2 = d / "f2.csv"
    f3 = d / "f3.csv"
    f1.write_text(
        CSV_HEADER
        + "\n1,2025-01-02 01:00:00,alice,login,ok,low,1.1.1.1"
        + "\n2,2025-01-02 01:10:00,alice,login,ok,low,1.1.1.1\n"
    )
    f2.write_text(
        CSV_HEADER + "\n3,2025-01-02 01:20:00,alice,login,ok,low,1.1.1.1\n"
    )
    f3.write_text(
        CSV_HEADER
        # 23:30 previous day: its 1h window [23:00, 00:00) ended before the
        # late-event watermark in batch 2 (batch-1's value, 01:00 — Spark
        # filters late rows with the PREVIOUS batch's watermark, one batch
        # behind the eviction watermark) → must be dropped
        + "\n4,2025-01-01 23:30:00,alice,login,ok,low,1.1.1.1"
        + "\n5,2025-01-02 01:40:00,alice,login,ok,low,1.1.1.1\n"
    )
    now = time.time()
    os.utime(f1, (now - 240, now - 240))  # force file → batch order
    os.utime(f2, (now - 120, now - 120))
    os.utime(f3, (now, now))

    raw = read_raw_events_stream(spark, str(d), max_files_per_trigger=1)
    raw = raw.withColumn("timestamp", F.col("timestamp").cast("timestamp"))
    counts = windowed_event_counts(raw, window="1 hour", watermark="10 minutes")
    q = (
        counts.writeStream.format("memory")
        .queryName("late_mem")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "late_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT window_start, MAX(n_events) AS n FROM late_mem GROUP BY 1"
    ).collect()
    got = {str(r.window_start): r.n for r in rows}
    # only the on-time window exists; the late 23:00 window never appears
    assert got == {"2025-01-02 01:00:00": 4}


def test_stream_stream_join_within_time_bound(spark, tmp_path):
    """Clicks joined to purchases within 30 min — the time-range condition
    both matches correctly and bounds the join state."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from security_data_pipeline_spark.streaming import stream_stream_join

    clicks_dir = tmp_path / "clicks"
    buys_dir = tmp_path / "buys"
    clicks_dir.mkdir()
    buys_dir.mkdir()
    (clicks_dir / "c.csv").write_text(
        "click_id,user_id,click_ts\n"
        "1,alice,2025-01-01 10:00:00\n"
        "2,bob,2025-01-01 10:05:00\n"
        "3,alice,2025-01-01 12:00:00\n"
    )
    (buys_dir / "b.csv").write_text(
        "buy_id,user_id,buy_ts\n"
        "10,alice,2025-01-01 10:20:00\n"   # within 30m of click 1
        "11,bob,2025-01-01 11:00:00\n"     # 55m after click 2 → no match
        "12,alice,2025-01-01 12:10:00\n"   # within 30m of click 3
    )
    c_schema = StructType(
        [
            StructField("click_id", LongType()),
            StructField("user_id", StringType()),
            StructField("click_ts", StringType()),
        ]
    )
    b_schema = StructType(
        [
            StructField("buy_id", LongType()),
            StructField("user_id", StringType()),
            StructField("buy_ts", StringType()),
        ]
    )
    clicks = (
        spark.readStream.schema(c_schema)
        .option("header", True)
        .csv(str(clicks_dir))
        .withColumn("click_ts", F.col("click_ts").cast("timestamp"))
    )
    buys = (
        spark.readStream.schema(b_schema)
        .option("header", True)
        .csv(str(buys_dir))
        .withColumn("buy_ts", F.col("buy_ts").cast("timestamp"))
        .withColumnRenamed("user_id", "buyer_id")
    )
    joined = stream_stream_join(
        clicks.withColumnRenamed("user_id", "u"),
        buys.withColumnRenamed("buyer_id", "u"),
        on=["u"],
        left_ts="click_ts",
        right_ts="buy_ts",
        within="30 minutes",
    )
    q = (
        joined.select("click_id", "buy_id")
        .writeStream.format("memory")
        .queryName("ssj_mem")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ssj_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.click_id, r.buy_id)
        for r in spark.sql("SELECT * FROM ssj_mem").collect()
    }
    assert got == {(1, 10), (3, 12)}


def test_streaming_drift_gate_equals_batch_per_cumulative_data(spark, tmp_path):
    """Per-batch PSI/KS from the folded count state must equal the batch
    value_drift on (reference, all stream data so far) — counts are the
    sufficient statistic, so the stream pays per-batch aggregates while
    reporting the exact batch answer."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from security_data_pipeline_spark.operators.drift import value_drift
    from security_data_pipeline_spark.streaming.pipeline import (
        maintain_drift_stream,
    )

    rng = random.Random(5)
    ref_rows = [
        ("a", rng.gauss(0.0, 1.0)) for _ in range(1500)
    ] + [("b", rng.uniform(0.0, 10.0)) for _ in range(1000)]
    ref = spark.createDataFrame(ref_rows, "grp string, v double")

    batches = [
        [("a", rng.gauss(0.2 * i, 1.0)) for _ in range(400)]
        + [("b", rng.uniform(0.0, 10.0 + 2.0 * i)) for _ in range(300)]
        for i in range(3)
    ]
    src = tmp_path / "in"
    src.mkdir()
    for bi, rows in enumerate(batches):
        pq.write_table(
            pa.table(
                {"grp": [r[0] for r in rows], "v": [r[1] for r in rows]}
            ),
            src / f"b{bi}.parquet",
        )
    stream = (
        spark.readStream.schema("grp string, v double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    state = str(tmp_path / "state")
    q = maintain_drift_stream(
        stream,
        ref,
        state,
        str(tmp_path / "ckpt"),
        value_col="v",
        group_cols=["grp"],
        n_bins=10,
        ks_grid=256,
    )
    q.awaitTermination(120)

    got = {
        r["grp"]: (r["n_ref"], r["n_cur"], r["psi"], r["ks"])
        for r in spark.read.parquet(f"{state}__psi").collect()
    }
    all_cur = spark.createDataFrame(
        [r for rows in batches for r in rows], "grp string, v double"
    )
    want = {
        r["grp"]: (r["n_ref"], r["n_cur"], r["psi"], r["ks"])
        for r in value_drift(
            ref, all_cur, "v", ["grp"], n_bins=10, ks_grid=256
        ).collect()
    }
    assert got == want
    assert got["a"][2] > 0.02  # the shift is actually detected
    # state stays bounded: <= |groups| * (n_bins + grid + 2) count rows
    n_state = spark.read.parquet(state).count()
    assert n_state <= 2 * (10 + 256 + 2)


def test_streaming_neardup_labels_equal_batch_recompute(spark, tmp_path):
    """The streaming dedup loop (band-index join + incremental components
    per batch) must end at EXACTLY the labeling a batch recompute over the
    cumulative corpus produces — across within-batch dups, cross-batch
    dups, and chains that merge clusters created in earlier batches."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from security_data_pipeline_spark.operators import dedup
    from security_data_pipeline_spark.streaming.pipeline import (
        maintain_neardup_stream,
    )

    def doc(seed: int, extra: str = "") -> str:
        words = [f"w{seed}x{i}" for i in range(12)]
        return " ".join(words) + (" " + extra if extra else "")

    batches = [
        [(0, doc(0)), (1, doc(0, "tail")), (2, doc(7)), (3, doc(9))],
        [(4, doc(0, "other")), (5, doc(7, "tail")), (6, doc(11))],
        [(7, doc(9, "x")), (8, doc(11, "y")), (9, doc(0))],
    ]
    src = tmp_path / "in"
    src.mkdir()
    for bi, rows in enumerate(batches):
        pq.write_table(
            pa.table(
                {
                    "doc_id": [r[0] for r in rows],
                    "text": [r[1] for r in rows],
                }
            ),
            src / f"b{bi}.parquet",
        )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    state = str(tmp_path / "labels")
    q = maintain_neardup_stream(
        stream,
        state,
        str(tmp_path / "ckpt"),
        verify_threshold=0.3,
    )
    q.awaitTermination(180)

    got = {
        (r["doc_id"], r["cluster_id"])
        for r in spark.read.parquet(state)
        .select("doc_id", "cluster_id")
        .collect()
    }
    all_docs = spark.createDataFrame(
        [r for rows in batches for r in rows], "doc_id long, text string"
    )
    edges = dedup.minhash_lsh_pairs(all_docs, verify_threshold=0.3)
    want = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup.connected_components(
            edges, all_docs, id_col="doc_id"
        ).collect()
    }
    assert got == want
    # sanity: the test actually exercises non-trivial merges
    clusters = {}
    for d, c in want:
        clusters.setdefault(c, set()).add(d)
    assert any(len(v) >= 3 for v in clusters.values())
    assert len(clusters) < 10

    # compact the band index's per-batch trees, then keep ingesting on a
    # fresh lineage: the consolidated index must behave identically
    from security_data_pipeline_spark.streaming.pipeline import (
        consolidate_stream_index,
    )

    report = consolidate_stream_index(spark, f"{state}__bands", "_pk")
    assert report["rows"] > 0
    batch4 = [(10, doc(0, "again")), (11, doc(42))]
    pq.write_table(
        pa.table(
            {
                "doc_id": [r[0] for r in batch4],
                "text": [r[1] for r in batch4],
            }
        ),
        src / "b3.parquet",
    )
    q2 = maintain_neardup_stream(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src)),
        state,
        str(tmp_path / "ckpt2"),
        verify_threshold=0.3,
    )
    q2.awaitTermination(180)
    got4 = {
        (r["doc_id"], r["cluster_id"])
        for r in spark.read.parquet(state)
        .select("doc_id", "cluster_id")
        .collect()
    }
    all4 = spark.createDataFrame(
        [r for rows in batches for r in rows] + batch4,
        "doc_id long, text string",
    )
    edges4 = dedup.minhash_lsh_pairs(all4, verify_threshold=0.3)
    want4 = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup.connected_components(
            edges4, all4, id_col="doc_id"
        ).collect()
    }
    assert got4 == want4
    assert (10, 0) in got4  # doc 10 joined doc 0's cluster POST-compaction


def test_streaming_dedup_against_corpus_never_readmits(spark, tmp_path):
    """A document seen in ANY earlier batch (not just the watermark
    horizon) must not survive again; within-batch dups keep the lowest
    id; the survivor set equals the batch keep-first over everything."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from security_data_pipeline_spark.streaming.pipeline import (
        dedup_stream_against_corpus,
    )

    batches = [
        [(1, "alpha beta gamma"), (2, "alpha  BETA gamma"), (3, "delta x")],
        [(4, "ALPHA beta gamma"), (5, "epsilon y")],
        [(6, "delta x"), (7, "epsilon y"), (8, "zeta new")],
    ]
    src = tmp_path / "in"
    src.mkdir()
    import os
    import time

    base = time.time() - 100
    for bi, rows in enumerate(batches):
        f = src / f"b{bi}.parquet"
        pq.write_table(
            pa.table(
                {"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}
            ),
            f,
        )
        # the file source orders batches by modification time; quick
        # successive writes can tie, making arrival order (and therefore
        # first-seen-wins) nondeterministic — pin strictly increasing mtimes
        os.utime(f, (base + bi, base + bi))
    out = str(tmp_path / "out")

    def sink(df, batch_id):
        df.write.mode("append").parquet(out)

    q = dedup_stream_against_corpus(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src)),
        str(tmp_path / "fps"),
        str(tmp_path / "ckpt"),
        sink,
    )
    q.awaitTermination(120)
    survivors = sorted(
        r["doc_id"] for r in spark.read.parquet(out).collect()
    )
    # 1 survives (2 and 4 are case/space variants of it), 3, 5, 8
    assert survivors == [1, 3, 5, 8]


def test_corpus_fingerprint_join_prunes_and_never_shuffles_index(
    spark, tmp_path
):
    """The 100 TB contract of dedup_stream_against_corpus: the persisted
    fingerprint index is read with directory pruning (PartitionFilters on
    the bounded _pfx prefix) and NO shuffle Exchange ever holds the index
    — both joins broadcast batch-sized sides only."""
    from security_data_pipeline_spark.operators.textops import fingerprint
    from security_data_pipeline_spark.streaming.pipeline import (
        _fp_pfx,
        corpus_fresh_rows,
    )

    corpus = spark.createDataFrame(
        [(i, f"historic doc number {i}") for i in range(64)],
        "doc_id long, text string",
    ).withColumn("_fp", fingerprint("text"))
    root = str(tmp_path / "fps")
    corpus.select("_fp", _fp_pfx().alias("_pfx")).write.partitionBy(
        "_pfx"
    ).parquet(root + "/_tag=tabc/batch=0")
    index = spark.read.parquet(root)

    batch = spark.createDataFrame(
        [(i, f"historic doc number {i}") for i in range(60, 70)],
        "doc_id long, text string",
    ).withColumn("_fp", fingerprint("text"))
    fresh = corpus_fresh_rows(batch, index)
    plan = fresh._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2, plan
    # no shuffle anywhere in this subplan: only broadcast exchanges
    assert "Exchange hashpartitioning" not in plan, plan
    pruned_scans = [
        line
        for line in plan.splitlines()
        if "PartitionFilters" in line
        and "_pfx" in line
        and (" IN " in line or "INSET" in line)
    ]
    assert pruned_scans, plan
    # and it still computes the right answer
    assert sorted(r["doc_id"] for r in fresh.collect()) == [64, 65, 66, 67, 68, 69]


def test_band_index_join_prunes_and_never_shuffles_index(spark, tmp_path):
    """Same contract for maintain_neardup_stream's band index: pruned
    directory read, batch band frame broadcast, no sort-merge join; the
    only hash exchange is the candidate-pair dedup (bounded by cross-side
    bucket co-occupancy, i.e. batch-sized)."""
    from pyspark.sql import functions as F

    from security_data_pipeline_spark.operators import dedup
    from security_data_pipeline_spark.streaming.pipeline import (
        _band_pk,
        prune_band_index,
    )

    def doc(seed: int, extra: str = "") -> str:
        return " ".join(f"w{seed}x{i}" for i in range(12)) + (
            " " + extra if extra else ""
        )

    corpus = spark.createDataFrame(
        [(i, doc(i)) for i in range(30)], "doc_id long, text string"
    )
    bb_all = dedup._minhash_band_frame(
        corpus, "doc_id", "text", 5, 32, 8, True, False
    )
    root = str(tmp_path / "bands")
    bb_all.withColumn("_pk", _band_pk(32)).write.partitionBy("_pk").parquet(
        root + "/_tag=tabc/batch=0"
    )
    index = spark.read.parquet(root)

    batch = spark.createDataFrame(
        [(100, doc(3, "tail")), (101, doc(999))], "doc_id long, text string"
    )
    bb = dedup._minhash_band_frame(
        batch, "doc_id", "text", 5, 32, 8, True, False
    ).localCheckpoint()
    pairs = dedup._band_join_pairs(
        F.broadcast(bb), prune_band_index(index, bb, 32), 0.3, None
    )
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "BroadcastHashJoin" in plan, plan
    # the single hash exchange is the candidate-pair dropDuplicates
    assert plan.count("Exchange hashpartitioning") <= 1, plan
    pruned_scans = [
        line
        for line in plan.splitlines()
        if "PartitionFilters" in line
        and "_pk" in line
        and (" IN " in line or "INSET" in line)
    ]
    assert pruned_scans, plan
    # doc 100 is a near-dup of corpus doc 3; doc 101 matches nothing
    got = {(r["new_id"], r["ref_id"]) for r in pairs.collect()}
    assert got == {(100, 3)}


def test_corpus_dedup_replay_skips_sink_and_new_lineage_keeps_index(
    spark, tmp_path
):
    """Crash-replay delivery guard: re-running the drained stream with the
    SAME checkpoint path wiped (every batch replays, ids restart at 0 with
    identical batch dirs committed) must not re-deliver any survivor; a
    FRESH checkpoint path (new lineage) must not clobber the existing
    index — every re-sent doc is a known dup, zero deliveries."""
    import os
    import shutil
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from security_data_pipeline_spark.streaming.pipeline import (
        dedup_stream_against_corpus,
    )

    batches = [
        [(1, "alpha beta"), (2, "delta x")],
        [(3, "alpha  BETA"), (4, "epsilon y")],
    ]
    src = tmp_path / "in"
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
    out = str(tmp_path / "out")
    state = str(tmp_path / "fps")
    ckpt = str(tmp_path / "ckpt")

    def sink(df, batch_id):
        df.write.mode("append").parquet(out)

    def run(checkpoint):
        q = dedup_stream_against_corpus(
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src)),
            state,
            checkpoint,
            sink,
        )
        q.awaitTermination(120)

    run(ckpt)
    first = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert first == [1, 2, 4]  # 3 is a case/space dup of 1

    # full replay: same checkpoint path, checkpoint state lost — every
    # batch re-fires with the same ids; committed index dirs skip the sink
    shutil.rmtree(ckpt)
    run(ckpt)
    replay = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert replay == first, "replay re-delivered survivors"

    # fresh lineage over kept state: new tag dirs, old index intact, and
    # every re-sent doc is already fingerprinted -> no new deliveries
    run(str(tmp_path / "ckpt2"))
    again = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert again == first
    tags = {d for d in os.listdir(state) if d.startswith("_tag=")}
    assert len(tags) == 2, tags
    n_fps = spark.read.parquet(state).count()
    assert n_fps == 3  # alpha-beta, delta-x, epsilon-y; never duplicated


def test_streaming_locf_equals_batch_forward_fill(spark, tmp_path):
    """In-order micro-batches through maintain_locf_stream must emit the
    EXACT per-row fills a batch forward_fill over the cumulative input
    produces — across gaps inside a batch, keys silent for whole batches,
    and keys whose first observation arrives late. State stays one row per
    key under the prefix-partitioned layout."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from security_data_pipeline_spark.operators.timeseries import forward_fill
    from security_data_pipeline_spark.streaming.pipeline import (
        maintain_locf_stream,
    )

    # (key, order, value): key a observes then goes silent; key b is NULL
    # until batch 2; key c appears only in batch 3
    batches = [
        [("a", 1, 10.0), ("a", 2, None), ("b", 1, None)],
        [("a", 3, None), ("b", 2, 20.0), ("b", 3, None)],
        [("a", 4, 40.0), ("b", 4, None), ("c", 1, None), ("c", 2, 5.0)],
    ]
    src = tmp_path / "in"
    src.mkdir()
    base = time.time() - 100
    for bi, rows in enumerate(batches):
        f = src / f"b{bi}.parquet"
        pq.write_table(
            pa.table(
                {
                    "k": [r[0] for r in rows],
                    "o": [r[1] for r in rows],
                    "v": pa.array([r[2] for r in rows], type=pa.float64()),
                }
            ),
            f,
        )
        os.utime(f, (base + bi, base + bi))

    out = str(tmp_path / "out")

    def sink(df, batch_id):
        df.write.mode("append").parquet(out)

    q = maintain_locf_stream(
        spark.readStream.schema("k string, o long, v double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src)),
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
        sink,
        keys=["k"],
        order_col="o",
        cols=["v"],
    )
    q.awaitTermination(120)

    got = {
        (r["k"], r["o"]): r["v_ffill"]
        for r in spark.read.parquet(out).collect()
    }
    all_rows = spark.createDataFrame(
        [r for rows in batches for r in rows], "k string, o long, v double"
    )
    want = {
        (r["k"], r["o"]): r["v_ffill"]
        for r in forward_fill(all_rows, ["k"], "o", ["v"]).collect()
    }
    assert got == want
    # the test exercises real carries: a's batch-2/3 NULLs fill from 10.0,
    # b's batch-3 NULL from 20.0, c's leading NULL stays None
    assert got[("a", 3)] == 10.0 and got[("b", 4)] == 20.0
    assert got[("c", 1)] is None

    # state: one row per key, prefix-partitioned on disk
    state = spark.read.parquet(str(tmp_path / "state"))
    assert state.count() == 3
    assert "_kp" in state.columns
    rows = {r["k"]: r["_last_v"] for r in state.collect()}
    assert rows["a"]["v"] == 40.0 and rows["b"]["v"] == 20.0
    assert rows["c"]["v"] == 5.0


def test_streaming_ann_index_equals_full_rebuild(spark, tmp_path):
    """Vectors streamed through maintain_ann_index_stream in 3 batches
    must yield BIT-EQUAL probed search results to a flat batch-built
    index with the same codebook; the streamed layout also feeds the
    staleness report, and the SQ8 variant matches the append-built
    compressed index."""
    import os
    import time

    import pyarrow as pa
    from pyspark.sql import functions as F

    from security_data_pipeline_spark.operators import similarity
    from security_data_pipeline_spark.sources.catalog import load_table
    from security_data_pipeline_spark.streaming.pipeline import (
        maintain_ann_index_stream,
    )

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    cents = similarity.ivf_centroid_vectors(emb, n_centroids=16)

    import pyarrow.parquet as pq

    src = tmp_path / "in"
    src.mkdir()
    base = time.time() - 100
    for bi in range(3):
        f = src / f"b{bi}.parquet"
        part = emb.filter(F.col("vec_id") % 3 == bi).select(
            "vec_id", "embedding"
        )
        pq.write_table(
            pa.Table.from_pandas(part.toPandas(), preserve_index=False), f
        )
        os.utime(f, (base + bi, base + bi))

    def stream():
        return (
            spark.readStream.schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )

    idx = str(tmp_path / "ivf_stream")
    q = maintain_ann_index_stream(
        stream(), idx, str(tmp_path / "ckpt"), cents
    )
    q.awaitTermination(120)

    flat = str(tmp_path / "ivf_flat")
    similarity.build_ivf_index(emb, flat, centroids=cents)
    queries = emb.filter(F.col("vec_id") < 20)
    got = sorted(map(tuple, similarity.search_ivf_index(
        spark, idx, queries=queries, centroids=cents, k=3, n_probe=4
    ).collect()))
    exp = sorted(map(tuple, similarity.search_ivf_index(
        spark, flat, queries=queries, centroids=cents, k=3, n_probe=4
    ).collect()))
    assert got == exp and len(got) > 0

    stale = similarity.ivf_index_staleness(spark, idx).collect()
    assert len(stale) == 16
    assert sum(r["n_rows"] for r in stale) == emb.count()

    # SQ8 variant: initial build fits the grids, the stream extends them
    sq_built = str(tmp_path / "sq8_built")
    similarity.build_ivf_sq8_index(emb, sq_built, centroids=cents)
    sq_stream = str(tmp_path / "sq8_stream")
    # reuse the built grids as the streamed index's sidecar contract
    spark.read.parquet(f"{sq_built}__grid").write.parquet(
        f"{sq_stream}__grid"
    )
    q2 = maintain_ann_index_stream(
        stream(),
        sq_stream,
        str(tmp_path / "ckpt2"),
        cents,
        sq8_grid_path=f"{sq_stream}__grid",
    )
    q2.awaitTermination(120)
    got_sq = sorted(map(tuple, similarity.search_ivf_sq8_index(
        spark, sq_stream, queries=queries, centroids=cents, k=3, n_probe=4
    ).collect()))
    exp_sq = sorted(map(tuple, similarity.search_ivf_sq8_index(
        spark, sq_built, queries=queries, centroids=cents, k=3, n_probe=4
    ).collect()))
    assert got_sq == exp_sq and len(got_sq) > 0

    # offline compaction of the STREAMED per-batch generations: one
    # generation left, searches still bit-equal (rows copy verbatim)
    report = similarity.compact_ann_index(spark, idx)
    assert report["generations_before"] == 3
    assert report["files_after"] < report["files_before"]
    compacted = sorted(map(tuple, similarity.search_ivf_index(
        spark, idx, queries=queries, centroids=cents, k=3, n_probe=4
    ).collect()))
    assert compacted == exp


def test_consolidate_stream_index_preserves_dedup_and_prunes(spark, tmp_path):
    """Compacting the per-batch fingerprint trees into one generation must
    not change behavior: a later stream batch against the consolidated
    index still never readmits anything, the pruned-read plan shape is
    unchanged, and files shrink to one per prefix directory."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from security_data_pipeline_spark.streaming.pipeline import (
        consolidate_stream_index,
        dedup_stream_against_corpus,
    )

    src = tmp_path / "in"
    src.mkdir()
    base = time.time() - 100

    def add_batch(bi, rows):
        f = src / f"b{bi}.parquet"
        pq.write_table(
            pa.table(
                {"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}
            ),
            f,
        )
        os.utime(f, (base + bi, base + bi))

    # 40 docs per batch: md5 prefixes collide across batches, so the
    # per-batch trees hold multiple files per prefix directory
    batches = [
        [(bi * 100 + i, f"doc number {bi} dash {i}") for i in range(40)]
        for bi in range(3)
    ]
    for bi, rows in enumerate(batches):
        add_batch(bi, rows)

    out = str(tmp_path / "out")
    state = str(tmp_path / "fps")

    def sink(df, batch_id):
        df.write.mode("append").parquet(out)

    def run(ckpt):
        q = dedup_stream_against_corpus(
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src)),
            state,
            ckpt,
            sink,
        )
        q.awaitTermination(120)

    run(str(tmp_path / "ckpt"))
    assert spark.read.parquet(out).count() == 120  # all unique so far

    n_pfx = (
        spark.read.parquet(state).select("_pfx").distinct().count()
    )
    report = consolidate_stream_index(spark, state, "_pfx", distinct=True)
    assert report["rows"] == 120
    assert report["files_after"] < report["files_before"]
    assert report["files_after"] == n_pfx  # one file per prefix directory
    # exactly one generation left on disk
    gens = {d for d in os.listdir(state) if d.startswith("_tag=")}
    assert gens == {"_tag=c0"}

    # continue ingesting on a fresh lineage: old content must still drop
    add_batch(
        3,
        [(901, "DOC  number 0 dash 3"), (902, "brand new doc"),
         (903, "doc number 2 dash 39")],
    )
    run(str(tmp_path / "ckpt2"))
    survivors = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    # 901/903 are case/space dups of consolidated content; 902 is new
    want = sorted([r[0] for b in batches for r in b] + [902])
    assert survivors == want


def test_locf_state_join_prunes_and_never_shuffles_state(spark, tmp_path):
    """The LOCF maintainer's 100 TB contract: the persisted per-key carry
    state is read with directory pruning on the key-hash prefix and NO
    shuffle Exchange ever holds the state — the carry path builds only
    batch-sized broadcast sides (the batch's own window fill is the sole
    hash exchange)."""
    from pyspark.sql import functions as F

    from security_data_pipeline_spark.streaming.pipeline import (
        locf_fill_with_carry,
        locf_key_prefix,
    )

    state = spark.createDataFrame(
        [(f"k{i}", (float(i), float(i) * 10.0)) for i in range(512)],
        "k string, _last_v struct<o double, v double>",
    )
    root = str(tmp_path / "state")
    state.withColumn("_kp", locf_key_prefix(["k"], 256)).write.partitionBy(
        "_kp"
    ).parquet(root)
    persisted = spark.read.parquet(root)

    batch = spark.createDataFrame(
        [("k3", 100, None), ("k3", 101, 7.0), ("k7", 100, None)],
        "k string, o long, v double",
    ).localCheckpoint()
    prefixes = [
        r["_kp"]
        for r in batch.select(locf_key_prefix(["k"], 256).alias("_kp"))
        .distinct()
        .collect()
    ]
    pruned = persisted.filter(F.col("_kp").isin(prefixes)).drop("_kp")
    filled = locf_fill_with_carry(batch, pruned, ["k"], "o", ["v"])

    plan = filled._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2, plan
    # the only hash exchanges are batch-sized: the window fill and the
    # batch-keys distinct feeding the semi-join broadcast
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    pruned_scans = [
        line
        for line in plan.splitlines()
        if "PartitionFilters" in line
        and "_kp" in line
        and (" IN " in line or "INSET" in line)
    ]
    assert pruned_scans, plan
    got = {(r["k"], r["o"]): r["v_ffill"] for r in filled.collect()}
    assert got == {("k3", 100): 30.0, ("k3", 101): 7.0, ("k7", 100): 70.0}


def test_check_replay_mixed_lineage_and_clean_return(spark):
    """The replay guard over prefix-partitioned state: stamps from an OLD
    checkpoint lineage (dynamic partition overwrite rewrites only touched
    prefixes, so they survive a restart) must not combine their high batch
    id with the current lineage's tag and flag a live batch as replayed;
    and the returned frame must carry NO guard columns on EITHER branch so
    the LOCF healing merge can union it with unstamped batch summaries."""
    from security_data_pipeline_spark.streaming.pipeline import _check_replay

    # the old lineage tag sorts BELOW the current one, so the buggy
    # independent max(_fold_tag) equals the current tag while
    # max(_last_batch_id) comes from the old lineage — the cross-combine
    mixed = spark.createDataFrame(
        [("k1", 1.0, 0, "tNEW"), ("k2", 2.0, 7, "tAAA")],
        "k string, v double, _last_batch_id long, _fold_tag string",
    )
    # old lineage's id 7 must NOT pair with the current tag: batch 1 folds
    replayed, clean = _check_replay(mixed, 1, "tNEW")
    assert not replayed
    assert set(clean.columns) == {"k", "v"}

    # genuine replay under the current lineage
    replayed, clean = _check_replay(mixed, 0, "tNEW")
    assert replayed
    # the healing merge unions this with an unstamped summary frame —
    # guard columns must already be gone
    assert set(clean.columns) == {"k", "v"}
    summ = spark.createDataFrame([("k9", 9.0)], "k string, v double")
    assert clean.unionByName(summ).count() == 3

    # stamps from another lineage only: fold normally
    replayed, clean = _check_replay(mixed, 0, "tELSEWHERE")
    assert not replayed

    # pre-guard state (no stamp columns): fold normally
    old = spark.createDataFrame([("k1", 1.0)], "k string, v double")
    replayed, clean = _check_replay(old, 5, "tNEW")
    assert not replayed and set(clean.columns) == {"k", "v"}


def test_streaming_locf_new_lineage_over_mixed_stamps_delivers(
    spark, tmp_path
):
    """Restarting LOCF with a FRESH checkpoint over kept state leaves
    prefix directories stamped by the old lineage; a later batch whose
    pruned slice mixes old- and new-lineage stamps must still fold and
    DELIVER (the cross-lineage max(batch_id)×max(tag) combination used to
    flag it replayed and silently skip the sink). The checkpoint names are
    chosen so the new lineage tag sorts lexicographically AFTER the old
    one — the exact ordering that triggered the false positive."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from security_data_pipeline_spark.operators.timeseries import forward_fill
    from security_data_pipeline_spark.streaming.pipeline import (
        locf_key_prefix,
        maintain_locf_stream,
    )

    # two keys in DIFFERENT state prefixes (so old stamps can survive a
    # partial rewrite)
    probe = spark.createDataFrame(
        [(f"k{i}",) for i in range(32)], "k string"
    ).select("k", locf_key_prefix(["k"], 256).alias("_kp"))
    by_pfx = {}
    for r in probe.collect():
        by_pfx.setdefault(r["_kp"], []).append(r["k"])
    k1, k2 = [ks[0] for ks in list(by_pfx.values())[:2]]

    # the fold stamps _fold_tag with the raw checkpoint path; name the new
    # lineage to sort lexicographically AFTER the old one, so the buggy
    # independent max(_fold_tag) lands on the CURRENT tag while
    # max(_last_batch_id) comes from the old lineage
    ckpt_a = str(tmp_path / "ckpt_a")
    ckpt_b = str(tmp_path / "ckpt_b")
    assert ckpt_b > ckpt_a

    state = str(tmp_path / "state")
    out = str(tmp_path / "out")

    def sink(df, batch_id):
        df.write.mode("append").parquet(out)

    def run(src_dir, ckpt):
        q = maintain_locf_stream(
            spark.readStream.schema("k string, o long, v double")
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir),
            state,
            ckpt,
            sink,
            keys=["k"],
            order_col="o",
            cols=["v"],
        )
        q.awaitTermination(120)

    def write_batch(d, name, rows, mtime):
        f = pathlib.Path(d) / name
        pq.write_table(
            pa.table(
                {
                    "k": [r[0] for r in rows],
                    "o": [r[1] for r in rows],
                    "v": pa.array([r[2] for r in rows], type=pa.float64()),
                }
            ),
            str(f),
        )
        os.utime(f, (mtime, mtime))

    base = time.time() - 100
    src_a = tmp_path / "in_a"
    src_a.mkdir()
    # lineage A: two batches touching BOTH prefixes -> stamps (tag_a, 1)
    write_batch(src_a, "b0.parquet", [(k1, 1, 10.0), (k2, 1, 20.0)], base)
    write_batch(
        src_a, "b1.parquet", [(k1, 2, None), (k2, 2, None)], base + 1
    )
    run(str(src_a), ckpt_a)

    # lineage B over the SAME state: batch 0 touches only k1's prefix
    # (re-stamped tag_b,0); batch 1 touches BOTH prefixes -> its pruned
    # slice mixes (tag_b,0) and (tag_a,1)
    src_b = tmp_path / "in_b"
    src_b.mkdir()
    write_batch(src_b, "b0.parquet", [(k1, 3, 30.0)], base + 2)
    write_batch(
        src_b, "b1.parquet", [(k1, 4, None), (k2, 3, None)], base + 3
    )
    run(str(src_b), ckpt_b)

    got = {
        (r["k"], r["o"]): r["v_ffill"]
        for r in spark.read.parquet(out).collect()
    }
    # the mixed-stamp batch DID deliver, with the right carries
    assert (k1, 4) in got and (k2, 3) in got, sorted(got)
    all_rows = spark.createDataFrame(
        [
            (k1, 1, 10.0), (k2, 1, 20.0), (k1, 2, None), (k2, 2, None),
            (k1, 3, 30.0), (k1, 4, None), (k2, 3, None),
        ],
        "k string, o long, v double",
    )
    want = {
        (r["k"], r["o"]): r["v_ffill"]
        for r in forward_fill(all_rows, ["k"], "o", ["v"]).collect()
    }
    assert got == want


def test_streaming_locf_wiped_checkpoint_full_replay_delivers_nothing(
    spark, tmp_path
):
    """Wiping the checkpoint and re-running the SAME drained stream (same
    lineage tag, batch ids restart at 0) must re-deliver nothing. The
    regression: the replayed batch 0's healing merge used to re-stamp the
    touched prefixes with its own LOWER id, un-marking every later batch's
    replay — batch 1 onward then re-delivered through the sink. The stamp
    is now monotone per lineage."""
    import os
    import shutil
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from security_data_pipeline_spark.streaming.pipeline import (
        maintain_locf_stream,
    )

    src = tmp_path / "in"
    src.mkdir()
    base = time.time() - 100
    batches = [
        [("k1", 1, 10.0), ("k2", 1, 20.0)],
        [("k1", 2, None), ("k2", 2, None)],
        [("k1", 3, 30.0)],
    ]
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
            str(f),
        )
        os.utime(f, (base + bi, base + bi))

    out = str(tmp_path / "out")
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")

    def sink(df, batch_id):
        df.write.mode("append").parquet(out)

    def run():
        q = maintain_locf_stream(
            spark.readStream.schema("k string, o long, v double")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src)),
            state,
            ckpt,
            sink,
            keys=["k"],
            order_col="o",
            cols=["v"],
        )
        q.awaitTermination(120)

    run()
    first = sorted(
        (r["k"], r["o"], r["v_ffill"])
        for r in spark.read.parquet(out).collect()
    )
    assert len(first) == 5
    shutil.rmtree(ckpt)
    run()  # full replay under the same lineage: nothing re-delivers
    replay = sorted(
        (r["k"], r["o"], r["v_ffill"])
        for r in spark.read.parquet(out).collect()
    )
    assert replay == first, "wiped-checkpoint replay re-delivered rows"


def test_streaming_neardup_replay_after_band_write_crash(spark, tmp_path):
    """Crash between the band-index write and the labels commit: the
    replayed batch re-reads an index that ALREADY holds its own band
    directory, then overwrites that directory (new part-file names). The
    fold must materialize its edges BEFORE the overwrite — a lazy
    cross-join executed later (inside the connected-components iterations)
    would list the stale files and die with FileNotFoundException on every
    restart. The healed labeling must equal the batch recompute."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from security_data_pipeline_spark.operators import dedup
    from security_data_pipeline_spark.streaming.pipeline import (
        _band_pk,
        _lineage_tag,
        maintain_neardup_stream,
    )

    def doc(seed: int, extra: str = "") -> str:
        words = [f"w{seed}x{i}" for i in range(12)]
        return " ".join(words) + (" " + extra if extra else "")

    b0 = [(0, doc(0)), (1, doc(0, "tail")), (2, doc(7))]
    b1 = [(3, doc(0, "other")), (4, doc(7, "tail")), (5, doc(11))]
    src = tmp_path / "in"
    src.mkdir()
    base = time.time() - 100

    def write_batch(name, rows, mtime):
        f = src / name
        pq.write_table(
            pa.table(
                {
                    "doc_id": [r[0] for r in rows],
                    "text": [r[1] for r in rows],
                }
            ),
            str(f),
        )
        os.utime(f, (mtime, mtime))

    write_batch("b0.parquet", b0, base)
    state = str(tmp_path / "labels")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = maintain_neardup_stream(
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src)),
            state,
            ckpt,
            verify_threshold=0.3,
        )
        q.awaitTermination(180)

    run()  # batch 0 folds; labels stamped batch 0

    # simulate the crashed batch-1 attempt: its band directory committed,
    # labels NOT — exactly the window the docstring calls harmless
    bdf = spark.createDataFrame(b1, "doc_id long, text string")
    bb = dedup._minhash_band_frame(
        bdf, "doc_id", "text", 5, 32, 8, True, False
    )
    tag = _lineage_tag(ckpt)
    bb.withColumn("_pk", _band_pk(32)).write.partitionBy("_pk").mode(
        "overwrite"
    ).parquet(f"{state}__bands/_tag={tag}/batch=1")

    write_batch("b1.parquet", b1, base + 1)
    run()  # replayed fold overwrites its own band dir mid-plan

    got = {
        (r["doc_id"], r["cluster_id"])
        for r in spark.read.parquet(state)
        .select("doc_id", "cluster_id")
        .collect()
    }
    all_docs = spark.createDataFrame(b0 + b1, "doc_id long, text string")
    edges = dedup.minhash_lsh_pairs(all_docs, verify_threshold=0.3)
    want = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup.connected_components(
            edges, all_docs, id_col="doc_id"
        ).collect()
    }
    assert got == want


def test_migrate_stream_index_from_flat_layout(spark, tmp_path):
    """State written by the pre-prefix maintainers (flat batch=N dirs, no
    _tag/_pfx levels) must fail fast in the pruned readers with a message
    naming the migration, and migrate_stream_index must rewrite it into
    the pruned layout so a restarted stream keeps recognizing every
    historical fingerprint. A partially-deleted re-run resumes."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from security_data_pipeline_spark.operators.textops import fingerprint
    from security_data_pipeline_spark.streaming.pipeline import (
        corpus_fresh_rows,
        dedup_stream_against_corpus,
        migrate_stream_index,
    )

    state = str(tmp_path / "fps")
    old_docs = [(1, "alpha beta"), (2, "delta x")]
    old_fps = spark.createDataFrame(
        old_docs, "doc_id long, text string"
    ).select(fingerprint("text").alias("_fp"))
    # the round-6 layout: one flat batch directory, no partition levels
    old_fps.write.parquet(f"{state}/batch=0")

    # pruned reader refuses the un-migrated layout by name
    flat = spark.read.parquet(state)
    local = spark.createDataFrame(
        [(9, "alpha beta")], "doc_id long, text string"
    ).withColumn("_fp", fingerprint("text"))
    with pytest.raises(RuntimeError, match="migrate_stream_index"):
        corpus_fresh_rows(local, flat)

    report = migrate_stream_index(spark, state, "fingerprint")
    assert report["batches_migrated"] == 1 and report["rows"] == 2
    migrated = spark.read.parquet(state)
    assert {"_fp", "_pfx", "_tag", "batch"} <= set(migrated.columns)
    assert migrated.count() == 2

    # a restarted stream must keep dropping the historical docs
    src = tmp_path / "in"
    src.mkdir()
    rows = [(3, "ALPHA   beta"), (4, "new doc")]  # 3 dups historical 1
    f = src / "b0.parquet"
    pq.write_table(
        pa.table(
            {"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}
        ),
        str(f),
    )
    os.utime(f, (time.time() - 10, time.time() - 10))
    out = str(tmp_path / "out")

    def sink(df, batch_id):
        df.write.mode("append").parquet(out)

    q = dedup_stream_against_corpus(
        spark.readStream.schema("doc_id long, text string").parquet(str(src)),
        state,
        str(tmp_path / "ckpt"),
        sink,
    )
    q.awaitTermination(120)
    assert [r["doc_id"] for r in spark.read.parquet(out).collect()] == [4]

    # idempotent re-run on the migrated tree: nothing to do
    again = migrate_stream_index(spark, state, "fingerprint")
    assert again["batches_migrated"] == 0

    # resume path: a leftover old dir beside a completed legacy gen is
    # just deleted, never re-read
    os.makedirs(f"{state}/batch=9", exist_ok=True)
    resumed = migrate_stream_index(spark, state, "fingerprint")
    assert resumed["batches_migrated"] == 1
    assert not os.path.exists(f"{state}/batch=9")

    with pytest.raises(ValueError, match="kind"):
        migrate_stream_index(spark, state, "bands")


def test_migrate_band_index_then_stream_continues(spark, tmp_path):
    """Band-index migration end-to-end: a corpus whose band index was
    written by the pre-prefix version (flat batch=N, no _pk/_tag) and
    whose labels state predates the replay guard must, after
    migrate_stream_index(kind='band'), serve a restarted near-dup stream
    whose final labeling equals the batch recompute over old + new docs."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from security_data_pipeline_spark.operators import dedup
    from security_data_pipeline_spark.streaming.pipeline import (
        maintain_neardup_stream,
        migrate_stream_index,
    )

    def doc(seed: int, extra: str = "") -> str:
        words = [f"w{seed}x{i}" for i in range(12)]
        return " ".join(words) + (" " + extra if extra else "")

    b0 = [(0, doc(0)), (1, doc(0, "tail")), (2, doc(7))]
    b1 = [(3, doc(0, "other")), (4, doc(7, "tail")), (5, doc(11))]

    state = str(tmp_path / "labels")
    docs0 = spark.createDataFrame(b0, "doc_id long, text string")
    # pre-guard labels state: plain (doc_id, cluster_id), no stamp columns
    labels0 = dedup.connected_components(
        dedup.minhash_lsh_pairs(docs0, verify_threshold=0.3),
        docs0,
        id_col="doc_id",
    )
    labels0.write.parquet(state)
    # pre-prefix band index: one flat batch directory
    bb0 = dedup._minhash_band_frame(
        docs0, "doc_id", "text", 5, 32, 8, True, False
    )
    bb0.write.parquet(f"{state}__bands/batch=0")

    report = migrate_stream_index(spark, f"{state}__bands", "band")
    assert report["batches_migrated"] == 1 and report["rows"] > 0
    migrated = spark.read.parquet(f"{state}__bands")
    assert {"_pk", "_tag", "batch"} <= set(migrated.columns)

    src = tmp_path / "in"
    src.mkdir()
    f = src / "b1.parquet"
    pq.write_table(
        pa.table(
            {"doc_id": [r[0] for r in b1], "text": [r[1] for r in b1]}
        ),
        str(f),
    )
    os.utime(f, (time.time() - 10, time.time() - 10))
    q = maintain_neardup_stream(
        spark.readStream.schema("doc_id long, text string").parquet(str(src)),
        state,
        str(tmp_path / "ckpt"),
        verify_threshold=0.3,
    )
    q.awaitTermination(180)

    got = {
        (r["doc_id"], r["cluster_id"])
        for r in spark.read.parquet(state)
        .select("doc_id", "cluster_id")
        .collect()
    }
    all_docs = spark.createDataFrame(b0 + b1, "doc_id long, text string")
    want = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup.connected_components(
            dedup.minhash_lsh_pairs(all_docs, verify_threshold=0.3),
            all_docs,
            id_col="doc_id",
        ).collect()
    }
    assert got == want
    # the cross-batch merge is real: doc 3 joined doc 0's old cluster
    clusters = {}
    for d, c in got:
        clusters.setdefault(c, set()).add(d)
    assert any({0, 3} <= m for m in clusters.values())


def test_streaming_checksum_equals_batch_manifest(spark, tmp_path):
    """The streamed per-group checksum manifest must EXACTLY equal
    dataset_checksum_by over the cumulative input (row-hash sums and
    counts are commutative monoids), including groups silent for whole
    batches and NULL-bearing values exercising the sentinel encoding;
    a full same-checkpoint replay must not double-add."""
    import os
    import shutil
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from security_data_pipeline_spark.operators.merge import (
        dataset_checksum_by,
    )
    from security_data_pipeline_spark.streaming.pipeline import (
        maintain_checksum_stream,
    )

    batches = [
        [("a", "x", 1), ("a", None, 2), ("b", "y|z", 3)],
        [("a", "", 4), ("c", "w", 5)],
        [("b", "y", 6), ("c", None, 7), ("a", "x", 8)],
    ]
    src = tmp_path / "in"
    src.mkdir()
    base = time.time() - 100
    for bi, rows in enumerate(batches):
        f = src / f"b{bi}.parquet"
        pq.write_table(
            pa.table(
                {
                    "grp": [r[0] for r in rows],
                    "val": [r[1] for r in rows],
                    "n": [r[2] for r in rows],
                }
            ),
            str(f),
        )
        os.utime(f, (base + bi, base + bi))

    state = str(tmp_path / "manifest")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = maintain_checksum_stream(
            spark.readStream.schema("grp string, val string, n long")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src)),
            state,
            ckpt,
            cols=["val", "n"],
            by=["grp"],
        )
        q.awaitTermination(120)

    run()
    got = {
        r["grp"]: (r["n_rows"], r["checksum"])
        for r in spark.read.parquet(state).collect()
    }
    all_rows = spark.createDataFrame(
        [r for rows in batches for r in rows], "grp string, val string, n long"
    )
    want = {
        r["grp"]: (r["n_rows"], r["checksum"])
        for r in dataset_checksum_by(all_rows, ["val", "n"], ["grp"]).collect()
    }
    assert got == want and len(got) == 3

    # full replay under the same checkpoint path: guard skips every
    # re-fired batch, sums unchanged
    shutil.rmtree(ckpt)
    run()
    again = {
        r["grp"]: (r["n_rows"], r["checksum"])
        for r in spark.read.parquet(state).collect()
    }
    assert again == want


def test_curate_stream_dedup_quality_decontamination(spark, tmp_path):
    """The composed ingest-curation fold: corpus-history exact dedup,
    then quality gate, then benchmark decontamination — delivered docs
    are exactly the clean set, and a later RE-CRAWL of a rejected doc is
    dropped as a known dup (rejected docs still enter the fingerprint
    index), never re-scored and re-delivered."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from security_data_pipeline_spark.streaming.pipeline import curate_stream

    good1 = "the quick brown fox jumps over the lazy dog and then the end"
    good2 = "a different page with the usual words and some more of the text"
    leaked = "the secret eval question is about the number of planets here"
    batches = [
        [(1, good1), (2, "x"), (3, leaked)],          # 2 low-quality, 3 leaks
        [(4, good1), (5, good2), (6, "x")],           # 4 dups 1; 6 re-crawls 2
        [(7, leaked), (8, good2)],                    # 7 re-crawls 3; 8 dups 5
    ]
    bench = spark.createDataFrame(
        [(100, "the secret eval question is hard")], "doc_id long, text string"
    )
    src = tmp_path / "in"
    src.mkdir()
    base = time.time() - 100
    for bi, rows in enumerate(batches):
        f = src / f"b{bi}.parquet"
        pq.write_table(
            pa.table(
                {"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}
            ),
            str(f),
        )
        os.utime(f, (base + bi, base + bi))
    out = str(tmp_path / "out")

    def sink(df, batch_id):
        df.write.mode("append").parquet(out)

    q = curate_stream(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src)),
        str(tmp_path / "fps"),
        str(tmp_path / "ckpt"),
        sink,
        benchmark=bench,
        min_quality=0.2,
        ngram_n=4,
    )
    q.awaitTermination(180)

    delivered = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    # 1 and 5 are the only clean first-sightings; every re-crawl (4, 6, 7,
    # 8) is a known fingerprint — including re-crawls of REJECTED docs
    assert delivered == [1, 5]
    # the index holds every distinct fingerprint ever seen, accepted or not
    n_fps = spark.read.parquet(str(tmp_path / "fps")).count()
    assert n_fps == 4  # good1, "x", leaked, good2


def test_streaming_scd2_equals_sequential_batch_apply(spark, tmp_path):
    """CDC batches streamed through maintain_scd2_stream must yield the
    EXACT dimension sequential batch scd2_apply produces over the same
    batch sequence — version opens/closes, unseen-key inserts, equal-
    update no-ops, intra-batch collapse to the latest change per key —
    and a full same-checkpoint replay must not re-close versions."""
    import datetime as dt
    import os
    import shutil
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from security_data_pipeline_spark.operators.merge import scd2_apply
    from security_data_pipeline_spark.streaming.pipeline import (
        maintain_scd2_stream,
    )

    T = lambda m: dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)  # noqa: E731
    batches = [
        # k1 churns twice in one batch -> only the second versioned;
        # k4 churns twice at the SAME timestamp -> the attr tie-break
        # picks 'q' deterministically (max over (ts, attrs))
        [("k1", "a", T(0)), ("k1", "b", T(1)), ("k2", "x", T(0)),
         ("k4", "q", T(2)), ("k4", "p", T(2))],
        [("k1", "b", T(5)), ("k3", "n", T(6))],   # equal update no-ops
        [("k2", "y", T(9)), ("k1", "c", T(9))],   # two version closes
    ]
    src = tmp_path / "in"
    src.mkdir()
    base = time.time() - 100
    for bi, rows in enumerate(batches):
        f = src / f"b{bi}.parquet"
        pq.write_table(
            pa.table(
                {
                    "k": [r[0] for r in rows],
                    "v": [r[1] for r in rows],
                    "ts": pa.array(
                        [r[2] for r in rows], type=pa.timestamp("us")
                    ),
                }
            ),
            str(f),
        )
        os.utime(f, (base + bi, base + bi))

    state = str(tmp_path / "dim")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = maintain_scd2_stream(
            spark.readStream.schema("k string, v string, ts timestamp")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src)),
            state,
            ckpt,
            keys=["k"],
            attrs=["v"],
            ts_col="ts",
        )
        q.awaitTermination(120)

    run()

    def snap(df):
        return sorted(
            (r["k"], r["v"], r["valid_from"], r["valid_to"], r["is_current"])
            for r in df.collect()
        )

    got = snap(
        spark.read.parquet(state).drop("_last_batch_id", "_fold_tag")
    )

    # sequential batch reference with the same per-batch collapse
    dim = spark.createDataFrame(
        [],
        "k string, v string, valid_from timestamp, valid_to timestamp,"
        " is_current boolean",
    )
    for rows in batches:
        b = spark.createDataFrame(rows, "k string, v string, ts timestamp")
        upd = b.groupBy("k").agg(
            F.max_by(
                F.struct("v", "ts"), F.struct(F.col("ts"), F.col("v"))
            ).alias("_u")
        ).select("k", "_u.*")
        dim = spark.createDataFrame(
            scd2_apply(dim, upd, ["k"], ["v"], ts_col="ts").collect(),
            dim.schema,
        )
    want = snap(dim)
    assert got == want
    # sanity: the history is non-trivial
    assert sum(1 for r in got if not r[4]) == 2  # two closed versions
    assert sum(1 for r in got if r[4]) == 4      # four open keys
    assert ("k4", "q") in {(r[0], r[1]) for r in got if r[4]}

    # full replay under the same checkpoint: guard skips every batch
    shutil.rmtree(ckpt)
    run()
    again = snap(
        spark.read.parquet(state).drop("_last_batch_id", "_fold_tag")
    )
    assert again == want

def test_streaming_importance_equals_batch_model(spark, tmp_path):
    """The streamed DSIR bucket-count state, finalized through the SAME
    ratio_from_bucket_counts the batch form uses, must be bit-equal to
    bucket_log_ratio over the cumulative input — including empty-target
    prefixes (batch 0 has no target docs: the smoothed model degrades to
    uniform, not NULL) — and a full same-checkpoint replay must not
    double-count bigrams."""
    import os
    import shutil
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from security_data_pipeline_spark.operators import mixing
    from security_data_pipeline_spark.streaming.pipeline import (
        maintain_importance_stream,
    )

    B = 64
    batches = [
        # batch 0: raw only (no 'en' docs yet) — empty-target model
        [(1, "gamma delta gamma", "de"), (2, "x", "de")],
        [(3, "alpha beta alpha beta", "en"), (4, "", "de")],
        [(5, "alpha beta gamma", "en"), (6, "delta delta delta", "fr")],
    ]
    src = tmp_path / "in"
    src.mkdir()
    base = time.time() - 100
    for bi, rows in enumerate(batches):
        f = src / f"b{bi}.parquet"
        pq.write_table(
            pa.table(
                {
                    "doc_id": [r[0] for r in rows],
                    "text": [r[1] for r in rows],
                    "lang": [r[2] for r in rows],
                }
            ),
            str(f),
        )
        os.utime(f, (base + bi, base + bi))

    state = str(tmp_path / "model")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = maintain_importance_stream(
            spark.readStream.schema("doc_id long, text string, lang string")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src)),
            state,
            ckpt,
            target_expr="lang = 'en'",
            num_buckets=B,
        )
        q.awaitTermination(120)

    def streamed_ratio():
        counts = spark.read.parquet(state).drop(
            "_last_batch_id", "_fold_tag"
        )
        return {
            r["bucket"]: r["term"]
            for r in mixing.ratio_from_bucket_counts(counts, B).collect()
        }

    run()
    all_rows = spark.createDataFrame(
        [r for rows in batches for r in rows],
        "doc_id long, text string, lang string",
    )
    want = {
        r["bucket"]: r["term"]
        for r in mixing.bucket_log_ratio(
            all_rows.filter("lang = 'en'"), all_rows, num_buckets=B
        ).collect()
    }
    got = streamed_ratio()
    assert got == want and len(got) == B

    # scoring through the streamed model must equal the batch fused form
    scored_batch = {
        r["doc_id"]: r["importance"]
        for r in mixing.importance_weights_fused(
            all_rows, all_rows.filter("lang = 'en'"), num_buckets=B
        ).collect()
    }
    counts = spark.read.parquet(state).drop("_last_batch_id", "_fold_tag")
    ratio = mixing.ratio_from_bucket_counts(counts, B)
    exploded = all_rows.select(
        "doc_id",
        F.explode(mixing.bigram_buckets("text", B)).alias("bucket"),
    )
    scored_stream = {
        r["doc_id"]: float(r["imp"])
        for r in exploded.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(F.sum("term").cast("double").alias("imp"))
        .collect()
    }
    for did, imp in scored_stream.items():
        assert imp == scored_batch[did]

    # full replay under the same checkpoint lineage: guard skips every
    # re-fired batch, counts unchanged
    shutil.rmtree(ckpt)
    run()
    assert streamed_ratio() == want

def test_streaming_sample_equals_batch_gumbel_topk(spark, tmp_path):
    """The streamed weighted sample must be BIT-EQUAL to the batch Gumbel
    top-k over the cumulative input — including a batch that displaces
    earlier winners — state stays <= k rows, and a full same-checkpoint
    replay leaves the sample unchanged."""
    import os
    import shutil
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from security_data_pipeline_spark.operators import mixing
    from security_data_pipeline_spark.streaming.pipeline import (
        maintain_sample_stream,
    )

    K = 5
    batches = [
        [(i, float(i % 3)) for i in range(0, 20)],
        [(i, float(i % 7)) for i in range(20, 40)],
        # heavy weights late: must displace earlier sample members
        [(i, 50.0) for i in range(40, 44)],
    ]
    src = tmp_path / "in"
    src.mkdir()
    base = time.time() - 100
    for bi, rows in enumerate(batches):
        f = src / f"b{bi}.parquet"
        pq.write_table(
            pa.table(
                {
                    "doc_id": [r[0] for r in rows],
                    "w": [r[1] for r in rows],
                }
            ),
            str(f),
        )
        os.utime(f, (base + bi, base + bi))

    state = str(tmp_path / "sample")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = maintain_sample_stream(
            spark.readStream.schema("doc_id long, w double")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src)),
            state,
            ckpt,
            weight_col="w",
            k=K,
        )
        q.awaitTermination(120)

    def streamed():
        return sorted(
            (r["doc_id"], r["w"], r["samp_key"])
            for r in spark.read.parquet(state)
            .drop("_last_batch_id", "_fold_tag")
            .collect()
        )

    run()
    all_rows = spark.createDataFrame(
        [r for rows in batches for r in rows], "doc_id long, w double"
    )
    want = sorted(
        (r["doc_id"], r["w"], r["samp_key"])
        for r in mixing.gumbel_topk(all_rows, "w", K).collect()
    )
    got = streamed()
    assert got == want and len(got) == K
    # the displacing batch actually displaced: every late heavy doc is in
    assert {d for d, _, _ in got} >= {40, 41, 42, 43}

    shutil.rmtree(ckpt)
    run()
    assert streamed() == want


def test_streaming_bloom_equals_batch_build(spark, tmp_path):
    """The streamed Bloom word state must be BIT-EQUAL to the batch build
    over the cumulative items; membership flags through the reconstructed
    probe frame match the batch filter; state stays <= m_bits/64 rows and
    a full same-checkpoint replay leaves the words unchanged."""
    import os
    import shutil
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from security_data_pipeline_spark.operators import bloom
    from security_data_pipeline_spark.streaming.pipeline import (
        maintain_bloom_stream,
        read_bloom_filter,
    )

    M, K = 1 << 12, 3
    batches = [
        [f"alpha {i} beta" for i in range(20)],
        [f"gamma {i} delta" for i in range(20, 40)],
        [f"alpha {i} beta" for i in range(10)],  # replayed content: no-op bits
    ]
    src = tmp_path / "in"
    src.mkdir()
    base = time.time() - 100
    for bi, items in enumerate(batches):
        f = src / f"b{bi}.parquet"
        pq.write_table(pa.table({"item": items}), str(f))
        os.utime(f, (base + bi, base + bi))

    state = str(tmp_path / "bloom")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = maintain_bloom_stream(
            spark.readStream.schema("item string")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src)),
            state,
            ckpt,
            item_col="item",
            m_bits=M,
            k=K,
        )
        q.awaitTermination(120)

    def streamed_words():
        return sorted(
            (r["i"], r["w"])
            for r in spark.read.parquet(state)
            .drop("_last_batch_id", "_fold_tag")
            .collect()
        )

    run()
    all_items = spark.createDataFrame(
        [(x,) for b in batches for x in b], "item string"
    )
    want = sorted(
        (r["i"], r["w"])
        for r in bloom.bloom_word_rows(all_items, "item", M, K).collect()
    )
    got = streamed_words()
    assert got == want
    assert len(got) <= M // 64

    # probe through the reconstructed frame == probe through a batch build
    probes = spark.createDataFrame(
        [("alpha 5 beta",), ("gamma 25 delta",), ("unseen x y",)],
        "text string",
    )
    bf_stream = read_bloom_filter(spark, state, M, K).localCheckpoint()
    bf_batch = bloom.bloom_filter_frame(
        all_items, "item", M, K
    ).localCheckpoint()
    flag = lambda bf: [
        (r["text"], r["n_bloom_hits"])
        for r in bloom.flag_bloom_hits(probes, bf, "text", 3, M, K)
        .select("text", "n_bloom_hits")
        .collect()
    ]
    assert sorted(flag(bf_stream)) == sorted(flag(bf_batch))

    # full replay under the same checkpoint lineage: guard skips batches
    shutil.rmtree(ckpt)
    run()
    assert streamed_words() == want


def test_streaming_kmv_equals_batch_sketch(spark, tmp_path):
    """The streamed bottom-k sketch must be BIT-EQUAL to the batch
    kmv_sketch over the cumulative items (including batches whose small
    hashes displace earlier members), stay <= k rows, survive a full
    same-checkpoint replay unchanged, and feed kmv_overlap identically
    to the batch sketch."""
    import os
    import shutil
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from security_data_pipeline_spark.operators import bloom
    from security_data_pipeline_spark.streaming.pipeline import (
        maintain_kmv_stream,
    )

    K = 32
    batches = [
        [f"w{i}" for i in range(100)],
        [f"x{i}" for i in range(100, 200)],
        [f"w{i}" for i in range(50)],  # pure replayed content: no-op
    ]
    src = tmp_path / "in"
    src.mkdir()
    base = time.time() - 100
    for bi, items in enumerate(batches):
        f = src / f"b{bi}.parquet"
        pq.write_table(pa.table({"item": items}), str(f))
        os.utime(f, (base + bi, base + bi))

    state = str(tmp_path / "kmv")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = maintain_kmv_stream(
            spark.readStream.schema("item string")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src)),
            state,
            ckpt,
            item_col="item",
            k=K,
        )
        q.awaitTermination(120)

    def streamed():
        return [
            r["h"]
            for r in spark.read.parquet(state)
            .drop("_last_batch_id", "_fold_tag")
            .orderBy("h")
            .collect()
        ]

    run()
    all_items = spark.createDataFrame(
        [(x,) for b in batches for x in b], "item string"
    )
    want = [
        r["h"] for r in bloom.kmv_sketch(all_items, "item", K).collect()
    ]
    got = streamed()
    assert got == want and len(got) == K

    # overlap through the streamed sketch == through the batch sketch
    other = spark.createDataFrame(
        [(f"w{i}",) for i in range(150)], "item string"
    )
    so = bloom.kmv_sketch(other, "item", K)
    via_stream = bloom.kmv_overlap(
        spark.read.parquet(state).select("h"), so, K
    ).first()
    via_batch = bloom.kmv_overlap(
        bloom.kmv_sketch(all_items, "item", K), so, K
    ).first()
    assert via_stream == via_batch

    shutil.rmtree(ckpt)
    run()
    assert streamed() == want


def test_curate_stream_repetition_gate_drops_spam(spark, tmp_path):
    """The optional stage-3 repetition gate inside the ingest-curation
    fold: a repeated-phrase page that passes the quality/dedup stages is
    dropped by its Gopher fractions; a normal page flows through. The
    gate is stateless map-side math, so the BATCH operator applies
    unchanged inside the micro-batch."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from security_data_pipeline_spark.streaming.pipeline import curate_stream

    spam = " ".join(["buy", "now"] * 12)  # top-2-gram frac 1.0, dup-8 1.0
    good = " ".join(f"w{i}" for i in range(30))  # all fracs under threshold
    src = tmp_path / "in"
    src.mkdir()
    pq.write_table(
        pa.table({"doc_id": [1, 2], "text": [spam, good]}),
        str(src / "b0.parquet"),
    )
    out = str(tmp_path / "out")

    def sink(df, batch_id):
        df.write.mode("append").parquet(out)

    q = curate_stream(
        spark.readStream.schema("doc_id long, text string")
        .parquet(str(src)),
        str(tmp_path / "fps"),
        str(tmp_path / "ckpt"),
        sink,
        repetition_gate=True,
    )
    q.awaitTermination(120)

    delivered = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert delivered == [2]
    # rejected docs still enter the fingerprint index (re-crawls stay dups)
    assert spark.read.parquet(str(tmp_path / "fps")).count() == 2


def test_streaming_source_counts_equal_batch_divergence(spark, tmp_path):
    """The streamed per-source unigram state, finalized through the SAME
    divergence_from_source_counts the batch form uses, must be bit-equal
    to source_divergence over the cumulative input — including a source
    that only appears in a later batch."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from security_data_pipeline_spark.operators import mixing
    from security_data_pipeline_spark.streaming.pipeline import (
        maintain_source_counts_stream,
    )

    B = 64
    batches = [
        [(1, "alpha beta alpha", "web"), (2, "alpha beta", "web")],
        [(3, "gamma delta gamma", "books"), (4, "alpha gamma", "web")],
        [(5, "epsilon zeta", "code"), (6, "gamma delta", "books")],
    ]
    src = tmp_path / "in"
    src.mkdir()
    base = time.time() - 100
    for bi, rows in enumerate(batches):
        f = src / f"b{bi}.parquet"
        pq.write_table(
            pa.table(
                {
                    "doc_id": [r[0] for r in rows],
                    "text": [r[1] for r in rows],
                    "source": [r[2] for r in rows],
                }
            ),
            str(f),
        )
        os.utime(f, (base + bi, base + bi))

    state = str(tmp_path / "counts")
    q = maintain_source_counts_stream(
        spark.readStream.schema("doc_id long, text string, source string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src)),
        state,
        str(tmp_path / "ckpt"),
        num_buckets=B,
    )
    q.awaitTermination(120)

    counts = spark.read.parquet(state).drop("_last_batch_id", "_fold_tag")
    got = {
        (r["src_a"], r["src_b"]): r["js_divergence"]
        for r in mixing.divergence_from_source_counts(counts, B).collect()
    }
    all_rows = spark.createDataFrame(
        [r for rows in batches for r in rows],
        "doc_id long, text string, source string",
    )
    want = {
        (r["src_a"], r["src_b"]): r["js_divergence"]
        for r in mixing.source_divergence(all_rows, num_buckets=B).collect()
    }
    assert got == want
    assert set(got) == {("books", "code"), ("books", "web"), ("code", "web")}
    # state is bounded by |sources| x num_buckets regardless of volume
    assert spark.read.parquet(state).count() <= 3 * B


def test_streamed_score_moments_equal_batch(spark, tmp_path):
    """maintain_score_moments_stream: the streamed per-source moments
    finalize to stats BIT-EQUAL to the batch operator over the
    cumulative input — normalizing the corpus against the streamed state
    equals normalize_scores_by_group exactly — and a wiped-checkpoint
    replay folds nothing twice."""
    import os
    import shutil
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from security_data_pipeline_spark.operators import textops
    from security_data_pipeline_spark.streaming.pipeline import (
        maintain_score_moments_stream,
    )

    batches = [
        [(1, "web", 0.25), (2, "web", 0.5), (3, "books", 0.9)],
        [(4, "web", 0.75), (5, "books", 0.7), (6, "code", 0.4)],
    ]
    src = tmp_path / "in"
    src.mkdir()
    base = time.time() - 100
    for bi, rows in enumerate(batches):
        f = src / f"b{bi}.parquet"
        pq.write_table(
            pa.table(
                {
                    "doc_id": [r[0] for r in rows],
                    "source": [r[1] for r in rows],
                    "quality_score": pa.array(
                        [r[2] for r in rows], type=pa.float64()
                    ),
                }
            ),
            str(f),
        )
        os.utime(f, (base + bi, base + bi))

    state = str(tmp_path / "moments")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = maintain_score_moments_stream(
            spark.readStream.schema(
                "doc_id long, source string, quality_score double"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src)),
            state,
            ckpt,
        )
        q.awaitTermination(120)

    run()
    cumulative = spark.createDataFrame(
        [r for b in batches for r in b],
        "doc_id long, source string, quality_score double",
    )
    streamed = textops.moments_to_stats(
        spark.read.parquet(state).drop("_last_batch_id", "_fold_tag"),
        "source",
    )
    got = {
        r["doc_id"]: r["quality_score_z"]
        for r in textops.normalize_with_stats(
            cumulative, streamed, "source", "quality_score"
        ).collect()
    }
    want = {
        r["doc_id"]: r["quality_score_z"]
        for r in textops.normalize_scores_by_group(
            cumulative, "source", "quality_score"
        ).collect()
    }
    assert got == want  # bit-equal, both the sd>0 and degenerate paths
    assert want[6] == 0.0  # single-doc source: degenerate sd -> 0

    # wiped-checkpoint full replay: the stamp guard folds nothing twice
    before = sorted(
        tuple(r) for r in spark.read.parquet(state).collect()
    )
    shutil.rmtree(ckpt)
    run()
    assert sorted(
        tuple(r) for r in spark.read.parquet(state).collect()
    ) == before


def test_streaming_locf_bounded_staleness_equals_batch(spark, tmp_path):
    """maintain_locf_stream(max_gap=...): the carry state pairs every
    value with its observation order, so staleness-bounded fill
    (forward_fill_bounded semantics) rides the SAME state — a carry from
    a previous batch fills only while the gap back to its observation is
    within the bound, including across the batch boundary."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from security_data_pipeline_spark.operators.timeseries import (
        forward_fill_bounded,
    )
    from security_data_pipeline_spark.streaming.pipeline import (
        maintain_locf_stream,
    )

    # k1: obs @1, gap rows @3 (within bound 5, filled cross-batch) and
    # @10 (gap 9 > 5, stays NULL); k2: obs @2, in-batch gap @4 filled
    batches = [
        [("k1", 1, 10.0), ("k2", 2, 20.0), ("k2", 4, None)],
        [("k1", 3, None), ("k1", 10, None)],
    ]
    src = tmp_path / "in"
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
            str(f),
        )
        os.utime(f, (base + bi, base + bi))

    out = str(tmp_path / "out")

    def sink(df, batch_id):
        df.write.mode("append").parquet(out)

    q = maintain_locf_stream(
        spark.readStream.schema("k string, o long, v double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src)),
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
        sink,
        keys=["k"],
        order_col="o",
        cols=["v"],
        max_gap=5.0,
    )
    q.awaitTermination(120)

    got = {
        (r["k"], r["o"]): r["v_ffill"]
        for r in spark.read.parquet(out).collect()
    }
    cumulative = spark.createDataFrame(
        [r for b in batches for r in b], "k string, o long, v double"
    )
    want = {
        (r["k"], r["o"]): r["v_ffill"]
        for r in forward_fill_bounded(
            cumulative, ["k"], "o", "v", max_gap=5.0
        ).collect()
    }
    assert got == want
    assert got[("k1", 3)] == 10.0  # cross-batch carry within bound
    assert got[("k1", 10)] is None  # stale carry refused
    assert got[("k2", 4)] == 20.0  # in-batch bounded fill
