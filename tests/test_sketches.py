"""Misra-Gries heavy-hitters sketch: brackets and detection guarantee under
arbitrary partitionings, verified against exact counts."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from security_data_pipeline_spark.operators import sketches


def _exact(df, col):
    return {
        r["item"]: r["n"]
        for r in df.filter(F.col(col).isNotNull())
        .groupBy(F.col(col).cast("string").alias("item"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }


def _check_invariants(df, col, k, n_partitions):
    hh = {
        r["item"]: (r["count_lo"], r["count_hi"], r["threshold"])
        for r in sketches.heavy_hitters(
            df.repartition(n_partitions), col, k=k
        ).collect()
    }
    exact = _exact(df, col)
    thr = next(iter(hh.values()))[2] if hh else 0
    for item, (lo, hi, _) in hh.items():
        assert lo <= exact[item] <= hi, (item, lo, exact[item], hi)
    for item, n in exact.items():
        if n > thr:
            assert item in hh, (item, n, thr)
    return hh, exact, thr


def test_small_cardinality_is_exact(spark):
    rows = [(i, f"t{i % 4}") for i in range(1000)]
    df = spark.createDataFrame(rows, "i long, item string")
    hh, exact, thr = _check_invariants(df, "item", k=16, n_partitions=7)
    assert thr == 0
    assert {i: lo for i, (lo, _, _) in hh.items()} == exact


def test_planted_heavy_item_always_detected(spark):
    rng = random.Random(3)
    # 60% mass on one item, long tail of 5000 singletons
    rows = [(i, "HOT") for i in range(6000)] + [
        (10_000 + i, f"u{i}") for i in range(4000)
    ]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "i long, item string")
    for parts in (1, 8, 32):
        hh, exact, thr = _check_invariants(df, "item", k=8, n_partitions=parts)
        assert "HOT" in hh
        lo, hi, _ = hh["HOT"]
        assert lo <= 6000 <= hi
        # the sketch must actually be sketching: far fewer candidates than
        # distinct items, threshold strictly positive on this tail
        assert len(hh) <= 8 * parts
        assert thr > 0


def test_nulls_ignored_and_weighted_batches(spark):
    rows = [(1, None)] * 50 + [(2, "a")] * 30 + [(3, "b")] * 20
    df = spark.createDataFrame(rows, "i long, item string")
    hh, exact, thr = _check_invariants(df, "item", k=4, n_partitions=3)
    assert "a" in hh and "b" in hh and None not in hh
    assert exact == {"a": 30, "b": 20}


def test_randomized_invariants(spark):
    rng = random.Random(11)
    rows = [
        (i, f"v{int(rng.paretovariate(1.1)) % 500}") for i in range(20_000)
    ]
    df = spark.createDataFrame(rows, "i long, item string")
    for k, parts in ((4, 16), (16, 4), (64, 32)):
        _check_invariants(df, "item", k=k, n_partitions=parts)


def _invariants_vs_exact(state_rows, exact):
    state = {r["item"]: (r["count_lo"], r["threshold"]) for r in state_rows}
    thr = next(iter(state.values()))[1] if state else 0
    for item, (lo, t) in state.items():
        assert lo <= exact.get(item, 0) <= lo + t, (item, lo, exact.get(item), t)
    for item, n in exact.items():
        if n > thr:
            assert item in state, (item, n, thr)
    return state, thr


def test_merge_heavy_hitter_states_invariants(spark):
    rng = random.Random(5)
    rows1 = [(i, "HOT") for i in range(3000)] + [
        (10_000 + i, f"a{i % 300}") for i in range(2000)
    ]
    rows2 = [(i, "HOT") for i in range(1000)] + [
        (50_000 + i, f"b{i % 400}") for i in range(3000)
    ]
    rng.shuffle(rows1)
    rng.shuffle(rows2)
    d1 = spark.createDataFrame(rows1, "i long, item string")
    d2 = spark.createDataFrame(rows2, "i long, item string")
    s1 = sketches.heavy_hitters(d1, "item", k=8)
    s2 = sketches.heavy_hitters(d2, "item", k=8)
    merged = sketches.merge_heavy_hitter_states(s1, s2, k=8).collect()
    assert len(merged) <= 8  # bounded state after merge
    exact = {}
    for _, it in rows1 + rows2:
        exact[it] = exact.get(it, 0) + 1
    state, thr = _invariants_vs_exact(merged, exact)
    assert "HOT" in state  # 4000 occurrences dominate every threshold
    assert thr > 0


def test_streaming_heavy_hitters_fold(spark, tmp_path):
    """Three micro-batches folded into a persisted <= k-row sketch whose
    brackets and detection guarantee hold over the WHOLE stream."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from security_data_pipeline_spark.streaming.pipeline import (
        maintain_heavy_hitters_stream,
    )

    src = tmp_path / "in"
    src.mkdir()
    batches = [
        ["HOT"] * 500 + [f"x{i}" for i in range(200)],
        ["HOT"] * 300 + [f"y{i}" for i in range(300)],
        ["HOT"] * 400 + ["WARM"] * 150 + [f"z{i}" for i in range(100)],
    ]
    for bi, items in enumerate(batches):
        pq.write_table(
            pa.table({"item": items}), src / f"b{bi}.parquet"
        )
    stream = (
        spark.readStream.schema("item string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = maintain_heavy_hitters_stream(
        stream,
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
        item_col="item",
        k=8,
    )
    q.awaitTermination(120)
    state_rows = spark.read.parquet(str(tmp_path / "state")).collect()
    assert 0 < len(state_rows) <= 8
    exact = {}
    for items in batches:
        for it in items:
            exact[it] = exact.get(it, 0) + 1
    state, thr = _invariants_vs_exact(state_rows, exact)
    assert "HOT" in state  # 1200 total must survive every fold


def test_empty_candidate_set_carries_threshold(spark):
    # k=2, one partition, three equal-weight items: the third insert's
    # decrement round zeroes every counter — the sketch has NO candidates
    # but a real threshold, which must survive as a NULL-item carrier row
    # (and through a merge), never be silently dropped
    rows = [(i, it) for i, it in enumerate(["h"] * 5 + ["w"] * 5 + ["x"] * 5)]
    df = spark.createDataFrame(rows, "i long, item string").coalesce(1)
    hh = sketches.heavy_hitters(df, "item", k=2).collect()
    assert len(hh) == 1
    assert hh[0]["item"] is None
    assert hh[0]["count_lo"] == 0 and hh[0]["threshold"] == 5
    # exact counts are all 5 <= threshold: the detection guarantee holds
    # vacuously, as it must

    other = spark.createDataFrame(
        [(i, "HOT") for i in range(40)], "i long, item string"
    ).coalesce(1)
    s2 = sketches.heavy_hitters(other, "item", k=2)
    merged = sketches.merge_heavy_hitter_states(
        sketches.heavy_hitters(df, "item", k=2), s2, k=2
    ).collect()
    state = {r["item"]: (r["count_lo"], r["threshold"]) for r in merged}
    assert "HOT" in state
    lo, thr = state["HOT"]
    assert thr >= 5  # the degenerate sketch's error bound was carried
    assert lo <= 40 <= lo + thr


def test_count_min_never_underestimates_and_merges(spark):
    rng = random.Random(9)
    rows = [(i, f"u{int(rng.paretovariate(1.2)) % 400}") for i in range(20_000)]
    df = spark.createDataFrame(rows, "i long, item string")
    from collections import Counter

    exact = Counter(it for _, it in rows)
    sk = sketches.count_min_build(df, "item", depth=4, width=256)
    assert sk.count() <= 4 * 256  # bounded regardless of cardinality
    items = spark.createDataFrame(
        [(it,) for it in list(exact) + ["NEVER_SEEN"]], "item string"
    )
    est = {
        r["item"]: r["cm_estimate"]
        for r in sketches.count_min_estimate(
            sk, items, "item", depth=4, width=256
        ).collect()
    }
    assert est["NEVER_SEEN"] == 0
    n = len(rows)
    import math

    for it, true in exact.items():
        assert est[it] >= true, (it, est[it], true)  # one-sided, always
        assert est[it] <= true + math.e / 256 * n * 3  # generous eps bound

    # mergeability: sketches of two halves, cells summed, equal the
    # whole-stream sketch EXACTLY (counter matrices add)
    h1 = spark.createDataFrame(rows[:10_000], "i long, item string")
    h2 = spark.createDataFrame(rows[10_000:], "i long, item string")
    merged = (
        sketches.count_min_build(h1, "item", depth=4, width=256)
        .unionByName(sketches.count_min_build(h2, "item", depth=4, width=256))
        .groupBy("row_id", "col_id")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = sketches.count_min_build(df, "item", depth=4, width=256)
    a = {(r["row_id"], r["col_id"]): r["cnt"] for r in merged.collect()}
    b = {(r["row_id"], r["col_id"]): r["cnt"] for r in whole.collect()}
    assert a == b


def test_streaming_fold_replay_is_exactly_once(spark, tmp_path):
    """foreachBatch is at-least-once: re-delivering a batch (crash after
    the state overwrite, before checkpoint commit) must NOT double-merge —
    the _last_batch_id guard skips the merge and the state is unchanged."""
    from security_data_pipeline_spark.streaming.pipeline import (
        _heavy_hitter_fold,
    )

    state = str(tmp_path / "state")
    fold = _heavy_hitter_fold(state, "item", k=8)
    b0 = spark.createDataFrame(
        [("HOT",)] * 50 + [(f"x{i}",) for i in range(20)], "item string"
    )
    b1 = spark.createDataFrame(
        [("HOT",)] * 30 + [("WARM",)] * 25, "item string"
    )
    fold(b0, 0)
    fold(b1, 1)

    def snap():
        return sorted(
            map(tuple, spark.read.parquet(state).collect())
        )

    before = snap()
    rows_before = spark.read.parquet(state).collect()
    assert all(r["_last_batch_id"] == 1 for r in rows_before)
    fold(b1, 1)  # replay: guard must skip the merge entirely
    assert snap() == before
    # the brackets still hold against exact counts over b0+b1 once
    rows = spark.read.parquet(state).collect()
    by_item = {r["item"]: r for r in rows if r["item"] is not None}
    hot = by_item["HOT"]
    assert hot["count_lo"] <= 80 <= hot["count_lo"] + hot["threshold"]

    # crash-mid-swap recovery under replay: state dir gone, scratch holds
    # the last generation -> the guard completes the swap, still no merge
    import shutil

    shutil.rmtree(state)
    fold(b1, 1)
    assert snap() == before

    # a genuinely NEW batch after the replay still folds normally
    b2 = spark.createDataFrame([("HOT",)] * 10, "item string")
    fold(b2, 2)
    after = spark.read.parquet(state).collect()
    assert all(r["_last_batch_id"] == 2 for r in after)
    hot = {r["item"]: r for r in after if r["item"] is not None}["HOT"]
    assert hot["count_lo"] <= 90 <= hot["count_lo"] + hot["threshold"]


def test_percentile_approx_rank_bound_and_check_can_fire(spark):
    """The Greenwald-Khanna rank guarantee the events_quantile_check
    asserts: the approx value's exact-rank interval covers q*n within
    n/accuracy (+1 slack); and the SAME bound arithmetic flags a value
    that is genuinely at the wrong rank — the self-check is falsifiable,
    not vacuous."""
    import random

    rng = random.Random(3)
    vals = [rng.random() * 100.0 for _ in range(20_000)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    n = len(vals)
    acc = 1000
    qs = [0.25, 0.5, 0.9]
    avs = df.agg(F.percentile_approx("v", qs, acc).alias("a")).first()["a"]
    s = sorted(vals)
    for q, av in zip(qs, avs):
        lo = sum(1 for x in vals if x < av) + 1
        hi = sum(1 for x in vals if x <= av)
        err = n / acc + 1
        assert lo - err <= q * n <= hi + err, (q, lo, hi)
    # falsifiability: the q=0.9 bound must REJECT the true median
    med = s[n // 2]
    lo = sum(1 for x in vals if x < med) + 1
    hi = sum(1 for x in vals if x <= med)
    assert not (lo - (n / acc + 1) <= 0.9 * n <= hi + (n / acc + 1))
