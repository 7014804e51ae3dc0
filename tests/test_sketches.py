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
