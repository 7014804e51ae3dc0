"""Bloom-filter decontamination + KMV overlap sketches: superset
guarantee, false-positive bound, map-only plan shape, mergeability, and
estimator accuracy (operators/bloom.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from security_data_pipeline_spark.operators import bloom
from security_data_pipeline_spark.operators.dedup import (
    contaminated_doc_ids,
    shingles,
)

M_BITS = 1 << 14
K = 3


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bloom_flag_is_superset_of_exact(spark, sf_smoke):
    """Every exactly-contaminated doc is Bloom-flagged: FPs only ever
    over-drop, nothing contaminated slips through."""
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    bench = docs.filter(F.col("doc_id") < 20)
    rest = docs.filter(F.col("doc_id") >= 20)
    items = bench.select(F.explode(shingles("text", 4)).alias("g")).distinct()
    bf = bloom.bloom_filter_frame(items, "g", M_BITS, K)
    flagged = bloom.flag_bloom_hits(rest, bf, "text", 4, M_BITS, K)
    bl = {
        r["doc_id"]
        for r in flagged.filter(F.col("n_bloom_hits") > 0)
        .select("doc_id")
        .collect()
    }
    ex = {r["doc_id"] for r in contaminated_doc_ids(rest, bench, n=4).collect()}
    assert ex <= bl, f"exact hits missing from bloom: {sorted(ex - bl)[:5]}"


def test_bloom_false_positive_rate_bounded(spark):
    """Disjoint probe set: empirical FP fraction stays within 4x the
    analytic (set_bits/m)^k bound (the 4x absorbs small-sample noise)."""
    members = _docs(
        spark, [(i, f"m{i} a{i} b{i} c{i}") for i in range(500)]
    )
    probes = _docs(
        spark, [(i, f"q{i} x{i} y{i} z{i}") for i in range(2000)]
    )
    items = members.select(F.explode(shingles("text", 4)).alias("g")).distinct()
    bf = bloom.bloom_filter_frame(items, "g", M_BITS, K).localCheckpoint()
    set_bits = bf.select(
        F.aggregate(
            "bloom", F.lit(0).cast("long"), lambda acc, w: acc + F.bit_count(w)
        ).alias("s")
    ).first()["s"]
    flagged = bloom.flag_bloom_hits(probes, bf, "text", 4, M_BITS, K)
    n_fp = flagged.filter(F.col("n_bloom_hits") > 0).count()
    analytic = (set_bits / M_BITS) ** K
    assert n_fp / 2000 <= max(4 * analytic, 0.01), (
        f"fp_rate={n_fp / 2000:.4f} vs analytic={analytic:.4f} "
        f"(set_bits={set_bits})"
    )


def test_flag_bloom_hits_is_map_only(spark, sf_smoke):
    """The corpus pass never shuffles: with the filter frame
    materialized, the flag plan is a BroadcastNestedLoopJoin against one
    row with ZERO hash-partitioning exchanges — the 100 TB contract."""
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    items = docs.filter(F.col("doc_id") < 20).select(
        F.explode(shingles("text", 4)).alias("g")
    )
    bf = bloom.bloom_filter_frame(items, "g", M_BITS, K).localCheckpoint()
    flagged = bloom.flag_bloom_hits(
        docs.filter(F.col("doc_id") >= 20), bf, "text", 4, M_BITS, K
    )
    plan = flagged._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_bloom_word_rows_merge_equals_joint_build(spark):
    """Mergeability (the streaming fold contract): bit_or-merging two
    word-row sets equals building over the union of items."""
    a = _docs(spark, [(i, f"a{i} p q r s") for i in range(50)])
    b = _docs(spark, [(i, f"b{i} t u v w") for i in range(50)])
    ga = a.select(F.explode(shingles("text", 4)).alias("g"))
    gb = b.select(F.explode(shingles("text", 4)).alias("g"))
    wa = bloom.bloom_word_rows(ga, "g", M_BITS, K)
    wb = bloom.bloom_word_rows(gb, "g", M_BITS, K)
    merged = (
        wa.unionByName(wb).groupBy("i").agg(F.bit_or("w").alias("w"))
    )
    joint = bloom.bloom_word_rows(ga.unionByName(gb), "g", M_BITS, K)
    got = {(r["i"], r["w"]) for r in merged.collect()}
    exp = {(r["i"], r["w"]) for r in joint.collect()}
    assert got == exp


def test_kmv_capped_path_matches_uncapped(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    g = docs.select(F.explode(shingles("text", 4)).alias("g"))
    plain = [r["h"] for r in bloom.kmv_sketch(g, "g", 128).collect()]
    n_distinct = g.select(bloom.h60(F.col("g")).alias("h")).distinct().count()
    cap = bloom.kmv_cap(n_distinct, 128)
    capped = [
        r["h"] for r in bloom.kmv_sketch(g, "g", 128, h_cap=cap).collect()
    ]
    assert plain == capped


def test_kmv_too_tight_cap_raises(spark):
    df = _docs(spark, [(i, f"t{i}") for i in range(500)]).select(
        F.col("text").alias("g")
    )
    with pytest.raises(ValueError, match="too tight"):
        bloom.kmv_sketch(df, "g", 64, h_cap=1)


def test_kmv_overlap_estimates_within_band(spark):
    """Hypothesis over random two-corpus overlaps: jaccard_est lands
    within 6 standard errors of exact (deterministic given the md5 hash,
    so a failure is a real estimator bug, not flake)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    k = 128

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        n_a=st.integers(300, 800),
        n_shared=st.integers(0, 300),
        salt=st.integers(0, 10**6),
    )
    def check(n_a, n_shared, salt):
        a_items = [f"s{salt}a{i}" for i in range(n_a)]
        shared = [f"s{salt}c{i}" for i in range(n_shared)]
        b_items = [f"s{salt}b{i}" for i in range(400)]
        a = spark.createDataFrame([(x,) for x in a_items + shared], "g string")
        b = spark.createDataFrame([(x,) for x in b_items + shared], "g string")
        est = bloom.kmv_overlap(
            bloom.kmv_sketch(a, "g", k), bloom.kmv_sketch(b, "g", k), k
        ).first()
        union = n_a + 400 + n_shared
        j = n_shared / union
        se = max((j * (1 - j) / k) ** 0.5, 1.0 / k)
        assert abs(est["jaccard_est"] - j) <= 6 * se + 0.02, (
            f"est={est['jaccard_est']} exact={j} se={se}"
        )
        for side, n_true in (("est_distinct_a", n_a + n_shared),
                             ("est_distinct_b", 400 + n_shared)):
            rel = abs(est[side] - n_true) / n_true
            assert rel <= 6 / (k ** 0.5), f"{side}={est[side]} true={n_true}"

    check()
