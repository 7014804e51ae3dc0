"""Deterministic hash sampling/splitting: stability is the whole point —
assignment must be a pure function of the key, invariant to partitioning
and data subset membership."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from security_data_pipeline_spark.operators import sampling


def test_hash_split_partition_invariant(spark):
    df1 = spark.range(0, 500, 1, 1).withColumnRenamed("id", "k")
    df16 = spark.range(0, 500, 1, 16).withColumnRenamed("id", "k")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["k"]: r["split"] for r in sampling.hash_split(df1, "k", fr).collect()}
    b = {r["k"]: r["split"] for r in sampling.hash_split(df16, "k", fr).collect()}
    assert a == b
    # proportions roughly honored (16-bit quantization, n=500)
    n_train = sum(1 for v in a.values() if v == "train")
    assert 0.7 < n_train / 500 < 0.9


def test_hash_split_subset_stable(spark):
    """A key's split never changes when other rows come and go (appends,
    filters) — the anti-leak property RNG sampling lacks."""
    full = spark.range(0, 300).withColumnRenamed("id", "k")
    sub = full.filter(F.col("k") % 3 == 0)
    fr = {"train": 0.5, "test": 0.5}
    a = {r["k"]: r["split"] for r in sampling.hash_split(full, "k", fr).collect()}
    b = {r["k"]: r["split"] for r in sampling.hash_split(sub, "k", fr).collect()}
    assert all(a[k] == v for k, v in b.items())


def test_hash_sample_matches_split_semantics(spark):
    df = spark.range(0, 400).withColumnRenamed("id", "k")
    kept = {r["k"] for r in sampling.hash_sample(df, "k", 0.25).collect()}
    # same rows every run, fraction approximately honored
    kept2 = {r["k"] for r in sampling.hash_sample(df, "k", 0.25).collect()}
    assert kept == kept2
    assert 0.15 < len(kept) / 400 < 0.35


def test_salt_gives_independent_assignment(spark):
    df = spark.range(0, 400).withColumnRenamed("id", "k")
    fr = {"a": 0.5, "b": 0.5}
    s1 = {r["k"]: r["split"] for r in sampling.hash_split(df, "k", fr).collect()}
    s2 = {
        r["k"]: r["split"]
        for r in sampling.hash_split(df, "k", fr, salt="exp2").collect()
    }
    assert s1 != s2  # different bucketing
    assert set(s1) == set(s2)  # same keys covered


def test_bad_fractions_raise(spark):
    df = spark.range(5).withColumnRenamed("id", "k")
    with pytest.raises(ValueError):
        sampling.hash_split(df, "k", {"a": 0.5, "b": 0.2})


def test_leakage_safe_split_never_straddles_clusters(spark):
    """Hypothesis over random cluster labelings: every cluster's members
    share one split, and unlabeled docs fall back to the plain id-keyed
    hash_split assignment."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from security_data_pipeline_spark.operators import sampling

    fracs = {"train": 0.8, "val": 0.1, "test": 0.1}

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        n=st.integers(20, 80),
        n_clusters=st.integers(1, 10),
        labeled_frac=st.floats(0.2, 1.0),
        seed=st.integers(0, 10**6),
    )
    def check(n, n_clusters, labeled_frac, seed):
        import random

        rng = random.Random(seed)
        docs = spark.createDataFrame(
            [(i, f"t{i}") for i in range(n)], "doc_id long, text string"
        )
        labeled = [i for i in range(n) if rng.random() < labeled_frac]
        clusters = spark.createDataFrame(
            [(i, rng.randrange(n_clusters)) for i in labeled]
            or [(0, 0)][:0],
            "doc_id long, cluster_id long",
        )
        out = sampling.leakage_safe_split(
            docs, clusters, fracs, salt="s"
        ).join(
            clusters.withColumnRenamed("cluster_id", "cl"), "doc_id", "left"
        )
        rows = {r["doc_id"]: (r["split"], r["cl"]) for r in out.collect()}
        assert len(rows) == n
        by_cluster = {}
        for _, (split, cl) in rows.items():
            if cl is not None:
                by_cluster.setdefault(cl, set()).add(split)
        assert all(len(s) == 1 for s in by_cluster.values()), by_cluster
        # unlabeled fallback == plain hash_split keyed on the doc id
        plain = {
            r["doc_id"]: r["split"]
            for r in sampling.hash_split(
                docs.withColumn("_k", F.col("doc_id").cast("string")),
                "_k",
                fracs,
                salt="s",
            ).collect()
        }
        for d, (split, cl) in rows.items():
            if cl is None:
                assert split == plain[d]

    check()


# --- rate_stratified_sample --------------------------------------------------


def _py_keep(doc_id, score, buckets, salt=""):
    import hashlib

    h = hashlib.md5((salt + str(doc_id)).encode()).hexdigest()[:4]
    for t, r in buckets:
        if score >= t:
            if r >= 1.0:
                return True
            if r <= 0.0:
                return False
            return h < format(min(int(r * 65536), 65535), "04x")
    return False


def test_rate_stratified_sample_matches_python_model(spark):
    from security_data_pipeline_spark.operators.sampling import (
        rate_stratified_sample,
    )

    rows = [(i, (i % 100) / 100.0) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, score double")
    buckets = [(0.7, 1.0), (0.5, 0.5), (0.0, 0.1)]
    got = sorted(
        r["doc_id"]
        for r in rate_stratified_sample(df, "doc_id", "score", buckets).collect()
    )
    exp = sorted(i for i, s in rows if _py_keep(i, s, buckets))
    assert got == exp


def test_rate_stratified_sample_is_monotone_in_rate(spark):
    """Raising any bucket's rate only ADDS documents — kept docs never
    churn out as a recipe is tuned."""
    from security_data_pipeline_spark.operators.sampling import (
        rate_stratified_sample,
    )

    rows = [(i, (i % 100) / 100.0) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, score double")
    low = {(r["doc_id"]) for r in rate_stratified_sample(
        df, "doc_id", "score", [(0.5, 0.3), (0.0, 0.05)]).collect()}
    high = {(r["doc_id"]) for r in rate_stratified_sample(
        df, "doc_id", "score", [(0.5, 0.6), (0.0, 0.05)]).collect()}
    assert low <= high


def test_rate_one_keeps_planted_ffff_key(spark):
    """md5('40691')[:4] == 'ffff' — the one-in-65536 key the quantized
    strict comparison (h < 'ffff') silently drops. Rate 1.0 must keep it:
    the 'all of the best' contract, and hash_sample(fraction=1.0) must be
    the identity. Rate 0.0 must keep nothing."""
    import hashlib

    from security_data_pipeline_spark.operators.sampling import (
        hash_sample,
        rate_stratified_sample,
    )

    assert hashlib.md5(b"40691").hexdigest()[:4] == "ffff"
    df = spark.createDataFrame(
        [(40691, 0.9), (1, 0.9), (2, 0.1)], "doc_id long, score double"
    )
    kept = {
        r["doc_id"]
        for r in rate_stratified_sample(
            df, "doc_id", "score", [(0.7, 1.0), (0.0, 0.0)]
        ).collect()
    }
    assert 40691 in kept, "rate-1.0 bucket dropped the ffff-prefix key"
    assert kept == {40691, 1}  # score 0.1 falls in the 0.0-rate bucket
    assert {r["doc_id"] for r in hash_sample(df, "doc_id", 1.0).collect()} == {
        40691,
        1,
        2,
    }
    assert hash_sample(df, "doc_id", 0.0).count() == 0


def test_rate_stratified_sample_validates_buckets(spark):
    import pytest as _pytest

    from security_data_pipeline_spark.operators.sampling import (
        rate_stratified_sample,
    )

    df = spark.createDataFrame([(1, 0.5)], "doc_id long, score double")
    with _pytest.raises(ValueError):
        rate_stratified_sample(df, "doc_id", "score", [])
    with _pytest.raises(ValueError):
        rate_stratified_sample(df, "doc_id", "score", [(0.1, 0.5), (0.7, 0.5)])
    with _pytest.raises(ValueError):
        rate_stratified_sample(df, "doc_id", "score", [(0.5, 1.5)])
