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
