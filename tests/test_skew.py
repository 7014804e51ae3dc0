"""Salted aggregation / join must be result-identical to the plain forms."""

from __future__ import annotations

import random

from security_data_pipeline_spark.operators import skew


def _rows(n=400, hot_frac=0.7, seed=3):
    rng = random.Random(seed)
    return [
        (
            0 if rng.random() < hot_frac else rng.randrange(1, 20),
            rng.randrange(1000),
            float(rng.randrange(100)),
        )
        for _ in range(n)
    ]


def test_salted_agg_matches_plain_groupby(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(_rows(), "k long, id long, v double")
    got = {
        r["k"]: (r["n"], r["total"], r["lo"], r["hi"])
        for r in skew.salted_agg(
            df,
            keys=["k"],
            aggs={
                "n": ("id", "count"),
                "total": ("v", "sum"),
                "lo": ("v", "min"),
                "hi": ("v", "max"),
            },
            n_salts=8,
        ).collect()
    }
    exp = {
        r["k"]: (r["n"], r["total"], r["lo"], r["hi"])
        for r in df.groupBy("k")
        .agg(
            F.count("id").alias("n"),
            F.sum("v").alias("total"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    assert got == exp


def test_salted_agg_rejects_non_algebraic(spark):
    import pytest

    df = spark.createDataFrame([(1, 2.0)], "k long, v double")
    with pytest.raises(ValueError, match="not algebraic"):
        skew.salted_agg(df, ["k"], {"a": ("v", "avg")})


def test_salted_join_matches_plain_join(spark):
    left = spark.createDataFrame(_rows(), "k long, id long, v double")
    right = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(15)], "k long, name string"
    )
    got = {
        (r["id"], r["name"])
        for r in skew.salted_join(left, right, on=["k"], n_salts=4).collect()
    }
    exp = {(r["id"], r["name"]) for r in left.join(right, "k").collect()}
    assert got == exp
