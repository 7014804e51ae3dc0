"""Schema evolution: mergeSchema reads across generations, loud failure on
incompatible type changes, schema_diff reporting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from security_data_pipeline_spark.sources import evolution


def test_merge_schema_reads_across_generations(spark, tmp_path):
    p = str(tmp_path / "data")
    spark.createDataFrame(
        [(1, "a")], "id long, name string"
    ).write.parquet(p)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.mode("append").parquet(p)

    df = evolution.read_evolving_parquet(spark, p)
    assert set(df.columns) == {"id", "name", "score"}
    rows = {r["id"]: r["score"] for r in df.collect()}
    assert rows[1] is None  # pre-column generation surfaces NULL
    assert rows[2] == 9.5
    # default read (no merge) planned from one footer may MISS the new
    # column — the wrapper exists precisely because of that footgun
    plain_cols = set(spark.read.parquet(p).columns)
    assert plain_cols.issubset(df.columns)


def test_incompatible_type_change_fails_loudly(spark, tmp_path):
    p = str(tmp_path / "bad")
    spark.createDataFrame([(1, 5)], "id long, v long").write.parquet(p)
    spark.createDataFrame(
        [(2, "five")], "id long, v string"
    ).write.mode("append").parquet(p)
    with pytest.raises(Exception, match="[Mm]erg|[Ss]chema|compat"):
        evolution.read_evolving_parquet(spark, p).collect()


def test_schema_diff_reports_all_change_kinds(spark):
    old = spark.createDataFrame(
        [(1, "x", 2.0)], "id long, gone string, v double"
    )
    new = spark.createDataFrame(
        [(1, 7, "later")], "id long, v int, fresh string"
    )
    diff = {
        r["column"]: (r["change"], r["from_type"], r["to_type"])
        for r in evolution.schema_diff(old, new).collect()
    }
    assert diff["gone"] == ("dropped", "string", None)
    assert diff["fresh"] == ("added", None, "string")
    assert diff["v"] == ("retyped", "double", "int")
    assert "id" not in diff
    assert evolution.schema_diff(old, old).count() == 0
