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


def test_target_schema_widens_and_null_fills(spark, tmp_path):
    """The declared-schema path: old int32 files upcast losslessly to the
    widened bigint column, files missing a column surface NULL, and no
    footer sweep is needed (mergeSchema would reject the retype)."""
    from pyspark.sql import functions as F

    from security_data_pipeline_spark.sources.evolution import (
        read_evolving_parquet,
    )

    root = str(tmp_path / "ds")
    spark.range(3).select(
        F.col("id").cast("int").alias("n")
    ).write.parquet(f"{root}/gen=1")
    spark.range(3, 6).select(
        F.col("id").alias("n"), F.lit(7).alias("extra")
    ).write.parquet(f"{root}/gen=2")

    df = read_evolving_parquet(
        spark, root, target_schema="n bigint, extra int, gen int"
    )
    assert df.schema.simpleString() == (
        "struct<n:bigint,extra:int,gen:int>"
    )
    rows = {r["n"]: (r["extra"], r["gen"]) for r in df.collect()}
    assert rows[0] == (None, 1)  # old file: upcast + NULL-filled
    assert rows[5] == (7, 2)
    assert sum(v for v in rows) == 15  # all six rows, summed as long

    # and the merge path still fails LOUDLY on the same layout
    import pytest

    with pytest.raises(Exception) as ei:
        read_evolving_parquet(spark, root, merge_schema=True).schema
    assert "MERGE" in str(ei.value).upper()
