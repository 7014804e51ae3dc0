"""Partitioned parquet sink → partition pruning on read-back."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from security_data_pipeline_spark.sources.catalog import load_table
from security_data_pipeline_spark.sources.sinks import write_parquet


def test_partitioned_sink_prunes_on_read(spark, sf_smoke):
    ev = load_table(spark, sf_smoke, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/events_partitioned"
        write_parquet(ev, path, partition_by=("event_date",))

        back = spark.read.parquet(path)
        one_day = back.filter(F.col("event_date") == "2024-01-03")
        plan = one_day._jdf.queryExecution().executedPlan().toString()
        # the date predicate must become a PartitionFilter on the scan
        # (directory-level pruning), not a post-scan row filter
        assert "PartitionFilters: [" in plan
        assert "event_date" in plan.split("PartitionFilters:")[1].split("]")[0]
        n_total = back.count()
        n_day = one_day.count()
        assert 0 < n_day < n_total


def test_bucketed_tables_join_without_exchange(spark, sf_smoke, tmp_path):
    """Identically-bucketed tables equi-join with zero shuffles."""
    from security_data_pipeline_spark.sources.sinks import write_bucketed_table

    orders = load_table(spark, sf_smoke, "orders")
    lineitem = load_table(spark, sf_smoke, "lineitem")
    write_bucketed_table(
        orders, "t_orders_b", ("o_orderkey",), 4, ("o_orderkey",),
        path=str(tmp_path / "ob"),
    )
    write_bucketed_table(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_lineitem_b", ("o_orderkey",), 4, ("o_orderkey",),
        path=str(tmp_path / "lb"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("t_orders_b").join(
            spark.table("t_lineitem_b"), "o_orderkey"
        )
        n = j.count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert n == lineitem.count()
        assert "Exchange" not in plan, plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_jsonl_roundtrip_with_explicit_schema(spark, sf_smoke):
    from security_data_pipeline_spark.sources.sinks import read_jsonl, write_jsonl

    docs = load_table(spark, sf_smoke, "documents").select(
        "doc_id", "source", "text"
    )
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/docs_jsonl"
        write_jsonl(docs, path, compression="gzip")
        back = read_jsonl(spark, path, schema=docs.schema)
        assert back.schema == docs.schema
        assert back.count() == docs.count()
        # value-level: checksum of ids and text lengths must survive
        agg = lambda df: df.agg(
            F.sum("doc_id").alias("s"), F.sum(F.length("text")).alias("l")
        ).first()
        assert agg(back) == agg(docs)
