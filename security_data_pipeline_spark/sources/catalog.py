"""Catalog over the driver-generated TPC-H-ish parquet tables (TESTDATA.md).

``load_table(spark, sf_dir, name)`` is the single entry point every query
uses; it normalizes physical quirks of the testdata so downstream operators
see clean logical types:

- ``events.ts`` is INT64 TIMESTAMP(NANOS) in the parquet footer, which Spark
  rejects natively. With ``spark.sql.legacy.parquet.nanosAsLong=true`` it
  arrives as a long; we convert to TimestampType at microsecond precision
  (``ts div 1000`` — integer division; a double roundtrip would lose
  precision on epoch-nanos magnitudes) matching DuckDB's TIMESTAMP cast.

Scale note: loads are bare ``spark.read.parquet`` + a projection — predicate
pushdown and column pruning flow through to the scan untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from security_data_pipeline_spark.session import configure

TESTDATA_TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, normalizing physical encoding quirks."""
    configure(spark)  # idempotent; needed when the caller built the session
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_field = df.schema["ts"]
        if isinstance(ts_field.dataType, T.LongType):
            # nanos → micros via integer division, then to timestamp (UTC).
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
    # Untagged parquet timestamps can still surface as TIMESTAMP_NTZ when the
    # inferTimestampNTZ conf could not be applied (static-conf deployments) or
    # the scan was planned before configure() ran. The session runs UTC, so
    # NTZ -> TIMESTAMP is value-preserving; epoch math downstream needs it.
    ntz_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.TimestampNTZType)
    ]
    for c in ntz_cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql queries."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
