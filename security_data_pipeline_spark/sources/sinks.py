"""Writers.

The reference writes a single CSV with ISO timestamps
(``/root/reference/src/pipeline.py:50-51``). At scale the engine writes
partitioned parquet; CSV remains for small-output parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_csv(
    df: DataFrame,
    path: str,
    single_file: bool = False,
    timestamp_format: str = "yyyy-MM-dd HH:mm:ssXXX",
) -> None:
    """CSV sink with header. ``single_file=True`` coalesces to one part file
    (small-output parity with the reference; never at scale)."""
    out = df.coalesce(1) if single_file else df
    (
        out.write.option("header", True)
        .option("timestampFormat", timestamp_format)
        .mode("overwrite")
        .csv(path)
    )


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
) -> None:
    """Parquet sink; partition by low-cardinality date/key columns so
    downstream scans get partition pruning (design choice for scale — the
    reference has no partitioned output)."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: tuple[str, ...],
    num_buckets: int = 32,
    sort_cols: tuple[str, ...] = (),
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sorted) parquet table.

    Tables bucketed identically on the join key let Spark run equi-joins and
    aggregations with NO exchange (each bucket pair joins locally) — the
    pre-shuffle investment for fact tables that are joined or sessionized on
    the same key repeatedly (e.g. events by user_id at 100 TB). ``sort_cols``
    additionally skips the sort-merge sort. ``path`` makes it an external
    table (defaults to the session warehouse dir); bucketing metadata lives
    in the catalog, so readers must use ``spark.table(name)``.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(name)


def write_jsonl(
    df: DataFrame,
    path: str,
    single_file: bool = False,
    compression: str | None = None,
) -> None:
    """JSON-lines sink — the interchange format of LLM corpus tooling.

    One JSON object per line, so files split cleanly across executors on
    read-back (even gzip parts parallelize per-file). ``compression``:
    "gzip" | "zstd" | None.
    """
    out = df.coalesce(1) if single_file else df
    writer = out.write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    compression: str = "zstd",
) -> None:
    """ORC sink — the other columnar interchange format (Hive/Trino
    ecosystems). Same pruning properties as parquet: stripe-level min/max
    stats + dictionary/bloom indexes, predicate pushdown on read is on by
    default (`spark.sql.orc.filterPushdown`)."""
    writer = df.write.mode("overwrite").option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_orc(spark, path: str) -> DataFrame:
    """ORC source; schema comes from file metadata (self-describing, like
    parquet — no inference pass)."""
    return spark.read.orc(path)


def read_jsonl(spark, path: str, schema=None) -> DataFrame:
    """JSON-lines source. Pass an explicit schema at scale: schema-less reads
    trigger a full inference pass over the data (twice the IO) and infer
    unstable types across file subsets — same determinism argument as the
    CSV reader's explicit StructType (SURVEY.md §1.2)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
