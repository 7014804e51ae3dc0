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
