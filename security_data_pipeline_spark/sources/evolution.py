"""Schema evolution: reading a dataset whose files were written across
schema generations, and reporting what changed between two schemas — the
source-side reality of any pipeline that runs for years (columns get
added; old files must surface NULLs, not errors; a silent type change must
be a loud report, not a downstream cast surprise).

Pairs with the VALUE-drift gate (``operators/drift.py``): `value_drift`
asks "did the data's distribution move"; :func:`schema_diff` asks "did the
data's SHAPE move".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_evolving_parquet(
    spark: SparkSession,
    path: str,
    merge_schema: bool = True,
    target_schema: str | None = None,
) -> DataFrame:
    """Read a parquet dataset written across schema generations.

    Two evolution regimes, matching what parquet actually supports:

    - **Additive** (columns added over time): ``mergeSchema=True`` unions
      every file footer's schema (one extra footer pass at planning;
      per-file, not per-row cost) — rows from files predating a column
      surface NULL for it. ANY type change, even a lossless widening like
      int → bigint, fails the merge loudly at plan time — exactly where a
      schema break should surface, not inside a downstream cast.
    - **Widened** (a column's type grew, e.g. int32 → int64 when a
      counter outgrew its type): pass ``target_schema`` (DDL string or
      StructType) declaring the CURRENT schema. The parquet reader
      upcasts old files' narrower physical types losslessly during the
      scan and fills columns absent from old files with NULL — no footer
      sweep at all (the declared schema skips inference), which is also
      the cheaper call on a 100 TB / million-file dataset.
    """
    if target_schema is not None:
        return spark.read.schema(target_schema).parquet(path)
    return (
        spark.read.option("mergeSchema", str(merge_schema).lower())
        .parquet(path)
    )


def schema_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Schema drift report between two DataFrames: one row per changed
    column — ``(column, change ∈ added|dropped|retyped|renullabled,
    from_type, to_type)``. Driver-side over the two schema objects (no
    jobs); returned as a DataFrame so it pipelines into alerting sinks
    like any other quality check. An empty result means the shapes agree.
    """
    old_fields = {f.name: f for f in old.schema.fields}
    new_fields = {f.name: f for f in new.schema.fields}
    rows: list[tuple[str, str, str | None, str | None]] = []
    for name in sorted(set(old_fields) | set(new_fields)):
        o, n = old_fields.get(name), new_fields.get(name)
        if o is None:
            rows.append((name, "added", None, n.dataType.simpleString()))
        elif n is None:
            rows.append((name, "dropped", o.dataType.simpleString(), None))
        elif o.dataType != n.dataType:
            rows.append(
                (
                    name,
                    "retyped",
                    o.dataType.simpleString(),
                    n.dataType.simpleString(),
                )
            )
        elif o.nullable != n.nullable:
            rows.append(
                (
                    name,
                    "renullabled",
                    f"nullable={o.nullable}",
                    f"nullable={n.nullable}",
                )
            )
    spark = old.sparkSession
    return spark.createDataFrame(
        rows, "column string, change string, from_type string, to_type string"
    ).orderBy("column") if rows else spark.createDataFrame(
        [], "column string, change string, from_type string, to_type string"
    )
