"""Skew mitigation: salted aggregation and salted broadcast-replicated join.

SURVEY.md §4.2 / §7.3(5): AQE handles skewed *sort-merge joins* at runtime,
but a skewed ``groupBy`` key or a skewed shuffled-hash join still serializes
the hot key into one task. These helpers make the standard salting patterns
reusable:

- :func:`salted_agg` — two-phase aggregation: partial agg on
  ``(keys, salt)`` spreads a hot key over ``n_salts`` tasks, then a final
  combine on ``keys`` merges the (tiny) partials. Only algebraic aggregates
  (count / sum / min / max) are offered — they re-combine losslessly.
- :func:`salted_join` — left-skewed equi-join: every left row gets a
  deterministic salt, the (small) right side is exploded ``n_salts``×, and
  the join runs on ``keys + salt``. Right-side duplication costs
  ``n_salts × |R|`` — only for genuinely small right sides.

The salt is ``xxhash64(whole row) mod n`` — deterministic (re-runs and
retried tasks produce identical results) yet spreads a hot key across tasks.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ALGEBRAIC = {
    "count": (F.count, F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def _salt(df: DataFrame, n_salts: int) -> Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase (salted) aggregation.

    ``aggs`` maps output alias → ``(column, fn)`` with fn in
    count / sum / min / max. Result is identical to
    ``df.groupBy(keys).agg(...)``; the physical plan differs: the first
    shuffle is on ``(keys, salt)`` (hot keys spread over ``n_salts`` tasks),
    the second shuffle moves only ``n_salts`` partial rows per key.
    """
    keys = list(keys)
    for alias, (_, fn) in aggs.items():
        if fn not in _ALGEBRAIC:
            raise ValueError(
                f"{alias}: '{fn}' is not algebraic; use a plain groupBy"
            )
    partial = (
        df.withColumn("_salt", _salt(df, n_salts))
        .groupBy(*keys, "_salt")
        .agg(
            *[
                _ALGEBRAIC[fn][0](F.col(col)).alias(alias)
                for alias, (col, fn) in aggs.items()
            ]
        )
    )
    return partial.groupBy(*keys).agg(
        *[
            _ALGEBRAIC[fn][1](F.col(alias)).alias(alias)
            for alias, (_, fn) in aggs.items()
        ]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with a left-side hot key spread over ``n_salts`` tasks.

    The right side is replicated once per salt value (explode of a literal
    range), so the join on ``keys + salt`` partitions the hot key's rows
    across tasks instead of funneling them into one.
    """
    on = list(on)
    l = left.withColumn("_salt", _salt(left, n_salts))
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    return l.join(r, on + ["_salt"], how).drop("_salt")


def fan_out(
    df: DataFrame, by: str | Column, min_partitions: int | None = None
) -> DataFrame:
    """Decouple compute parallelism from file layout for CPU-heavy map work.

    A parquet file is splittable only at row-group granularity; a
    single-row-group file scans as ONE partition, which serializes every
    per-row stage until the first shuffle — shingling, hashing, vector math
    — onto one core no matter how many the cluster has. This hash-partitions
    the rows on ``by`` (a high-cardinality key, e.g. the row id) up to
    ``min_partitions`` (default: the cluster's defaultParallelism) BEFORE
    the expensive expressions run, so the cheap raw rows shuffle once and
    the heavy compute fans out.

    Hash-by-key over round-robin deliberately: round-robin repartition must
    locally sort every column first (retry determinism, SPARK-23207) and
    showed multi-second latency spikes under load in this workload; hash
    partitioning is deterministic with no sort, and a unique key spreads
    rows evenly. Explicit numPartitions also keeps AQE from coalescing the
    fan-out away.

    No-op when the scan already yields enough partitions (the normal case
    at scale, where inputs are many files × many row groups) — safe to
    leave in place for 100 TB runs; it only bites on pathological layouts
    (one giant unsplittable file, heavily coalesced upstream output, a
    single gzip part).

    The parallelism probe avoids ``df.rdd.getNumPartitions()`` where it
    can: the ``.rdd`` conversion builds a second QueryExecution and
    physically plans the query a full extra time per call — pure
    driver-side noise at high query rates. Instead: ``df.inputFiles()``
    (a FileIndex lookup the scan relation already caches) short-circuits
    the two common cases — ≥target files is wide enough (caveat: Spark
    bin-packs tiny files, so thousands-of-tiny-files corpora can pack
    below file count; for such layouts pass ``min_partitions``
    explicitly), and for a handful of LOCAL files the partition count is
    computed from file sizes with Spark's own split formula
    (``FilePartition.maxSplitBytes``). Only non-file-backed or remote
    small-file plans fall back to the exact ``.rdd`` probe.
    """
    spark = df.sparkSession
    target = (
        min_partitions
        if min_partitions is not None
        else spark.sparkContext.defaultParallelism
    )
    current = _estimate_scan_partitions(df, spark, target)
    if current is None:
        current = df.rdd.getNumPartitions()
    if current >= target:
        return df
    key = F.col(by) if isinstance(by, str) else by
    return df.repartition(target, key)


def _estimate_scan_partitions(df, spark, target: int) -> int | None:
    """Partition-count estimate for file-backed plans without an ``.rdd``
    conversion; None → caller should use the exact probe."""
    import math
    import os
    from urllib.parse import unquote, urlparse

    try:
        files = df.inputFiles()
    except Exception:  # e.g. streaming plans don't expose a FileIndex
        return None
    if not files:
        return None
    if len(files) >= target:
        return len(files)
    sizes = []
    for f in files:
        parsed = urlparse(f)
        if parsed.scheme not in ("", "file"):
            return None  # remote FS: stat RPCs aren't worth the probe
        try:
            sizes.append(os.path.getsize(unquote(parsed.path)))
        except OSError:
            return None
    # FilePartition.maxSplitBytes: min(maxPartitionBytes,
    #   max(openCostInBytes, totalBytes/defaultParallelism)), then greedy
    # bin-packing — ceil(total/maxSplit) approximates the pack count
    def _bytes_conf(key: str, default: int) -> int:
        raw = str(spark.conf.get(key, str(default))).lower().rstrip("b")
        mult = 1
        for suffix, m in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30)):
            if raw.endswith(suffix):
                raw, mult = raw[:-1], m
                break
        return int(raw) * mult

    max_part = _bytes_conf("spark.sql.files.maxPartitionBytes", 128 << 20)
    open_cost = _bytes_conf("spark.sql.files.openCostInBytes", 4 << 20)
    parallelism = spark.sparkContext.defaultParallelism
    total = sum(s + open_cost for s in sizes)
    max_split = min(max_part, max(open_cost, total // max(parallelism, 1)))
    return max(1, math.ceil(total / max(max_split, 1)))
