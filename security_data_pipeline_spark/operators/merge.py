"""CDC-style merge operators: upsert and SCD2 history — the maintenance
half of a warehouse pipeline (the reference is append-only batch; a 100 TB
deployment re-lands changed dimension rows daily).

Both operators are single-shuffle plans:

- :func:`merge_upsert` — one full-outer equi-join on the key; every row is
  classified ``insert`` / ``update`` / ``unchanged`` and the surviving
  attribute set is source-wins. No driver-side diffing, no second pass.
- :func:`scd2_apply` — type-2 slowly-changing-dimension apply: one join of
  the update batch against the CURRENT slice of the dimension classifies
  each key, then closed-out rows, new versions, and untouched history are
  assembled by union — three selects over the two join legs, still one
  shuffle. Equality is null-safe (``<=>``): NULL → value and value → NULL
  both count as changes.

On a real deployment the output lands via the format's MERGE primitive
(Delta/Iceberg); these operators compute the same row set engine-side so
the semantics are portable and oracle-checkable.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _any_attr_differs(attrs: Sequence[str], suffix: str) -> Column:
    # initial False: a keys-only merge (no shared attrs) classifies every
    # matched row unchanged instead of raising on the empty reduce.
    diffs = [
        ~F.col(a).eqNullSafe(F.col(f"{a}{suffix}")) for a in attrs
    ]
    return reduce(lambda x, y: x | y, diffs, F.lit(False))


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    attrs: Sequence[str] | None = None,
) -> DataFrame:
    """Upsert ``source`` into ``target`` by ``keys``: source rows win,
    target-only rows survive, and every output row carries a ``merge_action``
    column (``insert`` — key only in source, ``update`` — key in both with
    ≥1 differing attribute, ``unchanged`` — key in both and equal, or key
    only in target).

    ``attrs`` defaults to every non-key column shared by both frames. One
    full-outer equi-join on the keys; with AQE the small side broadcasts.
    """
    keys = list(keys)
    if attrs is None:
        attrs = [
            c for c in target.columns if c not in keys and c in source.columns
        ]
    attrs = list(attrs)
    s = source.select(
        *keys, *[F.col(a).alias(f"{a}_src") for a in attrs], F.lit(True).alias("_in_src")
    )
    t = target.select(*keys, *attrs, F.lit(True).alias("_in_tgt"))
    j = t.join(s, keys, "full_outer")
    action = (
        F.when(F.col("_in_tgt").isNull(), F.lit("insert"))
        .when(F.col("_in_src").isNull(), F.lit("unchanged"))
        .when(_any_attr_differs(attrs, "_src"), F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    merged = [
        F.when(F.col("_in_src").isNotNull(), F.col(f"{a}_src"))
        .otherwise(F.col(a))
        .alias(a)
        for a in attrs
    ]
    return j.select(*keys, *merged, action.alias("merge_action"))


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    attrs: Sequence[str],
    ts_col: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
) -> DataFrame:
    """Apply an update batch to a type-2 dimension.

    ``dim`` carries full history: ``keys + attrs + valid_from + valid_to +
    is_current``. ``updates`` carries ``keys + attrs + ts_col`` with at most
    one row per key (pre-reduce a CDC stream with keep-latest dedup first).

    Per update key: if the attributes differ from the key's CURRENT row
    (null-safe), that row closes (``valid_to = ts``, ``is_current = false``)
    and a new open version starts at ``ts``; an unseen key inserts its first
    open version; an equal update is a no-op. Historical (non-current) rows
    pass through untouched. Output schema = dim schema.
    """
    keys = list(keys)
    attrs = list(attrs)
    hist_cols = [*keys, *attrs, valid_from, valid_to, is_current]

    u = updates.select(
        *keys,
        *[F.col(a).alias(f"{a}_u") for a in attrs],
        F.col(ts_col).alias("_u_ts"),
    )
    cur = (
        dim.filter(F.col(is_current))
        .withColumn("_in_dim", F.lit(True))
        .join(u, keys, "full_outer")
    )
    changed = _any_attr_differs(attrs, "_u")

    # current rows: close when a differing update arrived, else passthrough
    kept_current = cur.filter(F.col("_in_dim").isNotNull()).select(
        *keys,
        *attrs,
        F.col(valid_from),
        F.when(
            F.col("_u_ts").isNotNull() & changed, F.col("_u_ts")
        ).otherwise(F.col(valid_to)).alias(valid_to),
        F.when(F.col("_u_ts").isNotNull() & changed, F.lit(False))
        .otherwise(F.col(is_current))
        .alias(is_current),
    )
    # new open versions: changed keys and brand-new keys
    opened = cur.filter(
        F.col("_u_ts").isNotNull()
        & (F.col("_in_dim").isNull() | changed)
    ).select(
        *keys,
        *[F.col(f"{a}_u").alias(a) for a in attrs],
        F.col("_u_ts").alias(valid_from),
        F.lit(None).cast(dim.schema[valid_to].dataType).alias(valid_to),
        F.lit(True).alias(is_current),
    )
    closed_history = dim.filter(~F.col(is_current)).select(*hist_cols)
    return kept_current.unionByName(opened).unionByName(closed_history)


def row_content_hash(cols: Sequence[str]) -> Column:
    """60-bit md5-derived integer for one row over ``cols`` — the SINGLE
    hash expression behind :func:`dataset_checksum` and
    :func:`dataset_checksum_by` (one definition so the global and
    per-group forms cannot diverge).

    The row encoding is UNAMBIGUOUS: each field is length-prefixed
    (``<char_len>:<value>``) and NULL folds to ``-:`` — a token no
    non-null field can produce (its prefix position never holds ``-``).
    So ``("a|b","c")`` vs ``("a","b|c")``, ``("", NULL)`` vs
    ``(NULL, "")`` and every other concatenation collision hash
    differently, unlike a separator-joined encoding. Everything is plain
    ANSI-expressible string math (length/concat/md5), so the identical
    value is computable in DuckDB/Trino for cross-engine generation
    diffs.
    """
    parts: list[Column] = []
    for c in cols:
        s = F.col(c).cast("string")
        parts.append(
            F.when(s.isNull(), F.lit("-:")).otherwise(
                F.concat(F.length(s).cast("string"), F.lit(":"), s)
            )
        )
    return F.conv(
        F.substring(F.md5(F.concat(*parts).cast("binary")), 1, 15), 16, 10
    ).cast("decimal(38,0)")


def dataset_checksum(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Order-free content checksum of a dataset over ``cols`` — one row
    ``(n_rows, checksum)`` where ``checksum`` is the exact DECIMAL sum of
    a 60-bit md5-derived integer per row. Addition commutes, so the value
    is independent of partitioning, file layout, and row order: two
    dataset GENERATIONS (a compaction rewrite, a Z-order relayout, a
    migrated copy on another engine) are byte-equivalent in content iff
    their checksums and row counts match — without sorting or shuffling
    anything (one scan, map-side partial sums). The row encoding
    (:func:`row_content_hash`) is length-prefixed, so NULL / empty /
    separator-bearing values cannot collide.

    This is the generation-diff primitive: `compact_dataset` /
    `zorder_layout` callers assert checksum equality before swapping
    directories, and an incremental pipeline detects upstream restatement
    by checksumming per partition.
    """
    # checksum emitted as STRING: the exact integer exceeds int64 and a
    # decimal->float conversion in a consumer would silently lose the low
    # bits that make the checksum a checksum
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(row_content_hash(cols)).cast("string").alias("checksum"),
    )


def checksum_manifest_diff(
    old: DataFrame, new: DataFrame, by: Sequence[str]
) -> DataFrame:
    """Diff two generations' :func:`dataset_checksum_by` manifests — the
    decision step of incremental reprocessing: which partitions actually
    need recomputing after an upstream rewrite.

    ``old`` and ``new`` are manifests keyed by ``by`` with ``(n_rows,
    checksum)``. One full-outer join on the keys — NULL-SAFE, so a
    NULL-keyed partition (the unattributed bucket every real dimension
    carries) is one partition in both generations, not a spurious
    removed+added pair — classifies every partition: ``added`` (key only
    in new), ``removed`` (only in old), ``changed`` (both, content moved
    in row count or checksum), ``unchanged``. Downstream reprocesses
    only ``added``/``changed`` keys and retracts ``removed`` ones — at
    100 TB the manifests are |partitions|-sized, so the nightly decision
    is a join over thousands of rows, not a rescan of anything.
    """
    by = list(by)
    o = old.select(
        *by,
        F.col("n_rows").alias("n_rows_old"),
        F.col("checksum").alias("checksum_old"),
    ).alias("_o")
    n = new.select(
        *by,
        F.col("n_rows").alias("n_rows_new"),
        F.col("checksum").alias("checksum_new"),
    ).alias("_n")
    cond = reduce(
        lambda a, b: a & b,
        [
            F.col(f"_o.{k}").eqNullSafe(F.col(f"_n.{k}"))
            for k in by
        ],
    )
    status = (
        F.when(F.col("n_rows_old").isNull(), F.lit("added"))
        .when(F.col("n_rows_new").isNull(), F.lit("removed"))
        .when(
            F.col("n_rows_old").eqNullSafe(F.col("n_rows_new"))
            & F.col("checksum_old").eqNullSafe(F.col("checksum_new")),
            F.lit("unchanged"),
        )
        .otherwise(F.lit("changed"))
    )
    return o.join(n, cond, "full_outer").select(
        *[
            F.coalesce(F.col(f"_o.{k}"), F.col(f"_n.{k}")).alias(k)
            for k in by
        ],
        "n_rows_old",
        "n_rows_new",
        status.alias("status"),
    )


def dataset_checksum_by(
    df: DataFrame, cols: Sequence[str], by: Sequence[str]
) -> DataFrame:
    """Per-group form of :func:`dataset_checksum` — one
    ``by + (n_rows, checksum)`` row per group. The incremental-pipeline
    primitive: checksum a partitioned table per partition value, compare
    against yesterday's manifest, and ONLY the partitions whose checksum
    moved need reprocessing (upstream restatement detection without
    re-reading unaffected partitions downstream). Identical row encoding
    to the global form (:func:`row_content_hash`), so per-group checksums
    are consistent with the whole-dataset checksum by construction."""
    return df.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(row_content_hash(cols)).cast("string").alias("checksum"),
    )
