"""Incremental rollup maintenance: update aggregates without rescanning
history.

At 100 TB the fact table grows by one partition (day) at a time; recomputing
`GROUP BY key` aggregates from scratch each day rescans everything. The
standard fix is to persist PARTIAL aggregate state per (key, partition) and
fold new partitions in — possible exactly when every measure is algebraic
(sum/count/min/max: merge = the same op over partials) or carried as a
mergeable sketch (DataSketches HLL for distincts, roaring bitmaps for dense
integer keys). avg is stored as (sum, count) and finalized at read time.

Three pieces:

- :func:`partial_aggs` — one ``groupBy(keys)`` over a slice producing the
  partial-state schema: ``<m>_sum/_cnt/_min/_max`` per numeric measure and
  ``<c>_hll`` (binary DataSketches sketch) per distinct column. The slice
  is typically one ingest batch/day. (The exact-bitmap distinct variant
  lives in the ``events_distinct_sketch`` query — its
  ``bitmap_construct_agg`` partials merge through ``bitmap_or_agg`` by the
  same fold pattern if exactness over dense integer keys is required.)
- :func:`merge_partials` — fold any number of partial-state frames into one
  (union + re-aggregate with the measure-specific merge op). Associative
  and commutative, so batches can merge in any order or tree shape — the
  same property Spark's own partial aggregation exploits map-side.
- :func:`finalize` — project human-facing results (avg, distinct estimates,
  bitmap popcounts) out of merged state.

Correctness contract (oracle-checked by ``events_incremental_rollup``):
``finalize(merge_partials(partial_aggs(slice_i)...)) == direct aggregation
over the union of slices`` — exactly for algebraic measures, within sketch
error for the HLL distinct estimates. ``<c>_hll`` stays one ~KB sketch per
group regardless of cardinality.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["partial_aggs", "merge_partials", "finalize"]


def partial_aggs(
    df: DataFrame,
    keys: Sequence[str],
    measures: Sequence[str] = (),
    distinct_cols: Sequence[str] = (),
) -> DataFrame:
    """Partial aggregate state for one slice: one shuffle on ``keys``.

    Numeric ``measures`` become sum/count/min/max partials (sum as
    DECIMAL(38,6) so merge order can't change a float result); each
    ``distinct_cols`` entry becomes a DataSketches HLL sketch column.
    """
    keys = list(keys)
    aggs = []
    for m in measures:
        aggs += [
            F.sum(F.col(m).cast("decimal(38,6)")).alias(f"{m}_sum"),
            F.count(m).alias(f"{m}_cnt"),
            F.min(m).alias(f"{m}_min"),
            F.max(m).alias(f"{m}_max"),
        ]
    for c in distinct_cols:
        aggs.append(F.hll_sketch_agg(c).alias(f"{c}_hll"))
    aggs.append(F.count(F.lit(1)).alias("n_rows"))
    return df.groupBy(*keys).agg(*aggs)


def merge_partials(
    partials: Sequence[DataFrame],
    keys: Sequence[str],
    measures: Sequence[str] = (),
    distinct_cols: Sequence[str] = (),
) -> DataFrame:
    """Fold partial-state frames (same schema) into one: union + one
    re-aggregation with each measure's merge operator. Associative /
    commutative — safe for tree-shaped or out-of-order backfills."""
    keys = list(keys)
    it = iter(partials)
    unioned = next(it)
    for p in it:
        unioned = unioned.unionByName(p)
    aggs = []
    for m in measures:
        aggs += [
            F.sum(f"{m}_sum").alias(f"{m}_sum"),
            F.sum(f"{m}_cnt").alias(f"{m}_cnt"),
            F.min(f"{m}_min").alias(f"{m}_min"),
            F.max(f"{m}_max").alias(f"{m}_max"),
        ]
    for c in distinct_cols:
        aggs.append(F.hll_union_agg(f"{c}_hll").alias(f"{c}_hll"))
    aggs.append(F.sum("n_rows").alias("n_rows"))
    return unioned.groupBy(*keys).agg(*aggs)


def finalize(
    state: DataFrame,
    keys: Sequence[str],
    measures: Sequence[str] = (),
    distinct_cols: Sequence[str] = (),
) -> DataFrame:
    """Human-facing results out of (merged) state: sum/avg/min/max per
    measure, estimated distinct per sketch column, total row count."""
    keys = list(keys)
    cols = [F.col(k) for k in keys]
    for m in measures:
        cols += [
            F.col(f"{m}_sum").alias(f"{m}_sum"),
            (
                F.col(f"{m}_sum") / F.col(f"{m}_cnt")
            ).cast("decimal(38,6)").alias(f"{m}_avg"),
            F.col(f"{m}_min").alias(f"{m}_min"),
            F.col(f"{m}_max").alias(f"{m}_max"),
        ]
    for c in distinct_cols:
        cols.append(
            F.hll_sketch_estimate(F.col(f"{c}_hll")).alias(f"{c}_distinct")
        )
    cols.append(F.col("n_rows"))
    return state.select(*cols)
