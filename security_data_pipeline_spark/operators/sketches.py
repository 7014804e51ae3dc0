"""Frequent-items (heavy hitters) sketch — Misra-Gries summaries as
mergeable per-partition partials.

Completes the repo's mergeable-sketch family (HLL / DataSketches / bitmap
distinct counts in ``events_distinct_sketch``, KLL-style quantile sketches
in ``price_quantiles_sketch``): "which items dominate this stream" — top
talkers by IP, hot users, dominant event types — answered with BOUNDED
memory and a shuffle of k rows per partition, independent of item
cardinality. An exact ``groupBy(item).count()`` shuffles one row per
distinct item per partition; at 100 TB with billions of distinct IPs the
sketch shuffles kilobytes instead.

Algorithm (public, Misra & Gries 1982; merge analysis Agarwal et al.,
PODS'12): each partition keeps at most ``k`` counters; an arriving item
either increments its counter, claims a free slot, or — when all slots are
taken — triggers a decrement of EVERY counter by the minimum counter value
(weighted batch form), dropping zeros. Per partition, ``d`` = total amount
decremented from any one counter, so a kept counter ``c`` brackets the true
partition count in ``[c, c + d]`` and an absent item has true count ≤ d.
Summaries merge by summing counters; the global bracket is
``[Σc, Σc + Σd]`` and ANY item with true global count > Σd is guaranteed
present in the union — the detection threshold the self-checking query
asserts.

This is the one sketch here that genuinely needs per-partition imperative
state (a decrement-on-overflow loop over a bounded dict), so it runs in
``mapInPandas`` — Arrow batches are pre-reduced with ``collections.Counter``
and fed to the sketch as (item, weight) pairs, so the Python loop touches
distinct-items-per-batch entries, not rows. Everything downstream (merge,
brackets, violation checks) is JVM-side Column math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from security_data_pipeline_spark.pin import pin_lazy  # noqa: E402

_PARTIAL_SCHEMA = StructType(
    [
        StructField("pid", LongType()),
        StructField("item", StringType()),
        StructField("cnt", LongType()),
        StructField("d", LongType()),
    ]
)


def misra_gries_partials(
    df: DataFrame, item_col: str, k: int = 64
) -> DataFrame:
    """Per-partition Misra-Gries summaries: ≤ ``k`` rows
    ``(pid, item, cnt, d)`` per input partition (``d`` — that partition's
    total per-counter decrement — repeats on each of its rows; a partition
    whose every item was decremented away emits one ``item IS NULL`` row so
    its ``d`` still reaches the merge). NULL items are ignored (no
    frequency semantics)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def sketch_partition(batches):
        import pandas as pd
        from collections import Counter

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        counters: dict = {}
        d = 0
        for pdf in batches:
            batch = Counter(pdf[item_col].dropna().astype(str))
            for item, w in batch.items():
                if item in counters:
                    counters[item] += w
                    continue
                if len(counters) < k:
                    counters[item] = w
                    continue
                # weighted decrement round: remove the largest mass that
                # zeroes at least one counter (or the newcomer)
                delta = min(min(counters.values()), w)
                d += delta
                counters = {
                    i: c - delta for i, c in counters.items() if c > delta
                }
                if w > delta:
                    counters[item] = w - delta
        if counters:
            yield pd.DataFrame(
                {
                    "pid": [pid] * len(counters),
                    "item": list(counters.keys()),
                    "cnt": list(counters.values()),
                    "d": [d] * len(counters),
                }
            )
        elif d:
            yield pd.DataFrame(
                {"pid": [pid], "item": [None], "cnt": [0], "d": [d]}
            )

    return df.select(F.col(item_col).cast("string").alias(item_col)).mapInPandas(
        sketch_partition, schema=_PARTIAL_SCHEMA
    )


def heavy_hitters(
    df: DataFrame, item_col: str, k: int = 64
) -> DataFrame:
    """Approximate frequent items with deterministic error BRACKETS:
    ``(item, count_lo, count_hi, threshold)`` where the item's true count
    lies in ``[count_lo, count_hi]`` and EVERY item whose true count
    exceeds ``threshold`` (= Σ of per-partition decrements) is guaranteed
    to appear. Candidates are the union of per-partition sketch survivors;
    the merge is one JVM ``groupBy(item)`` over ≤ k rows per partition.

    The candidate SET depends on partitioning (any Misra-Gries does), but
    the brackets and the threshold guarantee hold under every layout —
    that invariant, not the set, is what the self-checking registered
    query asserts against exact counts.

    Degenerate case: a stream whose every counter decrements away yields
    an EMPTY candidate set but a nonzero threshold — losing that
    threshold would silently understate the error bound of any later
    :func:`merge_heavy_hitter_states`. The output then contains ONE
    ``item IS NULL`` carrier row (count_lo 0) holding the threshold —
    the same convention the per-partition partials use.
    """
    # TWO consumers (threshold aggregate, candidate merge) read this frame;
    # the mapInPandas sketch depends on partition content/row order, so an
    # unpinned plan could evaluate the sketch twice (task retry, AQE
    # replan) and pair run-A's threshold with run-B's candidates — breaking
    # the [count_lo, count_hi] bracket. Pin one run, same convention as
    # joins._tag_rows / dedup.jaccard_prefix_join.
    partials = misra_gries_partials(df, item_col, k).transform(pin_lazy)
    d_total = partials.groupBy("pid").agg(F.first("d").alias("_d")).agg(
        F.coalesce(F.sum("_d"), F.lit(0)).alias("threshold")
    )
    merged = (
        partials.filter(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("cnt").alias("count_lo"))
    )
    # LEFT join from the (always 1-row) threshold side: an empty candidate
    # set degrades to one NULL-item carrier row instead of dropping the
    # threshold on the floor
    return (
        d_total.withColumn("_j", F.lit(1))
        .join(merged.withColumn("_j", F.lit(1)), "_j", "left")
        .select(
            "item",
            F.coalesce(F.col("count_lo"), F.lit(0)).alias("count_lo"),
            (
                F.coalesce(F.col("count_lo"), F.lit(0)) + F.col("threshold")
            ).alias("count_hi"),
            "threshold",
        )
    )


def merge_heavy_hitter_states(
    a: DataFrame, b: DataFrame, k: int = 64
) -> DataFrame:
    """Merge two heavy-hitter states (rows ``(item, count_lo, threshold)``
    — :func:`heavy_hitters` output, or a previous merge) into one state of
    ≤ ``k`` counters, the Agarwal et al. (PODS'12) mergeable-summaries
    construction: union the counters, subtract the (k+1)-th largest
    merged count from every counter (dropping non-positives), and add
    that subtraction to the carried threshold. Invariants preserved
    (associatively, so states can merge across days / streams / sites):
    ``count_lo ≤ true ≤ count_lo + threshold`` and every item with true
    count > threshold is present.

    All-Column math over sketch-sized inputs: one groupBy over ≤ 2k rows,
    a rank window over ≤ 2k rows, two broadcast 1-row aggregates. The
    per-side threshold is max'd off that side's rows (it repeats on each;
    an EMPTY side contributes 0).
    """

    def side_threshold(df: DataFrame, alias: str) -> DataFrame:
        return df.groupBy().agg(
            F.coalesce(F.max("threshold"), F.lit(0)).alias(alias)
        )

    d_prev = side_threshold(a, "_da").join(
        side_threshold(b, "_db"), how="cross"
    ).select((F.col("_da") + F.col("_db")).alias("_d"))

    merged = (
        a.select("item", "count_lo")
        .unionByName(b.select("item", "count_lo"))
        .filter(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("count_lo").alias("_c"))
    )
    w = Window.orderBy(F.desc("_c"), F.col("item"))
    ranked = merged.withColumn("_rn", F.row_number().over(w))
    # the (k+1)-th largest merged count is the subtraction; 0 when ≤ k
    # items survive the union
    delta = (
        ranked.filter(F.col("_rn") == k + 1)
        .groupBy()
        .agg(F.coalesce(F.max("_c"), F.lit(0)).alias("_delta"))
    )
    bounds = delta.join(d_prev, how="cross")  # always exactly one row
    survivors = (
        ranked.join(F.broadcast(bounds), how="cross")
        .filter(F.col("_c") > F.col("_delta"))
        .select("item", (F.col("_c") - F.col("_delta")).alias("count_lo"))
    )
    # LEFT join from the 1-row bounds side: when the subtraction zeroes
    # EVERY counter (k+1 equal counts), the merged threshold must survive
    # as the NULL-item carrier row — same convention as heavy_hitters
    return (
        bounds.withColumn("_j", F.lit(1))
        .join(survivors.withColumn("_j", F.lit(1)), "_j", "left")
        .select(
            "item",
            F.coalesce(F.col("count_lo"), F.lit(0)).alias("count_lo"),
            (F.col("_d") + F.col("_delta")).alias("threshold"),
        )
    )


def count_min_build(
    df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 42,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) as a DataFrame of
    ``depth × width`` counter cells: row ``(row_id, col_id, cnt)`` where
    ``col_id = xxhash64(item, seed + row_id) mod width``. The complement
    of the Misra-Gries sketch: MG says WHICH items dominate; count-min
    answers "how often did THIS item occur" for ANY item, in O(depth)
    lookups, with the one-sided guarantee ``estimate ≥ true`` always
    (collisions only ADD) and ``estimate ≤ true + εN`` w.h.p. for
    ``ε = e/width``.

    Pure JVM math: each row explodes to ``depth`` (row_id, col_id) cells
    (seeded xxhash64 — no Python), one partial-aggregated groupBy reduces
    to ≤ depth·width rows TOTAL regardless of item cardinality, and
    sketches MERGE by unioning and re-summing cells (counter matrices
    add) — the same partial-aggregate contract as the HLL/bitmap family.
    NULL items are ignored."""
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    rows = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(depth - 1)),
            lambda i: F.struct(
                i.cast("int").alias("row_id"),
                F.pmod(
                    F.xxhash64(F.col(item_col).cast("string"), F.lit(seed) + i),
                    F.lit(width),
                ).cast("int").alias("col_id"),
            ),
        )
    )
    return (
        df.filter(F.col(item_col).isNotNull())
        .select(rows.alias("_c"))
        .groupBy(F.col("_c.row_id").alias("row_id"), F.col("_c.col_id").alias("col_id"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def count_min_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 42,
) -> DataFrame:
    """Point-frequency estimates for ``items`` against a
    :func:`count_min_build` sketch (same depth/width/seed): each item
    hashes to its ``depth`` cells, joins the (≤ depth·width row,
    broadcastable) sketch, and takes the MIN surviving counter — absent
    cells count 0, so items never inserted estimate 0. Output: one row
    per input item with ``cm_estimate``."""
    cells = items.select(
        F.col(item_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(depth - 1)),
                lambda i: F.struct(
                    i.cast("int").alias("row_id"),
                    F.pmod(
                        F.xxhash64(
                            F.col(item_col).cast("string"), F.lit(seed) + i
                        ),
                        F.lit(width),
                    ).cast("int").alias("col_id"),
                ),
            )
        ).alias("_c"),
    ).select(item_col, F.col("_c.row_id").alias("row_id"), F.col("_c.col_id").alias("col_id"))
    joined = cells.join(F.broadcast(sketch), ["row_id", "col_id"], "left")
    return (
        joined.groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cm_estimate"))
    )
