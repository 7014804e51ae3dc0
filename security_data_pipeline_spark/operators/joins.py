"""Temporal joins the reference lacks but the oracle suite needs
(SURVEY.md §2.7 "not implemented in the reference": as-of joins, range joins).

Both operators are built for the 100 TB path:

- :func:`asof_join` uses the **union + running-``last()`` idiom**: tag both
  inputs, union them, and carry the most recent right-side row forward with
  ``last(..., ignoreNulls)`` over a single ``(keys, ts)`` window. One shuffle
  of |L|+|R| rows, O(1) state per row — versus the naive range-join
  formulation whose candidate set is O(|L|·|R|) per key.
- :func:`bucketed_range_join` makes a bounded time-range join a hash
  equi-join: the right side is bucketed by ``floor(ts / width)``, the left
  side explodes to the (few) buckets its window can reach, and the exact
  range predicate filters after the equi-join. Candidate pairs are bounded
  by bucket occupancy, not by key cardinality — the classic bucketed /
  "bin" range-join strategy.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_seconds: float | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of left join: for each left row, attach the right row with
    the greatest ``right_ts`` ≤ ``left_ts`` within the same ``on`` keys.

    Right-side value columns (everything except ``on`` + ``right_ts``) are
    appended; the matched timestamp arrives as ``{right_ts}{suffix}``. A
    value column whose name collides with a left column also gets
    ``suffix``. Unmatched left rows keep NULLs (left-join semantics).
    ``tolerance_seconds`` nulls out matches older than the window.

    Ties: among right rows sharing the match timestamp the LAST one in
    ``(right_ts)`` window order wins — pre-aggregate the right side to
    unique ``(keys, ts)`` for full determinism (the registered query does).
    """
    on = list(on)
    left_payload = [c for c in left.columns if c not in on]
    rvals = [c for c in right.columns if c not in on and c != right_ts]

    rstruct = F.struct(
        F.col(right_ts).alias("_ts_r"), *[F.col(c) for c in rvals]
    )
    rstruct_type = right.select(rstruct.alias("_rv")).schema["_rv"].dataType
    left_types = {f.name: f.dataType for f in left.schema.fields}

    lrows = left.select(
        *on,
        *left_payload,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rstruct_type).alias("_rv"),
    )
    rrows = right.select(
        *on,
        *[
            F.lit(None).cast(left_types[c]).alias(c)
            for c in left_payload
        ],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        rstruct.alias("_rv"),
    )

    # Right rows sort before left rows at equal ts (_side 0 < 1), so an
    # exactly-simultaneous right row is visible to the left row (ts <= ts).
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        lrows.unionByName(rrows)
        .withColumn("_m", F.last("_rv", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if tolerance_seconds is not None:
        tol_us = int(tolerance_seconds * 1_000_000)
        in_window = (
            F.unix_micros(F.col("_ts")) - F.unix_micros(F.col("_m._ts_r"))
        ) <= F.lit(tol_us)
        matched = matched.withColumn(
            "_m", F.when(in_window, F.col("_m"))
        )

    out_cols: list[Column] = [F.col(c) for c in on + left_payload]
    out_cols.append(F.col("_m._ts_r").alias(f"{right_ts}{suffix}"))
    for c in rvals:
        alias = f"{c}{suffix}" if c in on + left_payload else c
        out_cols.append(F.col(f"_m.{c}").alias(alias))
    return matched.select(*out_cols)


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_seconds: float = 0.0,
    upper_seconds: float = 600.0,
    bucket_seconds: float | None = None,
) -> DataFrame:
    """Pairs where ``right_ts - left_ts`` ∈ [lower, upper] seconds (inclusive),
    within equal ``on`` keys, via bucket-equi-join instead of a theta join.

    Right columns colliding with left names (beyond ``on``) get an ``_r``
    suffix. Bucket width defaults to the window span, so each left row
    explodes to at most 2 buckets; pass ``bucket_seconds`` to trade
    duplication against bucket occupancy for skewed timelines.
    """
    if upper_seconds < lower_seconds:
        raise ValueError("upper_seconds must be >= lower_seconds")
    on = list(on)
    span = upper_seconds - lower_seconds
    width_us = int((bucket_seconds if bucket_seconds else max(span, 1.0)) * 1e6)
    lo_us = int(lower_seconds * 1_000_000)
    hi_us = int(upper_seconds * 1_000_000)

    def bucket_of(us_col: Column) -> Column:
        return F.floor(us_col / F.lit(width_us)).cast("long")

    collide = {
        c for c in right.columns if c in left.columns and c not in on
    }
    r = right.select(
        *on,
        *[
            F.col(c).alias(f"{c}_r" if c in collide else c)
            for c in right.columns
            if c not in on
        ],
    )
    r_ts_out = f"{right_ts}_r" if right_ts in collide else right_ts
    r = r.withColumn("_b", bucket_of(F.unix_micros(F.col(r_ts_out))))

    l_us = F.unix_micros(F.col(left_ts))
    l = left.withColumn(
        "_bs",
        F.sequence(bucket_of(l_us + F.lit(lo_us)), bucket_of(l_us + F.lit(hi_us))),
    ).withColumn("_b", F.explode("_bs")).drop("_bs")

    diff = F.unix_micros(F.col(r_ts_out)) - F.unix_micros(F.col(left_ts))
    return (
        l.join(r, on + ["_b"])
        .filter((diff >= F.lit(lo_us)) & (diff <= F.lit(hi_us)))
        .drop("_b")
    )
