"""Distribution drift detection between two slices of a dataset — the
data-quality gate every long-running training-data or security pipeline
needs ("did this week's feed stop looking like last week's?").

Two standard, complementary statistics per group:

- **PSI** (population stability index): equal-width bins fitted on the
  REFERENCE slice's [min, max], Laplace-smoothed bin shares,
  ``Σ (p_i - q_i) · ln(p_i / q_i)``. The industry thumb-rules (<0.1 stable,
  >0.25 drifted) assume exactly this construction.
- **KS statistic** (two-sample Kolmogorov-Smirnov): max ECDF gap
  ``sup_x |F_ref(x) - F_cur(x)|`` — finer-grained than PSI's coarse
  bins, sensitive to shape shifts they can miss.

Scale shape: everything is counts. Each side reduces to per-(group, bin)
or per-(group, grid-cell) counts with map-side combine — the raw slices
are scanned once each and never joined row-to-row. The KS ECDF runs, by
default, over a BOUNDED reference-fitted value grid (``ks_grid`` cells +
one out-of-range cell per side), so the per-group sequential window sees
≤ ``ks_grid + 2`` rows no matter how many distinct values the metric
takes — a continuous metric at 100× data cannot serialize one giant task
per group (the exact distinct-value ECDF, whose window row count IS the
group's value cardinality, stays available via ``ks_grid=None``).
Quantization error is ≤ the largest in-range cell's ECDF mass on either
side (~1/ks_grid for smooth distributions); the gap contributed by
current-side mass OUTSIDE the reference range is preserved exactly —
below-range mass accumulates before any reference mass (its full gap is
evaluated at the underflow cell) and the above-range gap's maximum occurs
at the last in-range cell, where F_ref is already 1. The
sequential-window cumulative sums and fixed-operand-order arithmetic make
both statistics bit-reproducible in any SQL engine — the registered query
checks them against DuckDB verbatim, grid construction included.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from security_data_pipeline_spark.pin import pin_lazy


def _ks_value_frame(
    both: DataFrame, g: list[str], ks_grid: int | None
) -> DataFrame:
    """Per-(group, value-point) side counts feeding the KS ECDF window.

    ``both`` carries ``g + (_v, _side, _mn, _mx)`` (reference-fitted
    min/max already joined on). With ``ks_grid`` set, ``_v`` is quantized
    onto ``ks_grid`` equal-width cells over the reference range plus one
    underflow (−1) and one overflow (``ks_grid``) cell — the output is
    ≤ ``ks_grid + 2`` rows per group regardless of value cardinality,
    which is what keeps the downstream ordered window from serializing a
    whole continuous-valued group into one task at scale. With
    ``ks_grid=None`` the exact distinct values pass through.
    """
    if ks_grid is None:
        vk = F.col("_v")
    else:
        span = F.col("_mx") - F.col("_mn")
        # strict comparisons route out-of-range mass to the sentinel
        # cells (the floor only ever sees in-range v, so its double->long
        # conversion cannot overflow however far the current range
        # extends); in-range mass clamps to [0, grid-1] so the reference
        # max stays in the last IN-RANGE cell — the evaluation point
        # where an entirely-above-range current side shows its full gap
        raw = F.floor((F.col("_v") - F.col("_mn")) / span * F.lit(ks_grid))
        vk = (
            F.when(F.col("_v") < F.col("_mn"), F.lit(-1))
            .when(F.col("_v") > F.col("_mx"), F.lit(ks_grid))
            .when(span == F.lit(0), F.lit(0))
            .otherwise(
                F.least(F.greatest(raw, F.lit(0)), F.lit(ks_grid - 1))
            )
            .cast("long")
            .cast("double")
        )
    return both.groupBy(*g, vk.alias("_vk")).agg(
        F.sum((F.col("_side") == "r").cast("long")).alias("_nr"),
        F.sum((F.col("_side") == "c").cast("long")).alias("_nc"),
    )


def value_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    group_cols: list[str],
    n_bins: int = 10,
    ks_grid: int | None = 4096,
) -> DataFrame:
    """Per-group PSI and KS between ``ref`` and ``cur``.

    Output: ``group_cols + (n_ref, n_cur, psi, ks)`` (psi/ks round 6).
    Groups present in only one side are dropped (no distribution to
    compare); NULL values are ignored. Bins are fitted on the reference
    slice; current-side values outside the reference range clamp into the
    edge bins (that mass SHOWING UP in the edge bins is exactly the drift
    signal). Laplace smoothing (+0.5 per bin) keeps empty bins finite.

    ``ks_grid`` (default 4096) bounds the KS ECDF to a reference-fitted
    value grid so the per-group ordered window never exceeds
    ``ks_grid + 2`` rows — see the module docstring for the error bound
    (≤ max in-range cell mass; out-of-range drift gaps preserved
    exactly). ``ks_grid=None`` computes the exact distinct-value ECDF
    (window rows = the group's value cardinality — fine for discrete
    metrics, a single-task serialization hazard for continuous ones).
    """
    g = list(group_cols)

    def side(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            *g, F.col(value_col).cast("double").alias("_v")
        ).filter(F.col("_v").isNotNull()).withColumn("_side", F.lit(tag))

    # one narrow (group, value, side) frame feeds THREE consumers (ref
    # stats, the PSI bin counts, the KS cell histogram) — checkpoint it
    # so the two input slices are scanned once, not once per consumer
    sides = side(ref, "r").unionByName(side(cur, "c")).transform(pin_lazy)
    stats = (
        sides.filter(F.col("_side") == "r")
        .groupBy(*g)
        .agg(F.min("_v").alias("_mn"), F.max("_v").alias("_mx"))
    )
    both = sides.join(stats, g)
    bin_counts = (
        both.withColumn("_b", bin_index_expr(n_bins))
        .groupBy(*g, "_side", "_b")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    psi = psi_from_bin_counts(bin_counts, g, n_bins)

    # KS: cumulative counts in value order (sequential window ->
    # reproducible), gap evaluated at every grid cell (bounded — default)
    # or every observed distinct value (ks_grid=None)
    ks = ks_from_cells(_ks_value_frame(both, g, ks_grid), g)
    return psi.join(ks, g).select(*g, "n_ref", "n_cur", "psi", "ks")


def bin_index_expr(n_bins: int) -> F.Column:
    """Equal-width PSI bin index on the REFERENCE range, clamped to
    ``[0, n_bins-1]`` — expects ``_v`` (value), ``_mn``/``_mx``
    (reference min/max) columns in scope."""
    raw_idx = F.floor(
        (F.col("_v") - F.col("_mn"))
        / (F.col("_mx") - F.col("_mn"))
        * F.lit(n_bins)
    )
    return F.when(F.col("_mx") == F.col("_mn"), F.lit(0)).otherwise(
        F.least(F.greatest(raw_idx, F.lit(0)), F.lit(n_bins - 1))
    )


def psi_from_bin_counts(
    bin_counts: DataFrame, g: list[str], n_bins: int
) -> DataFrame:
    """PSI from per-(group, side, bin) counts — rows
    ``g + (_side ∈ r|c, _b, _n)``. Counts are the SUFFICIENT STATISTIC for
    PSI, which is what makes the statistic incrementally maintainable: a
    stream folds new counts in by addition and recomputes PSI from the
    merged state, bit-identical to the batch computation on the same
    cumulative data (tests/test_streaming.py proves it). Output:
    ``g + (n_ref, n_cur, psi)``; groups present on only one side drop.
    """
    totals = bin_counts.groupBy(*g, "_side").agg(F.sum("_n").alias("_tot"))
    bc = bin_counts.join(totals, g + ["_side"])
    p = (F.col("_n").cast("double") + F.lit(0.5)) / (
        F.col("_tot").cast("double") + F.lit(0.5 * n_bins)
    )
    shares = bc.select(*g, "_side", "_b", "_tot", p.alias("_p"))
    rs = shares.filter(F.col("_side") == "r").select(
        *g,
        F.col("_b"),
        F.col("_p").alias("_pr"),
        F.col("_tot").alias("n_ref"),
    )
    cs = shares.filter(F.col("_side") == "c").select(
        *g,
        F.col("_b"),
        F.col("_p").alias("_pc"),
        F.col("_tot").alias("n_cur"),
    )
    # full outer per bin: a bin empty on one side takes the smoothed floor
    nr = rs.groupBy(*g).agg(F.max("n_ref").alias("n_ref"))
    nc = cs.groupBy(*g).agg(F.max("n_cur").alias("n_cur"))
    grid = (
        rs.select(*g, "_b")
        .unionByName(cs.select(*g, "_b"))
        .distinct()
        .join(nr, g)
        .join(nc, g)
    )
    floor_r = F.lit(0.5) / (F.col("n_ref").cast("double") + F.lit(0.5 * n_bins))
    floor_c = F.lit(0.5) / (F.col("n_cur").cast("double") + F.lit(0.5 * n_bins))
    joined = (
        grid.join(rs.select(*g, "_b", "_pr"), g + ["_b"], "left")
        .join(cs.select(*g, "_b", "_pc"), g + ["_b"], "left")
        .withColumn("_pr", F.coalesce(F.col("_pr"), floor_r))
        .withColumn("_pc", F.coalesce(F.col("_pc"), floor_c))
    )
    # each PSI term is a double, but the SUM accumulates as DECIMAL so the
    # result is order-free (a double sum is partition-order-dependent and
    # could round differently across engines)
    term = (F.col("_pr") - F.col("_pc")) * F.log(F.col("_pr") / F.col("_pc"))
    return joined.groupBy(*g, "n_ref", "n_cur").agg(
        F.round(
            F.sum(term.cast("decimal(38,18)")).cast("double"), 6
        ).alias("psi")
    )


def ks_from_cells(vals: DataFrame, g: list[str]) -> DataFrame:
    """KS statistic from per-(group, value-point) side counts — rows
    ``g + (_vk, _nr, _nc)`` (:func:`_ks_value_frame` output). Like the
    PSI counts, grid-cell counts are a sufficient statistic that merges
    by addition — the property the streaming drift gate exploits, and
    one the EXACT distinct-value ECDF shares only at unbounded state.
    Output: ``g + (ks,)``."""
    # one-sided groups (n=0 on either side) have no distribution to
    # compare — drop them BEFORE the division (ANSI mode: x/0 raises)
    totals = vals.groupBy(*g).agg(
        F.sum("_nr").alias("n_ref"), F.sum("_nc").alias("n_cur")
    ).filter((F.col("n_ref") > 0) & (F.col("n_cur") > 0))
    w = (
        Window.partitionBy(*g)
        .orderBy("_vk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ecdf = vals.select(
        *g,
        F.sum("_nr").over(w).alias("_cr"),
        F.sum("_nc").over(w).alias("_cc"),
    )
    return (
        ecdf.join(totals, g)
        .groupBy(*g)
        .agg(
            F.round(
                F.max(
                    F.abs(
                        F.col("_cr").cast("double")
                        / F.col("n_ref").cast("double")
                        - F.col("_cc").cast("double")
                        / F.col("n_cur").cast("double")
                    )
                ),
                6,
            ).alias("ks")
        )
    )


def drift_trend(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group_cols: list[str],
    bucket_seconds: int = 7 * 24 * 3600,
    n_bins: int = 10,
) -> DataFrame:
    """PSI TREND: every time bucket scored against its PREDECESSOR — the
    continuous form of the drift gate ("which week stopped looking like
    the week before it?"), one row per (group, bucket pair).

    One pass over the raw rows: each row lands in its bucket ``w`` and
    contributes TWICE to the binned counts — as the REFERENCE side of
    pair ``w`` (binned on bucket w's own min/max) and as the CURRENT side
    of pair ``w-1`` (binned on bucket w-1's stats, clamped to its edge
    bins exactly like :func:`value_drift`). Bucket stats are one compact
    per-(group, bucket) aggregate joined back, so the shuffles carry
    counts, never value-to-value joins; the PSI math is the shared
    :func:`psi_from_bin_counts` (Laplace smoothing, DECIMAL-exact sums),
    making every pair's number identical to calling :func:`value_drift`
    on those two slices. Output:
    ``group_cols + (bucket, n_ref, n_cur, psi)`` where ``bucket`` is the
    CURRENT bucket index (epoch-seconds / bucket_seconds) and the
    reference is ``bucket - 1``; pairs missing either side drop.
    """
    g = list(group_cols)
    w = F.floor(
        F.unix_micros(F.col(ts_col)) / F.lit(int(bucket_seconds) * 1_000_000)
    ).cast("long")
    vals = (
        df.select(
            *g, w.alias("_w"), F.col(value_col).cast("double").alias("_v")
        )
        .filter(F.col("_v").isNotNull())
        .transform(pin_lazy)
    )
    stats = vals.groupBy(*g, "_w").agg(
        F.min("_v").alias("_mn"), F.max("_v").alias("_mx")
    )
    # reference contribution: pair w, binned on w's stats
    ref_side = (
        vals.join(stats, g + ["_w"])
        .withColumn("_b", bin_index_expr(n_bins))
        .select(
            *g, (F.col("_w") + 1).alias("_pair"),
            F.lit("r").alias("_side"), "_b",
        )
    )
    # current contribution: pair w, binned on w-1's stats
    prev_stats = stats.select(
        *g, (F.col("_w") + 1).alias("_w"), "_mn", "_mx"
    )
    cur_side = (
        vals.join(prev_stats, g + ["_w"])
        .withColumn("_b", bin_index_expr(n_bins))
        .select(
            *g, F.col("_w").alias("_pair"),
            F.lit("c").alias("_side"), "_b",
        )
    )
    bin_counts = (
        ref_side.unionByName(cur_side)
        .groupBy(*g, "_pair", "_side", "_b")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    out = psi_from_bin_counts(bin_counts, g + ["_pair"], n_bins)
    return out.select(
        *g, F.col("_pair").alias("bucket"), "n_ref", "n_cur", "psi"
    )
