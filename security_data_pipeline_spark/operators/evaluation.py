"""Curation-model evaluation: calibration (reliability bins, ECE) and a
one-pass decision-threshold sweep (precision/recall/F1 per cut).

The quality classifier (:mod:`textops` ``classifier_score`` /
``quality_features``) gates what enters the training set; these operators
answer the two questions every such gate must face before running at
100 TB: *are the scores calibrated probabilities?* (reliability binning +
expected calibration error, Guo et al. 2017 — public technique) and
*which cut gives the precision/recall trade-off we want?* (threshold
sweep). No counterpart exists in the reference (a 463-LoC pandas ETL,
``/root/reference/src/pipeline.py``) — this is extension surface for the
LLM-data-pipeline family.

Scale shape — both families reduce to SUFFICIENT STATISTICS over a
bounded domain, so the corpus is touched exactly once:

- calibration: ONE hash aggregation into ``n_bins`` rows of
  ``(n, n_pos, sum_score)``; every downstream number (per-bin gaps, ECE)
  is arithmetic over those ≤ ``n_bins`` rows. Counts merge by ADDITION,
  which is what makes the statistic streamable
  (:func:`...streaming.pipeline.maintain_calibration_stream` folds the
  same frame per micro-batch and proves report equality).
- threshold sweep: rows land in ``len(thresholds)+1`` score bands via a
  chain of indicator casts (no join, no sort); ONE hash aggregation to
  per-band ``(n, n_pos)``; each threshold's confusion matrix is then a
  suffix-sum over the ≤ ``m+1``-row band frame (a broadcast theta join of
  two grid-sized literals) — m thresholds never cost m corpus scans.

Cross-engine determinism (the DuckDB oracle hash-compares values): scores
are rounded to 6 dp BEFORE binning (the classifier-gate precedent —
``exp``/libm may differ in last bits, 6 dp absorbs it); score sums go
through ``DECIMAL(11,6)``; every ratio is one IEEE division of identical
operands; ECE terms sum as ``DECIMAL(28,12)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column

from security_data_pipeline_spark.pin import pin_lazy as _pin_lazy

_SCORE_DEC = "decimal(11,6)"
_TERM_DEC = "decimal(28,12)"


def _rounded_score(score_col: str) -> Column:
    return F.round(F.col(score_col).cast("double"), 6)


def calibration_bin_counts(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Sufficient statistics for calibration: one row per occupied bin,
    ``(bin, n, n_pos, sum_score)``.

    ``bin = min(floor(round(round(score,6)·n_bins, 6)), n_bins-1)`` — scores are
    probabilities in [0,1]; the top edge folds into the last bin so 1.0
    is representable. ``sum_score`` is an exact DECIMAL(11,6) sum of the
    6-dp-rounded scores (order-free, hence shuffle- and stream-safe).
    NULL scores/labels are excluded (scored rows only). This frame is the
    unit of streaming state: counts and decimal sums merge by addition.
    """
    rs = _rounded_score(score_col)
    b = F.least(
        # round the product before flooring: bins are exactly
        # [k/n_bins, (k+1)/n_bins) — without it, exact-edge scores
        # misassign in IEEE doubles (0.3*10 = 2.999... -> bin 2)
        F.floor(F.round(rs * F.lit(float(n_bins)), 6)).cast("long"),
        F.lit(n_bins - 1).cast("long"),
    )
    return (
        df.filter(
            F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
        )
        .select(
            b.alias("bin"),
            F.col(label_col).cast("long").alias("_y"),
            rs.cast(_SCORE_DEC).alias("_s"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_y").alias("n_pos"),
            F.sum("_s").alias("sum_score"),
        )
    )


def reliability_from_bin_counts(bins: DataFrame) -> DataFrame:
    """Per-bin reliability report from :func:`calibration_bin_counts`
    output: ``bin, n, n_pos, mean_score, pos_rate, gap`` (gap =
    |pos_rate − mean_score|, the per-bin calibration error). Pure
    arithmetic over the ≤ ``n_bins`` statistic rows — shared verbatim by
    the batch query and the streaming maintainer so their reports are
    bit-identical on equal statistics."""
    mean_score = F.col("sum_score").cast("double") / F.col("n").cast(
        "double"
    )
    pos_rate = F.col("n_pos").cast("double") / F.col("n").cast("double")
    return bins.select(
        "bin",
        "n",
        "n_pos",
        F.round(mean_score, 6).alias("mean_score"),
        F.round(pos_rate, 6).alias("pos_rate"),
        F.round(F.abs(pos_rate - mean_score), 6).alias("gap"),
    )


def ece_from_bin_counts(bins: DataFrame) -> DataFrame:
    """Expected calibration error from the bin statistics: ONE row of
    ``n_docs, n_bins_occupied, ece, max_gap``. ECE = Σ (n_b/N)·gap_b —
    each term is computed as an IEEE double then summed as
    DECIMAL(28,12), so the scalar is accumulation-order-free (the PSI
    discipline)."""
    mean_score = F.col("sum_score").cast("double") / F.col("n").cast(
        "double"
    )
    pos_rate = F.col("n_pos").cast("double") / F.col("n").cast("double")
    gap = F.abs(pos_rate - mean_score)
    term = (gap * F.col("n").cast("double")).cast(_TERM_DEC)
    return bins.agg(
        F.sum("n").alias("n_docs"),
        F.count(F.lit(1)).alias("n_bins_occupied"),
        F.sum(term).alias("_gap_mass"),
        F.max(F.round(gap, 6)).alias("max_gap"),
    ).select(
        "n_docs",
        "n_bins_occupied",
        F.round(
            F.col("_gap_mass").cast("double")
            / F.col("n_docs").cast("double"),
            6,
        ).alias("ece"),
        "max_gap",
    )


def reliability_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Batch reliability diagram: :func:`calibration_bin_counts` →
    :func:`reliability_from_bin_counts`."""
    return reliability_from_bin_counts(
        calibration_bin_counts(df, score_col, label_col, n_bins)
    )


def ece_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Batch ECE scalar: :func:`calibration_bin_counts` →
    :func:`ece_from_bin_counts`."""
    return ece_from_bin_counts(
        calibration_bin_counts(df, score_col, label_col, n_bins)
    )


DEFAULT_THRESHOLDS: tuple[float, ...] = (
    0.1,
    0.2,
    0.3,
    0.4,
    0.5,
    0.6,
    0.7,
    0.8,
    0.9,
)


def threshold_sweep(
    df: DataFrame,
    score_col: str,
    label_col: str,
    thresholds: tuple[float, ...] = DEFAULT_THRESHOLDS,
) -> DataFrame:
    """Precision/recall/F1 at every threshold from ONE corpus pass.

    Band assignment: ``band = Σ_j [round(score,6) ≥ t_j]`` — a chain of
    indicator casts, no join, no sort; predicting positive at threshold
    ``t_j`` selects exactly the rows with ``band ≥ j``. One hash
    aggregation yields per-band ``(n, n_pos)`` (≤ m+1 rows); each
    threshold's TP/FP/FN/TN are suffix sums over that frame, realized as
    a broadcast ``band ≥ j`` theta join of two grid-sized literals —
    O(m²) pairs of TINY rows, never a second corpus scan. The m-scans
    alternative is what this operator exists to avoid at 100 TB.

    Output: one row per threshold — ``threshold, predicted_pos, tp, fp,
    fn, precision, recall, f1`` (6 dp; precision NULL when nothing is
    predicted positive). Thresholds must be strictly increasing.
    """
    ts = [round(float(t), 6) for t in thresholds]
    if sorted(set(ts)) != ts:
        raise ValueError("thresholds must be strictly increasing")
    rs = _rounded_score(score_col)
    band: Column = F.lit(0)
    for t in ts:
        band = band + (rs >= F.lit(t)).cast("int")
    per_band = (
        df.filter(
            F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
        )
        .select(
            band.cast("long").alias("band"),
            F.col(label_col).cast("long").alias("_y"),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_y").alias("n_pos"),
        )
    )
    spark = df.sparkSession
    # sentinel row j=0 (threshold -1: band >= 0 matches every row) makes
    # the class totals fall out of the SAME suffix-sum join — the
    # alternative (a separate per_band.agg() consumer) re-inlines the
    # corpus aggregation into both branches and scans the corpus twice
    # (caught by the one-scan plan pin in tests/test_plans.py)
    grid = spark.createDataFrame(
        [(0, -1.0)] + [(j + 1, t) for j, t in enumerate(ts)],
        "j long, threshold double",
    )
    joined = grid.join(
        F.broadcast(per_band), F.col("band") >= F.col("j"), "left"
    )
    swept = joined.groupBy("j", "threshold").agg(
        F.coalesce(F.sum("n"), F.lit(0)).alias("predicted_pos"),
        F.coalesce(F.sum("n_pos"), F.lit(0)).alias("tp"),
    )
    from pyspark.sql import Window

    w_all = Window.partitionBy(F.lit(1))
    with_totals = swept.select(
        "j",
        "threshold",
        "predicted_pos",
        "tp",
        F.max(F.when(F.col("j") == 0, F.col("predicted_pos"))).over(
            w_all
        ).alias("_n_total"),
        F.max(F.when(F.col("j") == 0, F.col("tp"))).over(w_all).alias(
            "_pos_total"
        ),
    ).filter(F.col("j") >= 1)
    pp = F.col("predicted_pos")
    tp = F.col("tp")
    fp = (pp - tp).alias("fp")
    fn = (F.col("_pos_total") - tp).alias("fn")
    precision = tp.cast("double") / F.nullif(pp, F.lit(0)).cast("double")
    recall = tp.cast("double") / F.nullif(
        F.col("_pos_total"), F.lit(0)
    ).cast("double")
    f1 = (2 * tp).cast("double") / F.nullif(
        2 * tp + (pp - tp) + (F.col("_pos_total") - tp), F.lit(0)
    ).cast("double")
    return (
        with_totals.select(
            "threshold",
            pp.alias("predicted_pos"),
            tp.alias("tp"),
            fp,
            fn,
            F.round(precision, 6).alias("precision"),
            F.round(recall, 6).alias("recall"),
            F.round(f1, 6).alias("f1"),
        )
        .orderBy("threshold")
    )


def ranking_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Exact ROC-AUC (Mann-Whitney U with midrank tie handling) and
    Brier score per group, from ONE corpus pass.

    Sufficient statistics: per (group, 6-dp-rounded score) counts
    ``(n, n_pos)`` — one hash aggregation into a BOUNDED domain (≤ 10⁶+1
    distinct rounded scores per group), the KS-grid argument: the ordered
    window that ranking needs runs over the distinct-score frame, never
    the corpus, so a group with 10¹² rows costs the same ranking work as
    one with 10⁶.

    AUC via average ranks, all-integer until the final division:
    ``2·Σranks_pos = Σ_s n_pos(s)·(2·cum_before(s) + n(s) + 1)`` (ranks
    1-based ascending; ties share the midrank), then
    ``auc = (2·Σranks_pos − P·(P+1)) / (2·P·N)`` — exact integer
    arithmetic both engines, one IEEE division, NULL when a group lacks
    a class. Brier = Σ(score − y)² / N_total rides the SAME frame:
    ``n_pos·(s−1)² + (n−n_pos)·s²`` per distinct score, summed as
    DECIMAL(28,12) (accumulation-order-free).

    Output per group: ``n_pos, n_neg, auc, brier`` (6 dp).
    """
    return ranking_from_score_counts(
        score_label_counts(df, score_col, label_col, group_cols),
        group_cols,
    )


def score_label_counts(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """The ranking sufficient statistics: one row per (group,
    6-dp-rounded score) — ``(*group_cols, _s, _n, _np)``. Counts merge
    by addition, so this frame is also the streaming ranking state
    (:func:`...streaming.pipeline.maintain_ranking_counts_stream`)."""
    g = list(group_cols or [])
    rs = _rounded_score(score_col)
    return (
        df.filter(
            F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
        )
        .select(
            *g,
            rs.alias("_s"),
            F.col(label_col).cast("long").alias("_y"),
        )
        .groupBy(*g, "_s")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("_y").alias("_np"),
        )
    )


def ranking_from_score_counts(
    per_score: DataFrame,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """AUC + Brier from the :func:`score_label_counts` statistics —
    shared verbatim by the batch operator and the streaming maintainer's
    reader, so their reports are bit-identical on equal statistics."""
    from pyspark.sql import Window

    g = list(group_cols or [])
    w = (
        Window.partitionBy(*g).orderBy("_s")
        if g
        else Window.partitionBy(F.lit(1)).orderBy("_s")
    ).rowsBetween(Window.unboundedPreceding, -1)
    cum_before = F.coalesce(F.sum("_n").over(w), F.lit(0))
    ranked = per_score.select(
        *g,
        "_n",
        "_np",
        (F.col("_np") * (2 * cum_before + F.col("_n") + 1)).alias("_r2"),
        (
            (
                F.col("_np") * (F.col("_s") - 1) * (F.col("_s") - 1)
                + (F.col("_n") - F.col("_np")) * F.col("_s") * F.col("_s")
            ).cast(_TERM_DEC)
        ).alias("_sq"),
    )
    agg = ranked.groupBy(*g).agg(
        F.sum("_np").alias("n_pos"),
        (F.sum("_n") - F.sum("_np")).alias("n_neg"),
        F.sum("_r2").alias("_r2sum"),
        F.sum("_sq").alias("_sqsum"),
        F.sum("_n").alias("_nt"),
    )
    p, q = F.col("n_pos"), F.col("n_neg")
    auc = (F.col("_r2sum") - p * (p + 1)).cast("double") / F.nullif(
        2 * p * q, F.lit(0)
    ).cast("double")
    brier = F.col("_sqsum").cast("double") / F.col("_nt").cast("double")
    return agg.select(
        *g,
        "n_pos",
        "n_neg",
        F.round(auc, 6).alias("auc"),
        F.round(brier, 6).alias("brier"),
    )


def calibrate_scores(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    out_col: str = "calibrated_score",
    fit_df: DataFrame | None = None,
) -> DataFrame:
    """Histogram calibration (binning calibration — Zadrozny & Elkan
    2001, public technique): remap each score to the EMPIRICAL positive
    rate of its reliability bin, closing the measure → remap loop the
    ECE report opens. The remapped scores are calibrated by
    construction on the fit data (each bin's mean prediction equals its
    positive rate), at the cost of coarsening to ``n_bins`` levels.

    ``fit_df`` lets the mapping be learned on held-out labeled data and
    applied to an unlabeled corpus; default fits on ``df`` itself.

    Scale shape: the mapping is the ≤``n_bins``-row calibration
    statistic broadcast back onto the corpus — one fit aggregation, one
    map-side broadcast-hash join; rows whose bin was unseen at fit time
    keep a NULL calibrated score (no silent extrapolation). Output: the
    input plus ``out_col`` (6 dp).
    """
    rs = _rounded_score(score_col)
    b = F.least(
        # round the product before flooring: bins are exactly
        # [k/n_bins, (k+1)/n_bins) — without it, exact-edge scores
        # misassign in IEEE doubles (0.3*10 = 2.999... -> bin 2)
        F.floor(F.round(rs * F.lit(float(n_bins)), 6)).cast("long"),
        F.lit(n_bins - 1).cast("long"),
    )
    mapping = calibration_bin_counts(
        fit_df if fit_df is not None else df, score_col, label_col, n_bins
    ).select(
        "bin",
        F.round(
            F.col("n_pos").cast("double") / F.col("n").cast("double"), 6
        ).alias(out_col),
    )
    return df.withColumn("_bin", b).join(
        F.broadcast(mapping).withColumnRenamed("bin", "_bin"), "_bin", "left"
    ).drop("_bin")


def calibrated_sweep_roundtrip(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Calibrated-gate round trip: sweep BOTH the raw and the histogram-
    calibrated scores from ONE corpus pass, with the two invariants that
    make a calibrated operating point predictable emitted as self-check
    columns.

    Two arms per bin ``k`` over the shared ≤``n_bins``-row statistic
    frame (:func:`calibration_bin_counts` — the corpus is scanned once):

    - ``arm='raw'``, threshold ``k/n_bins`` (select bins ≥ k): actual
      confusion counts, plus ``expected_tp`` = Σ selected ``n_b ·
      pos_rate_b`` — what the CALIBRATED scores predict the positive
      count to be at that cut. ``check_ok`` asserts
      ``|expected_tp − tp| ≤ 5e-7·predicted_pos + 1e-6`` (each bin's
      remapped score is its 6-dp-rounded positive rate, so the implied
      count reproduces the actual count within rounding — the round
      trip: calibrate → threshold → the promised yield IS the yield).
    - ``arm='cal'``, threshold ``pos_rate_k`` (select bins whose
      calibrated value ≥ it — NOT necessarily a contiguous raw range;
      histogram calibration is not monotone in general): ``check_ok``
      asserts ``precision ≥ threshold − 1e-6`` — every selected bin's
      rate is ≥ the cut, so their weighted mean is too. THE operating
      guarantee a calibrated gate buys.

    All counts are suffix/subset sums over the grid-sized frame
    (broadcast theta join of tiny operands — the threshold_sweep shape);
    ratios round to 6 dp; deterministic cross-engine.
    """
    stats = calibration_bin_counts(df, score_col, label_col, n_bins)
    rates = stats.select(
        "bin",
        "n",
        "n_pos",
        F.round(
            F.col("n_pos").cast("double") / F.col("n").cast("double"), 6
        ).alias("pos_rate"),
    ).transform(_pin_lazy)
    b = F.broadcast(
        rates.select(
            F.col("bin").alias("_jb"),
            F.col("n").alias("_jn"),
            F.col("n_pos").alias("_jp"),
            F.col("pos_rate").alias("_jr"),
        )
    )
    tot = F.broadcast(rates.agg(F.sum("n_pos").alias("_pos_total")))
    joined = rates.select("bin", "pos_rate").crossJoin(b)
    raw_sel = F.col("_jb") >= F.col("bin")
    cal_sel = F.col("_jr") >= F.col("pos_rate")

    def _arm_aggs(sel, prefix):
        z = F.lit(0).cast("long")
        return [
            F.sum(F.when(sel, F.col("_jn")).otherwise(z)).alias(
                f"{prefix}pp"
            ),
            F.sum(F.when(sel, F.col("_jp")).otherwise(z)).alias(
                f"{prefix}tp"
            ),
            F.sum(
                F.when(
                    sel,
                    (F.col("_jn").cast("double") * F.col("_jr")).cast(
                        _TERM_DEC
                    ),
                ).otherwise(F.lit(0).cast(_TERM_DEC))
            ).alias(f"{prefix}exp"),
        ]

    g = joined.groupBy("bin", "pos_rate").agg(
        *_arm_aggs(raw_sel, "_r"),
        *_arm_aggs(cal_sel, "_c"),
    )
    g = g.crossJoin(tot)

    def _prec(tp, pp):
        return F.round(
            tp.cast("double") / F.nullif(pp, F.lit(0)).cast("double"), 6
        )

    def _rec(tp):
        return F.round(
            tp.cast("double")
            / F.nullif(F.col("_pos_total"), F.lit(0)).cast("double"),
            6,
        )

    raw = g.select(
        F.col("bin"),
        F.lit("raw").alias("arm"),
        F.round(
            F.col("bin").cast("double") / F.lit(float(n_bins)), 6
        ).alias("threshold"),
        F.col("_rpp").alias("predicted_pos"),
        F.col("_rtp").alias("tp"),
        _prec(F.col("_rtp"), F.col("_rpp")).alias("precision"),
        _rec(F.col("_rtp")).alias("recall"),
        F.round(F.col("_rexp").cast("double"), 6).alias("expected_tp"),
        (
            F.abs(
                F.col("_rexp").cast("double")
                - F.col("_rtp").cast("double")
            )
            <= F.lit(5e-7) * F.col("_rpp").cast("double") + F.lit(1e-6)
        ).alias("check_ok"),
    )
    cal = g.select(
        F.col("bin"),
        F.lit("cal").alias("arm"),
        F.col("pos_rate").alias("threshold"),
        F.col("_cpp").alias("predicted_pos"),
        F.col("_ctp").alias("tp"),
        _prec(F.col("_ctp"), F.col("_cpp")).alias("precision"),
        _rec(F.col("_ctp")).alias("recall"),
        F.lit(None).cast("double").alias("expected_tp"),
        (
            _prec(F.col("_ctp"), F.col("_cpp"))
            >= F.col("pos_rate") - F.lit(1e-6)
        ).alias("check_ok"),
    )
    return raw.unionByName(cal)
