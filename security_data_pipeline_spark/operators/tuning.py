"""Operating-point pickers: measurement -> decision.

The recall sweeps (ann/lsh/sq/pq_recall_sweep, pq_codewords_sweep,
lsh_band_sweep) measure each index family's parameter surface; these
operators read those measured frames and CHOOSE — the step between a
recall curve and a deployed index config, the same shape as
``textops.quality_auto_threshold_report`` (a keep budget in, exact
thresholds out). Everything here is Column algebra over frames of
|sweep points| rows (a few dozen), so the pickers are free at any scale;
the cost lives in the sweeps that produce the frames.

Decision semantics (documented here once, pinned by oracle + tests):

- **Byte-budgeted code families** (LSH signature, SQ code, PQ codes on
  either axis): the chosen point maximizes measured recall subject to
  ``bytes_per_vec <= byte_budget``; ties break to fewer bytes, then the
  smaller parameter value. A family with NO point inside the budget gets
  no chosen row (every ``chosen`` false) rather than a silent overrun.
- **Scan-budgeted families** (IVF ``n_probe`` — bytes are the full
  vectors regardless; the knob trades scanned clusters for recall): the
  chosen point is the SMALLEST parameter meeting ``target_recall``; if
  no point meets it, the max-recall point (the honest fallback — deploy
  the best the family measures, visibly short of target).
- **Deployed row**: among the code families' chosen points, the max
  recall, ties to fewer bytes then family name — the single config the
  byte budget buys, with the full frame kept around it so the choice is
  auditable against every alternative it beat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def recall_operating_point(
    frame: DataFrame,
    byte_budget: float,
    target_recall: float,
) -> DataFrame:
    """Choose per-family index configs from a measured recall frame.

    ``frame`` columns: ``family`` (string; ``'ivf'`` is the scan-budgeted
    family, everything else is byte-budgeted), ``param_name``,
    ``param_value`` (int), ``bytes_per_vec`` (double), ``mean_recall``
    (double, 6dp-rounded by the sweeps). Returns the SAME rows plus the
    decision columns ``byte_budget, target_recall, within_budget,
    meets_target, chosen, deployed`` — the full frame is kept so the
    chosen row provably dominates everything it beat."""
    is_code = F.col("family") != F.lit("ivf")
    within = is_code & (F.col("bytes_per_vec") <= F.lit(float(byte_budget)))
    meets = (~is_code) & (
        F.col("mean_recall") >= F.lit(float(target_recall))
    )
    flagged = frame.select(
        "*",
        F.lit(float(byte_budget)).alias("byte_budget"),
        F.lit(float(target_recall)).alias("target_recall"),
        within.alias("within_budget"),
        meets.alias("meets_target"),
    )
    # one total order per family: eligible rows first, then the family's
    # objective (code: recall desc; ivf meeting target: min n_probe; ivf
    # fallback: recall desc), then bytes asc, param asc — deterministic
    # across engines because mean_recall is 6dp-canonical
    is_code_f = F.col("family") != F.lit("ivf")
    elig_rank = F.when(
        F.when(is_code_f, F.col("within_budget")).otherwise(
            F.col("meets_target")
        ),
        F.lit(0),
    ).otherwise(F.lit(1))
    objective = (
        F.when(is_code_f, -F.col("mean_recall"))
        .when(F.col("meets_target"), F.col("param_value").cast("double"))
        .otherwise(-F.col("mean_recall"))
    )
    w = Window.partitionBy("family").orderBy(
        elig_rank, objective, F.col("bytes_per_vec"), F.col("param_value")
    )
    ranked = flagged.withColumn("_rn", F.row_number().over(w))
    chosen = F.when(
        is_code_f, (F.col("_rn") == 1) & F.col("within_budget")
    ).otherwise(F.col("_rn") == 1)
    picked = ranked.withColumn("chosen", chosen)
    # the deployed config: best chosen CODE point (ivf's pick is a scan
    # knob over uncompressed vectors, not a byte-budget answer)
    dep_first = F.when(F.col("chosen") & is_code_f, F.lit(0)).otherwise(
        F.lit(1)
    )
    wd = Window.orderBy(
        dep_first,
        -F.col("mean_recall"),
        F.col("bytes_per_vec"),
        F.col("family"),
    )
    return (
        picked.withColumn("_rd", F.row_number().over(wd))
        .withColumn(
            "deployed",
            F.col("chosen") & is_code_f & (F.col("_rd") == 1),
        )
        .drop("_rn", "_rd")
    )


def banding_threshold_powers(
    jaccard_threshold: float, rows_grid: tuple[int, ...]
) -> dict[int, float]:
    """``jaccard_threshold ** r`` per grid point, computed ONCE in Python
    so the identical float64 literal lands in both the Spark plan and the
    DuckDB oracle — the theory gate below never calls an engine ``pow``
    (libm pow is not guaranteed correctly rounded, and a boolean that
    differs per engine would break the value hash)."""
    return {r: float(jaccard_threshold) ** int(r) for r in rows_grid}


def banding_operating_point(
    frame: DataFrame,
    candidate_ratio: float,
    jaccard_threshold: float,
    rows_grid: tuple[int, ...] = (1, 2, 4, 8),
) -> DataFrame:
    """Choose the MinHash-LSH banding from the measured S-curve frame.

    ``frame`` is the ``lsh_band_sweep`` shape: ``n_bands, rows_per_band,
    n_candidates, n_truth, recall, precision``. Two gates compose:

    - **Theory gate** (scale-robust): the banding collision threshold
      ``(1/b)^(1/r)`` must sit at or below the dedup threshold —
      equivalently ``t^r * b >= 1`` — so the S-curve puts pairs AT the
      threshold on the colliding side. This is what makes the choice
      stable across corpus sizes: measured recall 1.0 at a small sf is
      optimistic (a 10x corpus surfaces band misses the small corpus
      never sampled — observed 4x8's recall drop from 1.0 at sf0.01 to
      0.984 at sf0.1), while the theory gate prices the asymptotic miss
      rate the sweep cannot see. ``t^r`` comes in as exact per-arm
      literals (:func:`banding_threshold_powers`), never an engine pow.
    - **Verify-cost budget** (truth-relative): ``n_candidates <=
      candidate_ratio * n_truth`` — a ratio means the same thing at
      every corpus scale where an absolute count would not.

    Among arms passing both: max measured recall, ties to fewer
    candidates, then fewer bands (less signature state per doc). The
    measured recall column is the WITNESS that the theory gate held on
    this corpus. Returns the full frame plus ``candidate_ratio,
    theory_ok, within_budget, chosen``."""
    tpow = banding_threshold_powers(jaccard_threshold, rows_grid)
    tp = None
    for r, v in tpow.items():
        cond = F.col("rows_per_band") == F.lit(int(r))
        tp = (
            F.when(cond, F.lit(v))
            if tp is None
            else tp.when(cond, F.lit(v))
        )
    theory_ok = tp * F.col("n_bands").cast("double") >= F.lit(1.0)
    within = F.col("n_candidates").cast("double") <= F.lit(
        float(candidate_ratio)
    ) * F.col("n_truth").cast("double")
    flagged = frame.select(
        "*",
        F.lit(float(candidate_ratio)).alias("candidate_ratio"),
        theory_ok.alias("theory_ok"),
        within.alias("within_budget"),
    )
    elig = F.col("theory_ok") & F.col("within_budget")
    w = Window.orderBy(
        F.when(elig, F.lit(0)).otherwise(F.lit(1)),
        -F.col("recall"),
        F.col("n_candidates"),
        F.col("n_bands"),
    )
    return (
        flagged.withColumn("_rn", F.row_number().over(w))
        .withColumn("chosen", (F.col("_rn") == 1) & elig)
        .drop("_rn")
    )
