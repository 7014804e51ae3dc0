"""Privacy operators for training-data release: k-anonymity suppression and
quasi-identifier generalization.

Before a corpus (or the event logs behind it) leaves the pipeline, rows whose
quasi-identifier combination is rare enough to re-identify a person must be
suppressed or coarsened. Both operators are single-statement DataFrame plans:

- :func:`k_anonymize` — keep only rows whose quasi-identifier tuple occurs at
  least ``k`` times. The group size rides ONE count window over the
  quasi-identifier columns (no join-back, no second scan); at 100 TB this is
  one shuffle on the quasi-identifier key, same cost as any groupBy.
- :func:`generalize_numeric` — coarsen a numeric column to its bucket's range
  label (``"[lo,hi)"``), the standard generalization step that lifts group
  sizes above ``k`` without dropping rows. Pure Column arithmetic.

PII *content* scrubbing (emails, IPs inside text) is
``textops.scrub_pii``; these operators handle the *structural* identifiers.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "k_anonymize",
    "generalize_numeric",
    "l_diversity_report",
    "privacy_audit_from_cells",
]


def k_anonymize(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int = 5,
    count_col: str | None = None,
) -> DataFrame:
    """Suppress rows whose ``quasi_cols`` tuple appears fewer than ``k``
    times — the remaining frame is k-anonymous w.r.t. those columns.

    NULL is treated as a value of its own (SQL count over a window counts
    null-keyed groups together — matching the standard definition where an
    absent attribute is still an attribute). ``count_col`` optionally keeps
    the group size as a column for auditing.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    w = Window.partitionBy(*[F.col(c) for c in quasi_cols])
    sized = df.withColumn("_qid_count", F.count(F.lit(1)).over(w))
    kept = sized.filter(F.col("_qid_count") >= F.lit(k))
    if count_col:
        return kept.withColumnRenamed("_qid_count", count_col)
    return kept.drop("_qid_count")


def generalize_numeric(
    col: Column | str,
    width: float,
    anchor: float = 0.0,
) -> Column:
    """Range label for ``col`` generalized to fixed-width buckets anchored at
    ``anchor``: e.g. width=10 maps 37 → ``"[30,40)"``. NULL stays NULL (its
    own quasi-identifier value under :func:`k_anonymize`)."""
    c = F.col(col) if isinstance(col, str) else col
    lo = F.floor((c.cast("double") - F.lit(anchor)) / F.lit(width)) * F.lit(
        width
    ) + F.lit(anchor)
    # integral labels when width is integral, else decimal labels
    if float(width).is_integer() and float(anchor).is_integer():
        lo_s = lo.cast("long").cast("string")
        hi_s = (lo + F.lit(width)).cast("long").cast("string")
    else:
        lo_s = lo.cast("string")
        hi_s = (lo + F.lit(width)).cast("string")
    return F.concat(F.lit("["), lo_s, F.lit(","), hi_s, F.lit(")"))


def l_diversity_report(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    l: int = 3,
) -> DataFrame:
    """Distinct l-diversity audit (Machanavajjhala et al. 2006 — public
    criterion): k-anonymity alone fails when a quasi-group's SENSITIVE
    attribute is homogeneous (everyone in the group shares the secret, so
    group size protects nothing). Each quasi-identifier group must carry
    at least ``l`` distinct sensitive values.

    One hash aggregation per quasi-group: size + distinct-sensitive count
    (single-column distinct — Spark's two-phase partial distinct, no
    Expand) + the pass flag. Feed the failing groups back into
    :func:`generalize_numeric` coarsening or suppression the same way the
    k-anonymity gate is used. Output: ``*quasi_cols, group_size,
    n_sensitive, l_diverse``.
    """
    if l < 1:
        raise ValueError("l must be >= 1")
    return df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).alias("group_size"),
        F.countDistinct(F.col(sensitive_col)).alias("n_sensitive"),
        (F.countDistinct(F.col(sensitive_col)) >= F.lit(l)).alias(
            "l_diverse"
        ),
    )


def t_closeness_report(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    t: float = 0.2,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007 — public
    criterion), completing the k-anonymity / l-diversity triad:
    l-diversity still leaks when a group's sensitive DISTRIBUTION is
    skewed far from the corpus (a group with l distinct diagnoses, 95%
    of them one disease, tells the attacker plenty). Each quasi-group's
    sensitive-value distribution must sit within ``t`` of the global
    distribution in total variation distance
    ``TVD = 0.5 · Σ_v |p_group(v) − p_global(v)|`` (the categorical form
    of the paper's EMD).

    Shape: ONE (quasi, sensitive) hash aggregation; the global
    distribution folds FROM that frame (no second corpus pass) and joins
    back keyed on the sensitive value — a value-keyed equi-join, never a
    broadcast of the unbounded group list; absent values contribute
    ``p_global(v)/2`` each, folded in closed form via Σ_present
    (total absent mass = 1 − Σ_present p_global). Ratios round to 6 dp
    for cross-engine determinism. Output: ``*quasi_cols, group_size,
    tvd, t_close``.
    """
    if not 0.0 < t <= 1.0:
        raise ValueError("t must be in (0, 1]")
    cell = t_closeness_cells(df, quasi_cols, sensitive_col)
    return t_closeness_from_cells(cell, quasi_cols, t)


def t_closeness_cells(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
) -> DataFrame:
    """The (quasi, sensitive, count) sufficient-statistic frame behind
    :func:`t_closeness_report` — counts are ADDITIVE, so the frame is
    the unit of streaming state (``maintain_privacy_cells_stream``):
    fold per micro-batch, derive the audit from the cumulative cells.

    NULL sensitive values are EXCLUDED here, by convention: the audit
    measures the distribution of *known* secrets, matching
    :func:`l_diversity_report` (whose ``countDistinct`` likewise ignores
    NULL). Excluding them at the cell source — rather than letting the
    downstream equi-join drop them silently — keeps group sizes, the
    global distribution, and the TVD consistent with each other: before
    this filter, NULL-sensitive rows counted in ``group_size`` and the
    global total but vanished from the present-side TVD sum, understating
    or overstating TVD and letting an all-NULL quasi-group skip the audit
    unreported with inconsistent totals."""
    return (
        df.filter(F.col(sensitive_col).isNotNull())
        .groupBy(
            *[F.col(c) for c in quasi_cols],
            F.col(sensitive_col).alias("_v"),
        )
        .agg(F.count(F.lit(1)).alias("_c"))
    )


def t_closeness_from_cells(
    cell: DataFrame,
    quasi_cols: Sequence[str],
    t: float = 0.2,
) -> DataFrame:
    """Audit tail shared by the batch report and the streamed state
    reader: group sizes, the global distribution, and the TVD fold all
    derive FROM the bounded cell frame — no corpus access.

    The cell frame feeds FOUR consumers (group sizes, the global
    distribution twice via its total, and the join-back), so it is
    pinned — unpinned, Catalyst re-inlines the corpus-sized (quasi,
    sensitive) aggregation into every branch and the batch report scans
    the corpus four times (measured: 4 parquet scans, zero reused
    exchanges, round 11). The frame itself is grid-bounded, so the pin
    materializes a few hundred rows (the _cov_from_sums precedent)."""
    from security_data_pipeline_spark.pin import pin_lazy

    cell = cell.transform(pin_lazy)
    gsize = cell.groupBy(*quasi_cols).agg(F.sum("_c").alias("_gn"))
    glob = cell.groupBy("_v").agg(F.sum("_c").alias("_gc"))
    tot = glob.agg(F.sum("_gc").alias("_t"))
    pg = glob.crossJoin(F.broadcast(tot)).select(
        "_v",
        F.round(
            F.col("_gc").cast("double") / F.col("_t").cast("double"), 6
        ).alias("_pg"),
    )
    joined = (
        cell.join(pg, "_v")
        .join(gsize, list(quasi_cols))
        .select(
            *quasi_cols,
            "_gn",
            F.round(
                F.col("_c").cast("double") / F.col("_gn").cast("double"),
                6,
            ).alias("_pv"),
            "_pg",
        )
    )
    # TVD over the full value domain = 0.5·(Σ_present |pv − pg|
    # + Σ_absent pg) with Σ_absent pg = 1 − Σ_present pg. Terms are
    # true 6-dp decimals (both ratios pre-rounded), so casting each to
    # DECIMAL(18,6) before summing makes the fold exact and
    # accumulation-order-free — a plain double sum rounded to 6 dp sat
    # exactly on a ...9995 edge at sf0.01 and split the engines
    tvd = F.round(
        F.lit(0.5)
        * (
            F.sum(
                F.abs(F.col("_pv") - F.col("_pg")).cast("decimal(18,6)")
            ).cast("double")
            + (
                F.lit(1.0)
                - F.sum(F.col("_pg").cast("decimal(18,6)")).cast("double")
            )
        ),
        6,
    )
    return joined.groupBy(*quasi_cols).agg(
        F.max("_gn").cast("long").alias("group_size"),
        tvd.alias("tvd"),
        (tvd <= F.lit(float(t))).alias("t_close"),
    )


def privacy_audit_from_cells(
    cell: DataFrame,
    quasi_cols: Sequence[str],
    k: int = 25,
    l: int = 3,
    t: float = 0.2,
) -> DataFrame:
    """The WHOLE privacy triad from the one (quasi, sensitive, count)
    cell frame: k-anonymity group sizes, distinct l-diversity, and the
    t-closeness TVD — so a release review current at ingest cadence
    needs exactly ONE streamed state (``maintain_privacy_cells_stream``)
    and zero corpus access.

    Semantics follow the cell frame's documented convention
    (:func:`t_closeness_cells`): all three audits are over rows whose
    sensitive value is KNOWN — group sizes here can undercount
    :func:`k_anonymize`'s (which counts NULL-sensitive rows too); that
    is the price of deriving everything from one additive state, and it
    is the conservative direction for l-diversity/t-closeness (NULLs
    never inflate diversity or mass).

    Cell counts are additive and (quasi, sensitive) rows are unique, so
    ``n_sensitive`` is a plain row count per quasi-group — no distinct
    aggregation. The TVD leg is :func:`t_closeness_from_cells` verbatim
    (pinned cell frame, closed-form absent mass, DECIMAL TVD fold).
    Output: ``*quasi_cols, group_size, n_sensitive, k_anonymous,
    l_diverse, tvd, t_close``.
    """
    if k < 1 or l < 1:
        raise ValueError("k and l must be >= 1")
    from security_data_pipeline_spark.pin import pin_lazy

    cell = cell.transform(pin_lazy)
    sizes = cell.groupBy(*quasi_cols).agg(
        F.sum("_c").cast("long").alias("group_size"),
        F.count(F.lit(1)).cast("long").alias("n_sensitive"),
    )
    tvd = t_closeness_from_cells(cell, quasi_cols, t=t).select(
        *quasi_cols, "tvd", "t_close"
    )
    return sizes.join(tvd, list(quasi_cols)).select(
        *quasi_cols,
        "group_size",
        "n_sensitive",
        (F.col("group_size") >= F.lit(int(k))).alias("k_anonymous"),
        (F.col("n_sensitive") >= F.lit(int(l))).alias("l_diverse"),
        "tvd",
        "t_close",
    )
