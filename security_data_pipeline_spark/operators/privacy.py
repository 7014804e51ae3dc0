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

__all__ = ["k_anonymize", "generalize_numeric", "l_diversity_report"]


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
