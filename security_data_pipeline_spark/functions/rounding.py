"""Signed-zero-canonical rounding — the repo-wide convention.

The correctness driver hashes result values by BIT PATTERN, so
``-0.0`` and ``+0.0`` are different answers even though they compare
equal under ``==``. The two engines disagree on which zero a rounded
tiny negative produces (all three facts verified empirically in this
container, Spark 4.1 / DuckDB bundled):

- DuckDB ``ROUND`` on DOUBLE preserves the argument's sign:
  ``ROUND(-1e-10, 6) -> -0.0``.
- DuckDB ``ROUND`` on DECIMAL returns DECIMAL, which has no signed
  zero — and ``DECIMAL + 0.0`` stays DECIMAL, so the wrap below is a
  type-safe no-op at decimal sites.
- Spark ``F.round`` goes through ``java.math.BigDecimal``, which has
  no signed zero: every Spark round of a double is already ``+0.0``
  (pinned by ``tests/test_rounding_convention.py`` so a Spark upgrade
  that changes this breaks loudly).

Convention (round 11, after the round-10 ``corpus_stats_suite`` red
slot was bisected to a single ``-0.0`` covariance cell — VERDICT.md
r10 "What's wrong" #1): every oracle-SQL ``ROUND(x, n)`` is written
``(ROUND(x, n) + 0.0)`` — IEEE 754 guarantees ``-0.0 + 0.0 = +0.0``
under the default round-to-nearest mode, and every other value is
unchanged. ``scripts/canonicalize_round_zero.py`` applied the rewrite
mechanically to all 200 existing sites; ``sql_round`` below is the
helper for new SQL, and ``fround`` the (documentation-grade, since
Spark is already canonical) helper for new Spark code.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fround(col: Column | str, scale: int = 6) -> Column:
    """Round to ``scale`` digits with a canonical (positive) zero.

    ``F.round`` already never emits ``-0.0`` (BigDecimal semantics),
    so the ``+ 0.0`` is belt-and-braces: it keeps the Spark expression
    token-identical to the oracle's ``(ROUND(x, n) + 0.0)`` form and
    stays correct even if a future Spark release switched to an
    IEEE-sign-preserving round. NULL stays NULL (``NULL + 0.0`` is
    NULL in both engines); NaN stays NaN."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c, scale) + F.lit(0.0)


def sql_round(expr: str, scale: int = 6) -> str:
    """The oracle-SQL mirror of :func:`fround` for building new
    DuckDB oracle strings: ``(ROUND(expr, scale) + 0.0)``."""
    return f"(ROUND({expr}, {scale}) + 0.0)"
