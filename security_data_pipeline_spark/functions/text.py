"""Text canonicalization expressions.

All pure ``Column`` expressions — they stay inside whole-stage codegen and
never cross the Python boundary.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F


def canonicalize_text(col: Column | str) -> Column:
    """Lower + trim + ``[\\s\\-]+`` → ``_`` + collapse ``_+``.

    Parity with the reference's ``_normalize_text``
    (``/root/reference/src/normalization.py:34-40``). NULL stays NULL.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(F.trim(c))
    c = F.regexp_replace(c, r"[\s\-]+", "_")
    c = F.regexp_replace(c, r"_+", "_")
    return c


def map_with_passthrough(col: Column | str, mapping: Mapping[str, str]) -> Column:
    """Apply a synonym map; values absent from the map pass through unchanged.

    Mirrors pandas ``series.map(m).fillna(series)``
    (``/root/reference/src/normalization.py:75,98``). Implemented as a literal
    MapType lookup + coalesce so the whole expression is codegen'd JVM-side.
    ``try_element_at`` (not ``element_at``) so a missing key yields NULL under
    ANSI mode instead of raising.
    """
    c = F.col(col) if isinstance(col, str) else col
    pairs: list[Column] = []
    for key, value in mapping.items():
        pairs.append(F.lit(key))
        pairs.append(F.lit(value))
    map_lit = F.create_map(*pairs)
    return F.coalesce(F.try_element_at(map_lit, c), c)
