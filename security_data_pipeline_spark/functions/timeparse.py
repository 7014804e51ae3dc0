"""Multi-format timestamp parsing.

The reference relies on pandas' per-row format sniffing
(``pd.to_datetime(..., errors="coerce", utc=True)`` at
``/root/reference/src/normalization.py:25``). Spark's ``to_timestamp`` is
single-format, so we enumerate the observed wire formats and ``coalesce``
``try_to_timestamp`` attempts; a string matching none becomes NULL — exactly
``errors="coerce"`` (SURVEY.md §7.3 hard part 1).

Order matters for ambiguous strings: ``MM/dd`` is tried before ``dd-MM`` and
each only fires when the other's month field would be out of range, matching
pandas' month-first preference on the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The six formats observed in the reference corpus
# (/root/reference/data/raw_events.csv:2-7) plus ISO with offset.
TS_FORMATS: tuple[str, ...] = (
    "yyyy-MM-dd HH:mm:ss",
    "MM/dd/yyyy HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ss'Z'",
    "yyyy-MM-dd'T'HH:mm:ssXXX",
    "yyyy/MM/dd HH:mm:ss",
    "MMM d yyyy HH:mm:ss",
    "dd-MM-yyyy HH:mm:ss",
)


def parse_timestamp_multi(
    col: Column | str, formats: tuple[str, ...] = TS_FORMATS
) -> Column:
    """Parse a string column against each format in order; first hit wins.

    Returns TimestampType (session tz = UTC → same instants as pandas
    ``utc=True``); unparseable → NULL.
    """
    c = F.col(col) if isinstance(col, str) else col
    attempts = [F.try_to_timestamp(c, F.lit(fmt)) for fmt in formats]
    return F.coalesce(*attempts)
