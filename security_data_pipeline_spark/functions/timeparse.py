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


def time_bucket(col, seconds: float):
    """Arbitrary-width time bucket (the hypertable/continuous-aggregate
    primitive): floor ``col`` to a ``seconds``-wide epoch-aligned bucket —
    15-minute, 6-hour, 2-day widths all work, unlike ``date_trunc``'s fixed
    calendar units. TRUE integer epoch-micros math — ``us - pmod(us,
    width)`` never leaves the long domain (``pmod`` is non-negative, so the
    subtraction floors toward -inf for pre-1970 instants too), so bucket
    boundaries are exact at ANY epoch magnitude and identical in any
    engine; the result is a TIMESTAMP usable as a grouping key, a
    partition column, or the time axis of an incrementally-maintained
    rollup (operators/incremental.py partials per bucket merge across
    ingest batches).
    """
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    width_us = int(seconds * 1_000_000)
    if width_us <= 0:
        raise ValueError("seconds must be positive")
    us = F.unix_micros(c)
    return F.timestamp_micros(us - F.pmod(us, F.lit(width_us)))
