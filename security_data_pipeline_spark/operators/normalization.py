"""Normalization operators: timestamp standardization, categorical canon.

Parity targets: ``/root/reference/src/normalization.py`` (timestamps :16-31,
categoricals :43-108). Semantic traps encoded (SURVEY.md §4.3): unmapped
status/severity values pass through; NULL and empty-string travel different
paths and both end at "unknown".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from security_data_pipeline_spark.functions.maps import SEVERITY_MAP, STATUS_MAP
from security_data_pipeline_spark.functions.text import (
    canonicalize_text,
    map_with_passthrough,
)
from security_data_pipeline_spark.functions.timeparse import parse_timestamp_multi


def standardize_timestamps(
    df: DataFrame,
    column: str = "timestamp",
    drop_invalid: bool = True,
    first_format_only: bool = False,
    ordinal_col: str = "_ordinal",
) -> DataFrame:
    """Parse string timestamps to UTC TimestampType; coerce failures to NULL
    and optionally drop them (normalization.py:16-31).

    Default mode parses against every known wire format (a documented
    improvement). ``first_format_only=True`` replicates the reference's
    *empirical* behavior under pandas 2.x: ``pd.to_datetime`` locks onto the
    format inferred from the first non-null value and coerces every other
    format to NaT **[verified by execution — rows 1002-1006 of
    /root/reference/data/raw_events.csv are silently dropped]**.
    """
    if column not in df.columns:
        return df
    dtype = df.schema[column].dataType
    if isinstance(dtype, T.StringType):
        if first_format_only:
            fmt = _infer_first_format(df, column, ordinal_col)
            df = df.withColumn(
                column, F.try_to_timestamp(F.col(column), F.lit(fmt))
            )
        else:
            df = df.withColumn(column, parse_timestamp_multi(column))
    elif not isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        df = df.withColumn(column, F.col(column).cast("timestamp"))
    if drop_invalid:
        df = df.filter(F.col(column).isNotNull())
    return df


def _infer_first_format(df: DataFrame, column: str, ordinal_col: str) -> str:
    """Find the first (input-order) non-null value's wire format.

    One tiny driver-side job over a single row — mirrors pandas'
    ``guess_datetime_format(first_non_null)``.
    """
    from security_data_pipeline_spark.functions.timeparse import TS_FORMATS

    candidates = df.filter(F.col(column).isNotNull())
    if ordinal_col in df.columns:
        candidates = candidates.orderBy(ordinal_col)
    first = candidates.select(
        *[
            F.try_to_timestamp(F.col(column), F.lit(fmt)).isNotNull().alias(f"_f{i}")
            for i, fmt in enumerate(TS_FORMATS)
        ]
    ).first()
    if first is not None:
        for i, fmt in enumerate(TS_FORMATS):
            if first[f"_f{i}"]:
                return fmt
    return TS_FORMATS[0]


def _canon_with_null_unknown(col: str) -> Column:
    # canonicalize; NULL → "unknown" (pandas .fillna after _normalize_text)
    return F.coalesce(canonicalize_text(col), F.lit("unknown"))


def normalize_categoricals(df: DataFrame) -> DataFrame:
    """Canonicalize event_type/status/severity/user_id/source_ip
    (normalization.py:43-108). Single projection, fully codegen'd."""
    exprs: list[Column] = []
    for field in df.schema.fields:
        name = field.name
        if name == "event_type":
            exprs.append(_canon_with_null_unknown(name).alias(name))
        elif name == "status":
            exprs.append(
                map_with_passthrough(
                    _canon_with_null_unknown(name), STATUS_MAP
                ).alias(name)
            )
        elif name == "severity":
            exprs.append(
                map_with_passthrough(
                    _canon_with_null_unknown(name), SEVERITY_MAP
                ).alias(name)
            )
        elif name == "user_id" and isinstance(field.dataType, T.StringType):
            # canonicalize; "" → unknown; NULL stays NULL (pandas .replace
            # matches only the empty string — normalization.py:100-101)
            canon = canonicalize_text(name)
            exprs.append(
                F.when(canon == "", "unknown").otherwise(canon).alias(name)
            )
        elif name == "source_ip":
            trimmed = F.trim(F.col(name).cast("string"))
            exprs.append(
                F.when(trimmed == "", "0.0.0.0").otherwise(trimmed).alias(name)
            )
        else:
            exprs.append(F.col(name))
    return df.select(*exprs)
