"""Column-expression building blocks (pure, JVM-side, no Python UDFs)."""

from security_data_pipeline_spark.functions.text import (
    canonicalize_text,
    map_with_passthrough,
)
from security_data_pipeline_spark.functions.timeparse import (
    TS_FORMATS,
    parse_timestamp_multi,
)
from security_data_pipeline_spark.functions.maps import (
    STATUS_MAP,
    SEVERITY_MAP,
    SEVERITY_SCORE,
)
from security_data_pipeline_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)

__all__ = [
    "canonicalize_text",
    "map_with_passthrough",
    "TS_FORMATS",
    "parse_timestamp_multi",
    "STATUS_MAP",
    "SEVERITY_MAP",
    "SEVERITY_SCORE",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
]
