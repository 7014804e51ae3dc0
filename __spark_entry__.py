"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship end-to-end ETL query at sf0.001 (smoke).
``queries()`` — the 50-query driver window: every SURVEY.md §2 operator
witnessed directly or through a family composite (plans/composites.py).
``oracle_sql()`` — the DuckDB-ANSI equivalent for EVERY exported query
(no rows-only entries). Granular variants past the window are exported by
``security_data_pipeline_spark.plans.queries.get_extra_queries()`` and
oracle-checked locally by tests/test_oracle_parity.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full reference ETL chain (clean → dedup →
    multi-format parse → canonicalize → features → sessionize) over raw-style
    strings derived from events at sf0.001 — 13-column row-level output
    (scan → scalar ops → windows → agg; SURVEY.md §7.1/§3.1)."""
    from security_data_pipeline_spark.plans.queries import REGISTRY
    from security_data_pipeline_spark.session import configure

    configure(spark)
    return REGISTRY["secevents_etl"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from security_data_pipeline_spark.plans.queries import get_queries

    return get_queries()


def oracle_sql() -> dict[str, str]:
    from security_data_pipeline_spark.plans.queries import get_oracle_sql

    return get_oracle_sql()
