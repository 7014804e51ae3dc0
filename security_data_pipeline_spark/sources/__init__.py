"""Sources and sinks: testdata catalog, raw-event CSV ingest, writers."""

from security_data_pipeline_spark.sources.catalog import TESTDATA_TABLES, load_table
from security_data_pipeline_spark.sources.raw_events import (
    RAW_EVENTS_SCHEMA,
    read_raw_events_csv,
)
from security_data_pipeline_spark.sources.sinks import write_csv, write_parquet

__all__ = [
    "TESTDATA_TABLES",
    "load_table",
    "RAW_EVENTS_SCHEMA",
    "read_raw_events_csv",
    "write_csv",
    "write_parquet",
]
