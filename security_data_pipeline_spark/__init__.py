"""security_data_pipeline_spark — a PySpark-native security-event analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of
``AbhignaKuchukulla/Security-Data-Pipeline`` (a pandas batch ETL pipeline:
clean → normalize → feature-engineer security event logs), extended with the
operators a large-scale (100 TB) training-data pipeline needs: scalable
deduplication, similarity search, text analysis, and multimodal column
plumbing, plus a Structured Streaming re-host of the sessionization path.

Design stance (see SURVEY.md §7):
- Declarative DataFrame/SQL plans; Catalyst/AQE pick physical strategy.
- Zero Python UDFs on the reference-surface hot path.
- Explicit schemas everywhere (no inferSchema).
- Input order made explicit via an ``_ordinal`` column where the reference
  relies on implicit pandas row order (keep-last dedup).
"""

__version__ = "0.1.0"
