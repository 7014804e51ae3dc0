"""Structured Streaming re-host of the batch pipeline (SURVEY.md §2.10).

The reference is strictly batch; the streaming surface adds the concepts
batch never faced — watermarks bound state for late data, session windows
replace the cumulative-sum session ids, ``foreachBatch`` reuses the batch
sink. Stateless operators (cleaning/normalization projections and filters)
are reused verbatim from the batch modules: they are pure Column expressions,
legal in both execution modes.
"""

from security_data_pipeline_spark.streaming.sessionize import (
    session_window_stats,
    sessionize_with_state,
)
from security_data_pipeline_spark.streaming.pipeline import (
    enrich_stream,
    enrich_stream_with_cidrs,
    maintain_rollup_stream,
    read_raw_events_stream,
    stream_stream_join,
    run_streaming_pipeline,
)

__all__ = [
    "session_window_stats",
    "sessionize_with_state",
    "read_raw_events_stream",
    "enrich_stream",
    "enrich_stream_with_cidrs",
    "maintain_rollup_stream",
    "stream_stream_join",
    "run_streaming_pipeline",
]
