"""Structured Streaming tier (SURVEY.md §2.10 — absent from the
reference, which is batch-only; this is the EXT streaming surface).

The windowed aggregations here share their expression code with the
batch operators (``F.window`` / ``F.session_window`` are the same
Catalyst functions), so a pipeline validated in batch runs as a stream
by swapping ``read`` → ``readStream`` and adding a watermark.

Scale notes: file-source streams shard discovery across triggers
(``maxFilesPerTrigger``); stateful aggs keep per-key state in the state
store — watermarks bound that state; ``Trigger.AvailableNow`` gives
batch-like backfills with streaming semantics.
"""

from data_ingestion_tool_spark.streaming.streams import (
    incremental_reach_stream,
    read_reach_state,
    dedup_events_stream,
    enriched_events_stream,
    purchases_after_clicks_stream,
    running_user_totals_stream,
    sessionized_counts_stream,
    stream_ingest,
    stream_events_from_directory,
    windowed_counts_stream,
    write_stream_append,
)

__all__ = [
    "incremental_reach_stream",
    "read_reach_state",
    "dedup_events_stream",
    "enriched_events_stream",
    "purchases_after_clicks_stream",
    "running_user_totals_stream",
    "sessionized_counts_stream",
    "stream_ingest",
    "stream_events_from_directory",
    "windowed_counts_stream",
    "write_stream_append",
]
