"""Structured Streaming pipelines (extension beyond the reference — it has
no streaming surface; SURVEY.md §1.2)."""

from bigdata_lab02_spark.streaming.events import (  # noqa: F401
    dedup_stream,
    enriched_segment_stream,
    followup_pairs_stream,
    hourly_counts_stream,
    read_event_stream,
    run_stream_to_memory,
    running_user_totals_stream,
    sessionized_stream,
)
