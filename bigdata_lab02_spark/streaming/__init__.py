"""Structured Streaming pipelines (extension beyond the reference — it has
no streaming surface; SURVEY.md §1.2)."""

from bigdata_lab02_spark.streaming.events import (  # noqa: F401
    hourly_counts_stream,
    run_stream_to_memory,
    sessionized_stream,
)
