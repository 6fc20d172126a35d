"""Structured Streaming layer (SURVEY.md §2.9): the reference's
batch-polling incrementality (Airflow re-runs + idempotent loads),
re-expressed as streams."""

from telecom_competitor_analysis_spark.streaming.incremental import (  # noqa: F401
    foreach_batch_star_merge,
    stream_events,
    streaming_dedup,
    tumbling_event_stats,
)
