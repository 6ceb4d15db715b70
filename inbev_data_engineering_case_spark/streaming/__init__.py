"""Structured Streaming twins of the batch event-time operators."""

from inbev_data_engineering_case_spark.streaming.events import (  # noqa: F401
    stream_sessionize,
    stream_tumbling_counts,
)
