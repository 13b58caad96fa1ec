"""Streaming layer (SURVEY.md §2.9): incremental upsert
(`--enable-update-create` semantics) and windowed aggregation."""

from healthcare_api_spark.streaming.upsert import (
    streaming_upsert,
    tumbling_window_counts,
)

__all__ = ["streaming_upsert", "tumbling_window_counts"]
