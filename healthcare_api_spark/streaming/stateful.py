"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY.md §2.9 stretch; the brief's 'custom stateful operators' row).

``streaming_dedup`` — exactly-once emission per key across the whole
stream: the first row for each key passes, later duplicates are dropped,
with per-key state (a seen flag + first-seen timestamp) managed by the
state store and bounded by an optional processing-time timeout.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType


def streaming_dedup(
    stream_df: DataFrame,
    key_col: str,
    timeout_ms: int | None = None,
):
    """Drop duplicate keys across micro-batches.

    State per key: (seen count). Output: one row per key, first
    occurrence only, schema (key, first_seen_count=1).

    At scale the state store shards by the grouping key across
    executors; a processing-time timeout bounds state for unbounded key
    domains (after expiry a key may be re-emitted — at-least-once dedup,
    the standard trade-off).
    """
    out_schema = StructType(
        [StructField("key", StringType()), StructField("n_first_batch", LongType())]
    )
    state_schema = StructType([StructField("seen", LongType())])

    def dedup_fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # expiry: drop the key's state so the store stays bounded
            # (the key may be re-emitted later — at-least-once dedup)
            state.remove()
            return iter(())
        n = 0
        for pdf in pdfs:
            n += len(pdf)
        if state.exists:
            (seen,) = state.get
            state.update((seen + n,))
            if timeout_ms is not None:
                state.setTimeoutDuration(timeout_ms)  # re-arm on every touch
            return iter(())  # duplicate key: emit nothing
        state.update((n,))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        return iter([pd.DataFrame({"key": [str(key[0])], "n_first_batch": [n]})])

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        stream_df.groupBy(key_col)
        .applyInPandasWithState(dedup_fn, out_schema, state_schema, "update", timeout)
    )


def streaming_dedup_within_watermark(
    stream_df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    watermark: str,
) -> DataFrame:
    """Engine-native bounded-state streaming dedup: Spark's
    ``dropDuplicatesWithinWatermark`` keeps per-key state only until the
    event-time watermark passes the first-seen row, then evicts — the
    built-in complement to the custom ``streaming_dedup`` (whose state
    is processing-time-bounded and hand-managed). Use this when "same
    key within the late-data horizon" is the dedup contract (exactly
    the at-least-once-delivery retry window); use the custom operator
    when the contract is first-ever-occurrence with explicit TTL.
    """
    return stream_df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )
