"""Second-generation stateful streaming on the transformWithState API
(Spark 4): typed state variables + TTL handled by the state store itself.

``RunningStatsProcessor`` — per-key running aggregates (count/sum/min/
max) emitted incrementally each micro-batch: the streaming counterpart
of the rollup tiers, with state TTL bounding unbounded key domains.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("cnt", LongType()),
        StructField("sum_v", DoubleType()),
        StructField("min_v", DoubleType()),
        StructField("max_v", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("cnt", LongType()),
        StructField("sum_v", DoubleType()),
        StructField("min_v", DoubleType()),
        StructField("max_v", DoubleType()),
    ]
)


class RunningStatsProcessor(StatefulProcessor):
    """Maintains decomposable aggregates per key in a ValueState and
    emits the updated totals whenever the key sees new rows."""

    def __init__(self, value_col: str, ttl_ms: int | None = None):
        self._value_col = value_col
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("stats", _STATE_SCHEMA, self._ttl_ms)

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame], timerValues) -> Iterator[pd.DataFrame]:
        cnt, s = 0, 0.0
        mn, mx = None, None
        for pdf in rows:
            # nulls are excluded from ALL aggregates (cnt included) so
            # cnt/sum/min/max stay mutually consistent; an all-null batch
            # must not poison min/max state with NaN
            v = pdf[self._value_col].dropna().astype(float)
            cnt += len(v)
            if len(v):
                s += float(v.sum())
                mn = float(v.min()) if mn is None else min(mn, float(v.min()))
                mx = float(v.max()) if mx is None else max(mx, float(v.max()))
        if cnt == 0:
            return iter(())
        if self._state.exists():
            p_cnt, p_sum, p_min, p_max = self._state.get()
            cnt += p_cnt
            s += p_sum
            mn = p_min if mn is None else min(mn, p_min)
            mx = p_max if mx is None else max(mx, p_max)
        self._state.update((cnt, s, mn, mx))
        yield pd.DataFrame(
            {"key": [str(key[0])], "cnt": [cnt], "sum_v": [s], "min_v": [mn], "max_v": [mx]}
        )

    def close(self) -> None:
        pass


def tws_available() -> bool:
    """transformWithState's Python worker speaks protobuf to the JVM;
    without a functional google.protobuf the query crashes at start."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_stats(
    stream_df: DataFrame,
    key_col: str,
    value_col: str,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Per-key incremental aggregates over a stream via
    transformWithStateInPandas (RocksDB-backed typed state + TTL).

    Requires a working ``protobuf`` package (checked up front — absent
    in this build environment, so the applyInPandasWithState operators
    in ``stateful.py`` are the supported path there).
    """
    if not tws_available():
        raise NotImplementedError(
            "transformWithStateInPandas needs the protobuf package, which is "
            "not functional in this environment; use streaming.stateful "
            "(applyInPandasWithState) instead"
        )
    return stream_df.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=RunningStatsProcessor(value_col, ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None" if ttl_ms is None else "ProcessingTime",
    )
