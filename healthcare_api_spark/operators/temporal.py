"""Temporal join operators Spark lacks natively (brief: "as-of join,
range join" as archetypal custom operators) — implemented as
compositions of DataFrame ops, no UDFs, no per-row Python.

- ``asof_join``: point-in-time join. NOT the naive inequality-join +
  row_number (which explodes to O(left × right-per-key) before pruning);
  instead the union/running-state trick: tag both sides, union, and carry
  the right side's payload forward with last(ignorenulls) over a
  key-partitioned window. One shuffle, O(left+right) rows, no pair
  explosion — the scalable shape for billions of rows.
- ``interval_join``: event-in-interval join via chunked equi-join:
  intervals explode into fixed-width chunks, events map to their chunk,
  the join runs on (chunk) equi-keys and an exact filter prunes the
  boundary chunks. Shuffle volume is O(events + intervals×chunks) — a
  pure inequality join would be a cross product per overlapping range.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` for the same key (backward as-of, ties
    inclusive — matches DuckDB/pandas ASOF semantics). Left rows with no
    prior right row keep nulls.

    Forward direction flips the ordering (smallest right_ts ≥ left_ts).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction}")

    l_tag = left.withColumn("_ts", F.col(left_ts)).withColumn("_src", F.lit(1))
    r_cols = [F.col(key), F.col(right_ts).alias("_ts"), F.lit(0).alias("_src")] + [
        F.col(c).alias(f"_p_{c}") for c in payload_cols
    ]
    r_tag = right.select(*r_cols)
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)

    asc = direction == "backward"
    order = [F.col("_ts").asc() if asc else F.col("_ts").desc(), F.col("_src").asc()]
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned
    for c in payload_cols:
        carried = carried.withColumn(f"_p_{c}", F.last(F.col(f"_p_{c}"), ignorenulls=True).over(w))
    out = carried.filter(F.col("_src") == 1).drop("_src", "_ts")
    for c in payload_cols:
        out = out.withColumnRenamed(f"_p_{c}", c)
    return out


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    chunk: str = "30 days",
    how: str = "inner",
) -> DataFrame:
    """Join events to [start, end) intervals via chunked equi-join.

    ``chunk`` should be ≥ the typical interval width; each interval lands
    in (width/chunk + 1) chunks, each event in exactly one — the equi-join
    on the chunk key gives Catalyst a shuffle/broadcast hash join instead
    of a nested-loop inequality join.
    """
    chunk_secs = F.lit(_parse_duration_secs(chunk))
    ev_chunk = F.floor(F.unix_timestamp(F.col(ts_col)) / chunk_secs)
    events_c = events.withColumn("_chunk", ev_chunk)

    start_chunk = F.floor(F.unix_timestamp(F.col(start_col)) / chunk_secs)
    end_chunk = F.floor(F.unix_timestamp(F.col(end_col)) / chunk_secs)
    intervals_c = intervals.withColumn(
        "_chunk", F.explode(F.sequence(start_chunk, end_chunk))
    )
    joined = events_c.join(intervals_c, "_chunk", how).filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return joined.drop("_chunk")


def _parse_duration_secs(s: str) -> int:
    n, unit = s.split()
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60, "hour": 3600,
            "hours": 3600, "day": 86400, "days": 86400}[unit]
    return int(n) * mult
