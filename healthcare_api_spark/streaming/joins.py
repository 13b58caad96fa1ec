"""Watermarked stream-stream joins (SURVEY.md §2.9 stretch surface).

The canonical attribution shape: two unbounded streams joined on a key
within a time bound. Both sides carry watermarks and the join condition
carries the time-range predicate — that pair is what lets Spark expire
buffered state; without them a stream-stream join buffers forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    within: str,
    watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join two streams on ``key`` where the right event lands within
    ``(left_ts, left_ts + within]`` — e.g. click→purchase attribution.

    State bound: each side is watermarked at ``watermark`` (default:
    ``within``) and the range predicate is part of the join condition,
    so rows older than watermark + range are evicted from the state
    store instead of accumulating. Works identically on batch frames
    (watermarks are a streaming-only no-op), which is how the semantics
    are oracle-testable.
    """
    wm = watermark or within
    lf, rf = left, right
    if lf.isStreaming:
        lf = lf.withWatermark(left_ts, wm)
    if rf.isStreaming:
        rf = rf.withWatermark(right_ts, wm)
    lf = lf.alias("l")
    rf = rf.alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") > F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {within}"))
    )
    return lf.join(rf, cond, how)


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment: join an unbounded stream against a
    bounded dimension table (the classic fact-stream × dim shape).

    No watermark and no state store involvement. For a path-based
    parquet dim the FILE LISTING is captured when the frame is created,
    so this is snapshot-at-start semantics — an in-place overwrite of
    the dim path breaks the running query (FILE_NOT_EXIST). A
    slowly-changing dim needs either a MERGE-capable table format
    (Delta/Iceberg re-resolve snapshots per batch) or a foreachBatch
    sink that re-reads the dim each batch and joins there. The static
    side should be broadcast-sized or bucketed on the key; at
    100 TB/day stream volume the dim join must never shuffle the
    stream, so small dims are explicitly broadcast.
    """
    b = F.broadcast(dim) if how in ("left", "inner") else dim
    return stream.join(b, on=key, how=how)
