"""Streaming continuous-aggregate maintenance (SURVEY.md §2.9 + the
hypertable-rollup custom operator, streaming flavor).

``streaming_rollup_refresh`` wires ``operators.rollup.refresh_tier`` into
a checkpointed ``foreachBatch``: each micro-batch aggregates ONLY its own
events at the tier's resolution and merge-adds them into the persisted
tier — cost per batch is O(batch + touched buckets), never a re-scan of
history. Exactly-once batch delivery (the foreachBatch checkpoint)
makes the merge idempotent across restarts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from healthcare_api_spark.operators.rollup import refresh_tier

_TIER_SCHEMA = "bucket timestamp, cnt bigint, sum_v double, min_v double, max_v double"


def _load_tier(
    spark: SparkSession, path: str, group_cols: tuple[str, ...]
) -> DataFrame:
    try:
        return spark.read.parquet(path)
    except Exception:
        schema = _TIER_SCHEMA
        for g in group_cols:
            schema += f", {g} string"
        return spark.createDataFrame([], schema)


def streaming_rollup_refresh(
    stream_df: DataFrame,
    tier_path: str,
    ts_col: str,
    value_col: str,
    level: str,
    group_cols: tuple[str, ...] = (),
    checkpoint: str | None = None,
):
    """readStream → per-batch incremental tier refresh persisted at
    ``tier_path``. Returns the StreamingQuery.

    The merged tier is materialized via ``localCheckpoint`` before the
    overwrite (the read and the write touch the same path — without the
    barrier Spark would be overwriting its own input). At production
    scale the same ``refresh_tier`` merge runs against a MERGE-capable
    table (Delta/Iceberg) or the bucketed copy-on-write store, where the
    rewrite is bounded to touched buckets instead of the whole tier —
    tier tables are orders of magnitude smaller than raw events, so even
    the full rewrite is cheap relative to the batch scan it replaces.
    """
    spark = stream_df.sparkSession

    def _refresh(batch_df: DataFrame, batch_id: int) -> None:
        existing = _load_tier(spark, tier_path, group_cols)
        merged = refresh_tier(
            existing, batch_df, ts_col, value_col, level, group_cols
        ).localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(tier_path)

    writer = stream_df.writeStream.foreachBatch(_refresh).outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
