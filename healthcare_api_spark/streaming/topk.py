"""Continuous heavy hitters: a streaming-maintained token-count state
with top-k reads (SURVEY.md §2.9 composed with the §2.10 heavy-hitter
operator).

Per micro-batch: tokenize ONLY the batch, aggregate its counts, and
add-merge into the versioned state (`apply_versioned_merge` — the same
exactly-once snapshot skeleton the rollup tier uses, so replays never
double-count). State size is the vocabulary, not the stream; the top-k
read is an O(k) TakeOrdered over it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from healthcare_api_spark.streaming.rollup import (
    _complete_versions,
    apply_versioned_merge,
)


def _batch_counts(batch_df: DataFrame, text_col: str) -> DataFrame:
    from healthcare_api_spark.functions.text import tokens

    return (
        batch_df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _merge_counts(existing: DataFrame, batch_counts: DataFrame) -> DataFrame:
    return (
        existing.unionByName(batch_counts)
        .groupBy("tok")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )


def streaming_top_tokens(
    stream_df: DataFrame,
    text_col: str,
    state_path: str,
    checkpoint: str | None = None,
    keep_versions: int = 2,
):
    """readStream → continuously maintained corpus token counts.
    Returns the StreamingQuery; read the current top-k any time with
    ``read_top_tokens``."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        apply_versioned_merge(
            batch_df,
            batch_id,
            state_path,
            lambda existing, batch: _merge_counts(
                existing, _batch_counts(batch, text_col)
            ),
            lambda spark: spark.createDataFrame([], "tok string, cnt bigint"),
            keep_versions=keep_versions,
        )

    writer = stream_df.writeStream.foreachBatch(_apply).outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def read_top_tokens(spark: SparkSession, state_path: str, k: int = 20) -> DataFrame:
    """Current top-k heavy hitters from the newest complete snapshot
    (deterministic tie-break: cnt desc, token asc)."""
    versions = _complete_versions(spark, state_path)
    if not versions:
        return spark.createDataFrame([], "tok string, cnt bigint")
    counts = spark.read.parquet(f"{state_path}/v{versions[-1]}")
    return counts.orderBy(F.col("cnt").desc(), F.col("tok").asc()).limit(k)
