"""Continuous heavy hitters: a streaming-maintained token-count state
with top-k reads (SURVEY.md §2.9 composed with the §2.10 heavy-hitter
operator).

Per micro-batch: tokenize ONLY the batch, aggregate its counts, and
add-merge into the state. Since r8 the state is a
``BucketedVersionedState`` keyed by token (VERDICT r7 #3): counts live
in hash-of-token buckets and each batch rewrites only the buckets its
batch-vocabulary touches, as an immutable ``_SUCCESS``-gated
``v{batch_id}`` snapshot — replay-idempotent (a committed batch is
skipped; a partial one recomputes from the pre-batch versions) and
crash-safe (prior versions are never mutated). Note the natural-
language caveat: common tokens hash everywhere, so a big batch touches
most buckets — the bound is real but the win over full rewrite grows
as batches get small relative to the accumulated vocabulary, exactly
the steady-state regime. State size is the vocabulary, not the stream;
the top-k read is an O(k) TakeOrdered over it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from healthcare_api_spark.streaming.state import BucketedVersionedState


def _store(state_path: str, num_state_buckets: int) -> BucketedVersionedState:
    # r13 (guide §6): constructor merge_fn → append-protocol commits;
    # per-batch I/O is the batch vocabulary's counts, not the
    # accumulated vocabulary, and reads fold the pending deltas.
    return BucketedVersionedState(
        state_path,
        key_cols=["tok"],
        num_buckets=num_state_buckets,
        merge_fn=_merge_counts,
    )


def _batch_counts(batch_df: DataFrame, text_col: str) -> DataFrame:
    from healthcare_api_spark.functions.text import tokens

    return (
        batch_df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _merge_counts(existing: DataFrame | None, batch_counts: DataFrame) -> DataFrame:
    if existing is None:
        return batch_counts.select("tok", F.col("cnt").cast("bigint").alias("cnt"))
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
    num_state_buckets: int = 16,
):
    """readStream → continuously maintained corpus token counts.
    Returns the StreamingQuery; read the current top-k any time with
    ``read_top_tokens``."""
    store = _store(state_path, num_state_buckets)
    store.keep_versions = keep_versions

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        delta = _batch_counts(batch_df, text_col)
        store.merge_batch(delta, batch_id)

    writer = stream_df.writeStream.foreachBatch(_apply).outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def read_top_tokens(
    spark: SparkSession,
    state_path: str,
    k: int = 20,
    num_state_buckets: int = 16,
) -> DataFrame:
    """Current top-k heavy hitters from the newest complete per-bucket
    snapshots (deterministic tie-break: cnt desc, token asc)."""
    counts = _store(state_path, num_state_buckets).read(spark)
    if counts is None:
        return spark.createDataFrame([], "tok string, cnt bigint")
    return counts.orderBy(F.col("cnt").desc(), F.col("tok").asc()).limit(k)
