"""Streaming sketch maintenance: fold per-micro-batch KMV sketches
into a persistent state table (SURVEY.md §2.9 composed with the §2.10
sketch family).

The point of a MERGEABLE sketch is exactly this deployment: each
micro-batch is sketched independently (one distinct + per-group
bottom-k over BATCH rows only) and ``kmv_merge`` folds it into state
whose size is #groups × k hashes — never the stream. Because bottom-k
merge is associative, commutative and idempotent-on-duplicates, the
final state is bit-identical to a single batch build over the whole
corpus — which is what makes the st6 gate query hash-checkable against
the plain k4 oracle: the cross-batch machinery must EQUAL the batch
semantics, not approximate it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (re-export convention)

from healthcare_api_spark.operators.sketches import kmv_build, kmv_merge


def streaming_kmv(
    stream_df: DataFrame,
    state_root: str,
    group_cols: list[str],
    key_col: str,
    k: int = 64,
    checkpoint: str | None = None,
):
    """Start a foreachBatch KMV maintainer. Per micro-batch:

    1. sketch the batch (``kmv_build`` — distinct + bottom-k on batch
       rows only),
    2. merge into ``{state_root}/kmv`` (previous state pinned with
       localCheckpoint before the overwrite — the repo-wide
       read-own-input rule),
    3. overwrite the state table.

    Returns the StreamingQuery; read the live sketch with
    ``spark.read.parquet(f"{state_root}/kmv")`` (feed it to
    ``kmv_distinct`` / ``kmv_set_ops`` for estimates — sketch algebra
    works on the streaming state unchanged).
    """
    state_dir = f"{state_root}/kmv"

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        delta = kmv_build(batch_df, group_cols, key_col, k)
        try:
            prev = spark.read.parquet(state_dir).localCheckpoint(eager=True)
            merged = kmv_merge(prev, delta, group_cols, k)
        except Exception as e:  # first batch: no state yet
            if (
                "Path does not exist" not in str(e)
                and "PATH_NOT_FOUND" not in str(e)
            ):
                raise
            merged = delta
        merged.write.mode("overwrite").parquet(state_dir)

    writer = (
        stream_df.writeStream.foreachBatch(_fold).outputMode("update")
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
