"""Streaming near-duplicate admission control (SURVEY.md §2.9/§2.10).

The online corpus-building primitive: as documents stream in, admit a
doc only if it is not a near-duplicate of anything already SEEN. The
same banded-MinHash blocking as the batch LSH path
(operators/dedup.band_signatures — md5 family, oracle-reproducible),
maintained as a compact band→owner state table across micro-batches.

Semantics (deliberately exact and batch-replayable): a doc is admitted
iff every one of its band buckets is FIRST owned by it, where ownership
is lexicographic (batch, id) — no bucket was seen in any earlier batch,
and no smaller id in the same batch shares it. Because "seen" covers
ALL prior docs (admitted or not), the final verdict table equals a pure
batch computation with an explicit batch column:
``min(batch·K + id) OVER (PARTITION BY band, bucket)`` — which is what
the st5 oracle checks, proving the cross-batch state machinery exact.

State cost: |distinct (band, bucket)| rows — bands-per-doc × docs in
the worst case, but duplicate-heavy corpora (the use case) collapse to
the distinct-bucket count; each merge touches |state| + |batch bands|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_neardup(
    stream_df: DataFrame,
    state_root: str,
    id_col: str,
    text_col: str,
    num_hashes: int = 4,
    rows_per_band: int = 2,
    shingle_n: int = 3,
    checkpoint: str | None = None,
):
    """Start the streaming near-dup admission filter.

    Per micro-batch (foreachBatch — the st3 state-table pattern):

    1. band the batch (``dedup.band_signatures``, md5 rotation family),
    2. verdict: admitted iff no band hits ``{state_root}/bands`` (the
       earlier-batch owners) AND the id is the minimum among THIS
       batch's docs in each of its buckets,
    3. append (id, admitted) to ``{state_root}/verdicts``; fold the
       batch's buckets into the band state keeping min id per bucket
       (previous state pinned with localCheckpoint before the
       overwrite — the repo-wide read-own-input rule).

    Returns the StreamingQuery. Read the verdicts with
    ``spark.read.parquet(f"{state_root}/verdicts")``.
    """
    from healthcare_api_spark.operators.dedup import band_signatures

    bands_dir = f"{state_root}/bands"
    verdicts_dir = f"{state_root}/verdicts"

    def _admit(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        sig = band_signatures(
            batch_df, id_col, text_col, num_hashes, rows_per_band, shingle_n
        ).localCheckpoint(eager=True)
        try:
            prev = spark.read.parquet(bands_dir).localCheckpoint(eager=True)
        except Exception as e:  # first batch: no state yet
            if "PATH_NOT_FOUND" not in str(e) and "Path does not exist" not in str(e):
                raise
            prev = None
        batch_min = sig.groupBy("band", "bucket").agg(
            F.min(id_col).alias("_bmin")
        )
        hits = sig.join(batch_min, ["band", "bucket"]).withColumn(
            "_lose_batch", F.col(id_col) > F.col("_bmin")
        )
        if prev is not None:
            hits = hits.join(
                prev.select("band", "bucket", F.lit(True).alias("_seen")),
                ["band", "bucket"],
                "left",
            ).withColumn(
                "_lose", F.col("_lose_batch") | F.col("_seen").isNotNull()
            )
        else:
            hits = hits.withColumn("_lose", F.col("_lose_batch"))
        verdicts = hits.groupBy(id_col).agg(
            (~F.max(F.col("_lose"))).cast("int").alias("admitted")
        )
        verdicts.write.mode("append").parquet(verdicts_dir)
        new_state = batch_min.select(
            "band", "bucket", F.col("_bmin").alias("owner_id")
        )
        if prev is not None:
            new_state = (
                prev.unionByName(new_state)
                .groupBy("band", "bucket")
                .agg(F.min("owner_id").alias("owner_id"))
            )
        new_state.write.mode("overwrite").parquet(bands_dir)

    writer = stream_df.writeStream.foreachBatch(_admit).outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
