"""Streaming multi-touch attribution (r11 — the w17 path models run
LIVE, on the r8 bucketed versioned state).

Unlike first/last-touch (st13: two mergeable struct extremes), the
linear and time-decay models need the conversion's WHOLE path — every
touch since the user's previous conversion. The carried state is
therefore the user's OPEN path (touches not yet closed by a
conversion), and each batch walks its rows per user in (ts, type)
order, seeded with the carried path: a conversion closes the running
path and emits its credit rows; touches extend it. Input contract (the
st7/st11 discipline): batches arrive in per-user time order — for
out-of-order feeds use streaming/multitouch_wm.py (r12), which
replaces this contract with a watermark/late-data rule.

Exactness device: per (conversion, touch-type, half-life count h) the
batch emits an integer COUNT — never a weight — so the emitted rows
are exact and bounded (h saturates at 62, the w17 clamp). The read
side reconstructs w17's arithmetic verbatim in decimal(38,0):
num = Σ cnt·2^(62−h) per type, D = Σ num per path, then the same
half-up ppm divisions — a real 2-micro-batch run hash-checks against
the w17 oracle VERBATIM.

State honesty: the open path is unbounded for a user who touches
forever without converting — exactly the batch operator's trailing-
touch set, which it also materializes (and then drops). At 100 TB the
state store's bucket partitioning spreads users; a per-user cap would
change semantics and is deliberately NOT applied.

Per micro-batch:
1. read carried open paths for the TOUCHED buckets (strictly-pre-batch
   versions — replay-safe),
2. applyInPandas per user: walk seed ∪ batch rows in (us, tp) order
   (the documented w15/w17 ROW-precedence tie rule), emitting
   (conv_us, tp, h, cnt) rows per closed path and a tp=NULL marker for
   pathless conversions,
3. OVERWRITE ``results/batch={batch_id}`` (replay-idempotent),
4. merge the new open paths (wholesale per batch user — the st12
   replace-don't-merge device for keys the batch saw).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from healthcare_api_spark.streaming.state import BucketedVersionedState


def _state_store(
    state_root: str, key_col: str, nb: int
) -> BucketedVersionedState:
    return BucketedVersionedState(
        f"{state_root}/paths", key_cols=[key_col], num_buckets=nb
    )


def multitouch_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_root: str,
    key_col: str,
    ts_col: str,
    type_col: str,
    convert_type: str,
    halflife_us: int,
    num_state_buckets: int = 16,
) -> None:
    """One micro-batch of the seeded path walk — module-level so replay
    semantics are directly testable (the admit_batch pattern)."""
    import pyspark.sql.types as T

    spark = batch_df.sparkSession
    store = _state_store(state_root, key_col, num_state_buckets)

    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = batch_df.select(
        F.col(key_col).alias("k"),
        us.alias("us"),
        F.col(type_col).alias("tp"),
    ).localCheckpoint(eager=True)

    touched = store.touched_buckets(ev.select(F.col("k").alias(key_col)))
    carry = store.read(spark, before_batch=batch_id, buckets=touched)
    key_dt = ev.schema["k"].dataType
    if carry is not None:
        seeds = ev.select("k").distinct().join(
            carry.select(F.col(key_col).alias("k"), "path"), "k", "inner"
        )
    else:
        seeds = spark.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("k", key_dt),
                    T.StructField(
                        "path",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("us", T.LongType()),
                                    T.StructField("tp", T.StringType()),
                                ]
                            )
                        ),
                    ),
                ]
            ),
        )
    union = ev.select(
        "k", "us", "tp", F.lit(None).cast(
            "array<struct<us:bigint,tp:string>>"
        ).alias("path")
    ).unionByName(
        seeds.select(
            "k",
            F.lit(None).cast("bigint").alias("us"),
            F.lit(None).cast("string").alias("tp"),
            "path",
        )
    )

    # ONE fused walk emits BOTH outputs (credit rows, kind=0, and the
    # user's final open path, kind=1) — the first cut ran two
    # applyInPandas passes over the same union and the doubled
    # shuffle + Python group overhead dominated the gate (46.9 s at
    # sf0.1, the suite's slowest; fused: one grouped Python pass per
    # batch)
    combined_schema = T.StructType(
        [
            T.StructField("k", key_dt),
            T.StructField("kind", T.IntegerType()),
            T.StructField("conv_us", T.LongType()),
            T.StructField("tp", T.StringType()),
            T.StructField("h", T.IntegerType()),
            T.StructField("cnt", T.LongType()),
            T.StructField(
                "path",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("us", T.LongType()),
                            T.StructField("tp", T.StringType()),
                        ]
                    )
                ),
            ),
        ]
    )
    h_us = int(halflife_us)
    conv = str(convert_type)

    def _walk(pdf):
        import pandas as pd

        k = pdf["k"].iloc[0]
        path = []
        for p in pdf["path"]:
            if p is not None and len(p):
                # the carried open path (at most one seed row per user)
                path = [(int(r["us"]), str(r["tp"])) for r in p]
        rows = pdf[pdf["us"].notna()].copy()
        # the nullable seed rows make `us` arrive as float64 — exact
        # only below 2^53 µs; the batch operator is exact for any
        # int64 micros, so restore int64 BEFORE sorting and the walk
        rows["us"] = rows["us"].astype("int64")
        rows = rows.sort_values(["us", "tp"], kind="mergesort")
        out = []
        for us_, tp_ in zip(rows["us"], rows["tp"]):
            us_ = int(us_)
            if tp_ == conv:
                if not path:
                    out.append((k, 0, us_, None, None, 1, None))
                else:
                    agg: dict[tuple[str, int], int] = {}
                    for tus, ttp in path:
                        h = min((us_ - tus) // h_us, 62)
                        agg[(ttp, h)] = agg.get((ttp, h), 0) + 1
                        # exact ints; 2^(62-h) reconstruction happens
                        # Spark-side in decimal(38,0)
                    for (ttp, h), c in agg.items():
                        out.append((k, 0, us_, ttp, int(h), int(c), None))
                    path = []
            else:
                path.append((us_, tp_))
        out.append(
            (k, 1, None, None, None, None,
             [{"us": u, "tp": t} for u, t in path])
        )
        return pd.DataFrame(
            out,
            columns=["k", "kind", "conv_us", "tp", "h", "cnt", "path"],
        )

    combined = (
        union.groupBy("k").applyInPandas(_walk, combined_schema)
        .localCheckpoint(eager=True)
    )
    combined.filter(F.col("kind") == 0).select(
        "k", "conv_us", "tp", "h", "cnt"
    ).write.mode("overwrite").parquet(
        f"{state_root}/results/batch={batch_id}"
    )
    new_state = combined.filter(F.col("kind") == 1).select(
        F.col("k").alias(key_col), "path"
    )

    def _merge(prev, d):
        if prev is None:
            return d
        # batch users' paths REPLACE wholesale (the walk consumed the
        # seed); untouched users persist from prior versions
        return (
            prev.join(
                d.select(F.col(key_col).alias("_dk")),
                prev[key_col] == F.col("_dk"),
                "left_anti",
            ).unionByName(d)
        )

    store.merge_batch(new_state, batch_id, _merge)


def streaming_multitouch(
    stream_df: DataFrame,
    state_root: str,
    key_col: str,
    ts_col: str,
    type_col: str,
    convert_type: str,
    halflife: str = "1 hour",
    checkpoint: str | None = None,
    num_state_buckets: int = 16,
):
    """Start the foreachBatch multi-touch maintainer; read the credit
    table any time with :func:`read_multitouch`."""
    from healthcare_api_spark.operators.temporal import _parse_duration_secs

    h_us = _parse_duration_secs(halflife) * 1_000_000

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        multitouch_batch(
            batch_df, batch_id, state_root, key_col, ts_col, type_col,
            convert_type, h_us, num_state_buckets,
        )

    writer = stream_df.writeStream.foreachBatch(_apply).outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def read_multitouch(spark: SparkSession, state_root: str) -> DataFrame:
    """Reconstruct w17's output schema from the emitted integer rows:
    (touch_type, n_touches, paths_touched, linear_credit_ppm,
    decay_credit_ppm) — byte-compatible with
    ``analytics.multi_touch_attribution`` over the same events."""
    rows = spark.read.parquet(f"{state_root}/results").drop("batch")
    d38 = "decimal(38,0)"
    tch = rows.filter(F.col("tp").isNotNull()).select(
        "k", "conv_us", "tp",
        "cnt",
        # exact 2^(62-h) numerators, reconstructed in decimal like w17
        F.expr(
            "CAST(shiftleft(CAST(1 AS BIGINT), CAST(62 - h AS INT))"
            " AS DECIMAL(19,0)) * CAST(cnt AS DECIMAL(19,0))"
        ).alias("_num"),
    )
    per_type = tch.groupBy("k", "conv_us", "tp").agg(
        F.sum("cnt").cast("bigint").alias("_cnt"),
        F.sum("_num").cast(d38).alias("_tnum"),
    )
    tot = per_type.groupBy("k", "conv_us").agg(
        F.sum("_cnt").cast("bigint").alias("_n"),
        F.sum("_tnum").cast(d38).alias("_d"),
    )
    ppm = F.lit(1_000_000).cast(d38)
    cred = per_type.join(tot, ["k", "conv_us"]).select(
        F.col("tp").alias("touch_type"),
        "_cnt",
        (
            F.col("_cnt") * F.expr("(2 * 1000000 + _n) DIV (2 * _n)")
        ).cast("bigint").alias("_lin"),
        (
            F.lit(2).cast(d38) * ppm * F.col("_tnum") + F.col("_d")
        ).alias("_dnum"),
        F.col("_d").alias("_dden"),
    ).select(
        "touch_type", "_cnt", "_lin",
        F.expr("CAST(_dnum DIV (2 * _dden) AS BIGINT)").alias("_dec"),
    )
    none = (
        rows.filter(F.col("tp").isNull())
        .agg(F.sum("cnt").cast("bigint").alias("_c"))
        .filter(F.col("_c") > 0)
        .select(
            F.lit("(none)").alias("touch_type"),
            F.lit(0).cast("bigint").alias("n_touches"),
            F.col("_c").alias("paths_touched"),
            (F.col("_c") * 1_000_000).cast("bigint").alias(
                "linear_credit_ppm"
            ),
            (F.col("_c") * 1_000_000).cast("bigint").alias(
                "decay_credit_ppm"
            ),
        )
    )
    return (
        cred.groupBy("touch_type")
        .agg(
            F.sum("_cnt").cast("bigint").alias("n_touches"),
            F.count(F.lit(1)).cast("bigint").alias("paths_touched"),
            F.sum("_lin").cast("bigint").alias("linear_credit_ppm"),
            F.sum("_dec").cast("bigint").alias("decay_credit_ppm"),
        )
        .unionByName(none)
    )
