"""Streaming session flows WITH a late-data contract (r12, VERDICT
r11 #8 — the st15 watermark device applied to the OTHER order-
sensitive state, sessionization).

st7 (streaming/flows.py) carries only each key's LAST event, which is
sufficient exactly when batches arrive in per-key time order: a late
event landing INSIDE an already-counted session would change committed
transitions the last-event state cannot see. This module makes the
watermark the boundary between MUTABLE and FROZEN state:

- per key the state retains the event SUFFIX inside the lateness
  horizon ``[hwm − lateness, hwm]`` plus ONE anchor — the newest
  frozen event — because the anchor→suffix boundary transition is
  still mutable (a late event can land between them);
- a batch row older than ``hwm − lateness`` (pre-batch hwm, the st15
  rule; observed rows advance the mark even when dropped) is dropped
  and counted ('(dropped:late)');
- accepted rows — late or not — are merged into the suffix and the
  key's transitions RECOMPUTE: the batch emits the exact ± delta
  ``T(suffix ∪ accepted) − T(suffix)`` into the mergeable counts
  store. Count merges are sums, so retraction is just a negative
  delta; transitions at or before the anchor are provably unreachable
  by accepted rows (accepted ≥ hwm − lateness > anchor) and never
  re-emitted.

Equivalence contract (the st16 gate): after any batch sequence the
matrix EQUALS ``analytics.session_flows`` over the surviving rows,
plus the audit row — the oracle restates the drop rule in SQL.

State size honesty: the suffix is bounded by each key's event VOLUME
inside one lateness window (+1), not by history — the tunable
memory/lateness trade every watermarking system makes. Replay safety
rides the versioned store exactly as st7: deltas are a pure function
of pre-batch state + batch input, and a complete version
short-circuits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from healthcare_api_spark.streaming.state import BucketedVersionedState


def _suffix_store(
    state_root: str, key_col: str, nb: int
) -> BucketedVersionedState:
    return BucketedVersionedState(
        f"{state_root}/suffix", key_cols=[key_col], num_buckets=nb
    )


def _counts_store(state_root: str, nb: int) -> BucketedVersionedState:
    return BucketedVersionedState(
        f"{state_root}/counts", key_cols=["src", "dst"], num_buckets=nb
    )


# the drop audit rides the counts store as ('(dropped)', reason) rows —
# drop totals are mergeable sums exactly like transition counts, and a
# separate store would add a third per-batch version commit for one row
_AUDIT_SRC = "(dropped)"


def _transitions(rows: list, gap_us: int) -> dict:
    """Transition multiset of one key's (us, st) rows — the
    analytics.session_flows logic (integer gap breaks in us order,
    in-session lag in (us, st) order) as plain Python over the bounded
    suffix. Keep in lockstep with the w13 oracle."""
    out: dict = {}
    prev_us = None
    prev_st = None
    for us, st in sorted(rows):
        if prev_us is not None and us - prev_us <= gap_us:
            key = (prev_st, st)
            out[key] = out.get(key, 0) + 1
        prev_us, prev_st = us, st
    return out


def flows_wm_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_root: str,
    key_col: str,
    ts_col: str,
    state_col: str,
    gap_minutes: int,
    lateness_us: int,
    num_state_buckets: int = 16,
) -> None:
    """One micro-batch of watermarked transition maintenance."""
    import pyspark.sql.types as T

    spark = batch_df.sparkSession
    suffix_store = _suffix_store(state_root, key_col, num_state_buckets)
    counts_store = _counts_store(state_root, num_state_buckets)
    gap_us = gap_minutes * 60 * 1_000_000
    late_us = int(lateness_us)

    ev = batch_df.select(
        F.col(key_col).alias("k"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
        F.col(state_col).alias("st"),
    ).localCheckpoint(eager=True)

    touched = suffix_store.touched_buckets(
        ev.select(F.col("k").alias(key_col))
    )
    carry = suffix_store.read(spark, before_batch=batch_id, buckets=touched)
    key_dt = ev.schema["k"].dataType
    suffix_t = T.ArrayType(
        T.StructType(
            [
                T.StructField("us", T.LongType()),
                T.StructField("st", T.StringType()),
            ]
        )
    )
    if carry is not None:
        seeds = ev.select("k").distinct().join(
            carry.select(F.col(key_col).alias("k"), "suffix", "hwm"),
            "k",
            "inner",
        )
    else:
        seeds = spark.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("k", key_dt),
                    T.StructField("suffix", suffix_t),
                    T.StructField("hwm", T.LongType()),
                ]
            ),
        )
    union = ev.select(
        "k", "us", "st",
        F.lit(None).cast(suffix_t).alias("suffix"),
        F.lit(None).cast("bigint").alias("hwm"),
    ).unionByName(
        seeds.select(
            "k",
            F.lit(None).cast("bigint").alias("us"),
            F.lit(None).cast("string").alias("st"),
            "suffix", "hwm",
        )
    )

    combined_schema = T.StructType(
        [
            T.StructField("k", key_dt),
            T.StructField("kind", T.IntegerType()),
            T.StructField("src", T.StringType()),
            T.StructField("dst", T.StringType()),
            T.StructField("dn", T.LongType()),
            T.StructField("suffix", suffix_t),
            T.StructField("hwm", T.LongType()),
        ]
    )

    def _walk(pdf):
        import pandas as pd

        k = pdf["k"].iloc[0]
        suffix: list = []
        hwm = None
        seed = pdf[pdf["us"].isna()]
        for _, srow in seed.iterrows():
            sfx = srow["suffix"]
            if sfx is not None and len(sfx):
                suffix = [(int(r["us"]), str(r["st"])) for r in sfx]
            if srow["hwm"] is not None and not pd.isna(srow["hwm"]):
                hwm = int(srow["hwm"])
        rows = pdf[pdf["us"].notna()].copy()
        rows["us"] = rows["us"].astype("int64")
        late_n = 0
        accepted: list = []
        for us_, st_ in zip(rows["us"], rows["st"]):
            us_ = int(us_)
            if hwm is not None and us_ < hwm - late_us:
                late_n += 1
            else:
                accepted.append((us_, st_))
        new_hwm = hwm
        if len(rows):
            bmax = int(rows["us"].max())
            new_hwm = bmax if new_hwm is None else max(new_hwm, bmax)
        t_old = _transitions(suffix, gap_us)
        merged = sorted(suffix + accepted)
        t_new = _transitions(merged, gap_us)
        out = []
        for key in set(t_old) | set(t_new):
            dn = t_new.get(key, 0) - t_old.get(key, 0)
            if dn:
                out.append((k, 0, key[0], key[1], dn, None, None))
        if late_n:
            out.append((k, 2, None, None, late_n, None, None))
        # shrink to the NEW horizon: keep everything within
        # [new_hwm - lateness, new_hwm] plus one anchor (the newest
        # frozen event) for the mutable boundary transition
        horizon = (new_hwm - late_us) if new_hwm is not None else None
        keep: list = []
        anchor = None
        for us_, st_ in merged:
            if horizon is not None and us_ < horizon:
                anchor = (us_, st_)
            else:
                keep.append((us_, st_))
        if anchor is not None:
            keep = [anchor] + keep
        out.append(
            (
                k, 1, None, None, None,
                [{"us": u, "st": s} for u, s in keep],
                new_hwm,
            )
        )
        return pd.DataFrame(
            out,
            columns=["k", "kind", "src", "dst", "dn", "suffix", "hwm"],
        )

    combined = (
        union.groupBy("k").applyInPandas(_walk, combined_schema)
        .localCheckpoint(eager=True)
    )

    delta_counts = (
        combined.filter(F.col("kind") == 0)
        .select("src", "dst", "dn")
        .unionByName(
            combined.filter(F.col("kind") == 2).select(
                F.lit(_AUDIT_SRC).alias("src"),
                F.lit("late").alias("dst"),
                F.col("dn"),
            )
        )
        .groupBy("src", "dst")
        .agg(F.sum("dn").cast("bigint").alias("n"))
    )

    def _merge_counts(prev, d):
        if prev is None:
            return d
        return (
            prev.unionByName(d)
            .groupBy("src", "dst")
            .agg(F.sum("n").cast("bigint").alias("n"))
        )

    counts_store.merge_batch(delta_counts, batch_id, _merge_counts, materialize=False)

    new_suffix = combined.filter(F.col("kind") == 1).select(
        F.col("k").alias(key_col), "suffix", "hwm"
    )

    def _merge_suffix(prev, d):
        if prev is None:
            return d
        return (
            prev.join(
                d.select(F.col(key_col).alias("_dk")),
                prev[key_col] == F.col("_dk"),
                "left_anti",
            ).unionByName(d)
        )

    suffix_store.merge_batch(new_suffix, batch_id, _merge_suffix, materialize=False)


def streaming_session_flows_wm(
    stream_df: DataFrame,
    state_root: str,
    key_col: str,
    ts_col: str,
    state_col: str,
    gap_minutes: int = 30,
    lateness: str = "1 day",
    checkpoint: str | None = None,
    num_state_buckets: int = 16,
):
    """Start the foreachBatch watermarked transition maintainer; read
    the live matrix + audit with :func:`read_session_flows_wm`."""
    from healthcare_api_spark.operators.temporal import _parse_duration_secs

    l_us = _parse_duration_secs(lateness) * 1_000_000

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        flows_wm_batch(
            batch_df, batch_id, state_root, key_col, ts_col, state_col,
            gap_minutes, l_us, num_state_buckets,
        )

    writer = stream_df.writeStream.foreachBatch(_apply).outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def read_session_flows_wm(
    spark: SparkSession, state_root: str, num_state_buckets: int = 16
) -> DataFrame:
    """Current matrix in w13's shape — (src, dst, n_transitions,
    prob), pairs whose counts cancelled to zero filtered out — plus
    one '(dropped:late)' audit row (NULL prob)."""
    from pyspark.sql import Window

    counts = _counts_store(state_root, num_state_buckets).read(spark)
    if counts is None:
        return spark.createDataFrame(
            [], "src string, dst string, n_transitions bigint, prob double"
        )
    live = counts.filter(
        (F.col("n") > 0) & (F.col("src") != F.lit(_AUDIT_SRC))
    )
    tot = Window.partitionBy("src")
    flows = live.select(
        "src",
        "dst",
        F.col("n").alias("n_transitions"),
        F.round(
            F.col("n").cast("double")
            / F.sum("n").over(tot).cast("double"),
            6,
        ).alias("prob"),
    )
    audit = counts.filter(
        (F.col("src") == F.lit(_AUDIT_SRC)) & (F.col("n") > 0)
    ).select(
        "src",
        "dst",
        F.col("n").alias("n_transitions"),
        F.lit(None).cast("double").alias("prob"),
    )
    return flows.unionByName(audit)
