"""r11 volume legs (VERDICT r10 #4/#8):

1. t35 vocab_concentration under a GROWING vocabulary — the r10 table's
   flat ×100 row was verbatim replication (fixed vocab: map-side combine
   collapses the token stream and the rank step re-sorts the same
   vocabulary). The real 100 TB risk is Heaps'-law growth, so this leg
   suffixes EVERY token per replica: ×rep tokens AND ×rep vocabulary —
   the rank step's input grows linearly. Both rank modes measured so the
   auto-mode's range choice is justified by data, not vibes.

2. st* state-commit micro-audit: files and bytes written per micro-batch
   commit across the versioned-store streaming gates (st5 neardup,
   st12 CEP) — confirms the per-batch tombstone write added by the r10
   CEP fix did not introduce O(buckets) write amplification.

Protocol: pre-split parquet replicas, noop sink, median of 3 steady
passes after one warm pass (lifecycle gates measure the run itself).

Run: python tools/scale_sweep_r11.py [reps="1,25,100"]
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from healthcare_api_spark import get_spark
from healthcare_api_spark.operators import textops

SF_DIR = "/root/testdata/sf0.1"
N_STEADY = 3


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def steady(fn) -> float:
    fn()
    ts = []
    for _ in range(N_STEADY):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return round(statistics.median(ts), 2)


def t35_growing_vocab(spark, reps: list[int]) -> None:
    print("## t35 vocab_concentration, GROWING vocabulary (r11)", flush=True)
    print("| leg | x | vocab rows | window s | range s |", flush=True)
    root = tempfile.mkdtemp(prefix="r11_t35_")
    try:
        base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "text", "lang"
        )
        for rep in reps:
            if rep == 1:
                grown = base
            else:
                # suffix every token per replica: vocabulary ×rep, token
                # count ×rep — Heaps'-law growth, worst case (no replica
                # shares any term with another)
                grown = base.withColumn(
                    "r", F.explode(F.sequence(F.lit(0), F.lit(rep - 1)))
                ).select(
                    (F.col("doc_id") * rep + F.col("r")).alias("doc_id"),
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda t: F.concat(t, F.lit("_"), F.col("r")),
                        ),
                        " ",
                    ).alias("text"),
                    "lang",
                )
            path = f"{root}/docs_x{rep}.parquet"
            grown.repartition(64).write.mode("overwrite").parquet(path)
            dtx = spark.read.parquet(path)
            # vocab size for the record (distinct (lang, token))
            vocab = (
                dtx.select(
                    F.col("lang"),
                    F.explode(F.split(F.lower("text"), " ")).alias("t"),
                )
                .filter(F.col("t") != "")
                .select("lang", "t")
                .distinct()
                .count()
            )
            tw = steady(
                lambda: force(
                    textops.vocab_concentration(
                        dtx, "lang", "text", top_k=10, rank_mode="window"
                    )
                )
            )
            tr = steady(
                lambda: force(
                    textops.vocab_concentration(
                        dtx, "lang", "text", top_k=10, rank_mode="range"
                    )
                )
            )
            print(
                f"| t35 grow-vocab | x{rep} | {vocab} | {tw} s | {tr} s |",
                flush=True,
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def t35_hapax_vocab(spark, reps: list[int]) -> None:
    """The rank-step stress the suffix leg can't produce: the sf0.1
    corpus's vocabulary is only 155 terms, so even ×100 suffixing
    yields 15.5k vocab rows — trivial for either rank mode. This leg
    synthesizes hapax-heavy documents (40 UNIQUE tokens per doc,
    vocab ≈ token count) over 5 strata: at ×100 that is ~20M vocab
    rows with ~4M per stratum — the regime where the window mode
    funnels one whole stratum's vocabulary through a single task and
    the range mode's per-slice sorts win. This is the measurement
    behind rank_mode='auto' choosing 'range' at low strata counts."""
    print("## t35 vocab_concentration, HAPAX-heavy vocabulary (r11)", flush=True)
    print("| leg | x | vocab rows | window s | range s |", flush=True)
    root = tempfile.mkdtemp(prefix="r11_t35h_")
    try:
        for rep in reps:
            n_docs = 5000 * rep
            docs = (
                spark.range(n_docs)
                .select(
                    F.col("id").alias("doc_id"),
                    F.concat(F.lit("lang"), (F.col("id") % 5)).alias("lang"),
                    F.array_join(
                        F.transform(
                            F.sequence(F.lit(0), F.lit(39)),
                            lambda i: F.concat(
                                F.lit("tok"), F.col("id"), F.lit("x"), i
                            ),
                        ),
                        " ",
                    ).alias("text"),
                )
            )
            path = f"{root}/hapax_x{rep}.parquet"
            docs.repartition(64).write.mode("overwrite").parquet(path)
            dtx = spark.read.parquet(path)
            vocab = n_docs * 40  # every token unique by construction
            tw = steady(
                lambda: force(
                    textops.vocab_concentration(
                        dtx, "lang", "text", top_k=10, rank_mode="window"
                    )
                )
            )
            tr = steady(
                lambda: force(
                    textops.vocab_concentration(
                        dtx, "lang", "text", top_k=10, rank_mode="range"
                    )
                )
            )
            print(
                f"| t35 hapax-vocab | x{rep} | {vocab} | {tw} s | {tr} s |",
                flush=True,
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def r11_gate_volume(spark, reps: list[int]) -> None:
    """Replicated-volume legs for the r11 wave: w17/w18 (one corpus
    window pass + checkpointed path×type credit arithmetic), w19 (one
    user aggregate + broadcast thresholds), st13 (2 real micro-batch
    lifecycles of attribution state). Events replicate by user-id
    shift — conversions ×rep at constant per-key history, the w15
    convention — so the window pass parallelizes across users and the
    path arithmetic's small-frame claim is tested at ×rep paths."""
    import __spark_entry__ as entrymod
    from healthcare_api_spark.operators.analytics import (
        multi_touch_attribution,
        position_attribution,
        rfm_segments,
    )

    print("## r11 gate volume legs (events ×rep by user shift)", flush=True)
    print("| gate | x | wall s |", flush=True)
    root = tempfile.mkdtemp(prefix="r11_vol_")
    try:
        for rep in reps:
            ev = entrymod._t(spark, SF_DIR, "events").select(
                "user_id", "ts", "event_type", "value"
            )
            if rep > 1:
                shift = 10_000_000
                ev = ev.withColumn(
                    "r", F.explode(F.sequence(F.lit(0), F.lit(rep - 1)))
                ).select(
                    (F.col("user_id") + F.col("r") * shift).alias("user_id"),
                    "ts", "event_type",
                    # vary value per replica so cents sums differ
                    (F.col("value") + F.col("r") % 7).alias("value"),
                )
            path = f"{root}/ev_x{rep}.parquet"
            ev.repartition(64).write.mode("overwrite").parquet(path)
            evr = spark.read.parquet(path)
            legs = {
                "w17 multi_touch": lambda: force(
                    multi_touch_attribution(
                        evr, "user_id", "ts", "event_type", "purchase",
                        halflife="1 hour",
                    )
                ),
                "w18 position": lambda: force(
                    position_attribution(
                        evr, "user_id", "ts", "event_type", "purchase"
                    )
                ),
                "w19 rfm": lambda: force(
                    rfm_segments(
                        evr, "user_id", "ts", "event_type", "purchase",
                        "value",
                    )
                ),
            }
            for name, fn in legs.items():
                t = steady(fn)
                print(f"| {name} | x{rep} | {t} s |", flush=True)
            # st13: 2-batch lifecycle (the run IS the work — cold state
            # dirs per pass, st5/st12 protocol)
            from healthcare_api_spark.streaming.attribution import (
                touch_batch,
            )

            def _st13():
                r2 = tempfile.mkdtemp(prefix="r11st13_")
                try:
                    cutoff = F.col("ts") < F.lit("2024-01-16").cast(
                        "timestamp"
                    )
                    touch_batch(
                        evr.filter(cutoff), 0, f"{r2}/state", "user_id",
                        "ts", "event_type", "purchase", "value",
                    )
                    touch_batch(
                        evr.filter(~cutoff), 1, f"{r2}/state", "user_id",
                        "ts", "event_type", "purchase", "value",
                    )
                finally:
                    shutil.rmtree(r2, ignore_errors=True)

            t = steady(_st13)
            print(f"| st13 lifecycle | x{rep} | {t} s |", flush=True)

            from healthcare_api_spark.streaming.multitouch import (
                multitouch_batch,
            )

            def _st14():
                r2 = tempfile.mkdtemp(prefix="r11st14_")
                try:
                    cutoff = F.col("ts") < F.lit("2024-01-16").cast(
                        "timestamp"
                    )
                    for i, flt in enumerate((cutoff, ~cutoff)):
                        multitouch_batch(
                            evr.filter(flt), i, f"{r2}/state", "user_id",
                            "ts", "event_type", "purchase",
                            3_600_000_000,
                        )
                finally:
                    shutil.rmtree(r2, ignore_errors=True)

            t = steady(_st14)
            print(f"| st14 lifecycle | x{rep} | {t} s |", flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _dir_stats(path: str) -> tuple[int, int]:
    files = bytes_ = 0
    for dp, _dn, fns in os.walk(path):
        for fn in fns:
            if fn.startswith(("_", ".")):
                continue
            files += 1
            bytes_ += os.path.getsize(os.path.join(dp, fn))
    return files, bytes_


def st_commit_audit(spark) -> None:
    """Per-micro-batch versioned-store write profile for st5 and st12:
    run each gate's 2-batch lifecycle with a CONTROLLED state dir,
    snapshot it after every processAllAvailable(), and report the files
    + bytes each commit added. A healthy bucketed store writes only the
    TOUCHED buckets per batch (plus the tombstone markers the r10 CEP
    fix added); O(all-buckets) growth per batch would flag write
    amplification."""
    print("## st* state-commit micro-audit (files/bytes per commit)", flush=True)
    import __spark_entry__ as entrymod
    from healthcare_api_spark.streaming.cep import streaming_sequence_match
    from healthcare_api_spark.streaming.neardup import streaming_neardup

    docs = entrymod._t(spark, SF_DIR, "documents").select("doc_id", "text")
    ev = entrymod._t(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_type"
    )

    def snap(state, label, prev):
        files, byts = _dir_stats(state)
        print(
            f"| {label} | +{files - prev[0]} files | +{byts - prev[1]} bytes |"
            f" total {files} files / {byts} bytes |",
            flush=True,
        )
        return files, byts

    # --- st5: minhash near-dup, 2 batches ---
    root = tempfile.mkdtemp(prefix="r11audit_st5_")
    src, state, ckpt = f"{root}/src", f"{root}/state", f"{root}/ckpt"
    try:
        docs.write.mode("append").parquet(src)
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        q = streaming_neardup(
            stream, state, "doc_id", "text",
            num_hashes=4, rows_per_band=2, checkpoint=ckpt,
        )
        t0 = time.perf_counter()
        q.processAllAvailable()
        b1 = round(time.perf_counter() - t0, 2)
        st = snap(state, f"st5 batch1 ({b1} s)", (0, 0))
        docs.select(
            (F.col("doc_id") + 100001).alias("doc_id"), "text"
        ).write.mode("append").parquet(src)
        t0 = time.perf_counter()
        q.processAllAvailable()
        b2 = round(time.perf_counter() - t0, 2)
        snap(state, f"st5 batch2 ({b2} s)", st)
        q.stop()
    finally:
        shutil.rmtree(root, ignore_errors=True)

    # --- st12: CEP sequence match, 2 batches ---
    root = tempfile.mkdtemp(prefix="r11audit_st12_")
    src, state, ckpt = f"{root}/src", f"{root}/state", f"{root}/ckpt"
    try:
        cutoff = F.col("ts") < F.lit("2024-01-16").cast("timestamp")
        ev.filter(cutoff).write.mode("append").parquet(src)
        stream = spark.readStream.schema(
            "user_id long, ts timestamp, event_type string"
        ).parquet(src)
        q = streaming_sequence_match(
            stream, state, "user_id", "ts", "event_type",
            ["signup", "click", "purchase"],
            within_us=172800 * 1_000_000, checkpoint=ckpt,
        )
        t0 = time.perf_counter()
        q.processAllAvailable()
        b1 = round(time.perf_counter() - t0, 2)
        st = snap(state, f"st12 batch1 ({b1} s)", (0, 0))
        ev.filter(~cutoff).write.mode("append").parquet(src)
        t0 = time.perf_counter()
        q.processAllAvailable()
        b2 = round(time.perf_counter() - t0, 2)
        snap(state, f"st12 batch2 ({b2} s)", st)
        q.stop()
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    reps = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "1,25,100").split(",")]
    spark = get_spark("scale-sweep-r11")
    t35_growing_vocab(spark, reps)
    t35_hapax_vocab(spark, reps)
    r11_gate_volume(spark, reps)
    st_commit_audit(spark)


if __name__ == "__main__":
    main()
