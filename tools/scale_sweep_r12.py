"""r12 volume legs (VERDICT r11 #1/#4/#8 follow-through):

1. w21 markov_attribution under replicated volume — the corpus window
   pass parallelizes across users; the value iteration runs at
   |states|²×|scenarios| size regardless of corpus, so the wall should
   track the w17/w18 window-pass shape.
2. st15/st16 watermarked-lifecycle legs — the 2-micro-batch runs ARE
   the work (cold state dirs per pass, the st5/st12 protocol); the
   lateness walk adds drop classification + seed merge to the st14
   machinery, so the expectation is the same fixed-plan-dominated
   shape.

Events replicate by user-id shift (conversions ×rep at constant
per-key history, the w15 convention). Protocol: pre-split parquet
replicas, noop sink, median of 3 steady passes after one warm pass
for batch ops; lifecycle gates time the run itself.

Run: python tools/scale_sweep_r12.py [reps="1,25,100"]
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


def r12_gate_volume(
    spark, reps: list[int], gates: set[str] | None = None
) -> None:
    import __spark_entry__ as entrymod
    from healthcare_api_spark.operators.analytics import markov_attribution

    print("## r12 gate volume legs (events ×rep by user shift)", flush=True)
    print("| gate | x | wall s |", flush=True)
    root = tempfile.mkdtemp(prefix="r12_vol_")
    try:
        for rep in reps:
            ev = entrymod._t(spark, SF_DIR, "events").select(
                "event_id", "user_id", "ts", "event_type"
            )
            if rep > 1:
                shift = 10_000_000
                ev = ev.withColumn(
                    "r", F.explode(F.sequence(F.lit(0), F.lit(rep - 1)))
                ).select(
                    (F.col("event_id") + F.col("r")).alias("event_id"),
                    (F.col("user_id") + F.col("r") * shift).alias(
                        "user_id"
                    ),
                    "ts", "event_type",
                )
            path = f"{root}/ev_x{rep}.parquet"
            ev.repartition(64).write.mode("overwrite").parquet(path)
            evr = spark.read.parquet(path)

            if gates is None or "w21" in gates:
                t = steady(
                    lambda: force(
                        markov_attribution(
                            evr, "user_id", "ts", "event_type",
                            "purchase", iters=8,
                        )
                    )
                )
                print(f"| w21 markov | x{rep} | {t} s |", flush=True)

            # st15 / st16: 2-batch watermarked lifecycles (the run IS
            # the work — cold state dirs per pass)
            from healthcare_api_spark.streaming.flows_wm import (
                flows_wm_batch,
            )
            from healthcare_api_spark.streaming.multitouch_wm import (
                multitouch_wm_batch,
            )

            on_time = F.col("event_id") % 3 != 0
            b0 = evr.filter(on_time).drop("event_id")
            b1 = evr.filter(~on_time).drop("event_id")
            late_us = 15 * 86_400_000_000

            def _st15():
                r2 = tempfile.mkdtemp(prefix="r12st15_")
                try:
                    a = (
                        r2, "user_id", "ts", "event_type", "purchase",
                        3_600_000_000, late_us,
                    )
                    multitouch_wm_batch(b0, 0, *a)
                    multitouch_wm_batch(b1, 1, *a)
                finally:
                    shutil.rmtree(r2, ignore_errors=True)

            def _st16():
                r2 = tempfile.mkdtemp(prefix="r12st16_")
                try:
                    a = (r2, "user_id", "ts", "event_type", 30, late_us)
                    flows_wm_batch(b0, 0, *a)
                    flows_wm_batch(b1, 1, *a)
                finally:
                    shutil.rmtree(r2, ignore_errors=True)

            from healthcare_api_spark.streaming.attribution_wm import (
                touch_wm_batch,
            )

            def _st18():
                r2 = tempfile.mkdtemp(prefix="r12st18_")
                try:
                    a = (
                        r2, "user_id", "ts", "event_type", "purchase",
                        late_us,
                    )
                    touch_wm_batch(b0, 0, *a)
                    touch_wm_batch(b1, 1, *a)
                finally:
                    shutil.rmtree(r2, ignore_errors=True)

            for key, name, fn in (("st15", "st15 lifecycle", _st15),
                                  ("st16", "st16 lifecycle", _st16),
                                  ("st18", "st18 lifecycle", _st18)):
                if gates is not None and key not in gates:
                    continue
                t = steady(fn)
                print(f"| {name} | x{rep} | {t} s |", flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    reps = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "1,25,100").split(",")]
    gates = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    spark = get_spark("scale-sweep-r12")
    r12_gate_volume(spark, reps, gates)


if __name__ == "__main__":
    main()
