"""r13 scaling legs (VERDICT r12 #5/#6): demonstrate that the r12/r13
exchange eliminations buy PARALLELISM, not just plan aesthetics.

At sf0.1 every 8-core/32-core ratio sits near 1 — fixed job/scheduler
latency dominates ~600k-row inputs, so the shuffle work the removed
exchanges used to do is invisible. There is no sf1 test dataset, so
this tool builds compute-bound volume the way scale_sweep_r12 did:
replicate the operator's own substrate by id-shift (disjoint copies —
component structure, degree distributions and per-key history are
preserved) and time the OPERATOR at that volume under the current core
count ($SPARK_GRAFT_CPUS, the bench contract).

Legs:
- cc:        connected_components (g5/u13/u10 substrate, r12 window-min
             + r13 dedup-layout fusion), 8 rounds.
- pagerank:  pagerank (g1/g7, r12 one-time edge layout), 5 iterations.
- multitouch: the st14 2-micro-batch lifecycle (r12 window rewrite +
             r13 append-protocol commits) over replicated events.

Run twice and compare:
    SPARK_GRAFT_CPUS=32 python tools/scale_sweep_r13.py 20
    SPARK_GRAFT_CPUS=8  python tools/scale_sweep_r13.py 20
Protocol: one warm pass then median of 2 steady passes, noop sink
(lifecycle legs time the 2-batch run itself against cold state dirs).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from healthcare_api_spark import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_STEADY = 2


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    legs_sel = set((sys.argv[2].split(",")) if len(sys.argv) > 2 else ["cc", "pagerank", "st14"])
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("scale-sweep-r13")
    import __spark_entry__ as entrymod
    from healthcare_api_spark.operators import graph

    entrymod._tune(spark)
    out: dict[str, list[float]] = {}

    def leg(name, fn):
        runs = []
        for i in range(1 + N_STEADY):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn()
            runs.append(round(time.perf_counter() - t0, 2))
        out[name] = runs

    # --- cc / pagerank over replicated edge substrates ----------------
    knn = entrymod._knn_customer_edges(spark, SF_DIR)
    shift = (
        F.greatest(F.col("s"), F.col("d")) + F.lit(1)
    )  # per-replica id offset > max id: copies are disjoint
    maxid = knn.agg(F.max(F.greatest(F.col("s"), F.col("d")))).collect()[0][0]
    reps = spark.range(rep).select(F.col("id").alias("_r"))
    edges_cc = (
        knn.crossJoin(reps)
        .select(
            (F.col("s") + F.col("_r") * (maxid + 1)).alias("s"),
            (F.col("d") + F.col("_r") * (maxid + 1)).alias("d"),
        )
        .repartition(int(cpus) * 4)
        .localCheckpoint(eager=True)
    )
    n_cc = edges_cc.count()
    if "cc" in legs_sel:
        leg("cc", lambda: force(
            graph.connected_components(edges_cc, "s", "d", iters=8)
        ))

    li = entrymod._t(spark, SF_DIR, "lineitem").select(
        F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst")
    )
    pmax = li.agg(F.max("src")).collect()[0][0]
    smax = li.agg(F.max("dst")).collect()[0][0]
    prep = max(1, rep // 4)  # lineitem is already 600k rows at sf0.1
    reps2 = spark.range(prep).select(F.col("id").alias("_r"))
    edges_pr = (
        li.crossJoin(reps2)
        .select(
            (F.col("src") + F.col("_r") * (pmax + 1)).alias("src"),
            (F.col("dst") + F.col("_r") * (smax + 1)).alias("dst"),
        )
        .repartition(int(cpus) * 4)
        .localCheckpoint(eager=True)
    )
    n_pr = edges_pr.count()
    if "pagerank" in legs_sel:
        leg("pagerank", lambda: force(
            graph.pagerank(edges_pr, "src", "dst", iters=5, damping=0.85)
        ))

    # --- st14 lifecycle over replicated events -------------------------
    from healthcare_api_spark.streaming.multitouch import multitouch_batch

    ev = entrymod._t(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_type"
    )
    umax = ev.agg(F.max("user_id")).collect()[0][0]
    erep = max(1, rep // 4)
    reps3 = spark.range(erep).select(F.col("id").alias("_r"))
    ev_rep = (
        ev.crossJoin(reps3)
        .select(
            (F.col("user_id") + F.col("_r") * (umax + 1)).alias("user_id"),
            "ts",
            "event_type",
        )
        .repartition(int(cpus) * 4)
        .localCheckpoint(eager=True)
    )
    n_ev = ev_rep.count()
    cutoff = F.col("ts") < F.lit("2024-01-16").cast("timestamp")
    b0 = ev_rep.filter(cutoff)
    b1 = ev_rep.filter(~cutoff)
    h_us = 3_600_000_000

    def mt_run():
        root = tempfile.mkdtemp(prefix="sw13_mt_")
        try:
            args = (root, "user_id", "ts", "event_type", "purchase", h_us)
            multitouch_batch(b0, 0, *args)
            multitouch_batch(b1, 1, *args)
            from healthcare_api_spark.streaming.multitouch import (
                read_multitouch,
            )

            force(read_multitouch(spark, root))
        finally:
            shutil.rmtree(root, ignore_errors=True)

    if "st14" in legs_sel:
        leg("st14_multitouch_2batch", mt_run)

    print(json.dumps({
        "cpus": cpus, "rep": rep, "sf_dir": SF_DIR,
        "rows": {"cc_edges": n_cc, "pr_edges": n_pr, "events": n_ev},
        "legs": out,
    }))


if __name__ == "__main__":
    main()
