"""Replicated-volume legs for the r9 second-session LATE wave
(g12 weighted SSSP, m19 patch voting, u16 temperature mixture, x23
MASE, w14 CEP) — the same protocol as scale_sweep_r9b.py.

Shapes: g12 rides the disjoint-copies edge replication (sources in
copy 0 — the frontier-local adversarial case, like g10/g11). m19/u16
replicate documents verbatim ×rep with shifted ids (patch volume and
stratum counts scale linearly; m19's planted crops replicate with
their source). w14/x23 ride the events table as-is at sf0.1 plus a
×rep event replication with shifted user ids (match/series count
scales, per-key work constant).

Run: python tools/scale_sweep_r9c.py [reps="1,25,100"]
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

import __spark_entry__ as entrymod
from healthcare_api_spark import get_spark
from healthcare_api_spark.operators import analytics, curation, graph

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


def replicate_weighted_edges(spark, root: str, rep: int) -> str:
    c = entrymod._t(spark, SF_DIR, "customer")
    from pyspark.sql import Window

    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    r = c.select(
        "c_nationkey", "c_custkey",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("cents"),
        F.row_number().over(w).alias("rn"),
    )
    probes = r.select(
        "c_nationkey", F.col("c_custkey").alias("s"),
        F.col("cents").alias("cs"),
        F.explode(F.array(F.col("rn") + 1, F.col("rn") + 2, F.col("rn") + 3)).alias("rnb"),
    )
    edges = probes.join(
        r.select("c_nationkey", F.col("c_custkey").alias("d"),
                 F.col("cents").alias("cd"), F.col("rn").alias("rnb")),
        ["c_nationkey", "rnb"],
    ).select("s", "d", (F.abs(F.col("cs") - F.col("cd")) + 1).alias("w"))
    out = f"{root}/wedges_x{rep}.parquet"
    if rep > 1:
        shift = 10_000_000
        edges = edges.withColumn(
            "r", F.explode(F.sequence(F.lit(0), F.lit(rep - 1)))
        ).select(
            (F.col("s") + F.col("r") * shift).alias("s"),
            (F.col("d") + F.col("r") * shift).alias("d"),
            "w",
        )
    edges.repartition(16).write.mode("overwrite").parquet(out)
    return out


def replicate_docs(spark, root: str, rep: int) -> str:
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang"
    )
    out = f"{root}/docs_x{rep}.parquet"
    if rep > 1:
        docs = docs.withColumn(
            "r", F.explode(F.sequence(F.lit(0), F.lit(rep - 1)))
        ).select(
            (F.col("doc_id") * rep + F.col("r")).alias("doc_id"), "lang"
        )
    docs.repartition(64).write.mode("overwrite").parquet(out)
    return out


def replicate_events(spark, root: str, rep: int) -> str:
    ev = entrymod._t(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_type"
    )
    out = f"{root}/events_x{rep}.parquet"
    if rep > 1:
        shift = 10_000_000
        ev = ev.withColumn(
            "r", F.explode(F.sequence(F.lit(0), F.lit(rep - 1)))
        ).select(
            (F.col("user_id") + F.col("r") * shift).alias("user_id"),
            "ts", "event_type",
        )
    ev.repartition(64).write.mode("overwrite").parquet(out)
    return out


def main() -> None:
    reps = [
        int(x)
        for x in (sys.argv[1] if len(sys.argv) > 1 else "1,25,100").split(",")
    ]
    spark = get_spark("scale-sweep-r9c")
    entrymod._tune(spark)
    root = tempfile.mkdtemp(prefix="scale_r9c_")
    try:
        for rep in reps:
            wedges = spark.read.parquet(replicate_weighted_edges(spark, root, rep))
            docs = spark.read.parquet(replicate_docs(spark, root, rep))
            ev = spark.read.parquet(replicate_events(spark, root, rep))

            t = steady(
                lambda: force(
                    graph.sssp_weighted(
                        wedges, "s", "d", "w", sources=[1, 2, 3], rounds=8
                    )
                )
            )
            print(f"| g12 sssp_weighted | x{rep} | {t} s |", flush=True)

            t = steady(
                lambda: force(
                    curation.stratified_sample(
                        docs, "doc_id", "lang",
                        curation.temperature_mixture_rates(
                            docs, "lang", total=800 * rep, alpha_quarters=3
                        ),
                        salt="temp",
                    )
                )
            )
            print(f"| u16 temperature_mixture | x{rep} | {t} s |", flush=True)

            t = steady(
                lambda: force(
                    analytics.sequence_spans(
                        ev, "user_id", "ts", "event_type",
                        ["signup", "click", "purchase"], within="48 hours",
                    )
                )
            )
            print(f"| w14 sequence_spans | x{rep} | {t} s |", flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
