"""Replicated-volume legs for the r9-wave shapes VERDICT r9 #2 still
wanted measured: g9 HITS (whole-graph bounded-round iteration — NOT
frontier-local, so ×rep volume means ×rep per-round work), m19 patch
voting (codec + vote-join volume), st12 streaming CEP (2 real
micro-batches of state churn at ×rep key count), s15 versioned-store
lifecycle (import→upsert→delete→3 snapshot reads at ×rep rows), and
x23/x24 per-series recursions (series count ×rep, the applyInPandas
parallelism-unit contract).

Protocol identical to scale_sweep_r9/r9b/r9c: pre-split parquet
replicas, noop sink, median of 3 steady passes after one warm pass
(st12/s15 are lifecycle measurements — cold state dirs per pass, the
run IS the work).

Replication shapes: g9 rides the disjoint-copies edge replication
(id-shifted copies — HITS normalizes per copy identically, rounds
fixed); m19 replicates doc ids (patch volume linear; planted crops
replicate with their source); st12 shifts user ids (pending/done
state rows ×rep); s15 shifts customer ids (every bucket grows ×rep);
x23/x24 suffix event_type (series ×rep at constant length).

Run: python tools/scale_sweep_r10.py [reps="1,25,100"]
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from healthcare_api_spark import get_spark
from healthcare_api_spark.operators import graph, temporal

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


def knn_edges(spark):
    c = entrymod._t(spark, SF_DIR, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    r = c.select(
        "c_nationkey", "c_custkey", F.row_number().over(w).alias("rn")
    )
    probes = r.select(
        "c_nationkey", F.col("c_custkey").alias("s"),
        F.explode(
            F.array(F.col("rn") + 1, F.col("rn") + 2, F.col("rn") + 3)
        ).alias("rnb"),
    )
    return probes.join(
        r.select(
            "c_nationkey", F.col("c_custkey").alias("d"),
            F.col("rn").alias("rnb"),
        ),
        ["c_nationkey", "rnb"],
    ).select("s", "d")


def replicate_edges(spark, root: str, rep: int) -> str:
    edges = knn_edges(spark)
    out = f"{root}/edges_x{rep}.parquet"
    if rep > 1:
        shift = 10_000_000
        edges = edges.withColumn(
            "r", F.explode(F.sequence(F.lit(0), F.lit(rep - 1)))
        ).select(
            (F.col("s") + F.col("r") * shift).alias("s"),
            (F.col("d") + F.col("r") * shift).alias("d"),
        )
    edges.repartition(16).write.mode("overwrite").parquet(out)
    return out


def replicate_doc_ids(spark, root: str, rep: int) -> str:
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    out = f"{root}/docids_x{rep}.parquet"
    if rep > 1:
        docs = docs.withColumn(
            "r", F.explode(F.sequence(F.lit(0), F.lit(rep - 1)))
        ).select((F.col("doc_id") * rep + F.col("r")).alias("doc_id"))
    docs.repartition(32).write.mode("overwrite").parquet(out)
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


def replicate_customers(spark, root: str, rep: int) -> str:
    c = entrymod._t(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("id"),
        F.lit(1).alias("version"),
        F.col("c_acctbal").alias("acctbal"),
    )
    out = f"{root}/cust_x{rep}.parquet"
    if rep > 1:
        shift = 10_000_000
        c = c.withColumn(
            "r", F.explode(F.sequence(F.lit(0), F.lit(rep - 1)))
        ).select(
            (F.col("id") + F.col("r") * shift).alias("id"),
            "version", "acctbal",
        )
    c.repartition(32).write.mode("overwrite").parquet(out)
    return out


def replicate_series(spark, rep: int):
    ev = entrymod._t(spark, SF_DIR, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(F.round(F.sum("value"), 6).alias("v"))
    if rep > 1:
        hourly = hourly.withColumn(
            "r", F.explode(F.sequence(F.lit(0), F.lit(rep - 1)))
        ).select(
            F.concat_ws(
                "_", "event_type", F.col("r").cast("string")
            ).alias("event_type"),
            "bucket",
            "v",
        )
    return hourly


def run_st12(spark, ev_path: str, root: str) -> None:
    from healthcare_api_spark.streaming.cep import (
        read_sequence_matches,
        streaming_sequence_match,
    )

    run_root = tempfile.mkdtemp(dir=root, prefix="st12_")
    src, state, ckpt = (
        f"{run_root}/src", f"{run_root}/state", f"{run_root}/ckpt"
    )
    ev = spark.read.parquet(ev_path)
    cutoff = F.col("ts") < F.lit("2024-01-16").cast("timestamp")
    try:
        ev.filter(cutoff).write.mode("append").parquet(src)
        stream = spark.readStream.schema(
            "user_id long, ts timestamp, event_type string"
        ).parquet(src)
        q = streaming_sequence_match(
            stream, state, "user_id", "ts", "event_type",
            ["signup", "click", "purchase"],
            within_us=172800 * 1_000_000, checkpoint=ckpt,
        )
        q.processAllAvailable()
        ev.filter(~cutoff).write.mode("append").parquet(src)
        q.processAllAvailable()
        q.stop()
        force(read_sequence_matches(spark, state, "user_id", n_stages=3))
    finally:
        shutil.rmtree(run_root, ignore_errors=True)


def run_s15(spark, cust_path: str, root: str) -> None:
    from healthcare_api_spark.sources.store import VersionedResourceStore

    run_root = tempfile.mkdtemp(dir=root, prefix="s15_")
    base = spark.read.parquet(cust_path)
    try:
        store = VersionedResourceStore(spark, f"{run_root}/v", num_buckets=8)
        store.import_resources(base, "Customer")
        store.upsert(
            base.filter(F.col("id") % 5 == 0).select(
                "id", F.lit(2).alias("version"),
                (F.col("acctbal") + 100.0).alias("acctbal"),
            ),
            "Customer",
            version_col="version",
        )
        store.delete(
            base.filter(F.col("id") % 7 == 0).select("id"), "Customer"
        )
        for v in (1, 2, 3):
            force(store.table("Customer", as_of=v))
    finally:
        shutil.rmtree(run_root, ignore_errors=True)


def main() -> None:
    reps = [
        int(x)
        for x in (sys.argv[1] if len(sys.argv) > 1 else "1,25,100").split(",")
    ]
    spark = get_spark("scale-sweep-r10")
    entrymod._tune(spark)
    root = tempfile.mkdtemp(prefix="scale_r10_")
    try:
        for rep in reps:
            edges = spark.read.parquet(replicate_edges(spark, root, rep))
            t = steady(
                lambda: force(graph.hits(edges, "s", "d", iters=5))
            )
            print(f"| g9 hits | x{rep} | {t} s |", flush=True)

            ids_path = replicate_doc_ids(spark, root, rep)
            t = steady(lambda: force(_m19_frame(spark, ids_path)))
            print(f"| m19 patch_vote | x{rep} | {t} s |", flush=True)

            ev_path = replicate_events(spark, root, rep)
            t = steady(lambda: run_st12(spark, ev_path, root))
            print(f"| st12 streaming_cep | x{rep} | {t} s |", flush=True)

            cust_path = replicate_customers(spark, root, rep)
            t = steady(lambda: run_s15(spark, cust_path, root))
            print(f"| s15 time_travel lifecycle | x{rep} | {t} s |", flush=True)

            hourly = replicate_series(spark, rep).localCheckpoint(eager=True)

            def _x23():
                hw = temporal.holt_winters_add(
                    hourly, ("event_type",), "bucket", "v",
                    period=24, alpha=0.3, beta=0.2, gamma=0.25,
                ).select(
                    "event_type", "bucket", "v",
                    F.round("forecast", 6).alias("forecast"),
                )
                force(
                    temporal.forecast_eval(
                        hw, ("event_type",), "bucket", "v", "forecast",
                        naive_lag=24,
                    )
                )

            t = steady(_x23)
            print(f"| x23 forecast_mase | x{rep} | {t} s |", flush=True)

            vq = hourly.select(
                "event_type", "bucket",
                F.round(F.col("v") * 100).cast("bigint").alias("vq"),
            )
            t = steady(
                lambda: force(
                    temporal.series_features(vq, "event_type", "bucket", "vq")
                )
            )
            print(f"| x24 series_features | x{rep} | {t} s |", flush=True)

            # r10 late: the two new gates. t35 replicates documents
            # VERBATIM with shifted ids (vocabulary constant, counts
            # ×rep — corpus growth in the same language register); w15
            # rides the shifted-user events replica (conversions ×rep,
            # constant per-key history).
            docs_txt = spark.read.parquet(
                f"{SF_DIR}/documents.parquet"
            ).select("doc_id", "text", "lang")
            if rep > 1:
                docs_txt = docs_txt.withColumn(
                    "r", F.explode(F.sequence(F.lit(0), F.lit(rep - 1)))
                ).select(
                    (F.col("doc_id") * rep + F.col("r")).alias("doc_id"),
                    "text", "lang",
                )
            docs_path = f"{root}/docstxt_x{rep}.parquet"
            docs_txt.repartition(64).write.mode("overwrite").parquet(docs_path)
            dtx = spark.read.parquet(docs_path)
            from healthcare_api_spark.operators import textops as _tx

            t = steady(
                lambda: force(
                    _tx.vocab_concentration(dtx, "lang", "text", top_k=10)
                )
            )
            print(f"| t35 vocab_gini | x{rep} | {t} s |", flush=True)

            from healthcare_api_spark.operators.analytics import (
                touch_attribution,
            )

            # deterministic synthetic value column (the events replica
            # dropped it to keep replication narrow)
            ev_attr = spark.read.parquet(ev_path).withColumn(
                "value", (F.col("user_id") % 1000).cast("double") / 7.0
            )
            t = steady(
                lambda: force(
                    touch_attribution(
                        ev_attr, "user_id", "ts", "event_type",
                        "purchase", value_col="value",
                    )
                )
            )
            print(f"| w15 touch_attribution | x{rep} | {t} s |", flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _m19_frame(spark, ids_path: str):
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from healthcare_api_spark.operators.multimodal import (
        encode_png_bytes,
        image_patches,
        patch_vote_pairs,
    )

    docs = spark.read.parquet(ids_path)

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                x = np.arange(40)
                y = np.arange(32)
                v = ((np.outer(y, x) + 13 * d) % 256).astype(np.uint8)
                out_ids.append(d)
                payloads.append(encode_png_bytes(v[:, :, None]))
                if d % 4 == 0:
                    out_ids.append(d + 100_000_000)
                    payloads.append(
                        encode_png_bytes(v[8:24, 8:32][:, :, None])
                    )
            yield pd.DataFrame({"doc_id": out_ids, "data": payloads})

    pngs = docs.mapInPandas(_gen, "doc_id long, data binary")
    patches = image_patches(pngs, "doc_id", "data", patch=8)
    return patch_vote_pairs(patches, "id", "patch", min_votes=4, max_df=10)


if __name__ == "__main__":
    main()
