"""Replicated-volume scaling sweep for the r9 second-session
operators (g10 BFS, g11 stress, v21 range join, u15 k-center,
x21 banded DTW, x22 binseg) — SCALE.md's x1/x25/x100 protocol.

Shapes and what each leg measures:

- **v21 / u15 (embedding corpus ×rep, verbatim, pre-split)**: the
  corpus-scan shapes. v21's query set stays 8 vectors; every replica
  of a near point is another true hit, so output grows ~linearly —
  the legs measure the assign/verify scans. u15's k stays 12; each
  round is one scan, so the sweep measures pure scan scaling.
- **g10 / g11 (edge set ×rep with SHIFTED node ids — disjoint graph
  copies)**: seeds/pivots live in copy 0, so the REACHED region is
  constant; what grows is the full edge frame every frontier round
  joins against. This is the honest adversarial case for BFS on a
  big graph: the frontier is tiny, the edge scan is not. (At 100 TB
  the edge frame would be hash-partitioned by u and the frontier
  join shuffles only the frontier — local[32] still scans, which is
  what the leg shows.)
- **x21 / x22 (SERIES COUNT ×rep: event_type suffixed per replica)**:
  per-series ops scale in series count, not row count alone. x21's
  all-pairs feed grows quadratically in series count BY CONTRACT
  (pairs are the input; a corpus-scale run feeds SAX-pruned
  candidates) — the leg checks time tracks PAIR count, the true
  output. x22 candidates grow linearly in series count.

Run: python tools/scale_sweep_r9b.py [reps="1,25,100"]
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
from pyspark.sql import Window

import __spark_entry__ as entrymod
from healthcare_api_spark import get_spark
from healthcare_api_spark.operators import graph, similarity, temporal

SF_DIR = "/root/testdata/sf0.1"
N_STEADY = 3


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def steady(fn) -> float:
    fn()  # warm
    ts = []
    for _ in range(N_STEADY):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return round(statistics.median(ts), 2)


def replicate_emb(spark, root: str, rep: int) -> str:
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = f"{root}/emb_x{rep}.parquet"
    if rep == 1:
        emb.repartition(16).write.mode("overwrite").parquet(out)
        return out
    (
        emb.withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(rep - 1))))
        .select(
            (F.col("vec_id") * rep + F.col("r")).alias("vec_id"),
            "embedding",
            "label",
        )
        .repartition(16)
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def replicate_edges(spark, root: str, rep: int) -> str:
    edges = entrymod._knn_customer_edges(spark, SF_DIR)
    out = f"{root}/edges_x{rep}.parquet"
    if rep == 1:
        edges.repartition(16).write.mode("overwrite").parquet(out)
        return out
    shift = 10_000_000
    (
        edges.withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(rep - 1))))
        .select(
            (F.col("s") + F.col("r") * shift).alias("s"),
            (F.col("d") + F.col("r") * shift).alias("d"),
        )
        .repartition(16)
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def replicate_series(spark, rep: int):
    """Per-type hourly vq series (the x13 construction), event_type
    replicated with a suffix: series count ×rep, 144 buckets each."""
    ev = entrymod._t(spark, SF_DIR, "events")
    cents = F.round(F.col("value").cast("double") * 100).cast("bigint")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(
        F.round(
            F.sum(cents).cast("double") * 100.0 / F.count(F.lit(1))
        ).cast("bigint").alias("vq")
    )
    if rep > 1:
        hourly = hourly.withColumn(
            "r", F.explode(F.sequence(F.lit(0), F.lit(rep - 1)))
        ).select(
            F.concat_ws("_", "event_type", F.col("r").cast("string")).alias(
                "event_type"
            ),
            "bucket",
            "vq",
        )
    idx = F.row_number().over(
        Window.partitionBy("event_type").orderBy("bucket")
    )
    return (
        hourly.select("event_type", idx.alias("i"), "vq")
        .filter(F.col("i") <= 144)
        .localCheckpoint(eager=True)
    )


def main() -> None:
    reps = [
        int(x)
        for x in (sys.argv[1] if len(sys.argv) > 1 else "1,25,100").split(",")
    ]
    spark = get_spark("scale-sweep-r9b")
    entrymod._tune(spark)
    root = tempfile.mkdtemp(prefix="scale_r9b_")
    try:
        for rep in reps:
            emb = spark.read.parquet(replicate_emb(spark, root, rep))
            edges = spark.read.parquet(replicate_edges(spark, root, rep))

            t = steady(
                lambda: force(
                    similarity.l2_range_join(
                        emb,
                        emb.orderBy(F.col("vec_id").asc()).limit(8),
                        "vec_id", "vec_id", "embedding",
                        radius=1.2, scale=1000.0, n_cells=16, iters=3,
                    )
                )
            )
            print(f"| v21 l2_range_join | x{rep} | {t} s |", flush=True)

            t = steady(
                lambda: force(
                    similarity.kcenter_coreset(
                        emb, "vec_id", "embedding", k=12, scale=1000.0
                    )
                )
            )
            print(f"| u15 kcenter_coreset | x{rep} | {t} s |", flush=True)

            t = steady(
                lambda: force(
                    graph.bfs_hops(
                        edges, "s", "d", seeds=[1, 2, 3], max_hops=6
                    )
                )
            )
            print(f"| g10 bfs_hops | x{rep} | {t} s |", flush=True)

            t = steady(
                lambda: force(
                    graph.stress_centrality(
                        edges, "s", "d", pivots=[1, 2, 3, 4], max_depth=8
                    )
                )
            )
            print(f"| g11 stress_centrality | x{rep} | {t} s |", flush=True)

        # series-count legs (smaller factors: pairs grow quadratically
        # by contract for x21)
        for rep in (1, 5, 10):
            series = replicate_series(spark, rep)
            n_series = 5 * rep
            n_pairs = n_series * (n_series - 1) // 2
            t = steady(
                lambda: force(
                    temporal.dtw_band_join(
                        series, "event_type", "i", "vq", band=24
                    )
                )
            )
            print(
                f"| x21 dtw_band ({n_series} series, {n_pairs} pairs)"
                f" | x{rep} | {t} s |",
                flush=True,
            )
            t = steady(
                lambda: force(
                    temporal.binseg_changepoints(
                        series, "event_type", "i", "vq", k=3
                    )
                )
            )
            print(
                f"| x22 binseg ({n_series} series) | x{rep} | {t} s |",
                flush=True,
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
