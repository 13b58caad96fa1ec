"""Replicated-volume scaling sweep for the r8-wave operator shapes
(r9, VERDICT r8 task #6): extends SCALE.md's x1/x25/x100 protocol to
the pair-producing and pruned-probe operators it didn't cover —
containment join (d21), multi-needle substring search (t28), CDC
chunking (d20), and the filtered partition-pruned ANN probe (v17,
probe-time vs corpus size beyond sf0.1).

Protocol (same as the r3/r7 sweeps): sf0.1 documents / embeddings
replicated with shifted ids to x25 and x100 volume, parquet on disk,
noop sink, median of 3 steady passes per point.

One deliberate difference for the PAIR-PRODUCING operators (d21
containment, d20 chunk groups): replica text is PERTURBED by suffixing
EVERY token with the replica index. Verbatim replication makes every
text a 100-way duplicate, and a light perturbation (one changed token)
still leaves replicas ≥90%-contained in each other — either way the
TRUE pair output grows quadratically in the replication factor, which
measures the output's size, not the operator's scaling (the first
draft of this sweep perturbed one token and d21's x100 leg ran into
exactly that wall). All-token suffixing makes every replica's shingle
set disjoint, so the corpus is 100× the data with the SAME df shape as
x1 and near-linear true output — the numbers then answer "does the
plan survive 100x the data", which is the question. (The probe and
per-doc shapes replicate verbatim — duplicates don't change their
work.)

Run: python tools/scale_sweep_r9.py [reps="1,25,100"]
Prints one markdown table row per (operator, volume); paste into
SCALE.md and record in NOTES.md.
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
from healthcare_api_spark.operators import dedup, similarity, textops

SF_DIR = "/root/testdata/sf0.1"
N_STEADY = 3


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def replicate_docs(spark, root: str, rep: int, perturb: bool) -> str:
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    out = f"{root}/docs_x{rep}_{'p' if perturb else 'v'}.parquet"
    # pre-split the replicas (64 files): a 100 TB input arrives split;
    # writing one file would serialize every first narrow stage onto
    # one core (measured: t28's x100 trigram explode ran at load~1 on
    # a 32-core box for 10+ minutes before this repartition)
    if rep == 1 and not perturb:
        docs.repartition(64).write.mode("overwrite").parquet(out)
        return out
    r = docs.withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(rep - 1))))
    text = (
        # suffix EVERY token with the replica index: replicas share no
        # shingles, so pair outputs stay near-linear (see module doc)
        F.concat_ws(
            " ",
            F.transform(
                F.split(F.col("text"), r"\s+"),
                lambda w: F.concat(w, F.lit("_"), F.col("r").cast("string")),
            ),
        )
        if perturb
        else F.col("text")
    )
    (
        r.select(
            (F.col("doc_id") * rep + F.col("r")).alias("doc_id"),
            text.alias("text"),
        )
        .repartition(64)
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


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


def steady(fn) -> float:
    fn()  # warm
    ts = []
    for _ in range(N_STEADY):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return round(statistics.median(ts), 2)


def main() -> None:
    reps = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "1,25,100").split(",")]
    spark = get_spark("scale-sweep-r9")
    entrymod._tune(spark)
    root = tempfile.mkdtemp(prefix="scale_r9_")
    qvec = list(
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .head()[0]
    )
    try:
        for rep in reps:
            docs_p = spark.read.parquet(replicate_docs(spark, root, rep, True))
            docs_v = spark.read.parquet(replicate_docs(spark, root, rep, False))
            emb_path = replicate_emb(spark, root, rep)

            t = steady(
                lambda: force(
                    dedup.containment_pairs(
                        docs_p, "doc_id", "text", 9, 10, shingle_n=3
                    )
                )
            )
            print(f"| d21 containment_pairs (perturbed) | x{rep} | {t} s |")

            t = steady(
                lambda: force(
                    textops.substring_search_multi(
                        docs_v,
                        "doc_id",
                        "text",
                        ["batch stream", "spark window", "join order", "zz"],
                    )
                )
            )
            print(f"| t28 substring_search_multi | x{rep} | {t} s |")

            t = steady(
                lambda: force(
                    dedup.cdc_chunks(
                        docs_p, "doc_id", "text", window=16, mask_bits=5
                    )
                )
            )
            print(f"| d20 cdc_chunks (perturbed) | x{rep} | {t} s |")

            layout = f"{root}/ivf_x{rep}"
            similarity.write_ivf_partitioned(
                emb_path_df := spark.read.parquet(emb_path),
                layout,
                "embedding",
                entrymod._V3_CENTROIDS,
            )
            t = steady(
                lambda: force(
                    similarity.ivf_topk_pruned(
                        spark,
                        layout,
                        "vec_id",
                        "embedding",
                        entrymod._V3_CENTROIDS,
                        qvec,
                        k=10,
                        nprobe=3,
                        where=F.col("label").isin(2, 5),
                    )
                )
            )
            print(f"| v17 filtered pruned probe | x{rep} | {t} s |")
            sys.stdout.flush()
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
