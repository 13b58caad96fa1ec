"""End-to-end LLM-pipeline throughput at replicated volume
(VERDICT r9 #6): run examples/llm_data_pipeline.py unmodified against
a ×rep replica of the sf0.1 corpus and record total wall, docs/sec,
and the dominant stage (the example's SPARK_PIPE_STAGE_TIMES ticks).

Replication keeps the pipeline honest at volume:

- documents: each copy r appends a per-copy token ``xcopyr`` to the
  text and shifts doc_id — copies are DISTINCT documents (exact dedup
  must NOT collapse the replica; every stage sees ×rep row volume),
  while the base corpus's planted dup/near-dup structure replicates
  inside each copy, so the dedup stages still find ×rep the work.
- embeddings: vec_id shifted, the vector ROLLED by r%dim positions —
  distinct directions per copy (no ×rep² identical-vector cliques in
  the LSH buckets), same per-copy neighborhood structure.

Run: python tools/pipeline_volume_r10.py [rep=25]
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from healthcare_api_spark import get_spark
from healthcare_api_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.1"


def build_replica(spark, root: str, rep: int) -> str:
    out = f"{root}/sf_x{rep}"
    os.makedirs(out, exist_ok=True)
    docs = load_table(spark, SF_DIR, "documents")
    if rep > 1:
        docs = docs.withColumn(
            "r", F.explode(F.sequence(F.lit(0), F.lit(rep - 1)))
        ).select(
            (F.col("doc_id") * rep + F.col("r")).alias("doc_id"),
            F.concat_ws(
                " ", "text",
                F.concat(F.lit("xcopy"), F.col("r").cast("string")),
            ).alias("text"),
            "lang", "source", "n_chars",
        )
    docs.repartition(64).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )
    emb = load_table(spark, SF_DIR, "embeddings")
    if rep > 1:
        dim = len(emb.select("embedding").first()[0])
        roll = F.col("r") % F.lit(dim)
        emb = emb.withColumn(
            "r", F.explode(F.sequence(F.lit(0), F.lit(rep - 1)))
        ).select(
            (F.col("vec_id") * rep + F.col("r")).alias("vec_id"),
            F.concat(
                F.slice(F.col("embedding"), roll + 1, F.lit(dim) - roll),
                F.slice(F.col("embedding"), F.lit(1), roll),
            ).alias("embedding"),
            "label",
        )
    emb.repartition(32).write.mode("overwrite").parquet(
        f"{out}/embeddings.parquet"
    )
    return out


def main() -> None:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    root = tempfile.mkdtemp(prefix="pipe_vol_")
    spark = get_spark("pipeline-volume-build")
    try:
        sf_rep = build_replica(spark, root, rep)
        n_docs = spark.read.parquet(f"{sf_rep}/documents.parquet").count()
        spark.stop()  # the pipeline gets its own fresh session/JVM
        env = dict(os.environ, SPARK_PIPE_STAGE_TIMES="1")
        t0 = time.perf_counter()
        proc = subprocess.run(
            [
                sys.executable,
                os.path.join(
                    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "examples", "llm_data_pipeline.py",
                ),
                sf_rep,
            ],
            env=env,
            capture_output=True,
            text=True,
        )
        wall = time.perf_counter() - t0
        sys.stdout.write(proc.stdout)
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-4000:])
            raise SystemExit(proc.returncode)
        print(f"[pipeline-volume] rep=x{rep} docs={n_docs} "
              f"wall={wall:.1f}s docs_per_sec={n_docs / wall:.0f}")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
