"""Train and freeze the per-tier SemDeDup centroid artifact (r8,
VERDICT r7 #2).

The r6/r7 d14 gate froze ONE k=8 centroid set for every SF, so the
suite's slowest query demonstrated the exact Σ|cell|² blow-up its own
oversize guard warns about (sf0.01→sf0.1 = 6.2→25.3 s, superlinear by
construction at frozen k). This script re-trains with k SCALED TO n —
constant expected cell size (~31 rows) across SFs, so the in-cluster
pair join stays linear-ish in the corpus:

- tier 32:  ivf_train k=32 iters=2 on the sf0.01 dup-union (n=1000);
  also used at sf0.001 (both small SFs carry 500-row embeddings tables
  — the gate can only see corpus size, and a frozen centroid set is a
  correctness INPUT, not a fit, so sharing it is sound).
- tier 128: ivf_train k=128 iters=2 on the sf0.1 dup-union (n=4000).

Provenance matches the r6 _D14_CENTROIDS rules (deterministic lowest-id
init, Lloyd iterations, only k×dim floats to the driver). The artifact
is written as plain parquet (tier, cluster, vec double[]) so BOTH
engines consume the same doubles: the Spark gate loads it with pyarrow,
the DuckDB oracle reads it with read_parquet — no literals in source.

Run: python tools/train_d14_centroids.py  (writes artifacts/d14_centroids.parquet)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from healthcare_api_spark import get_spark
from healthcare_api_spark.operators.similarity import ivf_train
from healthcare_api_spark.tables import load_table

TIERS = [(32, "/root/testdata/sf0.01"), (128, "/root/testdata/sf0.1")]
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts",
    "d14_centroids.parquet",
)


def main() -> None:
    spark = get_spark("train-d14")
    rows = []
    for k, sf_dir in TIERS:
        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding"
        )
        dup = emb.unionByName(
            emb.select((F.col("vec_id") + 1000000).alias("vec_id"), "embedding")
        )
        cents = ivf_train(dup, "vec_id", "embedding", k=k, iters=2)
        for cid, vec in enumerate(cents):
            rows.append((k, cid, [float(x) for x in vec]))
        print(f"tier k={k}: trained {len(cents)} centroids on {sf_dir}")
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    table = pa.table(
        {
            "tier": pa.array([r[0] for r in rows], pa.int32()),
            "cluster": pa.array([r[1] for r in rows], pa.int32()),
            "vec": pa.array([r[2] for r in rows], pa.list_(pa.float64())),
        }
    )
    pq.write_table(table, OUT)
    print(f"wrote {OUT}: {table.num_rows} rows")


if __name__ == "__main__":
    main()
