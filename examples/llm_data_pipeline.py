"""Training-data preparation pipeline on the engine's LLM operators.

The north-star use case (BASELINE.json): take a raw document corpus +
embeddings and produce a cleaned, deduplicated, quality-filtered corpus
with stats — every stage a distributed operator from this package:

  1. language-ID + quality scoring (textops)
  2. quality gate (declarative filter)
  3. exact dedup (normalized-content fingerprints)
  4. near-dup clustering (minhash bands → connected components),
     keep cluster representatives
  5. embedding near-dup sweep within LSH buckets (similarity)
  6. token accounting for the surviving corpus
  7. write the cleaned corpus partitioned by language

Run: python examples/llm_data_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from healthcare_api_spark import get_spark
from healthcare_api_spark.operators import dedup, similarity, textops
from healthcare_api_spark.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = tempfile.mkdtemp(prefix="llm_corpus_")
    spark = get_spark("llm-pipeline")

    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. annotate: language + quality + tokens (all narrow, one pass each)
    lang = textops.lang_id(docs, "doc_id", "text")
    qual = textops.quality_score(docs, "doc_id", "text")
    annotated = (
        docs.join(lang, "doc_id").join(qual.select("doc_id", "score"), "doc_id")
    )

    # 2. quality gate
    gated = annotated.filter(F.col("score") >= 0.5)
    n_gated = gated.count()

    # 3. exact dedup on normalized content (persisted: feeds candidate
    # generation, clustering, and the final corpus join)
    exact = dedup.exact_dedup_by_content(gated, "doc_id", "text")
    exact_survivors = exact.filter(F.col("doc_id") == F.col("canonical_id")).persist()

    # 4. near-dup clusters: minhash band candidates → components → reps
    pairs = dedup.lsh_candidate_pairs(
        exact_survivors, "doc_id", "text", num_hashes=8, rows_per_band=2
    )
    clusters = dedup.cluster_pairs(
        pairs, exact_survivors.select("doc_id").withColumnRenamed("doc_id", "id"),
        "id", max_iter=8,
    )
    reps = clusters.filter(F.col("id") == F.col("cluster_id")).select(
        F.col("id").alias("doc_id")
    )
    # persisted: four downstream actions (count, token stats, the
    # partitioned write, the per-language report) would otherwise re-run
    # the whole annotate→gate→dedup→cluster lineage each
    corpus = exact_survivors.join(reps, "doc_id").persist()
    n_corpus = corpus.count()

    # 5. embedding near-dup audit (separate modality, LSH-bucketed)
    emb = load_table(spark, sf_dir, "embeddings")
    bucketed = similarity.hyperplane_buckets(emb, "embedding", dim=64, n_planes=8)
    emb_pairs = dedup.embedding_neardup_pairs(
        bucketed, "vec_id", "embedding", "bucket", threshold=0.95
    )
    n_emb_dups = emb_pairs.count()

    # 6. token accounting on the survivors
    tokens = textops.token_counts(corpus, "doc_id", "text")
    stats = tokens.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        F.sum("n_subwords").alias("subwords"),
    ).collect()[0]

    # 7. write partitioned by language (layout for downstream sampling)
    corpus.select("doc_id", "text", "pred_lang", "score").write.mode("overwrite").partitionBy(
        "pred_lang"
    ).parquet(out_dir)

    langs = {r["pred_lang"]: r["cnt"] for r in corpus.groupBy("pred_lang").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    print(f"input docs:            {n0}")
    print(f"after quality gate:    {n_gated}")
    print(f"after exact+near dedup:{n_corpus}")
    print(f"embedding near-dups:   {n_emb_dups}")
    print(f"corpus tokens:         {stats['tokens']} ({stats['subwords']} subwords)")
    print(f"by language:           {langs}")
    print(f"written to:            {out_dir}")


if __name__ == "__main__":
    main()
