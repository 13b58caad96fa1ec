"""SparkSession factory with scale-oriented defaults.

The reference executes single-threaded Python (transform.py:154-169); this
engine targets a multi-executor cluster. The configs below are the ones
that matter at 100 TB and are harmless at test scale:

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic broadcast conversion (SURVEY.md §4).
- nested schema pruning: FHIR structs are wide; reading only the touched
  nested fields is the columnar win (SURVEY.md §4 "column pruning").
- Arrow: vectorized transfer for the few pandas_udf paths (uuid5,
  validation, multimodal decode).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "healthcare-api-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` so tests and bench
    use every core; on a real cluster callers pass their own master/deploy
    config and only the SQL confs below carry over.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        # permissive semantics (OOB array index → null, lenient casts) to
        # match the reference's dict-access behavior and SQL oracles
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # r13 (guide §2.1), measured and kept at Spark's defaults with
        # env overrides. parallelismFirst=false + a bytes-based
        # advisory size was measured this round (VERDICT r12 #5): it
        # moved the inverse-scaling group's 8c/32c ratios toward 1
        # (m12 0.40→0.92, v16 0.48→1.00) and cut the join/agg-shuffle
        # gates, but it coalesces the explode-heavy class — small
        # shuffle BYTES, large downstream CPU (a14 +96%, d18 +86%,
        # u12 +66%, t33 +48%, d4 +51% medians at sf0.1) — because one
        # global bytes knob cannot see post-shuffle compute density.
        # parallelismFirst=true already coalesces sub-minPartitionSize
        # shuffles data-driven-ly while preserving parallelism above
        # it, so the DEFAULT stays Spark's; deployments whose mix is
        # scan/join-dominated can flip the env knobs (advisory toward
        # the guide-§9 256m class). Full evidence: OPTIMIZATION_r13.md
        # §2 and artifacts/r13/time_aqe_* / time_iso18_* pairs.
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            os.environ.get("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "true"),
        )
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get(
                "SPARK_GRAFT_ADVISORY_PARTITION_BYTES",
                str(64 * 1024 * 1024),
            ),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # zstd: ~30% smaller at-rest than snappy at similar scan speed —
        # at 100 TB the difference is real storage/IO money
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # whole-stage-codegen compiled-class cache (static conf, default
        # 100): a workload cycling through >100 distinct plan fragments
        # (this suite: 45 headline queries/pass) evicts and re-Janinos
        # every fragment every pass — measured +0.04..0.3 s per query,
        # +2.5 s on the 18-query comparable subtotal. Same math applies
        # per-executor on a cluster running a varied query mix.
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.warehouse.dir", os.environ.get("SPARK_WAREHOUSE", "/tmp/spark-warehouse"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
