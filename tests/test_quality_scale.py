"""observe()-based DQ gates, bucketed co-located joins, salted joins,
stateful streaming dedup."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from healthcare_api_spark.operators.relational import salted_join
from healthcare_api_spark.quality import observe_assay_documents, observed
from healthcare_api_spark.sources.store import import_bucketed
from healthcare_api_spark.streaming.stateful import streaming_dedup


def test_observe_metrics_one_pass(spark):
    df = spark.createDataFrame(
        [("d1", "Patient/p1"), ("d2", "Group/g1"), ("d3", "Specimen/s1")],
        ["id", "ref"],
    ).select("id", F.struct(F.col("ref").alias("reference")).alias("subject"))
    out, obs = observe_assay_documents(df)
    out.write.format("noop").mode("overwrite").save()
    m = obs.get
    assert m["n_docs"] == 3 and m["n_non_patient_subject"] == 2 and m["n_specimen_subject"] == 1


def test_observed_generic(spark):
    df = spark.range(10)
    out, obs = observed(df, "r", {"total": F.count(F.lit(1)), "mx": F.max("id")})
    out.write.format("noop").mode("overwrite").save()
    assert obs.get == {"total": 10, "mx": 9}


def test_bucketed_join_has_no_exchange(spark):
    a = spark.range(0, 1000).withColumn("v", F.col("id") * 2)
    b = spark.range(0, 1000).withColumn("w", F.col("id") * 3)
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t in ("bkt_a", "bkt_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)  # stale loc from prior sessions
    import_bucketed(a, "bkt_a", "id", num_buckets=8, sort_col="id")
    import_bucketed(b, "bkt_b", "id", num_buckets=8, sort_col="id")
    # force the large-large join shape: at test size the planner would
    # broadcast (and rightly skip bucketed reads); at 100 TB neither side
    # broadcasts and bucketing is what removes the exchange
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bkt_a").join(spark.table("bkt_b"), "id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle on either side
        assert "Bucketed: true" in plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_salted_join_matches_plain_join(spark):
    # skewed: 90% of rows share one key
    skewed = spark.createDataFrame(
        [(1, f"r{i}") for i in range(90)] + [(i, f"x{i}") for i in range(2, 12)],
        ["k", "payload"],
    )
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(1, 12)], ["dk", "dval"])
    plain = skewed.join(dim, skewed["k"] == dim["dk"]).select("k", "payload", "dval")
    salted = salted_join(skewed, dim, "k", "dk", salt=8).select("k", "payload", "dval")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_streaming_dedup_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "b1.json").write_text(
        "\n".join(json.dumps({"k": k}) for k in ["a", "b", "a"]) + "\n"
    )
    stream = spark.readStream.schema("k string").json(str(src))
    out = streaming_dedup(stream, "k")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        first = {r["key"]: r["n_first_batch"] for r in spark.table("dedup_out").collect()}
        assert first == {"a": 2, "b": 1}
        # second batch: duplicate key suppressed, new key emitted
        (src / "b2.json").write_text(
            "\n".join(json.dumps({"k": k}) for k in ["a", "c"]) + "\n"
        )
        q.processAllAvailable()
        rows = {r["key"]: r["n_first_batch"] for r in spark.table("dedup_out").collect()}
        assert rows == {"a": 2, "b": 1, "c": 1}  # 'a' not re-emitted
    finally:
        q.stop()
