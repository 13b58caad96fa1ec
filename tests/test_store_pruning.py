"""The store's type-partitioned layout must actually prune: a one-type
query reads one partition directory, never the whole store."""

from __future__ import annotations

from pyspark.sql import functions as F

from healthcare_api_spark.sources.store import ResourceStore


def test_type_scan_reads_single_partition(spark, tmp_path):
    store = ResourceStore(spark, str(tmp_path / "store"))
    store.import_resources(
        spark.createDataFrame([(f"p{i}",) for i in range(100)], ["id"]), "Patient"
    )
    store.import_resources(
        spark.createDataFrame([(f"o{i}",) for i in range(1000)], ["id"]), "Observation"
    )
    df = store.table("Patient")
    files = df.inputFiles()
    assert files and all("resourceType=Patient" in f for f in files)
    assert not any("resourceType=Observation" in f for f in files)
    assert df.count() == 100


def test_whole_store_scan_with_partition_filter(spark, tmp_path):
    """Reading the store root partitioned-by-resourceType also prunes via
    a partition filter — the Hive-style layout is readable as one table."""
    store = ResourceStore(spark, str(tmp_path / "store"))
    store.import_resources(spark.createDataFrame([("p1",)], ["id"]), "Patient")
    store.import_resources(spark.createDataFrame([("o1",), ("o2",)], ["id"]), "Observation")
    whole = spark.read.option("basePath", store.root).parquet(
        f"{store.root}/resourceType=*"
    )
    pruned = whole.filter(F.col("resourceType") == "Patient")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "resourceType" in plan.split("PartitionFilters")[1][:120]
    assert pruned.count() == 1
    counts = {r["resourceType"]: r["cnt"] for r in
              whole.groupBy("resourceType").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert counts == {"Patient": 1, "Observation": 2}
