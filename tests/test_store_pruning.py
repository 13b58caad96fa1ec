"""The store's type-partitioned layout must actually prune: a one-type
query reads one partition directory, never the whole store. The bucketed
copy-on-write variant must additionally bound upsert IO to the touched
bucket directories."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from healthcare_api_spark.sources.store import BucketedResourceStore, ResourceStore


def _bucket_files(type_path: str) -> dict[str, set[tuple[str, int]]]:
    """{bucket_dir: {(file_name, size)}} snapshot of the physical layout."""
    out = {}
    for d in os.listdir(type_path):
        if not d.startswith("bucket="):
            continue
        full = os.path.join(type_path, d)
        out[d] = {
            (f, os.path.getsize(os.path.join(full, f)))
            for f in os.listdir(full)
            if f.endswith(".parquet")
        }
    return out


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


def test_bucketed_upsert_semantics_match_plain_store(spark, tmp_path):
    # same last-write-wins merge as ResourceStore.upsert (S8)
    store = BucketedResourceStore(spark, str(tmp_path / "bs"), num_buckets=8)
    store.import_resources(
        spark.createDataFrame([(f"p{i}", 1, f"v{i}") for i in range(50)],
                              ["id", "version", "payload"]), "Patient"
    )
    store.upsert(
        spark.createDataFrame([("p3", 2, "updated"), ("p999", 1, "created")],
                              ["id", "version", "payload"]),
        "Patient", version_col="version",
    )
    rows = {r["id"]: r for r in store.table("Patient").collect()}
    assert len(rows) == 51
    assert rows["p3"]["payload"] == "updated" and rows["p999"]["payload"] == "created"
    # stale update loses to a higher existing version
    store.upsert(
        spark.createDataFrame([("p3", 1, "stale")], ["id", "version", "payload"]),
        "Patient", version_col="version",
    )
    assert {r["payload"] for r in store.table("Patient").filter(F.col("id") == "p3").collect()} \
        == {"updated"}


def test_bucketed_upsert_touches_bounded_file_set(spark, tmp_path):
    # VERDICT r1 #6: an upsert must rewrite ONLY the buckets its update
    # batch hashes into — untouched bucket directories stay bit-identical.
    store = BucketedResourceStore(spark, str(tmp_path / "bs2"), num_buckets=8)
    store.import_resources(
        spark.createDataFrame([(f"p{i}", f"v{i}") for i in range(200)], ["id", "payload"]),
        "Patient",
    )
    type_path = store._type_path("Patient")
    before = _bucket_files(type_path)
    assert len(before) == 8  # 200 spread ids populate every bucket

    updates = spark.createDataFrame([("p7", "new")], ["id", "payload"])
    store.upsert(updates, "Patient")
    touched = {f"bucket={r[0]}" for r in
               updates.select(store._bucket_expr("id")).distinct().collect()}
    assert len(touched) == 1
    after = _bucket_files(type_path)
    for d in before:
        if d in touched:
            assert after[d] != before[d]  # rewritten
        else:
            assert after[d] == before[d]  # bit-identical: no IO
    # and the merge read was pruned to the touched directory
    assert store.table("Patient").count() == 200
    assert {r["payload"] for r in
            store.table("Patient").filter(F.col("id") == "p7").collect()} == {"new"}


def test_compact_bounds_file_count_and_preserves_data(spark, tmp_path):
    root = str(tmp_path / "bstore")
    store = BucketedResourceStore(spark, root, num_buckets=4)
    store.import_resources(
        spark.createDataFrame([(f"p{i}", 0) for i in range(40)], ["id", "v"]), "Patient"
    )
    # several incremental upserts fragment the bucket directories (AQE
    # coalescing is disabled so the merge keeps its multi-task shuffle —
    # at test scale AQE would collapse everything onto one writer task
    # and mask the fragmentation compaction exists to fix)
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    old = spark.conf.get(coalesce_key, "true")
    spark.conf.set(coalesce_key, "false")
    try:
        for v in range(1, 4):
            store.upsert(
                spark.createDataFrame(
                    [(f"p{i}", v) for i in range(0, 40, 3)], ["id", "v"]
                ),
                "Patient",
                version_col="v",
            )
    finally:
        spark.conf.set(coalesce_key, old)
    type_path = f"{root}/resourceType=Patient"
    before = sum(len(fs) for fs in _bucket_files(type_path).values())
    assert before > 4  # fragmented: more files than bucket dirs
    expect = {r["id"]: r["v"] for r in store.table("Patient").collect()}

    store.compact("Patient")
    after_layout = _bucket_files(type_path)
    after = sum(len(fs) for fs in after_layout.values())
    assert after <= len(after_layout)  # ~one file per bucket dir
    assert after < before
    got = {r["id"]: r["v"] for r in store.table("Patient").collect()}
    assert got == expect


def test_plain_store_compact(spark, tmp_path):
    store = ResourceStore(spark, str(tmp_path / "pstore"))
    df = spark.createDataFrame([(f"p{i}", i) for i in range(50)], ["id", "v"])
    store.import_resources(df.repartition(8), "Patient")
    assert len(store.table("Patient").inputFiles()) > 1
    expect = {r["id"]: r["v"] for r in store.table("Patient").collect()}
    store.compact("Patient")
    assert len(store.table("Patient").inputFiles()) == 1
    assert {r["id"]: r["v"] for r in store.table("Patient").collect()} == expect


def test_bucketed_first_upsert_creates_table(spark, tmp_path):
    store = BucketedResourceStore(spark, str(tmp_path / "bs3"), num_buckets=4)
    store.upsert(spark.createDataFrame([("a", 1)], ["id", "v"]), "Patient")
    assert store.table("Patient").count() == 1


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


def test_bloom_filter_options_write_filters(spark, tmp_path):
    """bloom_cols grows the files by the serialized filters (pyarrow
    can't read bloom offsets, so assert behaviorally by size delta on
    identical data) and the data remains intact."""
    from pyspark.sql import functions as F

    from healthcare_api_spark.sources.store import ResourceStore

    df = spark.range(20000).select(
        F.concat(F.lit("id-"), F.col("id")).alias("id"),
        (F.col("id") % 7).alias("v"),
    ).coalesce(1)

    def total_size(root):
        import os

        return sum(
            os.path.getsize(os.path.join(d, f))
            for d, _, fs in os.walk(root)
            for f in fs
            if f.endswith(".parquet")
        )

    plain = ResourceStore(spark, str(tmp_path / "plain"))
    plain.import_resources(df, "T")
    bloomy = ResourceStore(spark, str(tmp_path / "bloom"))
    bloomy.import_resources(df, "T", bloom_cols=["id"])
    sz_plain, sz_bloom = total_size(str(tmp_path / "plain")), total_size(str(tmp_path / "bloom"))
    # ndv=100k default → filter blob is tens of KB; data identical
    assert sz_bloom > sz_plain + 10_000, (sz_plain, sz_bloom)
    assert bloomy.table("T").count() == 20000
    got = bloomy.table("T").filter(F.col("id") == "id-137").collect()
    assert len(got) == 1 and got[0]["v"] == 137 % 7


def test_snapshot_diff_change_taxonomy(spark):
    from healthcare_api_spark.sources.store import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None), (4, "d", 4.0)],
        ["id", "s", "v"],
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0),        # unchanged → absent from output
         (2, "b", 99.0),       # update
         (3, "c", 3.0),        # NULL → value is an update (null-safe)
         (5, "e", 5.0)],       # insert; 4 deleted
        ["id", "s", "v"],
    )
    out = {r["id"]: r["change"] for r in snapshot_diff(old, new, "id").collect()}
    assert out == {2: "update", 3: "update", 4: "delete", 5: "insert"}
    # compare_cols narrows change detection: only 's' → 2 and 3 unchanged
    out_s = {
        r["id"]: r["change"]
        for r in snapshot_diff(old, new, "id", compare_cols=["s"]).collect()
    }
    assert out_s == {4: "delete", 5: "insert"}


def test_soft_delete_hides_rows_without_touching_data_files(spark, tmp_path):
    root = str(tmp_path / "store")
    store = BucketedResourceStore(spark, root, num_buckets=4)
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(40)], ["id", "val"]
    )
    store.import_resources(base, "T")
    before = _bucket_files(f"{root}/resourceType=T")
    store.delete(base.filter(F.col("id") % 5 == 0).select("id"), "T")
    after = _bucket_files(f"{root}/resourceType=T")
    # deletion vectors: NOT ONE data file rewritten
    assert before == after
    got = {r["id"] for r in store.table("T").collect()}
    assert got == {i for i in range(40) if i % 5 != 0}
    # deleting an absent id is a no-op
    store.delete(spark.createDataFrame([(999,)], ["id"]), "T")
    assert store.table("T").count() == 32


def test_tombstone_id_col_mismatch_raises(spark, tmp_path):
    """ADVICE r8: delete()/upsert()/table() disagreeing on the id
    column must raise loudly — the old code inferred cols[0] in reads
    and SILENTLY skipped tombstone clearing in upsert(), so mis-joined
    reads or failed resurrection never surfaced."""
    import pytest

    root = str(tmp_path / "store")
    store = BucketedResourceStore(spark, root, num_buckets=4)
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], ["id", "val"]
    )
    store.import_resources(base, "T")
    store.delete(spark.createDataFrame([(3,)], ["id"]), "T")
    # a second delete keyed differently is rejected at write time
    with pytest.raises(ValueError, match="keyed by"):
        store.delete(
            spark.createDataFrame([(4,)], ["other_id"]), "T",
            id_col="other_id",
        )
    # an upsert keyed differently is rejected instead of silently
    # skipping the tombstone clear
    with pytest.raises(ValueError, match="keyed by"):
        store.upsert(
            spark.createDataFrame([(3, "x")], ["other_id", "val"]),
            "T", id_col="other_id",
        )
    # the matching-name paths still work
    got = {r["id"] for r in store.table("T").collect()}
    assert got == set(range(10)) - {3}


def test_upsert_resurrects_deleted_ids_even_when_bucket_fully_clears(spark, tmp_path):
    root = str(tmp_path / "store")
    store = BucketedResourceStore(spark, root, num_buckets=4)
    base = spark.createDataFrame(
        [(i, 1, f"v{i}") for i in range(20)], ["id", "version", "val"]
    )
    store.import_resources(base, "T")
    # delete exactly one id -> its bucket holds exactly one tombstone;
    # the resurrecting upsert clears ALL tombstones of that bucket
    # (the dynamic-overwrite-skips-empty-partitions trap, pinned)
    store.delete(spark.createDataFrame([(7,)], ["id"]), "T")
    assert store.table("T").filter(F.col("id") == 7).count() == 0
    store.upsert(
        spark.createDataFrame([(7, 2, "reborn")], ["id", "version", "val"]),
        "T", version_col="version",
    )
    got = store.table("T").filter(F.col("id") == 7).collect()
    assert len(got) == 1 and got[0]["val"] == "reborn"
    assert store.table("T").count() == 20


def test_compact_applies_and_clears_tombstones(spark, tmp_path):
    root = str(tmp_path / "store")
    store = BucketedResourceStore(spark, root, num_buckets=4)
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(30)], ["id", "val"]
    )
    store.import_resources(base, "T")
    store.delete(base.filter(F.col("id") < 10).select("id"), "T")
    store.compact("T")
    # physically applied: raw parquet (bypassing the anti-join) agrees
    raw = spark.read.parquet(f"{root}/resourceType=T")
    assert {r["id"] for r in raw.collect()} == set(range(10, 30))
    # and the tombstone dir is gone
    assert not os.path.exists(f"{root}/resourceType=T/_tombstones")
    assert store.table("T").count() == 20


def _vstore(spark, tmp_path, rows, nb=4):
    from healthcare_api_spark.sources.store import VersionedResourceStore

    store = VersionedResourceStore(spark, str(tmp_path / "vstore"), num_buckets=nb)
    df = spark.createDataFrame(rows, "id bigint, version int, val double")
    store.import_resources(df, "T")
    return store


def test_time_travel_snapshots_are_exact(spark, tmp_path):
    store = _vstore(
        spark, tmp_path, [(i, 1, float(i)) for i in range(1, 21)]
    )
    ups = spark.createDataFrame(
        [(i, 2, float(i) + 100.0) for i in (5, 10, 15, 20)],
        "id bigint, version int, val double",
    )
    store.upsert(ups, "T", version_col="version")
    dels = spark.createDataFrame([(7,), (14,)], "id bigint")
    store.delete(dels, "T")
    assert store.versions("T") == [1, 2, 3]
    v1 = {r["id"]: (r["version"], r["val"]) for r in store.table("T", as_of=1).collect()}
    assert v1 == {i: (1, float(i)) for i in range(1, 21)}
    v2 = {r["id"]: (r["version"], r["val"]) for r in store.table("T", as_of=2).collect()}
    assert v2[5] == (2, 105.0) and v2[7] == (1, 7.0) and len(v2) == 20
    v3 = {r["id"]: r["version"] for r in store.table("T").collect()}
    assert 7 not in v3 and 14 not in v3 and len(v3) == 18 and v3[10] == 2


def test_time_travel_writes_only_touched_buckets(spark, tmp_path):
    import glob

    store = _vstore(
        spark, tmp_path, [(i, 1, float(i)) for i in range(1, 41)], nb=8
    )
    ups = spark.createDataFrame([(3, 2, 999.0)], "id bigint, version int, val double")
    store.upsert(ups, "T", version_col="version")
    v2_buckets = {
        p.split("bucket=")[1]
        for p in glob.glob(str(tmp_path / "vstore/resourceType=T/v=2/bucket=*"))
    }
    assert len(v2_buckets) == 1  # one id -> one rewritten bucket
    # v1 files untouched: all 8 bucket dirs still present
    v1_buckets = glob.glob(str(tmp_path / "vstore/resourceType=T/v=1/bucket=*"))
    assert len(v1_buckets) == 8


def test_copy_on_write_delete_empties_bucket_and_reads_survive(spark, tmp_path):
    # a delete that empties a whole bucket writes no files for it — the
    # manifest still points there and the read treats it as empty
    store = _vstore(spark, tmp_path, [(1, 1, 1.0)], nb=2)
    store.delete(spark.createDataFrame([(1,)], "id bigint"), "T")
    assert [r["id"] for r in store.table("T").collect()] == []
    assert [r["id"] for r in store.table("T", as_of=1).collect()] == [1]


def test_expire_vacuums_unreferenced_versions(spark, tmp_path):
    import glob

    store = _vstore(spark, tmp_path, [(i, 1, float(i)) for i in range(1, 9)], nb=2)
    for k in (2, 3):
        ups = spark.createDataFrame(
            [(i, k, float(i * k)) for i in range(1, 9)],
            "id bigint, version int, val double",
        )
        store.upsert(ups, "T", version_col="version")
    assert store.versions("T") == [1, 2, 3]
    live_before = sorted(
        (r["id"], r["version"]) for r in store.table("T").collect()
    )
    removed = store.expire("T", keep_last=1)
    # every bucket was rewritten in v3 (full-table upserts), so v1/v2
    # data dirs are unreferenced and must be gone
    assert removed == [1, 2]
    assert store.versions("T") == [3]
    assert not glob.glob(str(tmp_path / "vstore/resourceType=T/v=1"))
    live_after = sorted(
        (r["id"], r["version"]) for r in store.table("T").collect()
    )
    assert live_after == live_before
    import pytest

    with pytest.raises(ValueError):
        store.table("T", as_of=1)
    with pytest.raises(ValueError):
        store.expire("T", keep_last=0)


def test_versioned_store_validation(spark, tmp_path):
    import pytest

    from healthcare_api_spark.sources.store import VersionedResourceStore

    store = VersionedResourceStore(spark, str(tmp_path / "v2"), num_buckets=2)
    with pytest.raises(ValueError, match="no snapshots"):
        store.table("T")
    df = spark.createDataFrame([(1, 1, 1.0)], "id bigint, version int, val double")
    with pytest.raises(ValueError, match="overwrite"):
        store.import_resources(df, "T", mode="append")
    store.import_resources(df, "T")
    with pytest.raises(ValueError, match="does not exist"):
        store.table("T", as_of=9)


def test_versioned_table_bucket_pruning_bounds_input_files(spark, tmp_path):
    """ADVICE r9: upsert/delete must read ONLY touched buckets' files.
    table(buckets=...) pushes the bucket IN filter onto each
    per-version parquet scan (partition-directory pruning); the
    md5-re-derivation the write path used before could not prune."""
    store = _vstore(
        spark, tmp_path, [(i, 1, float(i)) for i in range(1, 41)], nb=8
    )
    # derive id=3's bucket the same way the store does
    probe = spark.createDataFrame([(3,)], "id bigint").withColumn(
        "bucket", store._bucket_expr("id")
    )
    b3 = probe.collect()[0]["bucket"]
    pruned = store.table("T", buckets=[b3])
    # the IN filter must land as PartitionFilters on the scan —
    # inputFiles() reflects the unpruned relation, so read the plan
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters")[1].split("]")[0]
    # and the rows are exactly that bucket's rows
    full = store.table("T").withColumn("bucket", store._bucket_expr("id"))
    want = sorted(
        r["id"] for r in full.filter(F.col("bucket") == b3).collect()
    )
    assert sorted(r["id"] for r in pruned.collect()) == want


def test_versioned_table_pruned_read_of_emptied_bucket(spark, tmp_path):
    """When every wanted bucket's version dir is absent (copy-on-write
    delete emptied them), the pruned read must return an EMPTY frame
    with the right schema — not raise, not resurface old rows."""
    store = _vstore(spark, tmp_path, [(1, 1, 1.0)], nb=2)
    probe = spark.createDataFrame([(1,)], "id bigint").withColumn(
        "bucket", store._bucket_expr("id")
    )
    b1 = probe.collect()[0]["bucket"]
    store.delete(spark.createDataFrame([(1,)], "id bigint"), "T")
    got = store.table("T", buckets=[b1])
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["id", "version", "val"]
    # upsert into the emptied bucket still works end-to-end
    store.upsert(
        spark.createDataFrame([(1, 2, 9.0)], "id bigint, version int, val double"),
        "T",
        version_col="version",
    )
    assert [(r["id"], r["version"]) for r in store.table("T").collect()] == [(1, 2)]
