"""The resource store (SURVEY.md §2.1 S6-S8).

Replaces the reference's GCS-upload + Google-FHIR-store-import path
(upload.sh:23, README.md:77-90) with a Parquet lakehouse:

- one directory per store, partitioned by ``resourceType`` → a query for
  one type is a partition-pruned scan (the reference's one-file-per-type
  layout, made a physical partitioning);
- import = append/overwrite of a type partition;
- ``--enable-update-create`` upsert semantics (README.md:29) = merge by
  id with last-write-wins on a version timestamp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class ResourceStore:
    """A Parquet-backed, type-partitioned FHIR resource store."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def _type_path(self, resource_type: str) -> str:
        return f"{self.root}/resourceType={resource_type}"

    def import_resources(self, df: DataFrame, resource_type: str, mode: str = "overwrite",
                         bloom_cols: list[str] | None = None) -> None:
        """S7: bulk import one resource type (idempotent overwrite of the
        type partition; other types untouched — partitioned layout).
        ``bloom_cols`` writes parquet bloom filters for those columns so
        id point-lookups skip row groups (layout.bloom_filter_options)."""
        writer = df.write.mode(mode)
        if bloom_cols:
            from healthcare_api_spark.operators.layout import bloom_filter_options

            writer = writer.options(**bloom_filter_options(bloom_cols))
        writer.parquet(self._type_path(resource_type))

    def table(self, resource_type: str) -> DataFrame:
        """Type scan = partition-pruned read (§2.7 'type scan')."""
        return self.spark.read.parquet(self._type_path(resource_type))

    def upsert(self, updates: DataFrame, resource_type: str, id_col: str = "id",
               version_col: str | None = None) -> None:
        """S8 update-create semantics: merge by id, last-write-wins.

        At lake scale this is the foreachBatch/MERGE pattern; on plain
        Parquet we rewrite the partition with the deduped union. The
        winner is deterministic: highest version_col, else the update.
        """
        from pyspark.errors import AnalysisException

        try:
            existing = self.table(resource_type)
        except AnalysisException as e:
            # first write for this type: only a missing path is a valid
            # reason to skip the merge — anything else (corrupt footer,
            # permissions) must NOT silently overwrite history
            if "PATH_NOT_FOUND" not in str(e) and "Path does not exist" not in str(e):
                raise
            self.import_resources(updates, resource_type)
            return
        merged = upsert_frames(existing, updates, id_col, version_col)
        # Rewriting the input partition requires a materialization barrier.
        merged_local = merged.localCheckpoint(eager=True)
        self.import_resources(merged_local, resource_type, mode="overwrite")

    def compact(self, resource_type: str, target_files: int = 1) -> None:
        """Small-file compaction: rewrite the type partition into
        ``target_files`` files. Incremental upserts fragment the layout
        (every merge emits one file per shuffle task); at 100 TB the
        resulting tiny-file scans dominate NameNode/list costs and break
        split planning. Run compaction as periodic maintenance, exactly
        like OPTIMIZE in Delta/Iceberg."""
        existing = self.table(resource_type).coalesce(target_files)
        merged_local = existing.localCheckpoint(eager=True)
        self.import_resources(merged_local, resource_type, mode="overwrite")

    def counts_by_type(self, types: list[str]) -> DataFrame:
        """A4: per-type counts across the store catalog."""
        frames = [
            self.table(t).agg(F.count(F.lit(1)).alias("cnt")).select(F.lit(t).alias("resourceType"), "cnt")
            for t in types
        ]
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out


class BucketedResourceStore(ResourceStore):
    """Copy-on-write store with sub-partition upsert granularity — the
    100 TB production story for S8 (plain ``ResourceStore.upsert``
    rewrites the whole type partition, correct but O(partition) IO per
    batch).

    Layout: ``root/resourceType=T/bucket=NN/*.parquet`` where NN =
    md5-derived hash of the id modulo ``num_buckets``. An upsert:

    1. computes the bucket of every update row (narrow),
    2. collects the ≤ num_buckets TOUCHED bucket ids to the driver,
    3. reads ONLY those bucket directories of the existing table
       (partition-pruned scan),
    4. merges with the same last-write-wins semantics, and
    5. rewrites ONLY the touched buckets (dynamic partition overwrite).

    IO per batch is O(touched buckets), not O(type partition) — with
    well-spread ids a small batch touches few buckets; the worst case
    equals the plain store. The same idea is what Delta/Iceberg MERGE
    does with file-level pruning; this is the table-format-free version
    behind the identical API.

    ``num_buckets`` must stay constant for the lifetime of a store
    directory (it defines the physical layout); changing it requires a
    rewrite via ``import_resources``.
    """

    def __init__(self, spark: SparkSession, root: str, num_buckets: int = 32):
        super().__init__(spark, root)
        self.num_buckets = num_buckets

    def _bucket_expr(self, id_col: str):
        # md5-based (not F.hash) so the physical layout is reproducible
        # across Spark versions and engines; 15 hex chars fit in a long
        digest = F.md5(F.col(id_col).cast("string"))
        return F.pmod(
            F.conv(F.substring(digest, 1, 15), 16, 10).cast("long"),
            F.lit(self.num_buckets),
        ).cast("int")

    def import_resources(self, df: DataFrame, resource_type: str, mode: str = "overwrite",
                         id_col: str = "id") -> None:
        (
            df.withColumn("bucket", self._bucket_expr(id_col))
            .write.mode(mode)
            .partitionBy("bucket")
            .parquet(self._type_path(resource_type))
        )

    def _tombstone_path(self, resource_type: str) -> str:
        # leading underscore: Hadoop/Spark file listing skips _-prefixed
        # directories, so the data scan never sees tombstones
        return f"{self._type_path(resource_type)}/_tombstones"

    def _tombstones(self, resource_type: str) -> DataFrame | None:
        from pyspark.errors import AnalysisException

        try:
            return self.spark.read.parquet(self._tombstone_path(resource_type))
        except AnalysisException as e:
            # UNABLE_TO_INFER_SCHEMA: the dir exists but every bucket
            # partition was cleared (all tombstones consumed) — same as
            # no tombstones at all
            ok = (
                "PATH_NOT_FOUND" in str(e)
                or "Path does not exist" in str(e)
                or "UNABLE_TO_INFER_SCHEMA" in str(e)
            )
            if not ok:
                raise
            return None

    def delete(self, ids: DataFrame, resource_type: str, id_col: str = "id") -> None:
        """Soft delete by id — the deletion-vector idea (Delta/Iceberg
        merge-on-read), table-format-free: APPEND tombstone rows under
        ``_tombstones/bucket=NN`` instead of rewriting any data file.
        IO per delete batch is O(batch), not O(touched data); readers
        anti-join the (bucket-aligned, usually broadcast-sized)
        tombstone set; ``compact()`` physically applies and clears
        them — the vacuum step. Deleting an absent id is a no-op
        tombstone; a later ``upsert`` of a deleted id RESURRECTS it
        (update-create semantics — the upsert clears matching
        tombstones in its touched buckets)."""
        existing = self._tombstones(resource_type)
        if existing is not None:
            prev = self._tombstone_id_col(existing)
            if prev != id_col:
                raise ValueError(
                    f"tombstones for {resource_type!r} are keyed by "
                    f"{prev!r}; delete() was called with id_col="
                    f"{id_col!r} — one id column per resource type"
                )
        (
            ids.select(F.col(id_col)).distinct()
            .withColumn("bucket", self._bucket_expr(id_col))
            .write.mode("append")
            .partitionBy("bucket")
            .parquet(self._tombstone_path(resource_type))
        )

    @staticmethod
    def _tombstone_id_col(tomb: DataFrame) -> str:
        """The tombstone layout is exactly (id value, bucket); the id
        column KEEPS its live-table name so readers join by name. A
        mixed-name tombstone dir means delete() calls disagreed — that
        is rejected at write time, so a multi-column read here is
        corruption, not a soft case."""
        cols = [c for c in tomb.columns if c != "bucket"]
        if len(cols) != 1:
            raise ValueError(
                f"tombstone store is corrupt: expected one id column, "
                f"found {cols!r}"
            )
        return cols[0]

    def table(self, resource_type: str) -> DataFrame:
        live = super().table(resource_type).drop("bucket")
        tomb = self._tombstones(resource_type)
        if tomb is None:
            return live
        id_col = self._tombstone_id_col(tomb)
        if id_col not in live.columns:
            raise ValueError(
                f"tombstones for {resource_type!r} are keyed by "
                f"{id_col!r}, which is not a live-table column — "
                f"reads would silently miss the deletes"
            )
        return live.join(
            tomb.select(id_col).distinct(), id_col, "left_anti"
        )

    def upsert(self, updates: DataFrame, resource_type: str, id_col: str = "id",
               version_col: str | None = None) -> None:
        from pyspark.errors import AnalysisException

        updates_b = updates.withColumn("bucket", self._bucket_expr(id_col))
        # ONE touched-bucket collect (r12: the tombstone path and the
        # data path each ran this identical distinct — two full passes
        # over the updates plan per upsert)
        touched = [
            r["bucket"] for r in updates_b.select("bucket").distinct().collect()
        ]
        # update-create beats delete: clear tombstones for upserted ids
        # (touched tombstone partitions only — same bounded-IO contract)
        tomb = self._tombstones(resource_type)
        if tomb is not None and self._tombstone_id_col(tomb) != id_col:
            raise ValueError(
                f"tombstones for {resource_type!r} are keyed by "
                f"{self._tombstone_id_col(tomb)!r}; upsert() was called "
                f"with id_col={id_col!r} — resurrection would silently "
                f"fail"
            )
        if tomb is not None:
            t_touched = touched
            kept = (
                tomb.filter(F.col("bucket").isin(t_touched))
                .join(updates.select(id_col).distinct(), id_col, "left_anti")
                .localCheckpoint(eager=True)  # we rewrite what we read
            )
            # NOT dynamic partition overwrite: a touched bucket whose
            # tombstones ALL clear yields zero rows, and dynamic mode
            # skips row-less partitions — the stale tombstones would
            # survive and the resurrection silently fail. Remove the
            # touched partition dirs explicitly, then append survivors.
            for b in t_touched:
                self._remove_dir(
                    f"{self._tombstone_path(resource_type)}/bucket={b}"
                )
            if kept.take(1):
                (
                    kept.write.mode("append")
                    .partitionBy("bucket")
                    .parquet(self._tombstone_path(resource_type))
                )
        try:
            existing = self.spark.read.parquet(self._type_path(resource_type))
        except AnalysisException as e:
            if "PATH_NOT_FOUND" not in str(e) and "Path does not exist" not in str(e):
                raise
            self.import_resources(updates, resource_type, id_col=id_col)
            return
        # partition-pruned read: only the touched bucket directories
        existing_touched = existing.filter(F.col("bucket").isin(touched))
        merged = upsert_frames(
            existing_touched.drop("bucket"), updates, id_col, version_col
        ).withColumn("bucket", self._bucket_expr(id_col))
        # barrier: we overwrite directories we just read
        merged_local = merged.localCheckpoint(eager=True)
        (
            merged_local.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(self._type_path(resource_type))
        )

    def compact(
        self,
        resource_type: str,
        target_files: int = 1,
        zorder: tuple[str, str] | None = None,
    ) -> None:
        """Compaction for the bucketed layout: one pass that rewrites
        every bucket directory down to ~``target_files`` file(s) each.
        The repartition keys rows by their bucket, so each write task
        emits whole buckets — file count drops from O(upserts × tasks)
        to O(buckets) while the id-hash layout (and therefore bounded
        future upsert IO) is preserved.

        ``zorder=(col_a, col_b)`` additionally clusters each rewritten
        bucket by the rank-normalized Morton key of the two columns
        (``layout.zorder_by_ranked``) — compaction already rewrites the
        data, so Z-order maintenance rides along for free, exactly like
        ``OPTIMIZE ... ZORDER BY`` in Delta/Iceberg. Row groups then
        carry tight min/max on BOTH columns and scans prune on either.
        """
        existing = self.spark.read.parquet(self._type_path(resource_type))
        merged = existing
        # apply tombstones physically (the vacuum half of merge-on-read):
        # compaction rewrites everything anyway, so the anti-join rides
        # along for free and the tombstone set resets to empty below
        tomb = self._tombstones(resource_type)
        if tomb is not None:
            t_id = self._tombstone_id_col(tomb)
            if t_id not in merged.columns:
                raise ValueError(
                    f"tombstones for {resource_type!r} are keyed by "
                    f"{t_id!r}, which is not a table column — compaction "
                    f"would silently drop the deletes"
                )
            merged = merged.join(
                tomb.select(t_id).distinct(), t_id, "left_anti"
            )
        if zorder is not None:
            from healthcare_api_spark.operators.layout import zorder_by_ranked

            # attach zkey FIRST: zorder_by_ranked's rank-normalize join
            # re-shuffles when the distinct-rank frame is not broadcast
            # sized, which would destroy a prior repartition-by-bucket
            # and fragment each bucket across O(write-tasks) files
            merged = zorder_by_ranked(merged, *zorder)
        merged = merged.repartition(max(self.num_buckets * target_files, 1), "bucket")
        if zorder is not None:
            # sort by (bucket, zkey): the partitionBy writer splits by
            # bucket, and rows inside each bucket file stay z-clustered
            merged = merged.sortWithinPartitions("bucket", "zkey").drop("zkey")
        merged_local = merged.localCheckpoint(eager=True)
        (
            merged_local.write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(self._type_path(resource_type))
        )
        if tomb is not None:
            self._remove_dir(self._tombstone_path(resource_type))

    def _remove_dir(self, path: str) -> None:
        sc = self.spark.sparkContext
        hpath = sc._jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())
        fs.delete(hpath, True)


def import_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Co-location sink: hash-bucketed (and optionally sorted) managed
    table. Two tables bucketed identically on their join key join with
    NO shuffle on either side — at 100 TB this turns the repeated
    fact⋈fact join from a full exchange into a local zip per bucket.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def upsert_frames(existing: DataFrame, updates: DataFrame, id_col: str = "id",
                  version_col: str | None = None) -> DataFrame:
    """Pure merge: union + keep one row per id.

    Priority: updates beat existing; among duplicates, higher
    ``version_col`` wins, deterministic. One shuffle on the id.
    """
    e = existing.withColumn("_src", F.lit(0))
    u = updates.withColumn("_src", F.lit(1))
    merged = e.unionByName(u, allowMissingColumns=True)
    order = [F.col("_src").desc()]
    if version_col is not None:
        order = [F.col(version_col).desc(), F.col("_src").desc()]
    w = Window.partitionBy(id_col).orderBy(*order)
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "id",
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """CDC between two table snapshots: one row per changed id with
    ``change ∈ {insert, delete, update}`` — the feed a downstream
    incremental consumer (index refresh, cache invalidation, reverse
    ETL) reads instead of re-scanning the table.

    One full-outer join on the id; ``update`` detection compares
    ``compare_cols`` (default: all shared non-id columns) null-safely
    via a struct equality, so NULL→value and value→NULL both register.
    Unchanged rows are filtered out, so output is proportional to the
    churn, not the table. At lake scale run it per id-hash bucket
    (BucketedResourceStore layout) so both sides co-partition and the
    join never shuffles the full snapshots.
    """
    if compare_cols is None:
        compare_cols = [
            c for c in new.columns if c != id_col and c in set(old.columns)
        ]
    o = old.select(
        F.col(id_col).alias("_oid"),
        F.struct(*[F.col(c) for c in compare_cols]).alias("_ov"),
    )
    n = new.select(
        F.col(id_col).alias("_nid"),
        F.struct(*[F.col(c) for c in compare_cols]).alias("_nv"),
    )
    j = o.join(n, F.col("_oid") == F.col("_nid"), "full_outer")
    change = (
        F.when(F.col("_oid").isNull(), F.lit("insert"))
        .when(F.col("_nid").isNull(), F.lit("delete"))
        .when(~F.col("_ov").eqNullSafe(F.col("_nv")), F.lit("update"))
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(
            F.coalesce(F.col("_nid"), F.col("_oid")).alias(id_col),
            "change",
        )
    )


class VersionedResourceStore(ResourceStore):
    """Snapshot-versioned copy-on-write store — the time-travel /
    snapshot-isolation half of the lakehouse story
    (BucketedResourceStore covers bounded-IO upserts and s14 covers
    merge-on-read deletes; this is Iceberg-lite `AS OF`):

    - layout ``root/resourceType=T/v=K/bucket=NN/*.parquet`` plus one
      tiny JSON manifest per snapshot under the listing-invisible
      ``_manifests/`` (the underscore trick) mapping every bucket to
      the version directory holding its CURRENT files;
    - a write (upsert or copy-on-write delete) rewrites ONLY the
      touched buckets into a NEW ``v=K+1`` directory and publishes a
      new manifest — previous snapshots' files are never modified, so
      ``table(T, as_of=K)`` reconstructs any retained snapshot
      EXACTLY;
    - reads group the manifest's buckets by version: one
      partition-pruned parquet scan per distinct version (the
      ``bucket IN (...)`` filter prunes at the directory level), then
      a union — IO is the live file set, never the full history;
    - ``expire(T, keep_last=N)`` is the vacuum: drops version dirs no
      retained manifest references.

    Manifest IO is driver-side (a few hundred bytes per snapshot —
    exactly where table formats keep their metadata); data IO stays
    on the cluster. ``num_buckets`` is fixed for a store's lifetime,
    same contract as the bucketed store.
    """

    def __init__(self, spark: SparkSession, root: str, num_buckets: int = 32):
        super().__init__(spark, root)
        self.num_buckets = num_buckets

    # same md5 contract as BucketedResourceStore: layout reproducible
    # across Spark versions and engines
    def _bucket_expr(self, id_col: str):
        digest = F.md5(F.col(id_col).cast("string"))
        return F.pmod(
            F.conv(F.substring(digest, 1, 15), 16, 10).cast("long"),
            F.lit(self.num_buckets),
        ).cast("int")

    def _manifest_dir(self, resource_type: str) -> str:
        return f"{self._type_path(resource_type)}/_manifests"

    def _fs(self, path: str):
        sc = self.spark.sparkContext
        hpath = sc._jvm.org.apache.hadoop.fs.Path(path)
        return hpath.getFileSystem(sc._jsc.hadoopConfiguration()), hpath

    def _write_manifest(
        self, resource_type: str, version: int, mapping: dict[int, int]
    ) -> None:
        import json

        fs, _ = self._fs(self._manifest_dir(resource_type))
        sc = self.spark.sparkContext
        p = sc._jvm.org.apache.hadoop.fs.Path(
            f"{self._manifest_dir(resource_type)}/{version}.json"
        )
        out = fs.create(p, True)
        payload = json.dumps(
            {"version": version, "buckets": {str(k): v for k, v in mapping.items()}}
        )
        out.write(bytearray(payload.encode("utf-8")))
        out.close()

    def versions(self, resource_type: str) -> list[int]:
        fs, hpath = self._fs(self._manifest_dir(resource_type))
        if not fs.exists(hpath):
            return []
        out = []
        for st in fs.listStatus(hpath):
            name = st.getPath().getName()
            if name.endswith(".json"):
                out.append(int(name[:-5]))
        return sorted(out)

    def _read_manifest(
        self, resource_type: str, as_of: int | None = None
    ) -> tuple[int, dict[int, int]]:
        import json

        avail = self.versions(resource_type)
        if not avail:
            raise ValueError(f"no snapshots for {resource_type!r}")
        version = max(avail) if as_of is None else as_of
        if version not in avail:
            raise ValueError(
                f"snapshot v={version} of {resource_type!r} does not "
                f"exist (have {avail})"
            )
        line = (
            self.spark.read.text(
                f"{self._manifest_dir(resource_type)}/{version}.json"
            )
            .agg(F.concat_ws("", F.collect_list("value")))
            .head()[0]
        )
        doc = json.loads(line)
        return version, {int(k): v for k, v in doc["buckets"].items()}

    def _version_path(self, resource_type: str, version: int) -> str:
        return f"{self._type_path(resource_type)}/v={version}"

    def import_resources(self, df: DataFrame, resource_type: str, mode: str = "overwrite",
                         id_col: str = "id") -> None:
        if mode != "overwrite":
            raise ValueError("versioned store imports are snapshot v1: mode='overwrite'")
        fs, hpath = self._fs(self._type_path(resource_type))
        if fs.exists(hpath):
            fs.delete(hpath, True)
        (
            df.withColumn("bucket", self._bucket_expr(id_col))
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(self._version_path(resource_type, 1))
        )
        self._write_manifest(
            resource_type, 1, {b: 1 for b in range(self.num_buckets)}
        )

    def table(
        self,
        resource_type: str,
        as_of: int | None = None,
        buckets: list[int] | None = None,
    ) -> DataFrame:
        """Snapshot read. ``buckets`` restricts the read to those hash
        buckets BEFORE the scan (ADVICE r9): the manifest mapping is
        pruned driver-side so only versions holding a wanted bucket are
        scanned at all, and each per-version scan carries a
        ``bucket IN (...)`` filter on the partition column — directory-
        level pruning, which the write path (upsert/delete) relies on
        for its 'IO bounded to touched buckets' contract."""
        from functools import reduce

        from pyspark.errors import AnalysisException

        _, mapping = self._read_manifest(resource_type, as_of)
        want = (
            mapping
            if buckets is None
            else {b: v for b, v in mapping.items() if b in set(buckets)}
        )
        by_version: dict[int, list[int]] = {}
        for b, v in want.items():
            by_version.setdefault(v, []).append(b)
        parts = []

        def _read_version(v):
            try:
                return self.spark.read.parquet(
                    self._version_path(resource_type, v)
                )
            except AnalysisException as e:
                # a version dir is absent only when every bucket it
                # would hold ended empty (copy-on-write delete emptied
                # them) — semantically an empty contribution
                if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
                    return None
                raise

        for v, bs in sorted(by_version.items()):
            df = _read_version(v)
            if df is not None:
                parts.append(df.filter(F.col("bucket").isin(bs)))
        if not parts and buckets is not None:
            # every wanted bucket's version dir is absent (emptied by
            # copy-on-write deletes): recover the schema from any
            # readable version; the result is correctly empty
            for v in sorted(set(mapping.values())):
                df = _read_version(v)
                if df is not None:
                    parts.append(df.filter(F.lit(False)))
                    break
        if not parts:
            raise ValueError(f"snapshot has no readable data for {resource_type!r}")
        return reduce(lambda a, b: a.unionByName(b), parts).drop("bucket")

    def _commit_touched(
        self,
        resource_type: str,
        merged,  # rows for the touched buckets, WITHOUT bucket column
        id_col: str,
        touched: list[int],
        mapping: dict[int, int],
        new_version: int,
    ) -> None:
        out = merged.withColumn("bucket", self._bucket_expr(id_col))
        # barrier: new version dirs never overlap files we read, but the
        # checkpoint also keeps the plan from re-reading the store after
        # the manifest flips
        out_local = out.localCheckpoint(eager=True)
        if out_local.take(1):
            (
                out_local.write.mode("overwrite")
                .partitionBy("bucket")
                .parquet(self._version_path(resource_type, new_version))
            )
        for b in touched:
            mapping[b] = new_version
        self._write_manifest(resource_type, new_version, mapping)

    def upsert(self, updates: DataFrame, resource_type: str, id_col: str = "id",
               version_col: str | None = None) -> None:
        current, mapping = self._read_manifest(resource_type)
        updates_b = updates.withColumn("bucket", self._bucket_expr(id_col))
        touched = [
            r["bucket"] for r in updates_b.select("bucket").distinct().collect()
        ]
        # bucket-pruned snapshot read: the IN filter rides the partition
        # column into each per-version scan instead of being re-derived
        # from md5 post-read (which cannot prune directories)
        existing_touched = self.table(resource_type, buckets=touched)
        merged = upsert_frames(existing_touched, updates, id_col, version_col)
        self._commit_touched(
            resource_type, merged, id_col, touched, mapping, current + 1
        )

    def delete(self, ids: DataFrame, resource_type: str, id_col: str = "id") -> None:
        """COPY-ON-WRITE delete (contrast s14's merge-on-read
        tombstones): touched buckets are rewritten without the doomed
        rows into the next version — the read path needs no anti-join,
        and the PREVIOUS snapshot still serves the deleted rows."""
        current, mapping = self._read_manifest(resource_type)
        ids_b = (
            ids.select(F.col(id_col)).distinct()
            .withColumn("bucket", self._bucket_expr(id_col))
        )
        touched = [
            r["bucket"] for r in ids_b.select("bucket").distinct().collect()
        ]
        kept = self.table(resource_type, buckets=touched).join(
            ids.select(id_col).distinct(), id_col, "left_anti"
        )
        self._commit_touched(
            resource_type, kept, id_col, touched, mapping, current + 1
        )

    def expire(self, resource_type: str, keep_last: int = 1) -> list[int]:
        """Vacuum: drop manifests older than the last ``keep_last``
        snapshots and delete version DIRECTORIES no retained manifest
        references. Returns the removed directory versions."""
        if keep_last < 1:
            raise ValueError("keep_last must be ≥ 1")
        avail = self.versions(resource_type)
        keep = set(avail[-keep_last:])
        referenced: set[int] = set()
        for v in sorted(keep):
            _, mapping = self._read_manifest(resource_type, v)
            referenced.update(mapping.values())
        removed = []
        fs, _ = self._fs(self._type_path(resource_type))
        sc = self.spark.sparkContext
        for v in avail:
            if v not in keep:
                p = sc._jvm.org.apache.hadoop.fs.Path(
                    f"{self._manifest_dir(resource_type)}/{v}.json"
                )
                fs.delete(p, False)
        for v in set(avail) - referenced:
            # a data dir may be unreferenced even for a kept manifest's
            # version number (pure-delete snapshots write no files)
            p = sc._jvm.org.apache.hadoop.fs.Path(
                self._version_path(resource_type, v)
            )
            if fs.exists(p) and v not in referenced:
                fs.delete(p, True)
                removed.append(v)
        return sorted(removed)
