"""Bucketed, versioned micro-batch state store (VERDICT r7 #3).

The r7 streaming operators (near-dup admission, KMV fold, heavy-hitter
counts) kept their cross-batch state as ONE parquet table rewritten
whole every micro-batch. Correct — but the per-batch IO was
O(|state| + |delta|), and at a 100 TB corpus the band-owner state is
corpus-scale: rewriting it per batch is the bottleneck. Worse, the
in-place ``mode("overwrite")`` deleted the only copy before the new
files committed (a mid-write crash lost all state) and a foreachBatch
REPLAY after a partial failure read its own output (ADVICE r7: every
doc then collided with itself).

This store fixes all three with the two patterns the repo already
owns, composed:

- **bucketing** (``BucketedResourceStore.upsert``, sources/store.py:140)
  — state rows live in ``num_buckets`` hash-of-key buckets; a batch
  reads and rewrites ONLY the buckets its delta touches;
- **immutable versioned snapshots** (``apply_versioned_merge``,
  streaming/rollup.py:111) — each batch writes a NEW directory
  ``v{batch_id}/`` containing just its touched buckets, with Spark's
  ``_SUCCESS`` marking completeness. Prior versions are never mutated,
  so a crash mid-write loses nothing and a replay reads the exact
  pre-batch state (versions strictly older than the replayed batch).

Layout::

    {path}/v{batch_id}/_pt={bucket}/part-*.parquet
    {path}/v{batch_id}/_SUCCESS

The CURRENT state of bucket b is its newest complete version's
``_pt=b`` directory (a version's bucket dir always holds that bucket's
FULL merged state, because the merge folds the previous copy in).
Reads resolve bucket → newest-version once from a directory listing
(O(versions × buckets) driver-side names, never data) and issue one
multi-path parquet scan. Retention is per BUCKET: an old version is
deleted only when every bucket in it has ``keep_versions`` newer
complete copies — so the pre-batch state needed by an in-flight replay
always survives pruning.

Exactly-once contract (same as the rollup tier): foreachBatch is
at-least-once; ``merge_batch`` skips a batch whose complete snapshot
already exists, and a replayed/crashed batch recomputes from versions
strictly older than it — same inputs, same output, no double count and
no read-own-output.

Append + compact commit protocol (r13, guide §6). The full-snapshot
protocol above rewrites every touched bucket's FULL merged state per
micro-batch — commit I/O ∝ |touched-bucket state|, while only the
delta is new. When the store is constructed with a ``merge_fn`` (a
pure function ``(prev_state_or_None, delta) -> merged_state``), it
switches to an append protocol whose commit I/O ∝ |delta|:

- ``merge_batch`` writes the RAW delta as an immutable, bucketed
  ``d{batch_id}/`` directory (still ``_SUCCESS``-gated) — no pre-state
  read, no merge execution, no tombstones at commit time;
- ``read`` resolves per bucket the newest complete base snapshot and
  folds every newer complete delta through ``merge_fn`` in commit
  order — the fold runs lazily inside the consumer's own job, exactly
  reproducing ``state_n = merge_fn(state_{n-1}, delta_n)``;
- every ``compact_every`` pending deltas, the next commit writes a
  full ``v{batch_id}`` snapshot instead (the legacy path, tombstones
  included), covering the batch's touched buckets AND every bucket
  with a pending delta — which bounds the fold depth and keeps
  retention working.

The compaction coverage rule is load-bearing: because a snapshot
always folds in EVERY bucket that has any pending delta, a delta
version is either newer than the newest base snapshot (fold it for
all its buckets) or fully shadowed by one (skip it for all of them) —
``read`` can use one global version cutoff instead of per-bucket
delta resolution. Crash/replay semantics are unchanged: delta dirs
are immutable and ``_SUCCESS``-gated, an incomplete ``d{batch}`` is
invisible to the census and rewritten by the replay, and a replayed
batch reading ``before_batch`` folds exactly the pre-batch versions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from healthcare_api_spark.streaming.rollup import _fs_and_path

_BUCKET_SEED = 42


class BucketedVersionedState:
    """Keyed micro-batch state partitioned into hash buckets and
    persisted as immutable per-batch versioned snapshots."""

    def __init__(
        self,
        path: str,
        key_cols: list[str],
        num_buckets: int = 16,
        keep_versions: int = 2,
        merge_fn=None,
        compact_every: int = 8,
    ) -> None:
        if num_buckets < 1:
            raise ValueError("num_buckets must be >= 1")
        if keep_versions < 1:
            raise ValueError("keep_versions must be >= 1")
        if compact_every < 1:
            raise ValueError("compact_every must be >= 1")
        self.path = path
        self.key_cols = list(key_cols)
        self.num_buckets = num_buckets
        self.keep_versions = keep_versions
        # ``merge_fn`` set → append + compact protocol (r13, guide §6):
        # commits write raw deltas, reads fold them; the SAME function
        # must be passed by the writer and every reader of this path.
        self.merge_fn = merge_fn
        self.compact_every = compact_every

    # -- bucket assignment (deterministic across sessions: xxhash64
    # with a fixed seed, the same family the batch stores use) --------
    def bucket_expr(self):
        return F.pmod(
            F.xxhash64(*[F.col(c) for c in self.key_cols], F.lit(_BUCKET_SEED)),
            F.lit(self.num_buckets),
        ).cast("int")

    # -- directory census (driver-side NAMES only, never data) --------
    def _census(
        self, spark: SparkSession
    ) -> tuple[dict[int, list[int]], dict[int, list[int]]]:
        """(base snapshots: bucket -> ascending batch_ids of complete
        ``v{id}`` versions containing it, deltas: batch_id -> sorted
        buckets present in the complete ``d{id}`` directory)."""
        fs, root, jvm = _fs_and_path(spark, self.path)
        bases: dict[int, list[int]] = {}
        deltas: dict[int, list[int]] = {}
        if not fs.exists(root):
            return bases, deltas
        for vstat in fs.listStatus(root):
            name = vstat.getPath().getName()
            kind = name[0]
            if kind not in ("v", "d"):
                continue
            try:
                vid = int(name[1:])
            except ValueError:
                continue
            if not fs.exists(
                jvm.org.apache.hadoop.fs.Path(vstat.getPath(), "_SUCCESS")
            ):
                continue
            bs = [
                int(bstat.getPath().getName()[4:])
                for bstat in fs.listStatus(vstat.getPath())
                if bstat.getPath().getName().startswith("_pt=")
            ]
            if kind == "v":
                for b in bs:
                    bases.setdefault(b, []).append(vid)
            else:
                deltas[vid] = sorted(bs)
        for versions in bases.values():
            versions.sort()
        return bases, deltas

    def complete_versions(self, spark: SparkSession) -> list[int]:
        bases, deltas = self._census(spark)
        out = {v for vs in bases.values() for v in vs}
        out.update(deltas)
        return sorted(out)

    # -- reads --------------------------------------------------------
    def _base_paths(
        self,
        bases: dict[int, list[int]],
        before_batch: int | None,
        buckets: set[int] | None,
    ) -> list[str]:
        paths = []
        for b, versions in bases.items():
            if buckets is not None and b not in buckets:
                continue
            eligible = [
                v
                for v in versions
                if before_batch is None or v < before_batch
            ]
            if eligible:
                paths.append(f"{self.path}/v{eligible[-1]}/_pt={b}")
        return sorted(paths)

    def _read_base(self, spark: SparkSession, paths: list[str]):
        # r12: no mergeSchema on the hot path — it launches a
        # distributed footer-merge JOB per read (~5-8 reads per
        # 2-batch lifecycle), and every version merge_batch writes
        # carries ``_tomb``, so current-layout versions share one
        # schema. Only a state dir written by pre-tombstone code can
        # surface a footer without ``_tomb``; fall back to the merged
        # read for exactly that case (merging yields _tomb=null there,
        # which coalesce() keeps).
        df = spark.read.parquet(*paths)
        if "_tomb" not in df.columns:
            df = spark.read.option("mergeSchema", "true").parquet(*paths)
        if "_tomb" in df.columns:
            df = df.filter(
                ~F.coalesce(F.col("_tomb"), F.lit(False))
            ).drop("_tomb")
        return df

    def read(
        self,
        spark: SparkSession,
        before_batch: int | None = None,
        buckets: set[int] | None = None,
    ) -> DataFrame | None:
        """Current state (or the state as of strictly-before
        ``before_batch``, optionally restricted to ``buckets``).
        Returns None when no complete state exists — the first-batch
        signal. Tombstone rows (the emptied-bucket markers written by
        compacting ``merge_batch`` commits) are filtered out here, so
        callers only ever see live state rows.

        With a ``merge_fn`` (append protocol) the result is the FOLD of
        the newest base snapshots and every newer complete delta in
        commit order — lazily, inside the consumer's own jobs. The one
        global cutoff (deltas newer than the newest base anywhere) is
        exact because compaction always covers every pending-delta
        bucket (see the module docstring)."""
        bases, deltas = self._census(spark)
        paths = self._base_paths(bases, before_batch, buckets)
        state = self._read_base(spark, paths) if paths else None
        if self.merge_fn is None:
            return state
        # newest eligible base ANYWHERE — deltas at or below it are
        # fully shadowed for every bucket by the coverage invariant
        base_max = max(
            (
                v
                for vs in bases.values()
                for v in vs
                if before_batch is None or v < before_batch
            ),
            default=-1,
        )
        for vid in sorted(deltas):
            if vid <= base_max:
                continue
            if before_batch is not None and vid >= before_batch:
                continue
            dpaths = [
                f"{self.path}/d{vid}/_pt={b}"
                for b in deltas[vid]
                if buckets is None or b in buckets
            ]
            if not dpaths:
                continue
            d = spark.read.parquet(*dpaths)
            # fn(None, d) — not d itself — so the fold reproduces the
            # legacy protocol's v0 = merge_fn(None, delta) bit for bit
            # (some merges normalize/cast on the first fold)
            state = self.merge_fn(state, d)
        return state

    # -- the per-batch merge ------------------------------------------
    def touched_buckets(self, delta: DataFrame) -> set[int]:
        """Distinct bucket ids of the delta's keys — a bounded fetch
        (≤ num_buckets values), the store's only collect."""
        return {
            r[0]
            for r in delta.select(self.bucket_expr().alias("_pt"))
            .distinct()
            .collect()
        }

    def is_batch_complete(self, spark: SparkSession, batch_id: int) -> bool:
        fs, _, jvm = _fs_and_path(spark, self.path)
        hpath = jvm.org.apache.hadoop.fs.Path
        return fs.exists(
            hpath(f"{self.path}/v{batch_id}/_SUCCESS")
        ) or fs.exists(hpath(f"{self.path}/d{batch_id}/_SUCCESS"))

    def merge_batch(
        self,
        delta: DataFrame,
        batch_id: int,
        merge_fn=None,
        touched: set[int] | None = None,
        materialize: bool = True,
    ) -> None:
        """Fold ``delta`` into the state. Idempotent: a complete
        ``v{batch_id}`` (or ``d{batch_id}``) short-circuits.

        Legacy protocol (no constructor ``merge_fn``): read the touched
        buckets' pre-batch state, ``merge_fn(prev_or_None, delta) ->
        DataFrame`` (full post-merge state for those buckets), write
        them as version ``v{batch_id}``, prune shadowed versions.

        Append protocol (constructor ``merge_fn`` set, r13 guide §6):
        write the RAW delta as bucketed ``d{batch_id}`` — one job, no
        pre-state read, commit I/O ∝ |delta|; ``read`` folds. Every
        ``compact_every`` pending deltas the commit compacts instead:
        a full ``v{batch_id}`` snapshot over the touched buckets plus
        every pending-delta bucket (the coverage invariant ``read``'s
        global cutoff relies on)."""
        spark = delta.sparkSession
        if self.is_batch_complete(spark, batch_id):
            return
        if self.merge_fn is not None:
            self._merge_batch_append(
                delta, batch_id, touched, materialize
            )
            return
        if merge_fn is None:
            raise TypeError(
                "merge_batch needs a merge_fn (argument or constructor)"
            )
        if touched is None:
            # r12 optimization: the delta plan used to run TWICE per
            # batch — once inside ``touched_buckets`` (distinct bucket
            # ids) and once again in the version write below. For the
            # sketch/flow maintainers the delta is a full aggregation
            # (window pass, tokenize+groupBy) over the micro-batch, so
            # the doubled execution was the dominant avoidable cost
            # (guide §1.2: remove duplicate passes before tuning
            # anything else). Materialize it once; both consumers then
            # read the cached blocks. Callers whose delta is already a
            # cheap projection of a checkpointed frame opt out with
            # ``materialize=False`` — for those the extra checkpoint
            # job costs more than the second cached scan it saves
            # (measured: st16 42→46 jobs, +2 s, before the opt-out).
            if materialize:
                # lazy checkpoint: the touched-bucket collect right
                # below is the first action over the frame, so ONE job
                # both materializes the checkpoint blocks and fetches
                # the bucket ids (eager=True spent a separate job on
                # materialization first); the version write then reads
                # the same blocks with lineage truncated either way
                delta = delta.localCheckpoint(eager=False)
            touched = self.touched_buckets(delta)
        if not touched:
            return
        prev = self.read(spark, before_batch=batch_id, buckets=touched)
        self._write_snapshot(spark, merge_fn(prev, delta), touched, batch_id)
        self._prune(spark, batch_id)

    def _write_snapshot(
        self,
        spark: SparkSession,
        merged: DataFrame,
        cover: set[int],
        batch_id: int,
    ) -> None:
        """Write ``merged`` as the full ``v{batch_id}`` snapshot of the
        ``cover`` buckets (tombstones guarantee every covered bucket
        materializes even when its post-merge state is empty)."""
        out = merged.withColumn("_pt", self.bucket_expr()).withColumn(
            "_tomb", F.lit(False)
        )
        # Emptied-bucket representation (ADVICE r9): a touched bucket
        # whose post-merge state is EMPTY writes no ``_pt=`` directory
        # under partitionBy, so the census would keep resolving it to
        # the older version and its stale rows would resurface. One
        # tombstone row per touched bucket guarantees every touched
        # bucket materializes in this version; tombstones ride the same
        # atomic parquet commit as the data (crash-safe — no separate
        # manifest file to lose between _SUCCESS and a sidecar write)
        # and are filtered out by ``read``.
        null_cols = [
            F.lit(None).cast(f.dataType).alias(f.name)
            for f in out.schema.fields
            if f.name not in ("_pt", "_tomb")
        ]
        tombs = (
            spark.createDataFrame(
                [(int(b),) for b in sorted(cover)], "_pt int"
            )
            .withColumn("_tomb", F.lit(True))
            .select(*null_cols, "_pt", "_tomb")
        )
        (
            # ONE file per touched bucket per version (r12 audit): the
            # state bytes are tiny next to the batch plan, so commit
            # cost is FILE-COUNT overhead — without this repartition
            # every upstream task holding a bucket's rows writes its
            # own fragment (32 files for 0.09 MB measured at sf0.1).
            # Hashing on _pt makes each bucket exactly one task's
            # output; buckets stay the parallelism unit at scale.
            out.unionByName(tombs)
            .repartition(F.col("_pt"))
            .write.partitionBy("_pt")
            .mode("overwrite")
            .parquet(f"{self.path}/v{batch_id}")
        )

    def _merge_batch_append(
        self,
        delta: DataFrame,
        batch_id: int,
        touched: set[int] | None,
        materialize: bool,
    ) -> None:
        """The append-protocol commit: write the raw delta as
        ``d{batch_id}``, or — once ``compact_every`` deltas are pending
        — fold everything into a full ``v{batch_id}`` snapshot."""
        spark = delta.sparkSession
        bases, deltas = self._census(spark)
        base_max = max(
            (v for vs in bases.values() for v in vs), default=-1
        )
        pending = [v for v in deltas if v > base_max]
        if len(pending) < self.compact_every:
            if touched is not None and not touched:
                return
            (
                delta.withColumn("_pt", self.bucket_expr())
                .repartition(F.col("_pt"))
                .write.partitionBy("_pt")
                .mode("overwrite")
                .parquet(f"{self.path}/d{batch_id}")
            )
            self._prune(spark, batch_id)
            return
        # compaction commit. Coverage MUST include every pending-delta
        # bucket, not just the batch's touched buckets — read()'s
        # global delta cutoff is only correct because a snapshot never
        # leaves a pending delta partially shadowed.
        if touched is None:
            if materialize:
                delta = delta.localCheckpoint(eager=False)
            touched = self.touched_buckets(delta)
        cover = set(touched)
        for v in pending:
            cover.update(deltas[v])
        if not cover:
            return
        prev = self.read(spark, before_batch=batch_id, buckets=cover)
        self._write_snapshot(
            spark, self.merge_fn(prev, delta), cover, batch_id
        )
        self._prune(spark, batch_id)

    def _prune(self, spark: SparkSession, batch_id: int) -> None:
        """Delete complete versions older than ``batch_id`` that are
        fully shadowed, with a ``keep_versions`` replay margin:

        - a base snapshot, when every bucket in it has ``keep_versions``
          newer complete BASE copies (per-bucket retention — no
          bucket's only or replay-needed copy is ever removed);
        - a delta, when ``keep_versions`` newer complete base snapshots
          exist (any base newer than a delta shadows it for every one
          of its buckets, by the compaction coverage invariant).
        """
        bases, deltas = self._census(spark)
        base_versions = sorted({v for vs in bases.values() for v in vs})
        fs, _, jvm = _fs_and_path(spark, self.path)
        for v in base_versions:
            if v >= batch_id:
                continue
            if all(
                sum(1 for x in vs if x > v) >= self.keep_versions
                for vs in bases.values()
                if v in vs
            ):
                fs.delete(
                    jvm.org.apache.hadoop.fs.Path(f"{self.path}/v{v}"), True
                )
        for v in sorted(deltas):
            if v >= batch_id:
                continue
            if (
                sum(1 for s in base_versions if s > v)
                >= self.keep_versions
            ):
                fs.delete(
                    jvm.org.apache.hadoop.fs.Path(f"{self.path}/d{v}"), True
                )
