"""Similarity search over embedding columns (SURVEY.md §2.10).

- ``brute_force_topk``: exact cosine top-k — the correctness baseline.
  One pass over the table, no shuffle except the final top-k reduction
  (Spark's TakeOrderedAndProject — per-partition heaps then driver merge).
- ``lsh_bucketed_topk``: random-hyperplane LSH as the 100 TB scale path —
  partition-prunes the scan to matching sign-buckets before scoring.

All dot products run in double precision in array order (zip_with +
aggregate), so scores are deterministic and engine-reproducible.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i in array order, double precision, JVM-side."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def pair_dot_arrow(a: Column, b: Column) -> Column:
    """Arrow batch twin of :func:`dot` for VECTOR-VECTOR columns (both
    sides vary per row — the pair-join verify, where the interpreted
    zip_with+aggregate fold is the whole job cost): accumulates over
    dimensions in array order, vectorized over rows, so every partial
    sum matches the sequential fold bit-for-bit (the ivf_assign kernel
    precedent — never BLAS, whose pairwise accumulation diverges).
    NULL or length-mismatched pairs yield NULL, matching zip_with's
    null propagation. ~50× faster per pair at dim 64."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _pair_dot(va: pd.Series, vb: pd.Series) -> pd.Series:
        xs, ys = va.tolist(), vb.tolist()
        ok = [
            x is not None and y is not None and len(x) == len(y)
            for x, y in zip(xs, ys)
        ]
        out = [None] * len(xs)
        # group valid rows by dim so ragged batches stay correct
        by_dim: dict[int, list[int]] = {}
        for j, o in enumerate(ok):
            if o:
                by_dim.setdefault(len(xs[j]), []).append(j)
        for d, idx in by_dim.items():
            A = np.array([np.asarray(xs[j], dtype=np.float64) for j in idx])
            B = np.array([np.asarray(ys[j], dtype=np.float64) for j in idx])
            acc = np.zeros(len(idx))
            for t in range(d):
                acc = acc + A[:, t] * B[:, t]
            for j, v in zip(idx, acc):
                out[j] = float(v)
        return pd.Series(out, dtype="float64")

    return _pair_dot(a, b)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine to a literal query vector.

    The query vector is a constant array literal — no join, no broadcast,
    stays inside whole-stage codegen. Ties broken by id for determinism.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), 6).alias("cos"),
    )
    return scored.orderBy(F.col("cos").desc(), F.col(id_col).asc()).limit(k)


def prefix_rerank_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    prefix_dims: int = 8,
    candidates: int = 100,
    k: int = 10,
) -> DataFrame:
    """Two-stage dimension-truncated rerank (the Matryoshka-retrieval
    pattern): stage 1 scores EVERY vector by the raw dot product of
    only the first ``prefix_dims`` dimensions against the query and
    keeps the top ``candidates`` (a cheap coarse pass — with
    MRL-trained embeddings the leading dims carry most of the signal,
    and at 100 TB a dimension-chunked layout would let the coarse scan
    read prefix/dim of the bytes); stage 2 computes the EXACT full-dim
    cosine only on those candidates and returns the top ``k``.

    Both stages end in TakeOrderedAndProject (per-partition heaps,
    driver merge of ``candidates`` rows — never a global sort), and
    stage 2's input is ``candidates`` rows, so the expensive full-dim
    math runs on a constant-size frame regardless of corpus size.
    Recall < 1 by design, bounded by how informative the prefix is;
    ties break by id in both stages so the approximate answer is
    deterministic and oracle-reproducible (coarse scores are
    sequential in-order double sums, the v1 precedent).
    """
    if prefix_dims < 1 or candidates < k:
        raise ValueError("need prefix_dims >= 1 and candidates >= k")
    qp = F.array(*[F.lit(float(x)) for x in query_vec[:prefix_dims]])
    qf = F.array(*[F.lit(float(x)) for x in query_vec])
    coarse = (
        df.select(
            F.col(id_col),
            F.col(vec_col),
            # 6-dp rounding BEFORE ranking: sub-ulp engine differences
            # collapse onto the id tiebreak instead of reordering
            F.round(
                dot(F.slice(F.col(vec_col), 1, prefix_dims), qp), 6
            ).alias("coarse_dot"),
        )
        .orderBy(F.col("coarse_dot").desc(), F.col(id_col).asc())
        .limit(candidates)
    )
    return (
        coarse.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), qf), 6).alias("cos"),
            F.col("coarse_dot"),
        )
        .orderBy(F.col("cos").desc(), F.col(id_col).asc())
        .limit(k)
    )


def normalize_vec(a: Column) -> Column:
    """L2-normalize an embedding column (JVM-side)."""
    n = norm(a)
    return F.transform(a, lambda x: x.cast("double") / n)


def quantize_int8(a: Column, scale: float = 127.0) -> Column:
    """Symmetric int8 quantization of a [-1,1]-normalized embedding —
    4× smaller shuffle/storage for recall-tolerant stages."""
    return F.transform(a, lambda x: F.round(x.cast("double") * scale).cast("tinyint"))


def scalar_quantized_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    scale: float = 127.0,
) -> DataFrame:
    """ANN over int8 scalar-quantized embeddings: L2-normalize, quantize
    each component to round(x·127) ∈ [−127, 127], rank by the INTEGER
    dot product. The 100 TB motivation is bandwidth: the scan reads/
    shuffles 4× fewer bytes per vector (int8 vs float32) and the scoring
    loop is integer arithmetic — the standard faiss SQ8 trade
    (recall loss bounded by the quantization step; measured in tests).

    Because scores are exact integers, the ranking is bit-deterministic
    and (unlike every float-scored ANN variant) hash-verifiable against
    a SQL oracle — quantization turns similarity search into exact
    arithmetic. Ties broken by id.
    """
    import math

    q = [float(x) for x in query_vec]
    nrm = math.sqrt(sum(x * x for x in q))
    if nrm == 0:
        raise ValueError("query vector has zero norm")
    # half-away-from-zero to match Spark/DuckDB ROUND (numpy/python
    # round are half-to-even — a real cross-engine trap on ±x.5)
    qq = [
        int(math.copysign(math.floor(abs(x / nrm * scale) + 0.5), x)) for x in q
    ]
    qlit = F.array(*[F.lit(int(x)).cast("int") for x in qq])
    quant = F.transform(
        normalize_vec(F.col(vec_col)),
        lambda x: F.round(x * scale).cast("int"),
    )
    qdot = F.aggregate(
        F.zip_with(quant, qlit, lambda a, b: (a * b).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    scored = df.select(F.col(id_col), qdot.alias("qdot"))
    return scored.orderBy(F.col("qdot").desc(), F.col(id_col).asc()).limit(k)


# ----------------------------------------------------------------- IVF --

def ivf_train(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 16,
    iters: int = 5,
) -> list[list[float]]:
    """Train IVF centroids with Lloyd's k-means, Spark-side.

    Deterministic: initial centroids are the k lowest-id vectors; each
    iteration is one distributed assign (narrow, broadcast centroids as
    literals) + one groupBy mean over exploded components. Only the k×dim
    centroid matrix ever reaches the driver.
    """
    init_rows = df.orderBy(F.col(id_col).asc()).limit(k).select(vec_col).collect()
    centroids = [list(map(float, r[0])) for r in init_rows]
    for _ in range(iters):
        assigned = ivf_assign(df, vec_col, centroids)
        comp = assigned.select(
            "cluster", F.posexplode(F.col(vec_col)).alias("pos", "x")
        )
        means = (
            comp.groupBy("cluster", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("ms"))
            .collect()
        )
        new = {r["cluster"]: [s["m"] for s in r["ms"]] for r in means}
        centroids = [new.get(i, c) for i, c in enumerate(centroids)]
    return centroids


def ivf_assign(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    method: str = "auto",
) -> DataFrame:
    """Add a ``cluster`` column: argmax cosine over the centroid list
    (ties → lowest cluster id). At scale, write the table partitioned
    by ``cluster`` so probes partition-prune.

    Two bit-identical implementations:

    - ``"expr"``: an array of (−cos, cid) structs reduced with
      array_min — no UDF, stays in the JVM. Cost grows with k·dim
      per row through interpreted higher-order functions, so it wins
      for small centroid lists (the nprobe gate queries use k = 8).
    - ``"arrow"``: one vectorized batch kernel that reproduces the
      SAME float64 arithmetic — dots accumulate in array order by
      looping over DIMENSIONS and vectorizing over rows (never BLAS,
      whose pairwise accumulation diverges), sqrt/divide/compare are
      IEEE-identical, and ties keep the first (lowest) cid. ~100×
      faster per row at k = 64; the assignment pass over a corpus is
      what SemDeDup ingest spends its time in.

    ``"auto"`` picks arrow when k ≥ 16. Equality of the two paths is
    pinned by tests/test_ivf_cli.py on real embeddings.
    """
    k = len(centroids)
    if method not in ("auto", "expr", "arrow"):
        raise ValueError("method must be 'auto', 'expr', or 'arrow'")
    use_arrow = method == "arrow" or (method == "auto" and k >= 16)
    if not use_arrow:
        cands = F.array(
            *[
                F.struct(
                    (-cosine(F.col(vec_col), F.array(*[F.lit(float(x)) for x in c]))).alias("d"),
                    F.lit(i).alias("cid"),
                )
                for i, c in enumerate(centroids)
            ]
        )
        return df.withColumn("cluster", F.array_min(cands).getField("cid"))

    import math

    from pyspark.sql.functions import pandas_udf

    cents = [[float(x) for x in c] for c in centroids]
    dim = len(cents[0])
    cnorms = []
    for c in cents:
        s = 0.0
        for x in c:
            s += x * x
        cnorms.append(math.sqrt(s))

    @pandas_udf("int")
    def _assign(vecs: pd.Series) -> pd.Series:
        # NULL / ragged rows get a NULL cluster (ADVICE r6: the expr
        # path NULL-propagates; an object-dtype np.array from a None
        # row would IndexError on the column slice below)
        vals = vecs.tolist()
        ok = [v is not None and len(v) == dim for v in vals]
        out = [None] * len(vals)
        idx = [j for j, o in enumerate(ok) if o]
        if idx:
            mat = np.array([np.asarray(vals[j], dtype=np.float64) for j in idx])
            n = mat.shape[0]
            # sequential-order ‖v‖²: accumulate over dims, vectorize rows
            vn2 = np.zeros(n)
            for t in range(dim):
                vn2 = vn2 + mat[:, t] * mat[:, t]
            vnorm = np.sqrt(vn2)
            best_d = np.full(n, np.inf)
            best = np.zeros(n, dtype=np.int64)
            for i, c in enumerate(cents):
                dot = np.zeros(n)
                for t in range(dim):
                    dot = dot + mat[:, t] * c[t]
                negcos = -(dot / (vnorm * cnorms[i]))
                better = negcos < best_d  # strict: equal keeps the lower cid
                best_d = np.where(better, negcos, best_d)
                best = np.where(better, i, best)
            for j, b in zip(idx, best):
                out[j] = int(b)
        return pd.Series(out, dtype="Int32")

    return df.withColumn("cluster", _assign(F.col(vec_col)))


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """IVF probe: score only the ``nprobe`` clusters nearest the query.

    Driver picks the probe clusters from the tiny centroid matrix; the
    cluster filter prunes the scan (partition pruning when the table is
    written partitioned by cluster), then exact cosine top-k inside.

    The probe cosines use plain left-to-right double sums (not BLAS
    np.dot, whose unrolled/pairwise accumulation is not IEEE-sequential)
    so a SQL engine's sequential list_dot_product reproduces the probe
    choice bit-for-bit — what lets q_v3 carry a hash oracle over frozen
    centroids. Ties → lowest cluster id (stable sort / ORDER BY j).
    """
    probe = _probe_cells(centroids, query_vec, nprobe)
    assigned = ivf_assign(df, vec_col, centroids)
    cands = assigned.filter(F.col("cluster").isin(probe))
    return brute_force_topk(cands, id_col, vec_col, query_vec, k)


def _probe_cells(
    centroids: list[list[float]], query_vec: list[float], nprobe: int
) -> list[int]:
    """The ``nprobe`` cluster ids nearest the query by cosine —
    driver-side over the tiny centroid matrix, sequential double sums
    (the ivf_topk bit-portability contract), ties → lowest id."""
    import math

    def _seqdot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += float(x) * float(y)
        return s

    q = [float(x) for x in query_vec]

    def cos(c):
        denom = (math.sqrt(_seqdot(c, c)) * math.sqrt(_seqdot(q, q))) or 1.0
        return _seqdot(c, q) / denom

    return sorted(range(len(centroids)), key=lambda i: -cos(centroids[i]))[
        :nprobe
    ]


def write_ivf_partitioned(
    df: DataFrame,
    path: str,
    vec_col: str,
    centroids: list[list[float]],
    mode: str = "overwrite",
) -> None:
    """Materialize an embeddings table PARTITIONED BY its IVF cell —
    the layout half of the 100 TB retrieval story. ``ivf_assign`` adds
    the ``cluster`` column and ``partitionBy("cluster")`` lays each
    cell out as its own directory, so a probe's cluster filter becomes
    a PARTITION filter: Spark's scan lists only the probed
    directories and never opens the rest (see ``ivf_topk_pruned``).
    One write job; at cluster scale add ``.option("maxRecordsPerFile",
    …)`` sizing to taste."""
    assigned = ivf_assign(df, vec_col, centroids)
    assigned.write.partitionBy("cluster").mode(mode).parquet(path)


def ivf_upsert(
    new_df: DataFrame,
    path: str,
    vec_col: str,
    centroids: list[list[float]],
) -> None:
    """Append new vectors into an existing IVF layout (r12, VERDICT
    r11 #6 — at 100 TB a corpus grows; rebuild-per-ingest doesn't).
    The new rows are assigned with the INDEX'S frozen centroids — no
    retrain — and appended into their cell directories, so the write
    touches ONLY the cells the new vectors land in and never rewrites
    existing data.

    Probe parity (pinned by test): cell assignment is a pure function
    of (vector, centroids), so a probe over the upserted index returns
    EXACTLY what a full rebuild over old ∪ new with the same centroids
    would — upsert changes bytes-on-disk layout, never results.

    Drift bound: recall (vs. exact search) degrades only insofar as
    the INCOMING distribution drifts from the centroid fit — cells get
    imbalanced, and a probe's nprobe cells cover less of the true
    neighborhood mass. The index stays CORRECT for its semantics
    (exact top-k within probed cells) at any drift; re-train centroids
    and rebuild when cell-size skew (one tiny groupBy) crosses taste.
    Repeated upserts accumulate small files per cell — run
    :func:`ivf_compact` on the touched cells."""
    ivf_assign(new_df, vec_col, centroids).write.partitionBy(
        "cluster"
    ).mode("append").parquet(path)


def ivf_compact(
    spark,
    path: str,
    cells: list[int] | None = None,
) -> None:
    """Rewrite IVF cell directories accumulated by :func:`ivf_upsert`
    into ONE file each — small-file hygiene so probe scans stay
    one-seek-per-cell (cells compact in parallel: the shuffle hashes
    on the cell id, so each lands wholly in one task). Dynamic
    partition overwrite rewrites ONLY the cells present in the
    compaction frame (pass ``cells`` to bound it to the
    upsert-touched set); untouched directories keep their files
    byte-identical.

    The touched-cells frame is checkpointed before the overwrite (a
    parquet path cannot be read and overwritten in one plan); the
    materialized slice is bounded by the cells being compacted. At
    true 100 TB cell sizes, compact cell-by-cell (several calls) to
    bound the checkpoint."""
    df = spark.read.parquet(path)
    if cells is not None:
        df = df.filter(F.col("cluster").isin([int(c) for c in cells]))
    df = df.repartition(F.col("cluster")).localCheckpoint(eager=True)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.partitionBy("cluster").mode("overwrite").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def ivf_topk_pruned(
    spark,
    path: str,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    where: Column | None = None,
) -> DataFrame:
    """IVF probe over a cell-partitioned table (``write_ivf_partitioned``):
    the driver picks the probe cells from the centroid matrix (tiny,
    sequential double math — identical choice to ``ivf_topk``), and the
    ``cluster IN (...)`` predicate on the partition column prunes the
    SCAN itself — ``nprobe/k`` of the directories are listed and read,
    the rest never open. This is the difference that matters at 100 TB:
    ``ivf_topk`` scores fewer rows but still READS the corpus;
    this probe reads only the probed cells' bytes. Semantics are
    identical to ``ivf_topk`` on the same centroids (same probe set,
    same exact-cosine top-k inside), so the same oracle verifies both.

    ``where`` (optional) is a metadata predicate — FILTERED vector
    search, the "top-k among rows matching an attribute filter" query
    every production vector store serves. Pre-filter semantics: the
    predicate restricts the candidate set BEFORE the top-k, so the
    result is the true top-k of the filtered set (never k minus
    casualties of a post-filter). Because it is applied at the scan it
    composes with the partition pruning — the cluster filter prunes
    DIRECTORIES, the row predicate pushes into the parquet reader of
    the survivors (PushedFilters beside PartitionFilters in the same
    scan node) — so a filtered probe reads the probed cells' bytes and
    row-group-skips inside them, nothing else."""
    probe = _probe_cells(centroids, query_vec, nprobe)
    cands = spark.read.parquet(path).where(
        F.col("cluster").isin([int(p) for p in probe])
    )
    if where is not None:
        cands = cands.where(where)
    return brute_force_topk(cands, id_col, vec_col, query_vec, k)


def ivf_topk_batch(
    spark,
    path: str,
    queries: DataFrame,
    qid_col: str,
    qvec_col: str,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """BATCH (multi-query) IVF probe over a cell-partitioned table —
    the retrieval SERVING shape (r12): a whole batch of queries
    answered in ONE corpus pass instead of |Q| separate probes.

    1. Per-query probe cells are computed Spark-side against the
       centroid literal (the ivf_assign (−cos, cid) struct device,
       exploded; top-``nprobe`` per query via a qid-partitioned rank
       window — |Q|·|C| rows, tiny).
    2. The UNION of probed cells (≤ |centroids| values — ONE bounded
       collect, the lsh_bucketed_topk discipline) prunes the SCAN:
       ``cluster IN (...)`` is a PartitionFilter, so only directories
       some query probes are listed and read — per-batch IO is the
       probed-cell union's bytes, amortized across all queries that
       share a cell.
    3. Candidates join the broadcast (qid, cell, qvec) pairs on the
       cell id (each row lives in exactly one cell → no fan-out beyond
       queries-per-cell), exact cosine per pair, and per-query top-k
       via a qid-partitioned rank window (never a global sort).

    Semantics per query are IDENTICAL to :func:`ivf_topk_pruned` on
    the same centroids (same probe rule: raw −cos ties → lowest cell;
    same rounded-cosine (cos, id) ranking), so the single-query oracle
    device verifies the batch path. Output: (query id, ``id_col``,
    cos, rank), k rows per query.
    """
    from pyspark.sql import Window

    cands = F.array(
        *[
            F.struct(
                (
                    -cosine(
                        F.col(qvec_col),
                        F.array(*[F.lit(float(x)) for x in c]),
                    )
                ).alias("d"),
                F.lit(i).alias("cid"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    q = queries.select(
        F.col(qid_col).alias("_qid"),
        F.col(qvec_col).alias("_qe"),
        F.explode(cands).alias("_c"),
    ).select("_qid", "_qe", F.col("_c.d").alias("_d"), F.col("_c.cid").alias("_cid"))
    wq = Window.partitionBy("_qid").orderBy(F.col("_d").asc(), F.col("_cid").asc())
    probe = (
        q.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select("_qid", "_qe", "_cid")
        .localCheckpoint(eager=True)
    )
    cells = sorted(
        {r[0] for r in probe.select("_cid").distinct().collect()}
    )
    cand = spark.read.parquet(path).where(
        F.col("cluster").isin([int(c) for c in cells])
    )
    scored = cand.join(
        F.broadcast(probe), cand["cluster"] == probe["_cid"]
    ).select(
        F.col("_qid").alias("query_id"),
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col("_qe")), 6).alias("cos"),
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
    )


def hyperplane_buckets(
    df: DataFrame, vec_col: str, dim: int, n_planes: int = 8, seed: int = 42
) -> DataFrame:
    """Add a ``bucket`` column: sign-bit string of dot products with
    ``n_planes`` fixed random hyperplanes (deterministic seed).

    At scale, write the table partitioned/bucketed by this column; a query
    then scans only its own bucket (and optionally Hamming-adjacent ones
    for higher recall).
    """
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim))
    bits = [
        F.when(dot(F.col(vec_col), F.array(*[F.lit(float(v)) for v in plane])) >= 0, "1").otherwise("0")
        for plane in planes
    ]
    return df.withColumn("bucket", F.concat(*bits))


def lsh_bucketed_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    min_candidates: int | None = None,
    max_hamming: int | None = None,
) -> DataFrame:
    """Approximate top-k: score only rows in (or near) the query's bucket.

    Recall < 1 by construction; n_planes trades recall vs. candidate-set
    size (each plane halves the expected candidates).

    Bucket-underfill fallback: when the query's own bucket holds fewer
    than ``min_candidates`` rows (default: k), the scan widens to
    Hamming-adjacent buckets — nearest sign-patterns first — until the
    candidate pool is large enough or ``max_hamming`` is reached. Bucket
    populations come from ONE tiny aggregation (≤ 2^n_planes groups,
    map-side combined); at scale these stats live in table metadata and
    the probe set is decided driver-side either way, so the candidate
    scan stays partition-pruned to the chosen buckets.
    """
    min_candidates = k if min_candidates is None else min_candidates
    max_hamming = n_planes if max_hamming is None else max_hamming
    qbits = _query_sign_bits(query_vec, dim, n_planes, seed)
    bucketed = hyperplane_buckets(df, vec_col, dim, n_planes, seed)
    counts = {
        r["bucket"]: r["n"]
        for r in bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    probe = _lsh_probe_set(counts, qbits, min_candidates, max_hamming)
    candidates = bucketed.filter(F.col("bucket").isin(probe))
    return brute_force_topk(candidates, id_col, vec_col, query_vec, k)


def _query_sign_bits(
    query_vec: list[float], dim: int, n_planes: int, seed: int
) -> str:
    """The query's hyperplane sign-bit string — sequential double dots
    (not BLAS np.dot) so the bits match the engine-side
    zip_with+aggregate / a SQL engine's list_dot_product bit-for-bit:
    the hash-oracle portability rule."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim))

    def _seqdot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += float(x) * float(y)
        return s

    return "".join(
        "1" if _seqdot(plane, query_vec) >= 0 else "0" for plane in planes
    )


def _lsh_probe_set(
    counts: dict[str, int], qbits: str, min_candidates: int, max_hamming: int
) -> list[str]:
    """Occupied buckets to probe, nearest sign-pattern first (ties
    lexicographic), widening until the candidate pool reaches
    ``min_candidates``. ``max_hamming`` is a STRICT radius: buckets
    beyond it are never probed, even when every bucket inside it is
    empty (the result may then be empty/short — the caller chose
    precision over recall)."""

    def hamming(b: str) -> int:
        return sum(x != y for x, y in zip(b, qbits))

    probe: list[str] = []
    pool = 0
    for b in sorted(counts, key=lambda b: (hamming(b), b)):
        if hamming(b) > max_hamming or (probe and pool >= min_candidates):
            break
        probe.append(b)
        pool += counts[b]
    return probe


def write_lsh_partitioned(
    df: DataFrame,
    path: str,
    vec_col: str,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    mode: str = "overwrite",
) -> None:
    """Materialize an embeddings table PARTITIONED BY its LSH sign-bit
    bucket — the hyperplane twin of ``write_ivf_partitioned``. The
    partition value is prefixed ``b`` (``b01100101``) so Spark's
    partition-type inference can never mis-read a bitstring as an
    integer and drop leading zeros; readers re-derive the plain
    ``bucket`` column by stripping it."""
    bucketed = hyperplane_buckets(df, vec_col, dim, n_planes, seed)
    (
        bucketed.withColumn(
            "bucket_pt", F.concat(F.lit("b"), F.col("bucket"))
        )
        .drop("bucket")
        .write.partitionBy("bucket_pt")
        .mode(mode)
        .parquet(path)
    )


def lsh_topk_pruned(
    spark,
    path: str,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    min_candidates: int | None = None,
    max_hamming: int | None = None,
) -> DataFrame:
    """LSH probe over a bucket-partitioned table
    (``write_lsh_partitioned``): bucket occupancies come from an
    aggregate over the PARTITION column only (directory metadata, no
    vector bytes), the widening loop picks the probe set driver-side
    exactly as ``lsh_bucketed_topk`` does, and the ``bucket_pt IN``
    predicate prunes the scan to the probed directories. Identical
    answer to ``lsh_bucketed_topk`` on the same planes/knobs (same
    probe set, same exact-cosine top-k), so the same oracle verifies
    both — the v12 contract extended to the hyperplane path."""
    min_candidates = k if min_candidates is None else min_candidates
    max_hamming = n_planes if max_hamming is None else max_hamming
    qbits = _query_sign_bits(query_vec, dim, n_planes, seed)
    table = spark.read.parquet(path)
    counts = {
        r["bucket_pt"][1:]: r["n"]
        for r in table.groupBy("bucket_pt")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    probe = _lsh_probe_set(counts, qbits, min_candidates, max_hamming)
    candidates = table.filter(
        F.col("bucket_pt").isin([f"b{b}" for b in probe])
    )
    return brute_force_topk(candidates, id_col, vec_col, query_vec, k)


# ------------------------------------------------------------------ PCA --

def pca_train(df: DataFrame, vec_col: str, dim: int, k: int):
    """Distributed PCA training: ONE pass of Arrow-batched partial
    statistics (count, component sums, outer-product sums per batch) —
    only O(partitions) rows of dim + dim² floats reach the driver, where
    numpy eigendecomposes the tiny dim×dim covariance. Returns
    (mean: list[dim], components: list[k][dim] row-major,
    explained_ratio: list[k]).

    Sign convention: each component's largest-|coefficient| entry is
    made positive, so results are deterministic (eigenvectors are
    otherwise sign-ambiguous).
    """
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    schema = "n long, s array<double>, o array<double>"

    def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n, s, o = 0, np.zeros(dim), np.zeros((dim, dim))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            n += m.shape[0]
            s += m.sum(axis=0)
            o += m.T @ m
        if n:
            yield pd.DataFrame({"n": [n], "s": [s.tolist()], "o": [o.ravel().tolist()]})

    parts = df.select(vec_col).mapInPandas(_partial, schema).collect()
    if not parts:
        raise ValueError("pca_train: empty input")
    n = sum(r["n"] for r in parts)
    s = np.sum([np.array(r["s"]) for r in parts], axis=0)
    o = np.sum([np.array(r["o"]).reshape(dim, dim) for r in parts], axis=0)
    mean = s / n
    cov = o / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps, ratios = [], []
    total = float(np.clip(evals.sum(), 1e-300, None))
    for idx in order:
        v = evecs[:, idx]
        if v[np.argmax(np.abs(v))] < 0:
            v = -v
        comps.append(v.tolist())
        ratios.append(float(evals[idx] / total))
    return mean.tolist(), comps, ratios


def pca_project(
    df: DataFrame, id_col: str, vec_col: str, mean: list, components: list
) -> DataFrame:
    """Project vectors onto trained components — pure JVM expressions:
    p_j = dot(x, W_j) - dot(mean, W_j) (the mean-centering folds into a
    per-component constant). Narrow, zero shuffle. Output: (id, p0..pk-1).
    """
    outs = []
    for j, comp in enumerate(components):
        w = F.array(*[F.lit(float(c)) for c in comp])
        offset = float(sum(m * c for m, c in zip(mean, comp)))
        outs.append((dot(F.col(vec_col), w) - F.lit(offset)).alias(f"p{j}"))
    return df.select(F.col(id_col), *outs)


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str,
    k: int = 10,
    exclude_self: bool = True,
    method: str = "auto",
) -> DataFrame:
    """Batch exact k-NN join: for EVERY query row, the ``k`` most
    cosine-similar corpus rows — the retrieval primitive behind
    near-dup mining, eval-set contamination lookups, and hard-negative
    selection. Output: (query id, rank, corpus id, cos).

    Shape: the query side broadcasts (this exact path is for bounded
    query sets — eval suites, probe batches; for query sets at corpus
    scale use the LSH/IVF buckets so candidates stay pruned), the
    corpus streams through one narrow pass scoring |Q| pairs per row,
    and a per-query window keeps the top k. Ties break on the corpus
    id. ``exclude_self`` drops the query row itself when both sides
    come from the same table (matching ids).

    r7: norms are computed once per SIDE (|Q| + |C| folds instead of
    |Q|·|C|·2) and the per-pair dot defaults to the ``pair_dot_arrow``
    batch kernel — both bit-identical to the interpreted fold (the
    embedding_neardup_pairs rework; ``method='expr'`` keeps the pure-
    JVM baseline the kernel is pinned against).
    """
    from pyspark.sql import Window

    if method not in ("auto", "expr", "arrow"):
        raise ValueError("method must be 'auto', 'expr', or 'arrow'")
    qb = F.broadcast(
        queries.select(
            F.col(query_id).alias("_qid"), F.col(vec_col).alias("_qv"),
            norm(F.col(vec_col)).alias("_qn"),
        )
    )
    pairs = corpus.select(
        F.col(corpus_id).alias("_cid"), F.col(vec_col).alias("_cv"),
        norm(F.col(vec_col)).alias("_cn"),
    ).join(qb, F.lit(True))
    if exclude_self:
        pairs = pairs.filter(F.col("_cid") != F.col("_qid"))
    dot_pair = (
        dot(F.col("_cv"), F.col("_qv"))
        if method == "expr"
        else pair_dot_arrow(F.col("_cv"), F.col("_qv"))
    )
    scored = pairs.select(
        "_qid",
        "_cid",
        F.round(dot_pair / (F.col("_cn") * F.col("_qn")), 6).alias("cos"),
    )
    w = Window.partitionBy("_qid").orderBy(F.col("cos").desc(), F.col("_cid").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            F.col("_qid").alias(query_id),
            "rk",
            F.col("_cid").alias(corpus_id + "_nn"),
            "cos",
        )
    )


# ------------------------------------------------------------------- PQ --


def _l2_expr(a: Column, lit_vec: list[float]) -> Column:
    b = F.array(*[F.lit(float(x)) for x in lit_vec])
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _kmeans_l2(df: DataFrame, id_col: str, vec_col: str, k: int, iters: int):
    """Deterministic Lloyd's k-means under L2 (init = k lowest-id
    vectors) — the subspace trainer for PQ. Same driver contract as
    ivf_train: only k×sub_dim floats ever leave the cluster."""
    init_rows = df.orderBy(F.col(id_col).asc()).limit(k).select(vec_col).collect()
    cents = [list(map(float, r[0])) for r in init_rows]
    for _ in range(iters):
        cands = F.array(
            *[
                F.struct(_l2_expr(F.col(vec_col), c).alias("d"), F.lit(i).alias("cid"))
                for i, c in enumerate(cents)
            ]
        )
        assigned = df.withColumn("_c", F.array_min(cands).getField("cid"))
        comp = assigned.select("_c", F.posexplode(F.col(vec_col)).alias("pos", "x"))
        means = (
            comp.groupBy("_c", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .groupBy("_c")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("ms"))
            .collect()
        )
        new = {r["_c"]: [s["m"] for s in r["ms"]] for r in means}
        cents = [new.get(i, c) for i, c in enumerate(cents)]
    return cents


def pq_train(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 4,
    ksub: int = 16,
    iters: int = 3,
) -> list[list[list[float]]]:
    """Train product-quantization codebooks (Jégou et al. 2011, the
    faiss PQ shape): split the dimension into ``m`` subspaces, k-means
    each independently. Returns m codebooks of ksub sub-centroids.

    Compression: a dim-float32 vector becomes m uint8 codes — 64-dim ×
    4 B = 256 B down to 4 B at m=4 (64×), while ADC distances stay
    useful. The memory/bandwidth lever that makes billion-vector ANN
    fit a cluster at all; SQ8 (v6) is the gentler 4× sibling.
    """
    first = df.select(vec_col).head()
    if first is None:
        raise ValueError("empty input")
    dim = len(first[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    books = []
    for j in range(m):
        sliced = df.select(
            F.col(id_col), F.slice(F.col(vec_col), j * sub + 1, sub).alias("_sub")
        )
        books.append(_kmeans_l2(sliced, id_col, "_sub", ksub, iters))
    return books


def pq_encode(
    df: DataFrame, vec_col: str, codebooks: list[list[list[float]]],
    out_col: str = "codes",
) -> DataFrame:
    """Encode vectors to their PQ codes: per subspace, the L2-nearest
    sub-centroid id (ties → lowest id via the struct compare). Pure
    narrow expression — encoding 100 TB of embeddings is scan-bound."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    parts = []
    for j, book in enumerate(codebooks):
        piece = F.slice(F.col(vec_col), j * sub + 1, sub)
        cands = F.array(
            *[
                F.struct(_l2_expr(piece, c).alias("d"), F.lit(i).alias("cid"))
                for i, c in enumerate(book)
            ]
        )
        parts.append(F.array_min(cands).getField("cid"))
    return df.withColumn(out_col, F.array(*parts))


def pq_topk(
    encoded: DataFrame,
    id_col: str,
    codes_col: str,
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    k: int = 10,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: the query stays full-precision;
    each subspace contributes a PRECOMPUTED lookup-table entry
    lut[j][code] = ‖query_sub_j − centroid‖², so scoring a vector is m
    array-index adds — no per-row vector math at all. The m×ksub table
    is computed driver-side (tiny) and inlined as literals; the scan
    reads ONLY the m-byte codes column. Ties → lowest id."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    score = F.lit(0.0)
    for j, book in enumerate(codebooks):
        q = query_vec[j * sub : (j + 1) * sub]
        lut = [sum((float(a) - float(b)) ** 2 for a, b in zip(q, c)) for c in book]
        score = score + F.array(*[F.lit(v) for v in lut])[
            F.col(codes_col)[j]
        ]
    scored = encoded.select(
        F.col(id_col), F.round(score, 6).alias("adc_dist")
    )
    return scored.orderBy(F.col("adc_dist").asc(), F.col(id_col).asc()).limit(k)


def pq_adc_topk_int(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks_int: list[list[list[int]]],
    query_vec: list[float],
    k: int = 10,
    scale: int = 1000,
) -> DataFrame:
    """Hash-exact PQ ADC top-k over FROZEN integer codebooks — the v6
    SQ8 trick lifted to product quantization: every arithmetic step is
    integer, so the ranking is bit-portable across engines and the
    query graduates from rows-only to a DuckDB hash oracle.

    The deployment shape this mirrors is the real one: codebooks are a
    SHIPPED model artifact (trained offline once with :func:`pq_train`,
    coordinates rounded to ``round(x·scale)`` ints), while the
    production path — encode + ADC scoring — runs at ingest/query time.
    Per row: quantize the vector to ``round(x·scale)`` ints, pick the
    L2-nearest sub-centroid per subspace in integer space (ties →
    lowest code id via the struct compare), and score as the sum of
    the per-subspace integer lookup-table entries
    ``lut[j][code] = ‖q_int_sub − centroid_int‖²`` (computed
    driver-side from the full-precision query). The kernel is one
    vectorized Arrow batch (see inline note) — the plan is
    scan → ArrowEval → TakeOrderedAndProject: reads only the vector
    column, no join, no shuffle beyond the top-k reduction.
    """
    import math

    m = len(codebooks_int)
    sub = len(codebooks_int[0][0])
    # half-away-from-zero, matching Spark's F.round and DuckDB's round —
    # Python's built-in round is banker's and would flip exact-.5 cases
    qint = [
        int(math.floor(abs(float(x) * scale) + 0.5))
        * (1 if float(x) >= 0 else -1)
        for x in query_vec
    ]
    if len(qint) != m * sub:
        raise ValueError(f"query dim {len(qint)} != m*sub = {m * sub}")
    # Encode + ADC as ONE vectorized Arrow batch kernel. This is the
    # sanctioned Pandas-UDF case: the exact argmin needs m·ksub·sub
    # (here 1024) squared-diff terms per row, which as a Column tree
    # costs seconds of py4j construction per query build and falls out
    # of whole-stage codegen (interpreted eval measured ~1 ms/row); as
    # a zip_with/aggregate HOF chain it's per-element lambda dispatch.
    # numpy broadcasting does the same integer math at memory bandwidth
    # (µs per row), stays bit-exact (int64 throughout), and the plan
    # stays narrow: scan → ArrowEval → TakeOrderedAndProject. In a real
    # deployment the codes are precomputed at ingest (pq_encode); this
    # kernel is the query-time path over raw vectors.
    from pyspark.sql.functions import pandas_udf

    books = np.asarray(codebooks_int, dtype=np.int64)  # (m, ksub, sub)
    luts = np.array(
        [
            [
                sum((qi - int(ci)) ** 2 for qi, ci in zip(qint[j * sub :], c))
                for c in codebooks_int[j]
            ]
            for j in range(m)
        ],
        dtype=np.int64,
    )  # (m, ksub)

    @pandas_udf("long")
    def _adc(vecs: pd.Series) -> pd.Series:
        mat = np.array([np.asarray(v, dtype=np.float64) for v in vecs]) * scale
        # half-away-from-zero (np.round is banker's)
        q = (np.floor(np.abs(mat) + 0.5) * np.sign(mat)).astype(np.int64)
        total = np.zeros(len(vecs), dtype=np.int64)
        for j in range(m):
            piece = q[:, j * sub : (j + 1) * sub]  # (n, sub)
            diff = piece[:, None, :] - books[j][None, :, :]  # (n, ksub, sub)
            dists = np.einsum("nks,nks->nk", diff, diff)
            codes = np.argmin(dists, axis=1)  # first min = lowest cid
            total += luts[j][codes]
        return pd.Series(total)

    return (
        df.select(F.col(id_col), _adc(F.col(vec_col)).alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
        .limit(k)
    )


def ivfpq_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """IVF + PQ composed (the faiss IVFPQ shape): coarse-quantize to
    prune the scan to ``nprobe`` clusters, then rank the survivors by
    PQ ADC distance — the two memory/compute levers multiplied: the
    cluster filter skips (1 − nprobe/k_coarse) of the data (partition
    pruning when stored partitioned by cluster) and the ADC pass reads
    only m-byte codes. In a real deployment codes are PRECOMPUTED at
    ingest (pq_encode once, stored beside the cluster id); this
    convenience wrapper encodes on the fly for ad-hoc queries.

    Probe cosines use sequential double sums (see ivf_topk) so the
    probe choice is engine-reproducible."""
    import math

    def _seqdot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += float(x) * float(y)
        return s

    q = [float(x) for x in query_vec]

    def cos(c):
        denom = (math.sqrt(_seqdot(c, c)) * math.sqrt(_seqdot(q, q))) or 1.0
        return _seqdot(c, q) / denom

    probe = sorted(range(len(centroids)), key=lambda i: -cos(centroids[i]))[:nprobe]
    cands = ivf_assign(df, vec_col, centroids).filter(F.col("cluster").isin(probe))
    enc = pq_encode(cands, vec_col, codebooks)
    return pq_topk(enc, id_col, "codes", query_vec, codebooks, k)


def pool_embeddings(
    df: DataFrame,
    group_col,
    vec_col: str,
    dim: int,
    normalize: bool = True,
) -> DataFrame:
    """Mean-pool chunk embeddings into one vector per group (the
    multi-vector → document representation step: chunk a long doc,
    embed each chunk, pool back) with optional L2 normalization.

    Plan shape: ONE hash aggregate with ``dim`` map-side-combined
    ``avg`` columns — never an explode of n·dim rows, so the shuffle
    carries one partial row per (group, partition) regardless of chunk
    count. The array is assembled AFTER the agg from the dim scalar
    averages.

    Output: (group, pooled array<double>, l2_norm). An all-zero mean
    vector (l2_norm = 0) is returned unnormalized rather than divided
    by zero into NULL elements.
    """
    if dim < 1:
        raise ValueError("dim must be ≥ 1")
    v = F.col(vec_col)
    gcol = F.col(group_col) if isinstance(group_col, str) else group_col
    aggs = [
        F.avg(F.element_at(v, i + 1).cast("double")).alias(f"_d{i}")
        for i in range(dim)
    ]
    g = df.groupBy(gcol.alias("group")).agg(*aggs)
    arr = F.array(*[F.col(f"_d{i}") for i in range(dim)])
    norm = F.sqrt(
        sum((F.col(f"_d{i}") * F.col(f"_d{i}") for i in range(dim)), F.lit(0.0))
    )
    if normalize:
        # zero-guard: x / 0.0 is NULL in Spark SQL — an all-zero mean
        # vector must pool to itself, not to an array of NULLs
        pooled = F.when(
            F.col("l2_norm") > 0.0,
            F.transform(arr, lambda x: x / F.col("l2_norm")),
        ).otherwise(arr)
    else:
        pooled = arr
    return (
        g.withColumn("l2_norm", norm)
        .select("group", pooled.alias("pooled"), F.round("l2_norm", 6).alias("l2_norm"))
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str,
    rank_col: str = "rank",
    c: int = 60,
    k: int = 10,
    score_mode: str = "exact",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack & Clarke 2009) of N ranked lists:
    score(d) = Σ_present 1/(c + rank_i(d)), the standard hybrid-retrieval
    combiner (BM25 ⊕ dense ANN).

    Bit-portability: the score is kept as an EXACT integer rational —
    ``rrf_num / rrf_den`` accumulated stepwise (a/b + 1/(c+r) =
    (a·(c+r) + b) / (b·(c+r))), so the output columns are all integers
    and the only float op is the final ordering division, a single
    correctly-rounded IEEE op identical in any engine. Denominator
    magnitude is Π(c+rankᵢ) ≤ (c+max_rank)ᴺ, which overflows int64
    silently for enough deep lists (10 lists of rank ~1000 ≈ 10³⁰) and
    would corrupt the ordering — so the bound is CHECKED eagerly: the
    actual max rank of each list is fetched (one 1-value agg per list,
    the lists are bounded top-N frames) and the call raises if
    Σ log2(c+max_rankᵢ) could reach 63 bits, directing the caller to
    ``score_mode="double"`` (plain Σ 1/(c+rankᵢ) as a double ``rrf_score``
    column — not bit-portable across engines, but overflow-free).

    Scale shape: each ranking is already a bounded top-N list (the
    expensive scoring happened upstream), so the lists are stacked with
    a union and fused by ONE hash aggregate over Σ top-N rows — no join
    of any kind (a full-outer join can't broadcast, and would hand
    Catalyst a SortMergeJoin for two 30-row frames). The stacked frame
    is eagerly checkpointed FIRST, so the upstream scoring pipelines
    run exactly once: the r8 regression here was the overflow guard's
    per-list max-rank agg re-running the whole BM25/ANN scoring once
    per list before the fusion recomputed it again. Missing ranks
    contribute nothing (the rational simply skips the step).

    Output: (id, rank_1..rank_N nullable, rrf_num, rrf_den), top-``k``
    by score with id tie-break. With ``score_mode="double"`` the two
    rational columns are replaced by one ``rrf_score`` double.
    """
    import math

    if not rankings:
        raise ValueError("rankings must be non-empty")
    if c < 1:
        raise ValueError("c must be >= 1")
    if score_mode not in ("exact", "double"):
        raise ValueError("score_mode must be 'exact' or 'double'")
    n = len(rankings)
    stacked = None
    for i, r in enumerate(rankings, start=1):
        side = r.select(
            F.col(id_col),
            F.lit(i).alias("_list"),
            F.col(rank_col).cast("bigint").alias("_r"),
        )
        stacked = side if stacked is None else stacked.unionByName(side)
    # bounded materialization (Σ top-N rows): every downstream action —
    # the overflow guard and the fusion — reads these blocks instead of
    # re-running the scoring pipelines
    stacked = stacked.localCheckpoint(eager=True)
    fused = stacked.groupBy(id_col).agg(
        *[
            F.max(F.when(F.col("_list") == i, F.col("_r"))).alias(f"rank_{i}")
            for i in range(1, n + 1)
        ]
    )
    if score_mode == "double":
        score = sum(
            (
                F.coalesce(
                    F.lit(1.0) / (F.col(f"rank_{i}") + F.lit(c)).cast("double"),
                    F.lit(0.0),
                )
                for i in range(1, len(rankings) + 1)
            ),
            F.lit(0.0),
        )
        scored = fused.select(
            F.col(id_col),
            *[F.col(f"rank_{i}") for i in range(1, len(rankings) + 1)],
            score.alias("rrf_score"),
        )
        return scored.orderBy(
            F.col("rrf_score").desc(), F.col(id_col).asc()
        ).limit(k)
    # overflow guard for the exact rational: refuse if Π(c+max_rankᵢ)
    # could reach 2⁶³. ONE ≤N-row agg over the already-materialized
    # stacked frame — never a re-run of the upstream scoring (that was
    # the r8 v9 regression: one full pipeline re-run per list)
    maxes = {
        row["_list"]: row["_mr"]
        for row in stacked.groupBy("_list").agg(F.max("_r").alias("_mr")).collect()
    }
    bits = sum(
        math.log2(c + int(maxes.get(i) or 1)) for i in range(1, n + 1)
    )
    if bits >= 63.0:
        raise ValueError(
            f"rrf_fuse: exact rational denominator needs ~{bits:.1f} bits "
            "(> int64) for these list depths — pass score_mode='double'"
        )
    num, den = F.lit(0).cast("bigint"), F.lit(1).cast("bigint")
    for i in range(1, len(rankings) + 1):
        step = F.col(f"rank_{i}") + F.lit(c)
        num = F.when(step.isNotNull(), num * step + den).otherwise(num)
        den = F.when(step.isNotNull(), den * step).otherwise(den)
    scored = fused.select(
        F.col(id_col),
        *[F.col(f"rank_{i}") for i in range(1, len(rankings) + 1)],
        num.alias("rrf_num"),
        den.alias("rrf_den"),
    )
    order = F.col("rrf_num").cast("double") / F.col("rrf_den").cast("double")
    return scored.orderBy(order.desc(), F.col(id_col).asc()).limit(k)


def recall_at_k(
    exact: DataFrame, approx: DataFrame, id_col: str, k: int
) -> DataFrame:
    """ANN evaluation harness: recall@k of an approximate top-k result
    against the exact one — |approx ∩ exact| / min(k, |exact|), as a
    1-row frame (k, n_overlap, recall 6dp). The denominator is the
    ACHIEVABLE overlap: on a corpus smaller than k the exact frame has
    fewer than k rows and dividing by the literal k would understate
    recall and cap it below 1.0. Both inputs are top-k frames (≤ k
    rows), so the intersection is a broadcast join of two k-row sides;
    at corpus scale the cost is producing the inputs, never the eval.
    The recall metric every ANN deployment tracks next to its latency
    knob (nprobe, prefix dims, bucket widening)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    ex = exact.select(F.col(id_col).alias("_id"))
    hits = ex.join(
        F.broadcast(approx.select(F.col(id_col).alias("_id"))), "_id"
    )
    n_exact = ex.agg(F.count(F.lit(1)).cast("int").alias("_n_exact"))
    return (
        hits.agg(F.count(F.lit(1)).cast("int").alias("n_overlap"))
        .crossJoin(F.broadcast(n_exact))
        .select(
            F.lit(k).alias("k"),
            F.col("n_overlap"),
            F.round(
                F.col("n_overlap").cast("double")
                / F.least(F.lit(k), F.col("_n_exact")).cast("double"),
                6,
            ).alias("recall"),
        )
    )


def _lcm_1_to(k: int) -> int:
    from math import gcd

    out = 1
    for i in range(2, k + 1):
        out = out * i // gcd(out, i)
    return out


def ranking_eval(
    exact: DataFrame,
    approx: DataFrame,
    id_col: str,
    k: int,
    score_col: str = "cos",
) -> DataFrame:
    """Order-sensitive ANN evaluation: MRR and average precision of an
    approximate top-k ranking against the exact top-k as (binary)
    relevance — the metrics that distinguish "found the right ids" from
    "ranked them first", next to :func:`recall_at_k`'s set overlap.

    The approximate order is (``score_col`` desc, id asc) — the same
    tie rule every top-k builder here emits — and both metrics are
    computed in EXACT integer arithmetic so the result is
    bit-reproducible by a SQL oracle: with L = lcm(1..k), each AP term
    hits(i)·(L div i) is an exact int64 (i divides L), so
    AP = Σterms / (L·R) with R = min(k, |exact|) is ONE correctly
    rounded division of two integers, and MRR = 1/first-relevant-rank
    likewise. k is capped at 30 to keep Σterms ≤ k²·lcm(1..k) < 2⁶³
    (lcm(1..30) ≈ 2.3e12). Both inputs are ≤k-row frames, so the
    single-partition rank window and the broadcast membership join are
    constant-size regardless of corpus scale — at 100 TB the cost is
    producing the rankings, never the eval.

    Output (1 row): k, n_rel, mrr, avg_precision.
    """
    from pyspark.sql import Window

    if not 1 <= k <= 30:
        raise ValueError("k must be in [1, 30] for exact-integer AP")
    lcm = _lcm_1_to(k)
    # pre-truncate with orderBy().limit(k) — TakeOrderedAndProject
    # (per-partition heaps, no single-partition shuffle) — so an
    # oversized approx frame never funnels through the unpartitioned
    # row_number window below (the zipf_fit device, textops.py). Ranks
    # past k would floor anyway (lcm DIV i is exact only for i <= k)
    # and AP@k is defined over the first k ranks.
    topk = approx.select(
        F.col(id_col).alias("_id"), F.col(score_col).alias("_s")
    ).orderBy(F.col("_s").desc(), F.col("_id").asc()).limit(k)
    ranked = topk.select(
        "_id",
        F.row_number()
        .over(Window.orderBy(F.col("_s").desc(), F.col("_id").asc()))
        .alias("_i"),
    )
    marked = ranked.join(
        F.broadcast(
            exact.select(F.col(id_col).alias("_id"), F.lit(1).alias("_rel"))
        ),
        "_id",
        "left",
    ).select(
        "_i",
        F.coalesce(F.col("_rel"), F.lit(0)).alias("_rel"),
    )
    hits = marked.select(
        "_i",
        "_rel",
        F.sum("_rel")
        .over(Window.orderBy("_i").rowsBetween(Window.unboundedPreceding, 0))
        .alias("_hits"),
    )
    n_exact = exact.agg(F.count(F.lit(1)).cast("long").alias("_n_exact"))
    agg = hits.agg(
        F.sum("_rel").cast("int").alias("n_rel"),
        F.min(F.when(F.col("_rel") == 1, F.col("_i"))).alias("_first"),
        F.sum(
            F.col("_rel")
            * F.col("_hits")
            * F.expr(f"CAST({lcm} DIV _i AS BIGINT)")
        ).cast("long").alias("_ap_scaled"),
    )
    return agg.crossJoin(F.broadcast(n_exact)).select(
        F.lit(k).alias("k"),
        F.col("n_rel"),
        F.round(
            F.when(
                F.col("_first").isNotNull(),
                F.lit(1.0) / F.col("_first").cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("mrr"),
        F.round(
            F.col("_ap_scaled").cast("double")
            / (
                F.lit(lcm).cast("double")
                * F.least(F.lit(k).cast("long"), F.col("_n_exact")).cast(
                    "double"
                )
            ),
            6,
        ).alias("avg_precision"),
    )


def kmeans_update_stats(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    scale: int = 1_000_000,
    method: str = "auto",
) -> DataFrame:
    """One distributed Lloyd (k-means) round in EXACT arithmetic: the
    argmin assignment (:func:`ivf_assign` — the d14-proven portable
    double path, ties → lowest cluster id) followed by the per-
    (cluster, dimension) sufficient statistics the next round's
    centroids are formed from — member counts and scaled-integer
    coordinate sums.

    Coordinates are quantized ``round(x·scale)`` BEFORE summing, so the
    sums are exact int64 regardless of partition order (float sums
    reassociate, integer sums don't — the q1/x8 scaled-integer rule
    applied to clustering), and the emitted mean is ONE correctly
    rounded division of two int64s. int64 headroom: |x|·scale ≲ 1e9
    leaves ~9·10⁹ safe rows per (cluster, dim) cell.

    Scale shape: assignment is a broadcast-literal map pass (k·dim
    literals, no join); the stats are one map-side-combined groupBy
    with exactly k·dim output cells — the driver round-trip of a real
    distributed k-means is these k·dim rows, never the corpus. Iterate:
    form next centroids from (sum_scaled / scale / n) driver-side and
    call again (ivf_train owns the float fast path; this is the
    hash-verifiable audit round).

    Output: (cluster, dim, n_members, sum_scaled, mean_scaled).
    """
    if not centroids:
        raise ValueError("centroids must be non-empty")
    if scale < 1:
        raise ValueError("scale must be >= 1")
    assigned = ivf_assign(df.select(vec_col), vec_col, centroids, method)
    ex = assigned.select(
        "cluster",
        F.posexplode(F.col(vec_col)).alias("dim", "_v"),
    ).select(
        "cluster",
        "dim",
        F.round(F.col("_v").cast("double") * scale).cast("bigint").alias(
            "_q"
        ),
    )
    return (
        ex.groupBy("cluster", "dim")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.sum("_q").cast("bigint").alias("sum_scaled"),
        )
        .select(
            "cluster",
            "dim",
            "n_members",
            "sum_scaled",
            F.round(
                F.col("sum_scaled").cast("double")
                / F.col("n_members").cast("double"),
                6,
            ).alias("mean_scaled"),
        )
    )


def ivfpq_adc_topk_int(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    int_codebooks,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    scale: int = 1000,
) -> DataFrame:
    """IVFPQ with the HASH-EXACT integer ADC ranker — the two scale
    levers composed and still bit-portable: the coarse probe prunes the
    scan to ``nprobe`` clusters (partition pruning when the table is
    stored cluster-partitioned — the v12 layout), and the survivors are
    ranked by :func:`pq_adc_topk_int`'s all-integer asymmetric distance
    (quantize → per-subspace argmin → exact integer ‖q_sub − c‖²), so
    unlike the float :func:`ivfpq_topk` the full pruned ranking is
    reproducible by a SQL oracle. Probe selection uses the same
    sequential double cosines as ``ivf_topk`` (engine-reproducible,
    ties → lowest cluster id)."""
    import math

    if nprobe < 1:
        raise ValueError("nprobe must be >= 1")

    def _seqdot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += float(x) * float(y)
        return s

    q = [float(x) for x in query_vec]
    qn = math.sqrt(_seqdot(q, q))

    def negcos(c):
        denom = (math.sqrt(_seqdot(c, c)) * qn) or 1.0
        return -(_seqdot(c, q) / denom)

    probe = sorted(
        range(len(centroids)), key=lambda i: (negcos(centroids[i]), i)
    )[:nprobe]
    cands = ivf_assign(df, vec_col, centroids, method="expr").filter(
        F.col("cluster").isin(probe)
    ).drop("cluster")
    return pq_adc_topk_int(
        cands, id_col, vec_col, int_codebooks, query_vec, k=k, scale=scale
    )


def mmr_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    candidates: int = 30,
    lambda_num: int = 7,
    lambda_den: int = 10,
) -> DataFrame:
    """Maximal Marginal Relevance diversified top-k (Carbonell &
    Goldstein 1998) — the retrieval answer that balances relevance to
    the query against redundancy among the results: greedily pick

        argmax_u  λ·rel(u) − (1−λ)·max_{s∈S} sim(u, s)

    over the unpicked candidates, k times. The RAG/context-window
    standard when near-duplicate passages would waste the prompt.

    Distributed shape: ONE corpus scan scores every vector and a
    TakeOrderedAndProject keeps the top ``candidates`` — from there
    everything is bounded by constants, not corpus size: the
    candidate×candidate similarity matrix is ≤ C² rows and the greedy
    runs driver-side over that bounded fetch (the winsorize-cut-literal
    precedent; at 100 TB only the coarse scan grows).

    Engine-portability: relevance and pair similarities are cosine
    micros (round(cos·1e6) int64, sequential in-order dots — the v1
    precedent), λ is the exact rational ``lambda_num/lambda_den``, so
    every greedy comparison is EXACT int64 arithmetic
    (num·rel − (den−num)·maxsim) with an id tiebreak — the selection is
    deterministic and a DuckDB oracle replays it as unrolled argmax
    CTEs. Reported ``relevance``/``mmr`` are single correctly-rounded
    integer divisions.
    """
    if k < 1 or candidates < k:
        raise ValueError("need 1 <= k <= candidates")
    if not (0 <= lambda_num <= lambda_den) or lambda_den < 1:
        raise ValueError("lambda must be a rational in [0, 1]")
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cand = (
        df.select(
            F.col(id_col),
            F.col(vec_col).alias("_vec"),
            F.round(cosine(F.col(vec_col), q) * 1e6).cast("bigint").alias(
                "rel_micros"
            ),
        )
        .orderBy(F.col("rel_micros").desc(), F.col(id_col).asc())
        .limit(candidates)
        .localCheckpoint(eager=True)  # feeds the pair join twice + the result
    )
    a = cand.select(F.col(id_col).alias("_a"), F.col("_vec").alias("_va"))
    b = cand.select(F.col(id_col).alias("_b"), F.col("_vec").alias("_vb"))
    sims = (
        a.join(b, F.col("_a") < F.col("_b"))
        .select(
            "_a",
            "_b",
            F.round(cosine(F.col("_va"), F.col("_vb")) * 1e6)
            .cast("bigint")
            .alias("sim_micros"),
        )
    )
    # bounded fetches: <= C and <= C(C-1)/2 rows by construction
    cand_rows = [
        (r[id_col], r["rel_micros"]) for r in cand.select(id_col, "rel_micros").collect()
    ]
    sim = {}
    for r in sims.collect():
        sim[(r["_a"], r["_b"])] = r["sim_micros"]
        sim[(r["_b"], r["_a"])] = r["sim_micros"]
    rel = dict(cand_rows)
    dn = lambda_den - lambda_num
    selected: list[tuple[int, object, int]] = []  # (rank, id, score_scaled)
    chosen: set = set()
    for rank in range(1, k + 1):
        best = None
        for cid, rm in cand_rows:
            if cid in chosen:
                continue
            ms = max((sim[(cid, s)] for s in chosen), default=0)
            score = lambda_num * rm - dn * ms
            key = (-score, cid)
            if best is None or key < best[0]:
                best = (key, cid, score)
        if best is None:
            # the candidate pool can be smaller than k (tiny corpus, or
            # an upstream fused set under-filling `candidates`) — return
            # the ranks selected so far instead of crashing on best[1]
            break
        selected.append((rank, best[1], best[2]))
        chosen.add(best[1])
    spark = df.sparkSession
    sel = spark.createDataFrame(
        [(r, i, s) for r, i, s in selected], ["rank", "_sid", "score_scaled"]
    )
    return (
        sel.join(cand, sel["_sid"] == cand[id_col])
        .select(
            F.col("rank").cast("int").alias("rank"),
            F.col(id_col),
            (F.col("rel_micros") / F.lit(1e6)).alias("relevance"),
            (
                F.col("score_scaled") / F.lit(float(lambda_den) * 1e6)
            ).alias("mmr"),
        )
        .orderBy("rank")
    )


def mmr_topk_sql(
    vectors_sql: str,
    query_sql: str,
    id_col: str = "vec_id",
    k: int = 10,
    candidates: int = 30,
    lambda_num: int = 7,
    lambda_den: int = 10,
) -> str:
    """DuckDB oracle twin of :func:`mmr_topk` — the greedy unrolled as
    k chained argmax CTEs over the same integer-micros arithmetic.

    ``vectors_sql`` must yield (``id_col``, e DOUBLE[]); ``query_sql``
    must yield one row (qe DOUBLE[]).
    """
    dn = lambda_den - lambda_num
    parts = [
        f"WITH v AS MATERIALIZED ({vectors_sql}),"
        f" q AS MATERIALIZED ({query_sql}),"
        " cand AS MATERIALIZED (SELECT"
        f"  {id_col} AS id, e,"
        "  CAST(round(list_dot_product(e, qe) /"
        "   (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(qe, qe)))"
        "   * 1e6) AS BIGINT) AS rel_micros"
        f"  FROM v, q ORDER BY rel_micros DESC, id ASC LIMIT {candidates}),"
        " sims AS MATERIALIZED (SELECT a.id AS sa, b.id AS sb,"
        "  CAST(round(list_dot_product(a.e, b.e) /"
        "   (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))"
        "   * 1e6) AS BIGINT) AS sim_micros"
        "  FROM cand a JOIN cand b ON a.id <> b.id),",
        f" pick1 AS MATERIALIZED (SELECT 1 AS rank, id,"
        f"  {lambda_num} * rel_micros AS score_scaled"
        f"  FROM cand ORDER BY rel_micros DESC, id ASC LIMIT 1),"
        f" sel1 AS MATERIALIZED (SELECT id FROM pick1),",
    ]
    for i in range(2, k + 1):
        p = i - 1
        parts.append(
            f" p{i} AS (SELECT c.id,"
            f"  {lambda_num} * c.rel_micros - {dn} * coalesce("
            f"   (SELECT max(s.sim_micros) FROM sims s WHERE s.sa = c.id"
            f"    AND s.sb IN (SELECT id FROM sel{p})), 0) AS score_scaled"
            f"  FROM cand c WHERE c.id NOT IN (SELECT id FROM sel{p})),"
            f" pick{i} AS MATERIALIZED (SELECT {i} AS rank, id, score_scaled"
            f"  FROM p{i} ORDER BY score_scaled DESC, id ASC LIMIT 1),"
            f" sel{i} AS MATERIALIZED (SELECT id FROM sel{p}"
            f"  UNION ALL SELECT id FROM pick{i}),",
        )
    picks = " UNION ALL ".join(f"SELECT * FROM pick{i}" for i in range(1, k + 1))
    body = "".join(parts).rstrip(",")
    return (
        f"{body} SELECT CAST(pk.rank AS INT) AS rank, pk.id AS {id_col},"
        " cand.rel_micros / 1e6 AS relevance,"
        f" pk.score_scaled / {float(lambda_den) * 1e6} AS mmr"
        f" FROM ({picks}) pk JOIN cand ON cand.id = pk.id ORDER BY pk.rank"
    )


def sign_bits_words(vec: Column, dim: int, bits_per_word: int = 63) -> list[Column]:
    """Pack a float vector's SIGN BITS (v ≥ 0 → 1) into exact int64
    words, ``bits_per_word`` dims per word (63 keeps clear of the
    int64 sign bit). Pure narrow expression — the per-element lambda
    is cheap arithmetic on materialized elements (the d20 HOF rule's
    allowed class)."""
    words = []
    for w in range((dim + bits_per_word - 1) // bits_per_word):
        start = w * bits_per_word
        n = min(bits_per_word, dim - start)
        weights = F.array(*[F.lit(1 << i) for i in range(n)])
        words.append(
            F.aggregate(
                F.zip_with(
                    F.slice(vec, start + 1, n),
                    weights,
                    lambda v, p: F.when(v >= 0, p).otherwise(F.lit(0)).cast(
                        "bigint"
                    ),
                ),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            )
        )
    return words


def binary_quantized_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
) -> DataFrame:
    """1-bit (binary) quantized ANN — the most aggressive compression
    point on the SQ8 (v6) / PQ (v7) axis: each vector collapses to its
    per-dimension SIGN BITS (dim/8 bytes — 32× smaller than float32),
    ranking by Hamming distance to the query's sign pattern. The
    modern embedding-DB "binary quantization" fast path: at 100 TB the
    scan reads ~2 int64 words per row instead of the vector column,
    and XOR+popcount is the cheapest distance there is.

    Everything is EXACT integer arithmetic (bit packing, XOR,
    popcount), so the result is hash-portable with no rounding
    contract at all — the one ANN variant even cheaper to verify than
    SQ8. Ties break by id; recall is data-dependent (documented: rank
    by Hamming then exact-rerank the top candidates when it matters —
    compose with ``prefix_rerank_topk``'s second stage).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    dim = len(query_vec)
    words = sign_bits_words(F.col(vec_col), dim)
    # query words as exact python ints -> literals
    qwords = []
    for w in range((dim + 62) // 63):
        bits = 0
        for i, v in enumerate(query_vec[w * 63:(w + 1) * 63]):
            if v >= 0:
                bits |= 1 << i
        qwords.append(bits)
    ham = None
    for wc, qw in zip(words, qwords):
        term = F.bit_count(wc.bitwiseXOR(F.lit(qw)))
        ham = term if ham is None else ham + term
    return (
        df.select(F.col(id_col), ham.cast("int").alias("hamming"))
        .orderBy(F.col("hamming").asc(), F.col(id_col).asc())
        .limit(k)
    )


# ----------------------------------------------------------- range join --


def quantize_int_vec(a: Column, scale: float) -> Column:
    """Component-wise integer quantization round(x·scale) as int64 —
    the hash-portable embedding representation (F.round and DuckDB
    round() both round half away from zero; the v3 SQ8 precedent)."""
    return F.transform(
        a, lambda x: F.round(x.cast("double") * scale).cast("bigint")
    )


def _l2_assign_arrow(vec_col: Column, cents: list[list[float]]) -> Column:
    """Vectorized (cluster, distance) against a centroid matrix —
    one Arrow batch kernel instead of k interpreted HOF folds per row
    (the SCALE.md r8 HOF lesson: md5/arith inside array lambdas runs
    interpreted). Used where the assignment only SELECTS candidates
    (l2_range_join — lossless, so float-op order is free); the
    bit-pinned training paths (_kmeans_l2 for PQ artifacts) keep the
    sequential-order expr fold."""
    from pyspark.sql.functions import pandas_udf

    cmat = np.array(cents, dtype=np.float64)
    dim = cmat.shape[1]

    @pandas_udf("struct<cid: int, d: double>")
    def _assign(vecs: pd.Series) -> pd.DataFrame:
        vals = vecs.tolist()
        ok = [v is not None and len(v) == dim for v in vals]
        cid = [None] * len(vals)
        dist = [None] * len(vals)
        idx = [j for j, o in enumerate(ok) if o]
        if idx:
            mat = np.array(
                [np.asarray(vals[j], dtype=np.float64) for j in idx]
            )
            # (n,k) squared distances via elementwise ops per centroid
            best_d = np.full(mat.shape[0], np.inf)
            best = np.zeros(mat.shape[0], dtype=np.int64)
            for i in range(cmat.shape[0]):
                diff = mat - cmat[i]
                d2 = np.einsum("ij,ij->i", diff, diff)
                better = d2 < best_d  # strict: ties keep the lower cid
                best_d = np.where(better, d2, best_d)
                best = np.where(better, i, best)
            root = np.sqrt(best_d)
            for j, b, d in zip(idx, best, root):
                cid[j] = int(b)
                dist[j] = float(d)
        return pd.DataFrame({"cid": pd.Series(cid, dtype="Int32"), "d": dist})

    return _assign(vec_col)


def _lloyd_l2_arrow(
    df: DataFrame, id_col: str, vec_col: str, k: int, iters: int
) -> list[list[float]]:
    """Deterministic Lloyd's k-means (init = k lowest-id vectors) with
    the Arrow assign kernel — l2_range_join's trainer. Centroid
    positions only steer candidate pruning there, so this does NOT
    need _kmeans_l2's bit-pinned fold arithmetic."""
    init_rows = df.orderBy(F.col(id_col).asc()).limit(k).select(vec_col).collect()
    cents = [list(map(float, r[0])) for r in init_rows]
    for _ in range(iters):
        assigned = df.withColumn(
            "_c", _l2_assign_arrow(F.col(vec_col), cents).getField("cid")
        )
        comp = assigned.select("_c", F.posexplode(F.col(vec_col)).alias("pos", "x"))
        means = (
            comp.groupBy("_c", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .groupBy("_c")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("ms"))
            .collect()
        )
        new = {r["_c"]: [s["m"] for s in r["ms"]] for r in means}
        cents = [new.get(i, c) for i, c in enumerate(cents)]
    return cents


def l2_range_join(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str,
    query_id: str,
    vec_col: str,
    radius: float,
    scale: float = 1000.0,
    n_cells: int = 16,
    iters: int = 3,
    exclude_self: bool = True,
    validate: bool = True,
) -> DataFrame:
    """EXACT L2 range search with lossless cell pruning: for every
    query vector, ALL corpus vectors within ``radius`` (L2, measured
    on the round(x·scale) integer-quantized vectors — the portable
    metric), found WITHOUT scanning every (query, corpus) pair.

    This is the triangle-inequality IVF bound (Lloyd cells + per-cell
    covering radius): for query q, cell centroid c with covering
    radius R_c = max over members x of ‖x − c‖,

        ‖q − x‖ ≥ ‖q − c‖ − ‖x − c‖ ≥ ‖q − c‖ − R_c,

    so a cell with ‖q − c‖ − R_c > r can contain NO hit and is pruned
    with PROOF — unlike nprobe ANN this loses nothing, which is why
    the oracle can be the naive all-pairs filter. Pruning decisions
    use float sqrt with a small conservative slack (only ADDS
    candidates); the final membership test is exact int64
    Σ(aᵢ−bᵢ)² ≤ r_int², so the result set is bit-portable and
    independent of where k-means put the centroids.

    Scale shape: centroids train on the corpus (driver sees k×dim
    floats only); the corpus is scanned ONCE to assign cells + once to
    verify candidates; the (query × cell) bound table is |Q|·k tiny
    rows and broadcasts onto the cell-keyed corpus join. At 100 TB the
    corpus side is written partitioned by cell (write_ivf_partitioned)
    so pruned cells are never READ — same plan as v12/v13, but with a
    correctness proof instead of a recall target. Output:
    (query_id, match_id, sqdist) — sqdist in quantized-integer units.

    HONESTY NOTE (measured): pruning power is data-dependent. On
    clustered corpora cells outside the radius prune to nothing (the
    two-blob pytest: only the query's blob is verified); on the
    synthetic near-uniform test embeddings at a radius that returns
    any hits, R_c + r exceeds every query-centroid distance and 0 of
    128 cells prune (measured at sf0.1) — the curse of
    dimensionality, inherent to metric pruning, not an implementation
    gap. The result is exact either way; only the candidate count
    moves.
    """
    if radius <= 0:
        raise ValueError("radius must be > 0")
    if n_cells < 1:
        raise ValueError("n_cells must be >= 1")
    r_int = float(int(round(radius * scale)))
    thresh = int(r_int) * int(r_int)
    qv = quantize_int_vec(F.col(vec_col), scale)
    # checkpoint the quantized corpus ONCE: it feeds every Lloyd
    # iteration plus the final assign — without this each iteration
    # re-reads and re-quantizes the table
    corp = corpus.select(
        F.col(corpus_id).alias("_cid"), qv.alias("_cqv")
    ).localCheckpoint(eager=True)
    qrys = queries.select(F.col(query_id).alias("_qid"), qv.alias("_qv"))
    if validate:
        # the validation agg below is an eager full scan — checkpoint
        # the queries projection FIRST so the join pipeline reuses it
        # instead of re-reading the queries input (ADVICE r10: the
        # validation used to double the query-side input cost)
        qrys = qrys.localCheckpoint(eager=True)

    # Malformed vectors (NULL, null elements, ragged dims) would get a
    # NULL cell from the assigner / a NULL bound distance and silently
    # VANISH from the result while a naive all-pairs check might keep
    # them — breaking the lossless contract unobservably (ADVICE r9).
    # Raise instead: one cheap agg per side over the already-projected
    # vec column (BOTH sides read their local checkpoints, so each
    # input is scanned once total). ``validate=False`` skips the two
    # eager aggs for hot-path callers with known-clean inputs — the
    # lossless guarantee then rests on the caller's contract.
    def _check_vecs(df, col, side):
        bad = F.sum(
            F.when(
                F.col(col).isNull()
                | F.exists(F.col(col), lambda x: x.isNull()),
                1,
            ).otherwise(0)
        )
        row = df.agg(
            bad.alias("bad"),
            F.min(F.size(col)).alias("dmin"),
            F.max(F.size(col)).alias("dmax"),
        ).collect()[0]
        if row["bad"]:
            raise ValueError(
                f"{side} has {row['bad']} NULL/null-element vectors"
            )
        if row["dmin"] is not None and row["dmin"] != row["dmax"]:
            raise ValueError(
                f"{side} vector dims are ragged "
                f"({row['dmin']}..{row['dmax']})"
            )
        return row["dmin"]

    if validate:
        cdim = _check_vecs(corp, "_cqv", "corpus")
        qdim = _check_vecs(qrys, "_qv", "queries")
        if cdim is not None and qdim is not None and cdim != qdim:
            raise ValueError(
                f"corpus dim {cdim} != queries dim {qdim}"
            )
    cents = _lloyd_l2_arrow(corp, "_cid", "_cqv", n_cells, iters)
    if not cents:
        raise ValueError("empty corpus")
    # one corpus pass: nearest cell (ties -> lowest cid) + distance to it
    assigned = corp.select(
        "_cid", "_cqv", _l2_assign_arrow(F.col("_cqv"), cents).alias("_best")
    ).select(
        "_cid",
        "_cqv",
        F.col("_best").getField("cid").alias("_cell"),
        F.col("_best").getField("d").alias("_dc"),
    ).localCheckpoint(eager=True)  # feeds the stats agg AND the verify join
    stats = assigned.groupBy("_cell").agg(F.max("_dc").alias("_r"))
    # query-side bound: keep (query, cell) iff ||q-c|| <= R_c + r (+slack)
    spark = corpus.sparkSession
    cent_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        schema="_cell int, _cv array<double>",
    )
    bounds = qrys.crossJoin(
        F.broadcast(cent_df.join(stats, "_cell"))
    ).select(
        "_qid",
        "_qv",
        "_cell",
        F.sqrt(
            F.aggregate(
                F.zip_with(
                    F.col("_qv"),
                    F.col("_cv"),
                    lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("_dqc"),
        F.col("_r"),
    )
    # slack: the bound compares two float sqrts of exact sums — roundoff
    # is ~1 ulp; 1e-9 relative only ever ADDS candidate cells
    keep = bounds.filter(
        F.col("_dqc")
        <= (F.col("_r") + F.lit(r_int)) * F.lit(1.0 + 1e-9) + F.lit(1e-9)
    ).select("_qid", "_qv", "_cell")
    pairs = assigned.join(F.broadcast(keep), "_cell")
    if exclude_self:
        pairs = pairs.filter(F.col("_cid") != F.col("_qid"))
    d2 = F.aggregate(
        F.zip_with(F.col("_cqv"), F.col("_qv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return (
        pairs.select(
            F.col("_qid").alias(query_id),
            F.col("_cid").alias("match_id"),
            d2.alias("sqdist"),
        )
        .filter(F.col("sqdist") <= F.lit(thresh))
    )


def kcenter_coreset(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 12,
    scale: float = 1000.0,
) -> DataFrame:
    """Greedy k-center (farthest-point) coreset selection — the
    2-approximation diversity sampler (Gonzalez 1985) a training-data
    pipeline uses to pick a maximally-spread subset (coreset seeds,
    diverse eval sets, dedup-aware anchor selection; SemDeDup's
    complement: keep the SPREAD, not the clusters).

    Deterministic and hash-portable: distances are exact int64
    squared L2 on round(x·scale) quantized vectors; the seed is the
    lowest id; every later pick is argmax of the running min-distance
    to the selected set with ties broken by lowest id. The classic
    incremental trick keeps each round O(|corpus|): the running
    min-distance column is updated against the NEWEST center only
    (one narrow map, no shuffle), and the argmax is one
    TakeOrdered(1) reduction — k rounds total, each a scan + a 1-row
    fetch to the driver; the corpus never shuffles at all. At 100 TB
    that is k scan-passes over a columnar projection of (id, vec) —
    embarrassingly parallel, zero data movement.

    Output: (rank, id, min_sqdist) where min_sqdist is the coverage
    radius² the point closed at selection time (NULL for the seed) —
    monotonically non-increasing, the elbow read for choosing k.
    """
    if k < 1:
        raise ValueError("k must be ≥ 1")
    qv = quantize_int_vec(F.col(vec_col), scale)
    base = df.select(
        F.col(id_col).alias("_id"), qv.alias("_v")
    ).localCheckpoint(eager=True)
    n_rows = base.count()
    if n_rows == 0:
        raise ValueError("empty input")
    if k > n_rows:
        raise ValueError(f"k={k} exceeds corpus size {n_rows}")
    seed = base.orderBy(F.col("_id").asc()).limit(1).collect()
    picks = [(1, seed[0]["_id"], None)]
    center = [int(x) for x in seed[0]["_v"]]

    def _d2_to(lit_vec: list[int]):
        # ONE array literal instead of dim-many lit().cast() calls —
        # the expression tree (and the py4j chatter building it) per
        # round shrinks from O(dims) nodes to O(1) (r13; the k rounds'
        # cost here is driver-side plan construction, not the scans —
        # measured 9.6 s wall vs 3.9 s inside jobs)
        b = F.lit([int(x) for x in lit_vec]).cast("array<bigint>")
        return F.aggregate(
            F.zip_with(F.col("_v"), b, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )

    # selected rows LEAVE the candidate frame: with duplicate vectors
    # a selected point's twin sits at distance 0, and an argmax over a
    # frame that still contains the selected row itself would re-pick
    # that row's (lower) id forever instead of the twin — Gonzalez
    # picks k DISTINCT points
    mind = base.filter(F.col("_id") != seed[0]["_id"]).select(
        "_id", "_v", _d2_to(center).alias("_m")
    )
    for r in range(2, k + 1):
        # lazy: the argmax TakeOrdered collect right below is the first
        # action and computes every partition, so ONE job materializes
        # the round's checkpoint blocks AND fetches the pick; the
        # update then reads the same blocks (r12 job fusion)
        mind = mind.localCheckpoint(eager=False)  # feeds argmax AND update
        top = (
            mind.orderBy(F.col("_m").desc(), F.col("_id").asc())
            .limit(1)
            .collect()[0]
        )
        picks.append((r, top["_id"], int(top["_m"])))
        center = [int(x) for x in top["_v"]]
        mind = mind.filter(F.col("_id") != top["_id"]).select(
            "_id", "_v", F.least(F.col("_m"), _d2_to(center)).alias("_m")
        )
    spark = df.sparkSession
    out_id_type = df.schema[id_col].dataType.simpleString()
    return spark.createDataFrame(
        picks, schema=f"rank int, {id_col} {out_id_type}, min_sqdist bigint"
    )


def kcenter_coreset_sql(
    table: str,
    id_col: str,
    vec_col: str,
    k: int = 12,
    scale: float = 1000.0,
) -> str:
    """DuckDB oracle twin of :func:`kcenter_coreset` — the k greedy
    rounds unrolled as chained MATERIALIZED argmax CTEs (the x7 LTTB
    device): sel_i picks the farthest point, m_i folds the new
    center's distances into the running minimum."""
    if k < 1:
        raise ValueError("k must be ≥ 1")
    # exact int64 Σ(a-b)² via an indexed lambda — list_dot_product
    # returns DOUBLE, whose a·a − 2ab + b·b intermediates lose bits
    # past 2^53 and can flip the argmax against the exact Spark zip_with
    # (ADVICE r9); the subtract-first form also keeps intermediates
    # small (diffs, not raw magnitudes squared)
    d2 = (
        "CAST(list_sum(list_transform(m{p}.v,"
        " (x, j) -> (x - sel{i}.v[j]) * (x - sel{i}.v[j]))) AS BIGINT)"
    )
    parts = [
        f"WITH base AS MATERIALIZED (SELECT {id_col} AS id,"
        f" list_transform({vec_col},"
        f"  x -> CAST(round(CAST(x AS DOUBLE) * {scale}) AS BIGINT)) AS v"
        f" FROM {table}),"
        f" sel1 AS MATERIALIZED (SELECT id, v FROM base"
        f"  ORDER BY id LIMIT 1),"
        f" m1 AS MATERIALIZED (SELECT base.id, base.v,"
        f"  CAST(list_sum(list_transform(base.v,"
        f"   (x, j) -> (x - sel1.v[j]) * (x - sel1.v[j]))) AS BIGINT) AS m"
        f"  FROM base, sel1 WHERE base.id <> sel1.id),",
    ]
    for i in range(2, k + 1):
        p = i - 1
        parts.append(
            f" sel{i} AS MATERIALIZED (SELECT id, v, m FROM m{p}"
            f"  ORDER BY m DESC, id ASC LIMIT 1),"
            # selected rows leave the candidate frame (duplicate-vector
            # twins must stay pickable — see kcenter_coreset)
            f" m{i} AS MATERIALIZED (SELECT m{p}.id, m{p}.v,"
            f"  least(m{p}.m, {d2.format(p=p, i=i)}) AS m"
            f"  FROM m{p}, sel{i} WHERE m{p}.id <> sel{i}.id),"
        )
    union = " UNION ALL ".join(
        [f"SELECT 1 AS rank, id, CAST(NULL AS BIGINT) AS min_sqdist FROM sel1"]
        + [
            f"SELECT {i} AS rank, id, m AS min_sqdist FROM sel{i}"
            for i in range(2, k + 1)
        ]
    )
    body = "".join(parts).rstrip(",")
    return f"{body} SELECT rank, id AS {id_col}, min_sqdist FROM ({union}) u"
