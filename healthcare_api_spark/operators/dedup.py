"""Deduplication operators (SURVEY.md §2.10).

Scale design notes (100 TB):

- Exact dedup is a window/aggregate on the dedup key — one shuffle on the
  key, map-side combine does most of the work.
- MinHash: shingling is narrow (array expr per row, no explode until the
  signature agg). The signature aggregation explodes shingles but Spark's
  partial hash-agg computes per-doc mins map-side, so the shuffle carries
  ~1 row per (doc, seed) — linear in docs, not in shingles.
- LSH banding turns near-dup search from O(n²) into a self-join on band
  keys; band buckets are the only shuffle keys. Skewed buckets (boilerplate
  docs) are handled by AQE skew-join splitting.
- All hashes are md5-hex based → engine-independent and oracle-verifiable.
  Lexicographic min over md5 hex is a uniform minhash permutation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from healthcare_api_spark.functions.text import (
    normalize_text,
    seeded_hash,
    tokens,
    word_shingles,
)


# ---------------------------------------------------------------- exact --

def exact_dedup(df: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """Keep exactly one row per key: the one with the smallest
    ``order_col`` (deterministic tie-break — SURVEY.md §2.10 'exact').

    One shuffle on ``key_cols``; at scale prefer this over
    ``dropDuplicates`` because the survivor is deterministic.
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def exact_dedup_by_content(
    df: DataFrame, id_col: str, text_col: str, normalized: bool = True
) -> DataFrame:
    """Content dedup: fingerprint the (optionally normalized) text and keep
    the lowest-id row per fingerprint. Adds ``canonical_id``: every row maps
    to its cluster representative."""
    fp = F.md5(normalize_text(F.col(text_col))) if normalized else F.md5(F.col(text_col))
    w = Window.partitionBy("_fp")
    return (
        df.withColumn("_fp", fp)
        .withColumn("canonical_id", F.min(F.col(id_col)).over(w))
        .drop("_fp")
    )


# -------------------------------------------------------------- minhash --

def _rotate_hex(d: Column, i: int, step: int = 8) -> Column:
    """Circular rotation of a 32-hex digest by step·i chars — a bijection
    on the digest space, so min over it is a valid minhash permutation.
    ``step`` must be chosen so the k rotations are distinct (see
    minhash_signatures)."""
    k = (step * i) % 32
    if k == 0:
        return d
    return F.concat(F.substring(d, k + 1, 32 - k), F.substring(d, 1, k))


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    shingle_n: int = 3,
    family: str = "rotation",
) -> DataFrame:
    """Per-doc MinHash signature: columns ``mh0..mh{k-1}``.

    Three permutation families:
    - ``rotation`` (default): one md5 per shingle, permutation i = digest
      rotated by 8·i hex chars. 1 hash/shingle regardless of k — the
      cheap md5 path; permutations are pairwise uniform but not mutually
      independent (fine for banding/clustering, slightly higher variance).
    - ``seeded``: md5('s<i>:'||shingle) per permutation — k independent
      hashes per shingle, k× the hashing cost.
    - ``xxhash``: k independent ``xxhash64(seed=i)`` per shingle — the
      PRODUCTION fast path: a native 64-bit hash inside whole-stage
      codegen (no md5 bignum, no interpreted fold), signatures are
      longs (8 bytes vs 32-char hex → 4× smaller shuffle keys). NOT
      oracle-verifiable (xxhash64 is Spark-specific); md5 families exist
      exactly so dedup can be checked against an external engine.

    Physical shapes:
    - rotation: fully NARROW — one md5 per shingle and a single
      fold (``aggregate``) per row computing all k mins; no explode, no
      shuffle, no aggregation exchange. The one-element explode below is
      a Generate barrier stopping projection collapse from re-evaluating
      the shingling once per output column.
    - seeded: explode + groupBy(id) with map-side partial min — the
      per-shingle md5s run on the flat column in whole-stage codegen
      (k hashes per shingle can't be folded into one pass).

    No array_distinct anywhere: min() is insensitive to duplicates and
    the per-row hash-set build would be interpreted overhead.
    """
    if family == "rotation":
        if num_hashes > 32:
            raise ValueError("rotation family supports at most 32 hashes; use family='seeded'")
        # distinct rotations: step shrinks as k grows (k=4 → 8-char step,
        # k=8 → 4-char step); step*i < 32 for all i keeps them unique
        step = max(32 // num_hashes, 1)
        digests = F.transform(word_shingles(F.col(text_col), shingle_n), lambda s: F.md5(s))
        # 'g' sorts above every md5 hex digit — a safe +infinity
        init = F.struct(*[F.lit("g").alias(f"mh{i}") for i in range(num_hashes)])
        folded = F.aggregate(
            digests,
            init,
            lambda acc, d: F.struct(
                *[
                    F.least(acc[f"mh{i}"], _rotate_hex(d, i, step)).alias(f"mh{i}")
                    for i in range(num_hashes)
                ]
            ),
        )
        barrier = df.select(F.col(id_col), F.explode(F.array(folded)).alias("_sig"))
        return barrier.select(
            id_col, *[F.col("_sig").getField(f"mh{i}").alias(f"mh{i}") for i in range(num_hashes)]
        )
    shingled = df.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), shingle_n)).alias("_sh")
    )
    if family == "xxhash":
        aggs = [
            F.min(F.xxhash64(F.lit(i), F.col("_sh"))).alias(f"mh{i}")
            for i in range(num_hashes)
        ]
    elif family == "seeded":
        aggs = [F.min(seeded_hash(F.col("_sh"), i)).alias(f"mh{i}") for i in range(num_hashes)]
    else:
        raise ValueError(f"unknown minhash family: {family!r}")
    return shingled.groupBy(id_col).agg(*aggs)


def minhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 4,
    shingle_n: int = 3,
    family: str = "rotation",
) -> DataFrame:
    """Near-dup clustering by full-signature equality (the strictest LSH
    band: one band of ``num_hashes`` rows). Returns (id, canonical_id)
    where canonical_id = min id sharing the signature."""
    sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n, family)
    sig_cols = [f"mh{i}" for i in range(num_hashes)]
    w = Window.partitionBy(*sig_cols)
    return sig.withColumn("canonical_id", F.min(F.col(id_col)).over(w)).select(
        id_col, "canonical_id"
    )


def band_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 3,
    family: str = "rotation",
) -> DataFrame:
    """Banded MinHash bucket keys per doc: (id, band, bucket) — the
    shared blocking surface of :func:`lsh_candidate_pairs` and the
    streaming near-dup filter (streaming/neardup.py). One row per
    (doc, band); with the md5 families the bucket is the md5 of the
    '|'-joined band minhashes (oracle-reproducible), with ``xxhash``
    a native 64-bit key (production fast path, Spark-only)."""
    sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n, family)
    n_bands = num_hashes // rows_per_band
    bands = []
    for b in range(n_bands):
        cols = [
            F.col(f"mh{i}")
            for i in range(b * rows_per_band, (b + 1) * rows_per_band)
        ]
        bucket = (
            F.xxhash64(*cols) if family == "xxhash"
            else F.md5(F.concat_ws("|", *cols))
        )
        bands.append(
            sig.select(F.col(id_col), F.lit(b).alias("band"), bucket.alias("bucket"))
        )
    banded = bands[0]
    for b in bands[1:]:
        banded = banded.unionByName(b)
    return banded


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 3,
    family: str = "rotation",
) -> DataFrame:
    """Banded-LSH candidate generation: docs sharing any band signature.

    Bands of ``rows_per_band`` minhashes are hashed to a bucket key; a
    self-equi-join on (band_idx, bucket) yields candidates. Output:
    (id_a, id_b) with id_a < id_b, distinct. With ``family='xxhash'``
    the bucket key is a native 64-bit hash too — long join keys instead
    of 32-char hex, the production fast path.
    """
    banded = band_signatures(
        df, id_col, text_col, num_hashes, rows_per_band, shingle_n, family
    )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )


# -------------------------------------------------------------- jaccard --

def _md5_seed_expr(set_col: str, seed: int) -> Column:
    """transform(set, s -> md5('{seed}:' || s)) — one interpreted md5
    pass shared by FOUR bands (each band takes an 8-hex slice = 32
    independent bits). A module-level helper keeps the HOF lambda at
    arity 1 (PySpark dispatches transform() lambdas on arity)."""
    prefix = f"{seed}:"
    return F.transform(
        F.col(set_col), lambda s: F.md5(F.concat(F.lit(prefix), s))
    )


def _band_min_expr(hashed_col: str, slot: int) -> Column:
    """min over the slot'th 8-hex slice of the precomputed md5 array —
    the per-band minhash, at 1/4 the hashing cost of a seeded md5 per
    band (the dominant d4 cost: HOF lambdas are interpreted, so every
    extra md5 pass over the shingle arrays is paid at full price)."""
    start = slot * 8 + 1  # substring() is 1-based
    return F.array_min(
        F.transform(F.col(hashed_col), lambda m: F.substring(m, start, 8))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
    bands: int = 4,
    broadcast_candidates: bool = True,
) -> DataFrame:
    """Exact n-gram Jaccard over multi-band LSH candidates.

    Candidates are docs agreeing on ANY of ``bands`` independent
    one-row minhash bands (VERDICT r3 #3: a single band recalls only
    ≈J of qualifying pairs — at threshold 0.3 that's ~30%; with b
    independent bands recall is 1-(1-J)^b, ≈76% at b=4 and ≈94% at
    b=8 for J=0.3, and higher for nearer duplicates). The exact
    Jaccard verify keeps precision at 1.0 regardless of bands. Output:
    (id_a, id_b, jaccard) with jaccard ≥ threshold, id_a < id_b.

    Scale shape: signatures are narrow per-row expressions (zero
    shuffle); the band self-join shuffles O(docs × bands) slim key
    rows; candidate pairs are DISTINCT'd BEFORE the verify join so the
    exact intersect runs once per pair, not once per shared band. The
    shingle sets are persisted: higher-order lambdas (shingling,
    per-shingle md5) are interpreted, not codegen'd, and projection
    collapse would otherwise re-evaluate them on every join side — the
    dominant cost at scale. The cached blocks live until Spark's LRU
    evicts them or the caller runs ``spark.catalog.clearCache()``;
    sessions running many dedup batches should clear between batches.

    ``broadcast_candidates`` (default True) broadcasts the slim
    (id_a, id_b) candidate list into the verify joins — the shingle
    sets then never shuffle (measured 2× on the whole query). The list
    is band-collision-bounded, ~tens of bytes per candidate, but it IS
    corpus-dependent: for corpora whose candidate count exceeds driver
    memory (billions of near-dup pairs), pass False to fall back to
    shuffle joins on the id — the plan a 100 TB run wants anyway.
    """
    if bands < 1:
        raise ValueError("bands must be >= 1")
    sets = df.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(word_shingles(F.col(text_col), shingle_n)).alias("_set"),
    )
    for seed in range((bands + 3) // 4):
        sets = sets.withColumn(f"_hs{seed}", _md5_seed_expr("_set", seed))
    for b in range(bands):
        sets = sets.withColumn(f"_mh{b}", _band_min_expr(f"_hs{b // 4}", b % 4))
    sets = sets.drop(*[f"_hs{s}" for s in range((bands + 3) // 4)])
    sets = sets.persist()
    # one generator pass (not a 4-way union): band = position in the
    # minhash array — a single scan of the cached sets emits all keys
    keys = sets.select(
        F.col("_id"),
        F.posexplode(F.array(*[F.col(f"_mh{b}") for b in range(bands)])).alias(
            "_band", "_mh"
        ),
    )
    cand = (
        keys.alias("l")
        .join(
            keys.alias("r"),
            (F.col("l._band") == F.col("r._band"))
            & (F.col("l._mh") == F.col("r._mh"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .distinct()
    )
    a = sets.select(F.col("_id").alias("id_a"), F.col("_set").alias("set_a"))
    b_ = sets.select(F.col("_id").alias("id_b"), F.col("_set").alias("set_b"))
    inter = F.size(F.array_intersect(F.col("set_a"), F.col("set_b"))).cast("double")
    union = (F.size(F.col("set_a")) + F.size(F.col("set_b"))).cast("double") - inter
    verify = (
        a.join(F.broadcast(cand), "id_a") if broadcast_candidates
        else cand.join(a, "id_a")
    )
    # threshold on the RAW ratio (rounding first would admit boundary
    # pairs just below threshold); round only for output
    return (
        verify.join(b_, "id_b")
        .filter((inter / union) >= threshold)
        .select("id_a", "id_b", F.round(inter / union, 6).alias("jaccard"))
    )


def seeded_hash_min(text: Column, seed: int, shingle_n: int = 3) -> Column:
    """min(md5(seed || shingle)) computed as a narrow array expression —
    a per-row minhash with no explode at all (for candidate keys)."""
    sh = F.array_distinct(word_shingles(text, shingle_n))
    return F.array_min(F.transform(sh, lambda s: F.md5(F.concat(F.lit(f"s{seed}:"), s))))


# -------------------------------------------------------------- simhash --

def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 16) -> DataFrame:
    """SimHash over tokens: each token votes ±1 on ``bits`` bit positions
    derived from its md5; the sign of each bit-sum forms the hash.

    Narrow implementation: token hashing and the per-row bit votes are
    array expressions; the only shuffle is none at all — simhash is
    computed per row. Output: (id, simhash long).
    """
    toks = F.array_distinct(tokens(F.col(text_col)))
    # 16-bit int from the first 4 hex chars of each token's md5
    tok_h = F.transform(toks, lambda t: F.conv(F.substring(F.md5(t), 1, 4), 16, 10).cast("long"))
    out = F.lit(0).cast("long")
    for i in range(bits):
        mask = F.lit(1 << i).cast("long")
        votes = F.aggregate(
            tok_h,
            F.lit(0),
            lambda acc, h: acc + F.when(h.bitwiseAND(mask) > 0, F.lit(1)).otherwise(F.lit(-1)),
        )
        out = out + F.when(votes > 0, mask).otherwise(F.lit(0).cast("long"))
    return df.select(F.col(id_col), out.alias("simhash"))


def simhash_dedup(df: DataFrame, id_col: str, text_col: str, bits: int = 16) -> DataFrame:
    """Cluster docs with identical simhash → (id, canonical_id)."""
    sh = simhash(df, id_col, text_col, bits)
    w = Window.partitionBy("simhash")
    return sh.withColumn("canonical_id", F.min(F.col(id_col)).over(w)).select(
        id_col, "simhash", "canonical_id"
    )


# ------------------------------------------------- components clustering --

def cluster_pairs(
    pairs: DataFrame,
    all_ids: DataFrame,
    id_col: str = "id",
    max_iter: int = 10,
) -> DataFrame:
    """Connected components over near-dup candidate pairs → transitive
    dedup clusters: (id, cluster_id = min id in component).

    Iterative min-label propagation on DataFrames (the standard
    large-graph approach — alternating small-star steps): each round
    joins labels to the symmetric edge list and takes the min neighbor
    label; converges in O(component diameter) rounds, each one shuffle.
    ``pairs`` must have columns (id_a, id_b); singletons come from
    ``all_ids``. Early-exits when a round changes nothing.
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .persist()
    )
    # localCheckpoint each round: iterative DataFrame loops otherwise grow
    # the logical plan exponentially (and the convergence check would
    # recompute the whole history every round)
    labels = all_ids.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("label")
    ).localCheckpoint(eager=True)
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["src"], "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias(
                    "label"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        # silent truncation would split components — surface it
        import warnings

        warnings.warn(
            f"cluster_pairs did not converge within max_iter={max_iter}; "
            "components with larger diameter are split — raise max_iter",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select(F.col("node").alias(id_col), F.col("label").alias("cluster_id"))


# ---------------------------------------------------- embedding near-dup --

def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    bucket_col: str,
    threshold: float = 0.95,
    method: str = "auto",
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine within a bucket column
    (pre-clustering key: LSH bucket, shard, or label). The bucket bounds
    the pair join; cosine is exact double math in array order, so results
    are reproducible bit-for-bit. Output: (id_a, id_b, cos) id_a < id_b.

    r7 perf rework (bit-identical by construction, pinned by tests):
    norms are computed ONCE PER VECTOR before the pair join — the same
    sequential fold on the same array yields the same double whether it
    runs per-vector or per-pair, and a cell of size g needs g norms,
    not g² — and the per-pair dot runs through the Arrow batch kernel
    (``pair_dot_arrow``: dimension-ordered accumulation vectorized over
    pairs, the ivf_assign precedent) instead of the interpreted
    zip_with+aggregate fold. ``method``: ``"auto"``/``"arrow"`` use the
    kernel, ``"expr"`` keeps the pure-JVM fold (the conservative
    baseline the kernel is pinned against). This is SemDeDup's hot
    loop: Σ|cell|² pair cosines.
    """
    from healthcare_api_spark.operators.similarity import (
        dot as _dot,
        norm as _norm,
        pair_dot_arrow,
    )

    if method not in ("auto", "expr", "arrow"):
        raise ValueError("method must be 'auto', 'expr', or 'arrow'")
    v = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.col(bucket_col).alias("_b"),
        _norm(F.col(vec_col)).alias("_n"),
    )
    a = v.select(
        F.col("_id").alias("id_a"), F.col("_v").alias("va"),
        F.col("_b").alias("ba"), F.col("_n").alias("na"),
    )
    b = v.select(
        F.col("_id").alias("id_b"), F.col("_v").alias("vb"),
        F.col("_b").alias("bb"), F.col("_n").alias("nb"),
    )
    dot_pair = (
        _dot(F.col("va"), F.col("vb"))
        if method == "expr"
        else pair_dot_arrow(F.col("va"), F.col("vb"))
    )
    cos = dot_pair / (F.col("na") * F.col("nb"))
    return (
        a.join(b, (F.col("ba") == F.col("bb")) & (F.col("id_a") < F.col("id_b")))
        .withColumn("cos", cos)
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )


# ------------------------------------------------- exact-substring dedup --

def exact_substring_flags(
    df: DataFrame,
    id_col: str,
    text_col: str,
    gram_len: int = 40,
    min_docs: int = 2,
) -> DataFrame:
    """ExactSubstr-style dedup signal (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better" — public paper): flag
    documents that share any verbatim character run of ``gram_len`` with
    another document. The full suffix-array method removes the spans;
    this operator produces the detection layer — per doc, the number of
    its distinct ``gram_len``-grams that occur in ≥ ``min_docs`` docs.

    Output: (id, n_repeated, flagged).

    Shape at scale: per-doc grams are deduped narrowly
    (``array_distinct`` before the explode), the doc-frequency aggregate
    is keyed by a fixed-width md5 (constant shuffle key size regardless
    of gram_len), and the frequent-gram set joins back semi-style. Same
    skeleton as corpus boilerplate removal — corpus-frequency ops all
    reduce to it.
    """
    from healthcare_api_spark.functions.text import char_ngrams

    grams = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.transform(char_ngrams(F.col(text_col), gram_len), lambda g: F.md5(g))
            )
        ).alias("g"),
    )
    freq = (
        grams.groupBy("g").agg(F.count(F.lit(1)).alias("dfreq"))
        .filter(F.col("dfreq") >= min_docs)
        .select("g")
    )
    # shuffle_hash: corpus-sized gram-frequency side — never broadcast
    # (the ×100-sweep driver-OOM lesson; both sides g-partitioned)
    hits = grams.join(freq.hint("shuffle_hash"), "g").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_repeated")
    )
    return (
        df.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_repeated"), F.lit(0)).cast("bigint").alias("n_repeated"),
            (F.coalesce(F.col("n_repeated"), F.lit(0)) > 0).cast("int").alias("flagged"),
        )
    )


def canonical_per_cluster(
    members: DataFrame,
    ranking: DataFrame,
    id_col: str,
    cluster_col: str,
    rank_col: str,
    descending: bool = True,
) -> DataFrame:
    """Policy-driven canonical selection over near-dup clusters: instead
    of the min-id representative the clustering emits, keep the member
    that maximizes (default) or minimizes ``rank_col`` — e.g. longest
    text, highest quality score, newest version. Deterministic: rank
    ties break on the smaller id.

    Output: one row per cluster — (cluster, canonical id, members).
    One equi-join (rank frame is usually the same table the members came
    from) and one per-cluster window; both shuffle on keys that dedup
    already shuffled on, so this composes at the end of the pipeline for
    one extra exchange at most.
    """
    from pyspark.sql import Window

    joined = members.join(ranking, id_col)
    order = [
        F.col(rank_col).desc() if descending else F.col(rank_col).asc(),
        F.col(id_col).asc(),
    ]
    w = Window.partitionBy(cluster_col).orderBy(*order)
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .withColumn("_m", F.count(F.lit(1)).over(Window.partitionBy(cluster_col)))
        .filter(F.col("_rn") == 1)
        .select(
            F.col(cluster_col),
            F.col(id_col).alias("canonical_id"),
            F.col("_m").cast("bigint").alias("n_members"),
        )
    )


def fuzzy_string_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_col: str,
    right_id: str,
    right_col: str,
    max_dist: int = 2,
    block_chars: int = 4,
    broadcast_right: bool = False,
) -> DataFrame:
    """Approximate string join (entity resolution): candidate pairs via
    equality on a cheap blocking key (shared ``block_chars`` prefix),
    then EXACT Levenshtein verification ≤ ``max_dist`` — never an
    all-pairs product, the same candidates-then-verify shape as the
    MinHash/LSH dedup family. Output: (left id, right id, dist).

    Prefix blocking misses matches whose edits fall inside the first
    ``block_chars`` characters — production entity resolution runs
    multiple blocking passes (prefix, suffix, sorted char n-grams) and
    unions the candidates; each pass is this same shuffle-on-block-key
    join. Levenshtein runs JVM-side (codegen) on candidates only.

    Cross-engine note: Levenshtein distance is CHARACTER-based in Spark
    and BYTE-based in some engines (DuckDB) — oracle comparisons must
    restrict to ASCII or normalize first.

    Verify cost: the distance runs with Spark's ``threshold`` argument —
    banded DP that early-exits past ``max_dist`` (O(k·n) per pair, not
    O(n²); measured 2.7× on the d11 block sizes). ``broadcast_right``
    additionally broadcasts the right side so candidates are generated
    and verified on the LEFT side's partitioning with no shuffle at all
    (another 2× there) — only valid when the right side fits in an
    executor; leave False for large-large joins, where the block-key
    shuffle (plus AQE skew split on hot blocks) is the scalable path.
    """
    lb = left.select(
        F.col(left_id).alias("_la"),
        F.col(left_col).alias("_ta"),
        F.substring(F.col(left_col), 1, block_chars).alias("_blk"),
    )
    rb = right.select(
        F.col(right_id).alias("_rb"),
        F.col(right_col).alias("_tb"),
        F.substring(F.col(right_col), 1, block_chars).alias("_blk"),
    )
    cand = lb.join(F.broadcast(rb) if broadcast_right else rb, "_blk")
    return (
        cand.withColumn("_d", F.levenshtein(F.col("_ta"), F.col("_tb"), max_dist))
        .filter((F.col("_d") >= 0) & (F.col("_d") <= max_dist))
        .select(
            F.col("_la").alias(left_id + "_l"),
            F.col("_rb").alias(right_id + "_r"),
            F.col("_d").cast("int").alias("dist"),
        )
    )


# ------------------------------------------------- sorted neighborhood --


def global_row_rank(
    df: DataFrame, order_cols: list[str], out_col: str = "rank", parts: int | None = None
) -> DataFrame:
    """Exact 0-based global rank of every ROW under ``order_cols`` —
    without the single-task global window (`row_number() OVER (ORDER BY
    …)` with no partition pulls the whole table through one task; the
    scale-killer). Same decomposition as layout.rank_normalize16 but
    over rows, not distinct values:

    1. ``repartitionByRange(order_cols)`` — partition *i* sorts strictly
       before partition *i+1* (localCheckpoint pins the SAMPLED range
       boundaries before the frame is read twice),
    2. per-partition counts → cumulative offsets on the driver (one int
       per partition — the only driver traffic),
    3. rank = offset[pid] + per-partition row_number (parallel windows).

    ``order_cols`` must be a total order (append a unique id) or ranks
    within ties are partition-dependent."""
    spark = df.sparkSession
    parts = parts or spark.sparkContext.defaultParallelism
    cols = [F.col(c) for c in order_cols]
    ranged = (
        df.repartitionByRange(parts, *cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = {
        r["_pid"]: r["n"]
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    total, offsets = 0, {}
    for pid in sorted(counts):
        offsets[pid] = total
        total += counts[pid]
    if total == 0:
        return df.withColumn(out_col, F.lit(None).cast("bigint"))
    off_map = F.create_map(
        *[x for pid in sorted(counts) for x in (F.lit(pid), F.lit(offsets[pid]))]
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    return ranged.withColumn(
        out_col,
        (off_map[F.col("_pid")] + F.row_number().over(w) - 1).cast("bigint"),
    ).drop("_pid")


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    key_col: str,
    window: int = 5,
) -> DataFrame:
    """Sorted-neighborhood entity blocking (Hernández & Stolfo 1995),
    the sort-based alternative to LSH banding: order all records by the
    blocking key, slide a ``window``-record window, and emit every pair
    that co-occurs — O(n·window) candidates instead of O(n²), and unlike
    prefix blocking it tolerates typos ANYWHERE after the first sort-
    significant characters (near records stay near in sort order).

    Output: (id_a, key_a, id_b, key_b) with rank(a) < rank(b) ≤
    rank(a)+window−1 — candidates only; compose with an exact verifier
    (levenshtein/jaccard) downstream. Deterministic: ordering is
    (key, id), a total order.

    Shape at scale: one range-repartition (the global sort SNM is named
    for), driver traffic = one int per partition, then an equi-join of
    the ranked frame against itself on ``rank + δ`` (δ exploded 1..w−1)
    — never a cross join; skew-free because ranks are unique."""
    if window < 2:
        raise ValueError("window must be ≥ 2")
    ranked = global_row_rank(
        df.select(F.col(id_col), F.col(key_col)), [key_col, id_col], "_r"
    )
    left = ranked.select(
        F.col(id_col).alias("id_a"), F.col(key_col).alias("key_a"),
        F.explode(
            F.array(*[F.col("_r") + d for d in range(1, window)])
        ).alias("_rb"),
    )
    right = ranked.select(
        F.col(id_col).alias("id_b"), F.col(key_col).alias("key_b"),
        F.col("_r").alias("_rb"),
    )
    return left.join(right, "_rb").drop("_rb")


# --------------------------------------------------------- PassJoin --


def passjoin_pairs(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_col: str,
    right_id: str,
    right_col: str,
    max_dist: int = 2,
) -> DataFrame:
    """EXACT-recall edit-distance join (PassJoin, Li/Deng/Feng 2011
    simplified): every pair with levenshtein ≤ ``max_dist`` is found —
    unlike prefix blocking (documented misses) or sorted-neighborhood
    (window misses), this is the blocking scheme with a proof.

    Pigeonhole: partition each RIGHT string into k+1 segments; any
    left string within k edits must contain at least one segment
    VERBATIM, displaced by at most k positions (≤ k edits shift any
    alignment by ≤ k). So the left side probes substrings at every
    (target-length ∈ ±k, segment j, shift δ ∈ ±k) — a fixed
    O((2k+1)²·(k+1)) ≈ 75 probes per row at k=2, generated as one
    narrow array-explode. Candidates equi-join on (length, segment#,
    substring) and only candidates pay the (threshold'd, banded-DP)
    Levenshtein verify. Never all-pairs; shuffle keys are short
    substrings.

    Output: (left_id+'_l', right_id+'_r', dist), distinct pairs.
    NULL/empty strings never match (levenshtein needs content).
    """
    if max_dist < 1:
        raise ValueError("max_dist must be ≥ 1")
    k = max_dist
    n = k + 1

    def seg_start(ls, j):  # 1-based start of segment j for length ls
        base, rem = F.floor(ls / n), ls % n
        # the first (n - rem) segments are short (length = base)
        return (j * base + F.greatest(F.lit(0), F.lit(j) - (F.lit(n) - rem)) + 1)

    def seg_len(ls, j):
        base, rem = F.floor(ls / n), ls % n
        return base + F.when(F.lit(j) >= F.lit(n) - rem, 1).otherwise(0)

    rlen = F.length(F.col(right_col))
    rsegs = F.array(*[
        F.struct(
            F.lit(j).alias("j"),
            seg_start(rlen, j).cast("int").alias("p"),
            seg_len(rlen, j).cast("int").alias("l"),
        )
        for j in range(n)
    ])
    rx = (
        right.filter(F.length(F.col(right_col)) >= 1)
        .select(
            F.col(right_id).alias("_rb"),
            F.col(right_col).alias("_tb"),
            rlen.cast("int").alias("_ls"),
            F.explode(rsegs).alias("_s"),
        )
        .select(
            "_rb", "_tb", "_ls", F.col("_s.j").alias("_j"),
            F.expr(f"substring(_tb, _s.p, _s.l)").alias("_seg"),
        )
        .filter(F.length("_seg") >= 1)
    )

    llen = F.length(F.col(left_col))
    probes = []
    for dl in range(-k, k + 1):
        ls = llen + dl
        for j in range(n):
            p = seg_start(ls, j)
            sl = seg_len(ls, j)
            for delta in range(-k, k + 1):
                # joint bound: δ = net shift BEFORE the matched segment,
                # and the net shift AFTER it must make up the remaining
                # length difference lt − ls = −dl, i.e. equals −dl − δ;
                # each consumes at least that many edits, their sum may
                # not exceed k. Trims probes ~2× (75 → 39 at k=2); exact
                # recall re-proven by the brute-force test (which caught
                # the sign of this very bound once).
                if abs(delta) + abs(dl + delta) > k:
                    continue
                start = p + delta
                probes.append(
                    F.struct(
                        ls.cast("int").alias("ls"),
                        F.lit(j).alias("j"),
                        start.cast("int").alias("p"),
                        sl.cast("int").alias("l"),
                    )
                )
    lx = (
        left.filter(F.length(F.col(left_col)) >= 1)
        .select(
            F.col(left_id).alias("_la"),
            F.col(left_col).alias("_ta"),
            llen.cast("int").alias("_lt"),
            F.explode(F.array(*probes)).alias("_p"),
        )
        .filter(
            (F.col("_p.ls") >= 1)
            & (F.col("_p.l") >= 1)
            & (F.col("_p.p") >= 1)
            & (F.col("_p.p") + F.col("_p.l") - 1 <= F.col("_lt"))
        )
        .select(
            "_la", "_ta",
            F.col("_p.ls").alias("_ls"), F.col("_p.j").alias("_j"),
            F.expr("substring(_ta, _p.p, _p.l)").alias("_seg"),
        )
    )
    # dedup candidates on the ID PAIR only (a pair can match on several
    # segments) — the distinct shuffle then carries two ids, not two
    # full strings; the strings rejoin from the compact per-side frames
    cand_ids = (
        lx.join(rx, ["_ls", "_j", "_seg"])
        .select("_la", "_rb")
        .distinct()
    )
    lstr = left.select(F.col(left_id).alias("_la"), F.col(left_col).alias("_ta"))
    rstr = right.select(F.col(right_id).alias("_rb"), F.col(right_col).alias("_tb"))
    cand = cand_ids.join(lstr, "_la").join(rstr, "_rb")
    return (
        cand.withColumn("_d", F.levenshtein(F.col("_ta"), F.col("_tb"), k))
        .filter((F.col("_d") >= 0) & (F.col("_d") <= k))
        .select(
            F.col("_la").alias(left_id + "_l"),
            F.col("_rb").alias(right_id + "_r"),
            F.col("_d").cast("int").alias("dist"),
        )
    )


# --------------------------------------------------------- SemDeDup --


def semdedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 16,
    threshold: float = 0.95,
    iters: int = 3,
    keep: str = "min_id",
    centroids: list[list[float]] | None = None,
    max_iter: int = 10,
    oversize_factor: float = 4.0,
    on_oversized: str = "warn",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic deduplication by embedding —
    k-means-cluster the embedding space, find cosine-≥ θ pairs WITHIN
    each cluster only, connected-component them, keep one document per
    semantic group. The cluster scoping is what makes it tractable: the
    pair join is bounded by cluster populations, never corpus² (the
    paper's observation: semantic dups land in the same k-means cell).

    Output: (id, cluster, semantic_group, keep) for every input row —
    ``keep = 1`` on the per-group representative (lowest id; plug a
    quality rank in via canonical_per_cluster for keep-best).

    Scale shape: ivf_train moves only k×dim floats to the driver per
    iteration; assignment is a narrow expression; the in-cluster pair
    join shuffles on the cluster key (write the table partitioned by
    cluster and it co-locates); component labels come from the
    iterative min-label propagation (cluster_pairs).

    Guards (r7, the kcore ``on_nonconverged`` pattern): the in-cluster
    pair cost is Σ|cell|², so ONE oversized cell silently dominates the
    whole job at corpus scale — when the largest cell exceeds
    ``oversize_factor · n/k`` the behavior follows ``on_oversized``:
    ``"warn"`` (default), ``"raise"``, or ``"ignore"`` (also skips the
    one extra count aggregate the check costs). ``max_iter`` forwards
    to the min-label propagation — cluster_pairs already warns when a
    component's diameter exceeds the budget, and raising it here (or
    run-to-convergence semantics) no longer requires bypassing
    semdedup's signature.
    """
    from healthcare_api_spark.operators.similarity import ivf_assign, ivf_train

    if on_oversized not in ("warn", "raise", "ignore"):
        raise ValueError("on_oversized must be 'warn', 'raise', or 'ignore'")
    # precomputed centroids (a frozen offline-trained artifact) make the
    # whole pipeline engine-reproducible — every remaining step is
    # deterministic double math / integer min-propagation
    cents = (
        centroids
        if centroids is not None
        else ivf_train(df, id_col, vec_col, k=k, iters=iters)
    )
    # pin the assignment once: it feeds the guard, BOTH sides of the
    # in-cluster pair join, the label id set, and the final join — five
    # consumers that would otherwise each recompute the argmin pass.
    # At corpus scale this is the "write the assigned table partitioned
    # by cluster" step; localCheckpoint is its in-session equivalent
    # (executor storage, disk overflow).
    assigned = ivf_assign(df, vec_col, cents).localCheckpoint(eager=True)
    if on_oversized != "ignore":
        stats = (
            assigned.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("_c"))
            .agg(F.sum("_c").alias("_n"), F.max("_c").alias("_mx"))
            .head()
        )
        n, mx = stats["_n"] or 0, stats["_mx"] or 0
        cap = oversize_factor * n / max(len(cents), 1)
        if mx > cap:
            msg = (
                f"semdedup: largest k-means cell holds {mx} of {n} rows "
                f"(> {oversize_factor}·n/k = {cap:.0f}); the in-cluster "
                f"pair join is Σ|cell|² and this cell dominates at scale "
                f"— raise k / retrain centroids, or pass "
                f"on_oversized='ignore'."
            )
            if on_oversized == "raise":
                raise RuntimeError(msg)
            import warnings

            warnings.warn(msg, stacklevel=2)
    pairs = embedding_neardup_pairs(
        assigned, id_col, vec_col, "cluster", threshold=threshold
    ).select("id_a", "id_b")
    labels = cluster_pairs(
        pairs, assigned.select(F.col(id_col).alias("id")), "id",
        max_iter=max_iter,
    )
    out = assigned.select(F.col(id_col), "cluster").join(
        labels.select(
            F.col("id").alias(id_col), F.col("cluster_id").alias("semantic_group")
        ),
        id_col,
    )
    if keep != "min_id":
        raise ValueError("keep='min_id' is the only built-in policy; compose"
                         " canonical_per_cluster for quality-aware selection")
    w = Window.partitionBy("semantic_group")
    return out.withColumn(
        "keep", (F.col(id_col) == F.min(F.col(id_col)).over(w)).cast("int")
    )


def cluster_pairs_incremental(
    prev_labels: DataFrame,
    delta_pairs: DataFrame,
    id_col: str = "id",
    max_iter: int = 10,
) -> DataFrame:
    """Incrementally maintain connected-component labels as NEW edges
    arrive — without re-propagating over the historical edge set.
    Contraction: the previous labeling already collapses every old
    component to one representative, so it suffices to run CC over the
    delta edges PROJECTED onto label space (old_label ↔ old_label),
    then compose the two mappings. Appending a day's worth of near-dup
    pairs to a 100 TB corpus costs O(delta + |labels|), never a rescan
    of every historical edge — the same contract as a12's aggregate
    maintenance, for graphs.

    ``prev_labels``: (id, cluster_id) from a prior cluster_pairs run.
    ``delta_pairs``: (id_a, id_b) new edges; endpoints absent from
    ``prev_labels`` enter as singletons. Output: the updated full
    (id, cluster_id) — identical to a from-scratch run on old∪new edges
    (labels are min-ids, and min is associative over the merge).
    """
    prev = prev_labels.select(
        F.col(id_col).alias("_id"), F.col("cluster_id").alias("_lab")
    )
    new_ids = (
        delta_pairs.select(F.col("id_a").alias("_id"))
        .unionByName(delta_pairs.select(F.col("id_b").alias("_id")))
        .distinct()
        .join(prev, "_id", "left_anti")
        .select("_id", F.col("_id").alias("_lab"))
    )
    full = prev.unionByName(new_ids).localCheckpoint(eager=True)
    # project delta edges into label space (contract old components)
    la = full.select(F.col("_id").alias("id_a"), F.col("_lab").alias("_la"))
    lb = full.select(F.col("_id").alias("id_b"), F.col("_lab").alias("_lb"))
    meta_edges = (
        delta_pairs.join(la, "id_a").join(lb, "id_b")
        .select(F.col("_la").alias("id_a"), F.col("_lb").alias("id_b"))
        .filter(F.col("id_a") != F.col("id_b"))
        .distinct()
    )
    meta_nodes = full.select(F.col("_lab").alias("id")).distinct()
    meta = cluster_pairs(meta_edges, meta_nodes, "id", max_iter=max_iter)
    return (
        full.join(meta, full["_lab"] == meta["id"])
        .select(F.col("_id").alias(id_col), F.col("cluster_id"))
    )


# ------------------------------------------------- sparse cosine join --


def sparse_cosine_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    max_df_frac: float = 0.5,
) -> DataFrame:
    """Document-to-document cosine similarity over SPARSE tf-idf
    vectors via posting lists — the IR workhorse for text near-dup at
    corpus scale: no embeddings needed, candidates arise only from
    SHARED TOKENS (the inverted index IS the blocker), and the score
    is exact for every emitted pair.

        cos(a,b) = Σ_t w_at·w_bt / (‖a‖‖b‖),  w = tf·ln(N/df)

    ``max_df_frac`` drops tokens present in more than that fraction of
    documents — the classic stop-token prune: ubiquitous tokens add
    ~nothing to cosine but quadratic join volume (they are also the
    join-skew risk; pruning is the scale fix AND the semantics fix).
    Dropped tokens are excluded from norms too, so the reported cosine
    is exact over the retained vocabulary.

    Output: (id_a, id_b, cos) with id_a < id_b, cos ≥ threshold.
    Shape at scale: tf (doc,tok) aggregate → df/N (token aggregate,
    broadcast N) → posting-list self-join keyed by token (shuffle ∝
    Σ_t df_t², bounded by the prune) → pair aggregate (map-side
    combine) → one join to per-doc norms. Every step keyed, no
    cartesian anything."""
    from healthcare_api_spark.functions.text import tokens

    if not 0 < max_df_frac <= 1:
        raise ValueError("max_df_frac must be in (0, 1]")
    tf = (
        df.select(F.col(id_col).alias("_id"), F.explode(tokens(F.col(text_col))).alias("_t"))
        .groupBy("_id", "_t")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    dfreq = tf.groupBy("_t").agg(F.count(F.lit(1)).alias("_df"))
    n_docs = df.select(F.count(F.lit(1)).alias("_n"))
    w = (
        # shuffle_hash: corpus-sized term-df side — never broadcast
        # (the ×100-sweep driver-OOM lesson; both sides _t-partitioned)
        tf.join(dfreq.hint("shuffle_hash"), "_t")
        .crossJoin(F.broadcast(n_docs))
        .filter(F.col("_df") <= F.col("_n") * max_df_frac)
        .select(
            "_id", "_t",
            (F.col("_tf") * F.log(F.col("_n") / F.col("_df"))).alias("_w"),
        )
    )
    norms = w.groupBy("_id").agg(F.sqrt(F.sum(F.col("_w") * F.col("_w"))).alias("_nrm"))
    a = w.select(F.col("_id").alias("id_a"), "_t", F.col("_w").alias("_wa"))
    b = w.select(F.col("_id").alias("id_b"), "_t", F.col("_w").alias("_wb"))
    dots = (
        a.join(b, "_t")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("_wa") * F.col("_wb")).alias("_dot"))
    )
    na = norms.select(F.col("_id").alias("id_a"), F.col("_nrm").alias("_na"))
    nb = norms.select(F.col("_id").alias("id_b"), F.col("_nrm").alias("_nb"))
    cos = F.col("_dot") / (F.col("_na") * F.col("_nb"))
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .filter(cos >= threshold)
        .select("id_a", "id_b", F.round(cos, 6).alias("cos"))
    )


# ------------------------------------------------ sentence-level dedup --

def sentence_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = r"\. ",
    joiner: str = ". ",
) -> DataFrame:
    """Corpus-wide sentence-level exact dedup (MassiveText / CCNet line
    dedup, adapted to this corpus's single-line documents): split every
    document into sentences, keep only the globally FIRST occurrence of
    each distinct sentence (first = smallest ``(doc_id, position)``),
    and reassemble each document from its surviving sentences in their
    original order.

    Reference parity: the reference pipeline dedups whole resources by
    id (upload.sh / the store's update-create semantics); sub-document
    dedup is the LLM-pipeline extension (SURVEY.md §2.10) — removing
    boilerplate sentences repeated across crawled pages is standard
    pre-training curation (Rae et al. 2021 §A1.2; Lee et al. 2022).

    Output: (id, text_deduped, n_sentences, n_kept) — one row per input
    doc, ``text_deduped`` empty when every sentence was seen earlier.

    Scale shape: posexplode is narrow; the survivor decision is ONE
    shuffle keyed by sentence fingerprint (md5, uniform — no skew from
    long docs; identical boilerplate sentences land in one group whose
    size AQE handles); reassembly is ONE shuffle back on doc id with
    map-side partial collect. Nothing is O(corpus²) and no driver-side
    state: the seen-set IS the fingerprint partitioning.
    """
    # NULL text would explode to zero rows and silently DROP the doc
    # from the output — normalize to the empty string instead (one
    # empty sentence, doc retained with n_kept ∈ {0, 1})
    parts = (
        df.select(
            F.col(id_col),
            F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), sep)),
        )
        .withColumnRenamed("pos", "_pos")
        .withColumnRenamed("col", "_sent")
    )
    w = Window.partitionBy("_fp").orderBy(F.col(id_col).asc(), F.col("_pos").asc())
    kept = (
        parts.withColumn("_fp", F.md5(F.col("_sent")))
        .withColumn("_rn", F.row_number().over(w))
    )
    # reassemble: sort surviving (pos, sentence) structs per doc — the
    # collect_list order is nondeterministic across partitions, the
    # array_sort makes it exact
    rebuilt = (
        kept.groupBy(id_col)
        .agg(
            F.count("*").alias("n_sentences"),
            F.sum(F.when(F.col("_rn") == 1, 1).otherwise(0)).alias("n_kept"),
            F.array_sort(
                F.collect_list(
                    F.when(F.col("_rn") == 1, F.struct(F.col("_pos"), F.col("_sent")))
                )
            ).alias("_kept"),
        )
        .select(
            F.col(id_col),
            F.array_join(F.transform(F.col("_kept"), lambda s: s["_sent"]), joiner)
            .alias("text_deduped"),
            F.col("n_sentences").cast("bigint").alias("n_sentences"),
            F.col("n_kept").cast("bigint").alias("n_kept"),
        )
    )
    return rebuilt


def hamming_neardup_pairs(
    df: DataFrame,
    id_col: str,
    hash_col: str,
    max_hamming: int = 3,
    bands: int = 4,
    allow_lossy: bool = False,
) -> DataFrame:
    """Near-duplicate pairs by Hamming distance over a 64-bit hex hash
    column (16 hex chars: a perceptual image ahash, a SimHash, any
    64-bit fingerprint) — banded blocking, never all-pairs.

    Pigeonhole recall guarantee: a pair with Hamming ≤ ``bands − 1``
    differs in fewer bits than there are bands, so at least one band
    is IDENTICAL and the pair surfaces from that band's equi-join —
    exact recall at ``max_hamming < bands`` (the d13/PassJoin
    argument, in bit space). ``max_hamming ≥ bands`` silently loses
    pairs, so it raises unless ``allow_lossy=True``.

    Scale shape (r7 rework): the bands equi-join over the DISTINCT
    hash set, not raw rows — on duplicate-heavy corpora (the near-dup
    use case: image groups share one identical ahash) banding raw rows
    makes every identical-hash group of size g contribute g² candidate
    rows PER BAND before the verify; banding distinct hashes caps each
    band bucket's fan-out at the number of distinct near hashes, and
    identical-hash groups expand to pairs only AFTER the verify — so
    total work is candidate-bounded + OUTPUT-bounded (the emitted
    pairs themselves), never band-amplified. ``bands`` equi-joins on
    16-bit band keys, union → distinct hash pairs, exact Hamming
    verify via two 32-bit xor+bit_count halves (the full 64-bit value
    overflows a signed BIGINT), then two output expansions: verified
    cross-hash pairs × their id groups, and C(g,2) Hamming-0 pairs
    within each identical-hash group — all JVM-side, no UDF.

    Input hex is case-normalized with ``lower()`` (the band keys are
    string-equality while the Hamming verify is numeric — without
    normalization an 'A' vs 'a' fingerprint would silently fail the
    band join but pass the verify). Output: (id_a, id_b, hamming)
    with id_a < id_b.
    """
    if not 1 <= bands <= 16 or 16 % bands:
        raise ValueError("bands must divide the 16 hex chars")
    if max_hamming >= bands and not allow_lossy:
        raise ValueError(
            f"max_hamming={max_hamming} ≥ bands={bands} loses pairs "
            f"(pigeonhole guarantee needs max_hamming < bands); raise "
            f"bands or pass allow_lossy=True"
        )
    band_w = 16 // bands
    # pin the narrow (id, hash) projection: it feeds the distinct-hash
    # band set, both expansion joins, and the same-hash self-join — if
    # the hash column is itself computed (m14: a full PNG decode →
    # ahash pipeline), every consumer would otherwise recompute it.
    # Two columns wide, so the cache is fingerprint-sized, not corpus-
    # sized.
    members = df.select(
        F.col(id_col).alias("_id"), F.lower(F.col(hash_col)).alias("_h")
    ).localCheckpoint(eager=True)
    hashes = members.select("_h").distinct().select(
        "_h",
        F.conv(F.substring("_h", 1, 8), 16, 10).cast("long").alias("_x1"),
        F.conv(F.substring("_h", 9, 8), 16, 10).cast("long").alias("_x2"),
    )
    cand = None
    for b in range(bands):
        key = F.substring(F.col("_h"), b * band_w + 1, band_w)
        a = hashes.select(
            F.col("_h").alias("_ha"),
            F.col("_x1").alias("_a1"),
            F.col("_x2").alias("_a2"),
            key.alias("_k"),
        )
        bb = hashes.select(
            F.col("_h").alias("_hb"),
            F.col("_x1").alias("_b1"),
            F.col("_x2").alias("_b2"),
            key.alias("_k"),
        )
        p = a.join(bb, "_k").filter(F.col("_ha") < F.col("_hb")).drop("_k")
        cand = p if cand is None else cand.unionByName(p)
    ham = (
        F.bit_count(F.col("_a1").bitwiseXOR(F.col("_b1")))
        + F.bit_count(F.col("_a2").bitwiseXOR(F.col("_b2")))
    )
    hpairs = (
        cand.distinct()
        .withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("_ha", "_hb", "hamming")
    )
    cross = (
        hpairs.join(
            members.select(F.col("_id").alias("_ia"), F.col("_h").alias("_ha")),
            "_ha",
        )
        .join(
            members.select(F.col("_id").alias("_ib"), F.col("_h").alias("_hb")),
            "_hb",
        )
        .select(
            F.least("_ia", "_ib").alias("id_a"),
            F.greatest("_ia", "_ib").alias("id_b"),
            "hamming",
        )
    )
    same = (
        members.select(F.col("_id").alias("id_a"), "_h")
        .join(members.select(F.col("_id").alias("id_b"), "_h"), "_h")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.lit(0).cast("int").alias("hamming"))
    )
    return cross.unionByName(same)


def hamming_topk(
    df: DataFrame,
    id_col: str,
    hash_col: str,
    probe_hex: str,
    k: int = 10,
    max_hamming: int = 3,
    bands: int = 4,
    allow_lossy: bool = False,
) -> DataFrame:
    """Hash-adjacent RETRIEVAL: the closest ``k`` rows to a probe
    64-bit fingerprint by Hamming distance (perceptual image ahash,
    SimHash, any 16-hex-char hash) — the point-lookup twin of
    :func:`hamming_neardup_pairs` (pairs within a corpus) and the
    Hamming analogue of the v2 LSH probe (reference has no native
    image retrieval at all; this rounds out multimodal similarity as
    a first-class retrieval path).

    The probe's band keys are LITERALS, so the candidate filter
    ``OR_b substring(hash, off_b, w) = probe_band_b`` needs no join
    and no shuffle: it pushes into the scan, and the only exchange in
    the plan is the final TakeOrderedAndProject. Pigeonhole recall:
    any row within Hamming ≤ ``bands − 1`` matches the probe exactly
    in ≥ 1 band, so recall is EXACT at ``max_hamming < bands`` (the
    hamming_neardup_pairs guarantee, probe-sided); ``max_hamming ≥
    bands`` raises unless ``allow_lossy=True``. The verify is the
    same two 32-bit xor+bit_count halves, all JVM-side.

    Output: (id, hash, hamming) ordered by (hamming, id), ≤ k rows.
    """
    probe = probe_hex.lower()
    if len(probe) != 16 or any(c not in "0123456789abcdef" for c in probe):
        raise ValueError(f"probe_hex must be 16 hex chars, got {probe_hex!r}")
    if not 1 <= bands <= 16 or 16 % bands:
        raise ValueError("bands must divide the 16 hex chars")
    if max_hamming >= bands and not allow_lossy:
        raise ValueError(
            f"max_hamming={max_hamming} ≥ bands={bands} loses matches "
            f"(pigeonhole guarantee needs max_hamming < bands); raise "
            f"bands or pass allow_lossy=True"
        )
    band_w = 16 // bands
    h = F.lower(F.col(hash_col))
    cand = None
    for b in range(bands):
        m = F.substring(h, b * band_w + 1, band_w) == F.lit(
            probe[b * band_w : (b + 1) * band_w]
        )
        cand = m if cand is None else (cand | m)
    p1, p2 = int(probe[:8], 16), int(probe[8:], 16)
    ham = (
        F.bit_count(
            F.conv(F.substring(h, 1, 8), 16, 10).cast("long").bitwiseXOR(F.lit(p1))
        )
        + F.bit_count(
            F.conv(F.substring(h, 9, 8), 16, 10).cast("long").bitwiseXOR(F.lit(p2))
        )
    )
    return (
        df.filter(cand)
        .select(
            F.col(id_col).alias("id"),
            h.alias("hash"),
            ham.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .orderBy(F.col("hamming").asc(), F.col("id").asc())
        .limit(k)
    )


def prefix_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    tau_num: int = 3,
    tau_den: int = 5,
    shingle_n: int = 1,
) -> DataFrame:
    """EXACT-recall token-set Jaccard self-join via prefix filtering
    (AllPairs / PPJoin lineage — Bayardo et al. 2007, Xiao et al.
    2008): emit every unordered doc pair whose DISTINCT-token Jaccard
    is ≥ τ = ``tau_num / tau_den``, without the all-pairs cross
    product. The banded-MinHash path (d2/d6) trades recall for speed;
    this is its exact sibling, the d13-for-sets.

    How the prune stays lossless: tokens are globally ordered by
    (document frequency asc, token) — rarest first; a doc's PREFIX is
    its first |x| − ⌈τ·|x|⌉ + 1 tokens in that order. The prefix
    lemma guarantees two docs with J ≥ τ share a prefix token, so the
    candidate join is an equi-join on prefix tokens (bounded: rare
    tokens by construction), plus the lossless length-ratio prune
    τ·max ≤ min. Verification is EXACT INTEGER arithmetic —
    ``tau_den·overlap ≥ tau_num·(nx+ny−overlap)`` — so the output
    hashes identically in any engine, and the d18 oracle is the NAIVE
    all-pairs join: equality proves exact recall, the d13 pattern.

    Scale shape: one token-frequency aggregate, one frequency join,
    one per-doc sort+collect, a prefix-token equi-join (skew-immune by
    design: frequent tokens never land in prefixes), and a verify join
    on doc ids. Output: (id_a, id_b, n_a, n_b, overlap).

    ``shingle_n`` picks the set elements: 1 = distinct unigrams (the
    classic AllPairs setting), ≥ 2 = distinct word n-shingles (the d2
    convention) — on homogeneous corpora whose unigram vocabularies
    all overlap, shingles are what makes Jaccard (and therefore the
    prefix prune) discriminative at all.
    """
    if not (0 < tau_num <= tau_den):
        raise ValueError("need 0 < tau_num <= tau_den (tau in (0, 1])")
    if shingle_n < 1:
        raise ValueError("shingle_n must be >= 1")
    elems = (
        tokens(F.col(text_col))
        if shingle_n == 1
        else word_shingles(F.col(text_col), shingle_n)
    )
    toks = (
        df.select(F.col(id_col).alias("_id"), F.explode(elems).alias("_t"))
        .filter(F.col("_t") != "")
        .distinct()
        # feeds BOTH the frequency agg and the join back onto it —
        # without the pin the shingle regex + explode + distinct runs
        # twice inside one action (measured 8.8 → 6.4 s at sf0.1)
        .localCheckpoint(eager=True)
    )
    freq = toks.groupBy("_t").agg(F.count(F.lit(1)).alias("_df"))
    # per-doc token array in global (df, token) order — rarest first.
    # shuffle_hash hint: the frequency table is CORPUS-SIZED (one row
    # per distinct shingle); AQE judges it by compressed shuffle bytes
    # and will broadcast it under the threshold, but the in-memory
    # hash relation of string keys explodes ~50× — measured driver
    # OOM (3.3 GiB broadcast on 8g) at the ×100 replication sweep.
    # Both sides are already partitioned by _t (freq is derived FROM
    # toks grouped by _t), so the shuffle join reuses the exchange.
    arrs = (
        toks.join(freq.hint("shuffle_hash"), "_t")
        .groupBy("_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_df", "_t"))),
                lambda s: s["_t"],
            ).alias("_arr")
        )
        .withColumn("_n", F.size("_arr"))
        # prefix length |x| − ⌈τ|x|⌉ + 1, exact integer ceil
        .withColumn(
            "_plen",
            F.col("_n")
            - F.floor(
                (F.col("_n") * tau_num + tau_den - 1) / tau_den
            ).cast("int")
            + 1,
        )
        .localCheckpoint(eager=True)  # feeds both sides of two self-joins
    )
    pref = arrs.select(
        "_id",
        "_n",
        F.posexplode(F.slice("_arr", 1, F.col("_plen"))).alias("_p", "_t"),
    )
    a, b = pref.alias("a"), pref.alias("b")
    # PPJoin positional filter (also lossless): each array's prefix is
    # a DOWN-SET of the same global order, so no shared token can
    # precede the pair's FIRST shared prefix token c* (a smaller
    # shared token would itself be a prefix-prefix match) — hence
    # overlap ≤ 1 + min(nx − i*, ny − j*) with i*, j* the 1-based
    # positions of c*. Candidates whose bound misses the required
    # overlap t = τ/(1+τ)·(nx+ny) never reach the array_intersect
    # verify (measured at sf0.1: 193k candidates → the verify sees
    # only hundreds; 8.8 → 4.3 s end-to-end).
    cand = (
        a.join(
            b,
            (F.col("a._t") == F.col("b._t"))
            & (F.col("a._id") < F.col("b._id"))
            # lossless length-ratio prune: J ≥ τ ⟹ τ·max ≤ min
            & (F.col("a._n") * tau_num <= F.col("b._n") * tau_den)
            & (F.col("b._n") * tau_num <= F.col("a._n") * tau_den),
        )
        .groupBy(
            F.col("a._id").alias("_ia"),
            F.col("b._id").alias("_ib"),
        )
        .agg(
            # c* = the lexicographically-first shared (pos_x, pos_y):
            # positions of a given token agree with the global order on
            # both sides, so min over pairs IS the first shared token
            F.min(
                F.struct(
                    F.col("a._p").alias("pi"), F.col("b._p").alias("pj")
                )
            ).alias("_m"),
            F.first("a._n").alias("_na"),
            F.first("b._n").alias("_nb"),
        )
        .filter(
            (
                F.lit(1)
                + F.least(
                    F.col("_na") - F.col("_m.pi") - 1,
                    F.col("_nb") - F.col("_m.pj") - 1,
                )
            )
            * (tau_num + tau_den)
            >= (F.col("_na") + F.col("_nb")) * tau_num
        )
        .select("_ia", "_ib")
    )
    va = arrs.select(F.col("_id").alias("_ia"), F.col("_arr").alias("_aa"), F.col("_n").alias("n_a"))
    vb = arrs.select(F.col("_id").alias("_ib"), F.col("_arr").alias("_ab"), F.col("_n").alias("n_b"))
    verified = (
        cand.join(va, "_ia")
        .join(vb, "_ib")
        .withColumn("overlap", F.size(F.array_intersect("_aa", "_ab")))
        .filter(
            F.col("overlap") * tau_den
            >= (F.col("n_a") + F.col("n_b") - F.col("overlap")) * tau_num
        )
    )
    return verified.select(
        F.col("_ia").alias("id_a"),
        F.col("_ib").alias("id_b"),
        F.col("n_a").cast("int").alias("n_a"),
        F.col("n_b").cast("int").alias("n_b"),
        F.col("overlap").cast("int").alias("overlap"),
    )


def paragraph_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 25,
) -> DataFrame:
    """Paragraph-level exact deduplication — the CCNet/C4 pre-pass that
    removes REPEATED PASSAGES across a corpus (boilerplate, mirrored
    articles, licence blocks) while keeping each document's unique
    remainder, where document-level dedup (exact_dedup) would keep or
    drop whole docs only.

    "Paragraph" here is a fixed window of ``chunk_tokens`` consecutive
    whitespace tokens (the corpus has no newline structure; with real
    paragraphs, split on them instead — the machinery is identical).
    Each chunk occurrence is kept iff it is the corpus-wide FIRST
    occurrence of its content, first = lexicographic min (doc id,
    chunk idx) — deterministic, order-independent. Output per doc:
    (id, n_chunks, n_kept, text_dedup = surviving chunks rejoined in
    order; '' when everything was seen before).

    Scale shape: chunks shuffle ONCE keyed by md5(chunk) for the
    first-occurrence window (16-byte keys; the window needs no global
    order, only per-hash), then once by doc id to reassemble — both
    plain hash exchanges, no self-join and no candidate blow-up, so
    the cost is O(corpus tokens) end to end at any corpus size. md5
    equality stands in for string equality (collision odds ~2^-64 at
    corpus scale; swap in the raw chunk as grouping key if that is
    ever unacceptable).
    """
    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")
    from pyspark.sql import Window

    toks = F.split(F.col(text_col), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(chunk_tokens)).cast("int")
    chunks = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.when(
                F.size(toks) > 0,
                F.transform(
                    F.sequence(F.lit(0), n_chunks - 1),
                    lambda i: F.array_join(
                        F.slice(toks, i * chunk_tokens + 1, chunk_tokens), " "
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("idx", "chunk"),
    )
    w = Window.partitionBy(F.md5(F.col("chunk"))).orderBy("_id", "idx")
    flagged = chunks.withColumn(
        "_kept", (F.row_number().over(w) == 1).cast("int")
    )
    kept_struct = F.when(
        F.col("_kept") == 1, F.struct(F.col("idx"), F.col("chunk"))
    )
    return (
        flagged.groupBy(F.col("_id").alias(id_col))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.sum("_kept").cast("bigint").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("text_dedup"),
        )
    )


def cdc_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 16,
    mask_bits: int = 6,
) -> DataFrame:
    """Content-defined chunking dedup (the FastCDC/LBFS idea, public:
    Muthitacharoen et al. 2001): split each document at positions where
    a hash of the TRAILING ``window`` characters has ``mask_bits``
    trailing zero... i.e. ``h % 2^mask_bits == 0`` — so chunk
    boundaries are decided by CONTENT, not offsets. Insert one
    character into a doc and fixed-stride chunking (d19) shifts every
    later chunk; CDC re-synchronizes at the next content boundary
    (~2^mask_bits chars), which is what makes chunk-level dedup
    robust to edits — the backup/dedup-storage trick applied to
    corpus curation.

    Engine-portable formulation: the boundary hash is md5 of the
    window substring (first 8 hex digits as int) — each position is
    INDEPENDENT, so the whole split is array expressions (sequence →
    filter → slice/zip), no window functions, no UDFs, no recurrence.
    Expected chunk length is 2^mask_bits characters; docs shorter than
    ``window`` are one chunk. A production 100 TB variant swaps the
    per-position md5 for an incremental gear hash inside mapInPandas
    (same boundaries-by-content contract); the declarative form here
    trades that CPU for bit-portability — the corpus-level work
    (ONE md5(chunk)-keyed first-occurrence window, the d19 shape) is
    identical in both.

    Output: (id, chunk_idx, start_pos, chunk_len, chunk_md5, keep) —
    keep = 1 on the corpus-wide FIRST occurrence of the chunk content
    (by (id, chunk_idx) order), 0 on every later copy.
    """
    from pyspark.sql import Window

    if window < 1:
        raise ValueError("window must be >= 1")
    if mask_bits < 1:
        raise ValueError("mask_bits must be >= 1")
    mask = 1 << mask_bits
    t = text_col
    # Boundary detection runs md5 as a PLAIN column expression over
    # exploded positions, NOT inside an array-lambda: higher-order
    # lambdas evaluate interpreted (outside whole-stage codegen), and
    # an interpreted md5 per character position costs ~10 µs — 29 s at
    # sf0.1 measured. Exploding first keeps the hash in codegen
    # (<1 s same data); the price is ONE id-keyed re-aggregation of
    # boundary ints — a shuffle of (id, int) pairs, never text.
    pos = df.select(
        F.col(id_col),
        F.posexplode(
            F.expr(f"sequence({window}, greatest(length({t}), {window}))")
        ).alias("_junk", "_i"),
        F.col(t).alias("_txt"),
    ).filter(F.col("_i") <= F.length("_txt"))
    hits = pos.filter(
        F.conv(
            F.substring(
                F.md5(F.expr(f"substring(_txt, _i - {window} + 1, {window})")),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % mask
        == 0
    ).groupBy(id_col).agg(F.sort_array(F.collect_set("_i")).alias("_bnds"))
    with_bounds = (
        df.select(F.col(id_col), F.col(t))
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.col(t),
            F.expr(
                f"array_sort(array_distinct(concat("
                f" coalesce(_bnds, array()), array(length({t})))))"
            ).alias("_ends"),
        )
        .withColumn(
            "_starts",
            F.concat(
                F.array(F.lit(0)),
                F.slice(F.col("_ends"), 1, F.size("_ends") - 1),
            ),
        )
    )
    chunks = (
        with_bounds.select(
            F.col(id_col),
            F.col(t),
            F.posexplode(
                F.arrays_zip(
                    F.col("_starts").alias("s"), F.col("_ends").alias("e")
                )
            ).alias("chunk_idx", "_z"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx"),
            F.col("_z.s").alias("start_pos"),
            (F.col("_z.e") - F.col("_z.s")).alias("chunk_len"),
            F.md5(
                F.expr(f"substring({t}, _z.s + 1, _z.e - _z.s)")
            ).alias("chunk_md5"),
        )
        .filter(F.col("chunk_len") > 0)
    )
    w = Window.partitionBy("chunk_md5").orderBy(id_col, "chunk_idx")
    return chunks.withColumn(
        "keep", (F.row_number().over(w) == 1).cast("int")
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    tau_num: int = 9,
    tau_den: int = 10,
    shingle_n: int = 3,
) -> DataFrame:
    """EXACT-recall set-CONTAINMENT join: every ORDERED pair (a, b),
    a ≠ b, with |A∩B| ≥ τ·|A| over distinct token/shingle sets — the
    asymmetric sibling of :func:`prefix_jaccard_pairs`. Jaccard misses
    the quote/subset case by construction (a short doc fully contained
    in a long one has tiny J); containment is the metric behind
    "B quotes A", nested mirrors, and training-data plagiarism sweeps.

    Losslessness: with required overlap t = ⌈τ·n_a⌉ ≥ 1, the prefix
    lemma says A's first n_a − t + 1 elements in ANY global order must
    include a shared element — so joining A-prefixes (global
    rarest-first order, the d18 machinery) against B's FULL element
    set is exact. There is no length-ratio prune (B may be arbitrarily
    large — that asymmetry is the point). Skew: the B side fans out
    only where a PREFIX token matches, and prefix tokens are globally
    rare by construction (frequent tokens never enter prefixes — the
    d18 argument), so candidates stay Σ prefix_count(t)·df(t) over
    rare t, never |A|·|B|.

    Verification is exact integer arithmetic
    (``tau_den·overlap ≥ tau_num·n_a``); the oracle is the
    any-shared-element join (lossless for τ > 0) + the same verify —
    two disjoint routes, equality proves exact recall.

    Output: (id_a, id_b, n_a, n_b, overlap) with A = id_a contained
    in B = id_b.

    Output-size caveat (measured, SCALE.md): on a corpus with large
    MUTUAL-containment cliques (e.g. many exact or boilerplate-wrapped
    copies of one text) the answer itself is Θ(clique²) pairs — no
    algorithm can emit fewer rows than the true result. Run
    ``exact_dedup_by_content`` first (identical texts are trivially
    mutually contained; their pairs are exactly what exact dedup
    already reports), and treat a containment sweep like d18: a
    near-dup PRUNING pass, not a cross-product report.
    """
    if not (0 < tau_num <= tau_den):
        raise ValueError("need 0 < tau_num <= tau_den (tau in (0, 1])")
    if shingle_n < 1:
        raise ValueError("shingle_n must be >= 1")
    elems = (
        tokens(F.col(text_col))
        if shingle_n == 1
        else word_shingles(F.col(text_col), shingle_n)
    )
    toks = (
        df.select(F.col(id_col).alias("_id"), F.explode(elems).alias("_e"))
        .filter(F.col("_e") != "")
        # 60-bit md5-prefix digests replace the raw shingle strings for
        # everything downstream: the per-doc element arrays shrink ~4×
        # (8-byte longs vs ~35-char strings), which is what the verify
        # join ships on BOTH sides — the r9 ×100 sweep measured this
        # join spilling past a 32 g pool with raw-string arrays (the
        # d21 memory knee, SCALE.md). The oracle computes the SAME
        # digest (('0x'||substr(md5,1,15))::BIGINT), so any collision
        # merges identically in both engines and hash parity is exact,
        # not probabilistic. The prefix lemma holds for ANY global
        # order, so ordering by (df, digest) stays lossless.
        .select(
            "_id",
            F.conv(F.substring(F.md5("_e"), 1, 15), 16, 10)
            .cast("long")
            .alias("_t"),
        )
        .distinct()
        .localCheckpoint(eager=True)  # feeds freq agg, the B side, and arrs
    )
    freq = toks.groupBy("_t").agg(F.count(F.lit(1)).alias("_df"))
    arrs = (
        # shuffle_hash: the df table is corpus-sized — AQE would
        # broadcast it by compressed-bytes estimate and the string-key
        # hash relation blows the driver (measured: 3.3 GiB broadcast
        # OOM at the ×100 sweep); both sides are already _t-partitioned
        toks.join(freq.hint("shuffle_hash"), "_t")
        .groupBy("_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_df", "_t"))),
                lambda s: s["_t"],
            ).alias("_arr")
        )
        .withColumn("_n", F.size("_arr"))
        # prefix length n − ⌈τn⌉ + 1 (exact integer ceil)
        .withColumn(
            "_plen",
            F.col("_n")
            - F.floor(
                (F.col("_n") * tau_num + tau_den - 1) / tau_den
            ).cast("int")
            + 1,
        )
        .localCheckpoint(eager=True)  # feeds the prefix side and both verifies
    )
    pref = arrs.select(
        F.col("_id").alias("_ia"),
        F.explode(F.slice("_arr", 1, F.col("_plen"))).alias("_t"),
    )
    cand = (
        pref.join(toks.select(F.col("_id").alias("_ib"), "_t"), "_t")
        .filter(F.col("_ia") != F.col("_ib"))
        .select("_ia", "_ib")
        .distinct()
    )
    va = arrs.select(F.col("_id").alias("_ia"), F.col("_arr").alias("_aa"), F.col("_n").alias("n_a"))
    vb = arrs.select(F.col("_id").alias("_ib"), F.col("_arr").alias("_ab"), F.col("_n").alias("n_b"))
    verified = (
        cand.join(va, "_ia")
        .join(vb, "_ib")
        .withColumn("overlap", F.size(F.array_intersect("_aa", "_ab")))
        .filter(F.col("overlap") * tau_den >= F.col("n_a") * tau_num)
    )
    return verified.select(
        F.col("_ia").alias("id_a"),
        F.col("_ib").alias("id_b"),
        F.col("n_a").cast("int").alias("n_a"),
        F.col("n_b").cast("int").alias("n_b"),
        F.col("overlap").cast("int").alias("overlap"),
    )


def dedup_eval(
    pred_pairs: DataFrame,
    truth_pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Dedup-quality evaluation — precision / recall / F1 of a
    predicted near-dup PAIR set against a reference pair set (the
    eval every production dedup tracks next to its speed knob, and the
    dedup sibling of recall_at_k/ranking_eval for retrieval).

    Both inputs are normalized to unordered distinct pairs
    (least/greatest, self-pairs dropped), intersected with one
    equi-join, and reduced to a ONE-ROW frame:

      (n_pred, n_truth, n_hit, precision, recall, f1)

    Counts are exact int64; each ratio is a small-denominator rational
    rounded to 6 dp in EXACT integer arithmetic (the t30 decimal-tie
    rule — hit/n_pred ties at .0000005 genuinely occur), with
    F1 = 2·hit/(n_pred + n_truth) computed directly from the counts
    (no float P·R composition). Empty denominators yield NULL.

    Scale: everything after the two distincts is join + count —
    nothing driver-side, output constant-size at any corpus scale.
    """
    def _norm(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.least(F.col(id_a), F.col(id_b)).alias("_a"),
                F.greatest(F.col(id_a), F.col(id_b)).alias("_b"),
            )
            .filter(F.col("_a") != F.col("_b"))
            .distinct()
        )

    p = _norm(pred_pairs)
    t = _norm(truth_pairs)
    hit = p.join(t, ["_a", "_b"], "semi")
    np_ = p.agg(F.count(F.lit(1)).cast("bigint").alias("n_pred"))
    nt = t.agg(F.count(F.lit(1)).cast("bigint").alias("n_truth"))
    nh = hit.agg(F.count(F.lit(1)).cast("bigint").alias("n_hit"))
    one = np_.crossJoin(nt).crossJoin(nh)
    ratio = (
        "CASE WHEN ({d}) > 0 THEN"
        " CAST((2 * ({n}) * 1000000 + ({d})) DIV (2 * ({d})) AS DOUBLE)"
        " / 1000000.0 ELSE NULL END"
    )
    return one.select(
        "n_pred",
        "n_truth",
        "n_hit",
        F.expr(ratio.format(n="n_hit", d="n_pred")).alias("precision"),
        F.expr(ratio.format(n="n_hit", d="n_truth")).alias("recall"),
        F.expr(ratio.format(n="2 * n_hit", d="n_pred + n_truth")).alias("f1"),
    )
