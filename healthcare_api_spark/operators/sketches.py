"""Engine-portable frequency sketches.

The reference's analytics surface (SURVEY.md §2.6) carries approximate
aggregates; k1/k2 cover Spark's built-in HLL++ / KLL sketches, whose
binary state is engine-specific (rows-only checks). This module adds a
**count-min sketch** (Cormode & Muthukrishnan 2005) built from md5
arithmetic only, so the *entire sketch state* — not just the estimates —
is bit-identical across engines and hash-verifiable against a SQL
oracle.

Scale shape: the sketch build is ONE ``groupBy`` whose output is bounded
by ``depth × width`` cells regardless of input volume — map-side combine
reduces each partition to ≤ d·w partial cells before the shuffle, so the
exchange moves O(d·w × partitions) tiny rows for any input size. Lookups
broadcast the (tiny) sketch to the probe side. This is the standard
"sketch on 100 TB, query on a laptop" decomposition: heavy pass emits a
fixed-size summary; estimation never rescans the data.

Error bound: est(x) ∈ [c(x), c(x) + εN] with ε = e/width at confidence
1 − (1/e)^depth; the overestimate-only property is asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(key: F.Column, row: int, width: int) -> F.Column:
    """Hash row ``row``'s bucket for ``key``: first 8 hex chars of
    md5('<row>:<key>') as an integer, mod width. Pure md5+conv — the SQL
    twin is ``('0x' || substr(md5(r || ':' || key), 1, 8))::BIGINT % w``."""
    h = F.md5(F.concat_ws(":", F.lit(str(row)), key))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % width).alias(
        f"_b{row}"
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a count-min sketch over ``key_col``: one output row per
    non-empty cell ``(r, bucket, n)`` where ``n`` is the (weighted) count
    of keys hashing into that cell on hash-row ``r``.

    ``weight_col``: optional pre-aggregated counts (sketch of a frequency
    table instead of raw rows).
    """
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be ≥ 1")
    key = F.col(key_col).cast("string")
    w = F.col(weight_col) if weight_col else F.lit(1)
    cells = df.select(
        F.posexplode(F.array(*[_bucket(key, r, width) for r in range(depth)])).alias(
            "r", "bucket"
        ),
        w.alias("_w"),
    )
    return (
        cells.groupBy("r", "bucket")
        .agg(F.sum("_w").cast("bigint").alias("n"))
    )


def cms_lookup(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int,
    width: int,
) -> DataFrame:
    """Point-estimate each probe key against a built sketch:
    ``est = min over rows r of sketch[r][h_r(key)]`` (the classic CMS
    overestimate-only estimator). The sketch side is ≤ depth×width rows —
    broadcast explicitly so the probe side never shuffles."""
    key = F.col(key_col).cast("string")
    probed = probes.select(
        key_col,
        F.posexplode(
            F.array(*[_bucket(key, r, width) for r in range(depth)])
        ).alias("r", "bucket"),
    )
    joined = probed.join(F.broadcast(sketch), ["r", "bucket"], "left")
    # a missing cell means nothing ever hashed there → true count 0
    return (
        joined.groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("est"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    threshold: int = 100,
) -> DataFrame:
    """Keys whose CMS estimate ≥ ``threshold``, with the estimate.

    The candidate set is the distinct keys of ``df`` itself (exact
    heavy-hitter recall: CMS never underestimates, so every true heavy
    hitter survives; some near-threshold keys may overshoot in — the
    documented CMS false-positive direction). Build and probe are two
    aggregations sharing the input scan."""
    sketch = cms_build(df, key_col, depth=depth, width=width)
    probes = df.select(key_col).distinct()
    est = cms_lookup(sketch, probes, key_col, depth=depth, width=width)
    return est.filter(F.col("est") >= threshold)


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with the SAME (depth, width): cell-wise
    sum — the property that makes CMS distributable (partition sketches
    union into the corpus sketch; used by the streaming rollup path)."""
    return (
        a.unionByName(b)
        .groupBy("r", "bucket")
        .agg(F.sum("n").cast("bigint").alias("n"))
    )


# ------------------------------------------------------------------ KMV --


def kmv_build(
    df: DataFrame, group_cols: list[str], key_col: str, k: int = 64
) -> DataFrame:
    """Bottom-k (KMV) sketch per group: the k smallest md5 draws over
    DISTINCT keys, as a sorted array — the classic k-minimum-values
    distinct-count summary (Bar-Yossef et al. 2002). Like the CMS, the
    state is pure md5 arithmetic, so the whole sketch (and therefore
    the estimate) is engine-portable and hash-verifiable — unlike the
    opaque HLL++ binary behind k1.

    Output: (group…, n_seen ≤ k, kmv array<string of 8 hex>).

    Shape at scale: one distinct on (group, key) — the only shuffle a
    distinct-counter can avoid only by sketching *per partition* and
    merging (see kmv_merge, which exists exactly for that + streaming);
    then a per-group top-k window. State per group is k hashes.
    """
    if k < 2:
        raise ValueError("k must be ≥ 2")
    h = F.substring(F.md5(F.col(key_col).cast("string")), 1, 8)
    distinct = df.select(*group_cols, h.alias("_h")).distinct()
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(F.col("_h").asc())
    kept = distinct.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    return kept.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_seen"),
        F.sort_array(F.collect_list("_h")).alias("kmv"),
    )


def kmv_distinct(sketch: DataFrame, k: int = 64) -> DataFrame:
    """Distinct-count estimate from a KMV sketch: with fewer than k
    hashes the count is exact (= n_seen); otherwise n̂ = (k − 1) /
    h_(k) with h_(k) the k-th smallest hash scaled to (0, 1]. The
    estimate is a pure function of the (portable) sketch → identical in
    every engine. Appends ``est_distinct`` (rounded bigint)."""
    hk = F.conv(F.element_at(F.col("kmv"), -1), 16, 10).cast("double") / F.lit(
        float(1 << 32)
    )
    est = F.when(F.col("n_seen") < k, F.col("n_seen").cast("double")).otherwise(
        F.lit(float(k - 1)) / hk
    )
    return sketch.withColumn("est_distinct", F.round(est).cast("bigint"))


def kmv_merge(a: DataFrame, b: DataFrame, group_cols: list[str], k: int = 64) -> DataFrame:
    """Merge two KMV sketches (same k): bottom-k of the concatenated
    hash sets — the property that lets partition-local sketches union
    into the global one (and micro-batches fold into streaming state).
    """
    both = a.select(*group_cols, "kmv").unionByName(b.select(*group_cols, "kmv"))
    merged = both.groupBy(*group_cols).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("kmv")))),
            1, k,
        ).alias("kmv")
    )
    return merged.withColumn("n_seen", F.size("kmv").cast("bigint")).select(
        *group_cols, "n_seen", "kmv"
    )


def kmv_set_ops(sketch: DataFrame, group_col: str, k: int = 64) -> DataFrame:
    """Pairwise set-operation estimates between groups from their KMV
    sketches alone (Beyer et al. 2007 multiset synopses): for every
    unordered group pair, estimate |A∪B|, |A∩B| and the Jaccard
    similarity WITHOUT touching the raw data again — the union sketch
    is the bottom-k of the merged hash arrays, the intersection rate is
    the fraction of the union's bottom-k present in both inputs, and
    everything is a pure function of the (md5-portable) sketch state,
    so the estimates are engine-reproducible and hash-verifiable.

    When the merged hash set has fewer than k entries both sketches
    were complete and every output is EXACT; otherwise
    D̂(A∪B) = (k−1)/h_(k) and D̂(A∩B) = ρ·D̂(A∪B) with ρ = |bottom-k ∩
    A ∩ B| / k. Output per pair: (group_a, group_b, n_union ≤ k,
    est_union, n_inter_topk, est_intersection, jaccard 6dp).

    Scale shape: the input is one sketch ROW per group (k hashes), so
    the pair join is a broadcast self-join over #groups² sketch rows —
    the raw corpus is never rescanned; this is exactly why mergeable
    sketches exist at 100 TB.
    """
    a = sketch.select(
        F.col(group_col).alias("group_a"), F.col("kmv").alias("_ka")
    )
    b = sketch.select(
        F.col(group_col).alias("group_b"), F.col("kmv").alias("_kb")
    )
    pairs = a.join(F.broadcast(b), F.col("group_a") < F.col("group_b"))
    u = F.slice(
        F.array_sort(F.array_distinct(F.concat(F.col("_ka"), F.col("_kb")))),
        1, k,
    )
    paired = pairs.select("group_a", "group_b", "_ka", "_kb", u.alias("_u"))
    n_union = F.size("_u")
    inter = F.filter(
        F.col("_u"),
        lambda h: F.array_contains(F.col("_ka"), h)
        & F.array_contains(F.col("_kb"), h),
    )
    n_inter = F.size(inter)
    hk01 = F.conv(F.element_at(F.col("_u"), -1), 16, 10).cast("double") / F.lit(
        float(1 << 32)
    )
    est_u_raw = F.lit(float(k - 1)) / hk01
    exact = n_union < k
    return paired.select(
        "group_a",
        "group_b",
        n_union.cast("int").alias("n_union"),
        F.when(exact, n_union.cast("double"))
        .otherwise(F.round(est_u_raw))
        .cast("bigint")
        .alias("est_union"),
        n_inter.cast("int").alias("n_inter_topk"),
        F.when(exact, n_inter.cast("double"))
        .otherwise(F.round(n_inter.cast("double") * est_u_raw / F.lit(float(k))))
        .cast("bigint")
        .alias("est_intersection"),
        F.round(
            F.when(exact, n_inter.cast("double") / n_union.cast("double"))
            .otherwise(n_inter.cast("double") / F.lit(float(k))),
            6,
        ).alias("jaccard"),
    )


def hash_sample_build(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """Bottom-k-by-hash VALUE sample per group — the KMV idea pointed at
    quantiles: keep the rows whose md5(id) draws are the k smallest,
    with their values. Because md5 is a fixed uniform draw per row, the
    kept rows are a uniform k-sample of the group, and the state
    (sorted (hash, value) pairs) is engine-portable — the whole sketch,
    not just the estimate, is hash-verifiable against a SQL oracle
    (unlike the opaque KLL binary behind k2).

    Output: (group…, n_seen = k-capped sample size, n_total, sample
    array<struct<h: 8-hex string, v: double>> sorted by hash).

    Scale shape: one per-group top-k window (map-side partial top-k via
    the rank filter), state bounded at k rows per group. Merge with
    ``hash_sample_merge`` — bottom-k of the union of two samples is
    exactly the sample of the union (same draw function), so
    partition-local / micro-batch sketches fold associatively.
    Quantile error is the sampling error ~ O(1/√k).
    """
    if k < 2:
        raise ValueError("k must be ≥ 2")
    from pyspark.sql import Window

    h = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
    w = Window.partitionBy(*group_cols).orderBy(F.col("_h").asc(), F.col(id_col).asc())
    kept = (
        df.select(*group_cols, F.col(id_col), F.col(value_col).cast("double").alias("_v"))
        .withColumn("_h", h)
        .withColumn("_rn", F.row_number().over(w))
    )
    return (
        kept.groupBy(*group_cols)
        .agg(
            F.sum(F.when(F.col("_rn") <= k, 1).otherwise(0)).cast("bigint").alias("n_seen"),
            F.count(F.lit(1)).cast("bigint").alias("n_total"),
            F.array_sort(
                F.collect_list(
                    F.when(F.col("_rn") <= k, F.struct(F.col("_h").alias("h"), F.col("_v").alias("v")))
                )
            ).alias("sample"),
        )
    )


def hash_sample_merge(a: DataFrame, b: DataFrame, group_cols: list[str], k: int = 256) -> DataFrame:
    """Merge two hash-sample sketches (same k, disjoint row sets):
    bottom-k by hash of the concatenated samples; n_total adds."""
    cols = [*group_cols, "n_total", "sample"]
    both = a.select(*cols).unionByName(b.select(*cols))
    merged = both.groupBy(*group_cols).agg(
        F.sum("n_total").cast("bigint").alias("n_total"),
        F.slice(F.array_sort(F.flatten(F.collect_list("sample"))), 1, k).alias("sample"),
    )
    return merged.select(
        *group_cols,
        F.size("sample").cast("bigint").alias("n_seen"),
        "n_total",
        "sample",
    )


def hash_sample_quantiles(sketch: DataFrame, probs: list[float]) -> DataFrame:
    """Quantile estimates from a hash-sample sketch: exact
    linear-interpolated percentiles (the percentile_cont / Spark
    ``percentile`` definition) over the sampled values — a pure array
    expression, no explode, identical arithmetic in any engine.
    Appends ``q_<p>`` (rounded 6 dp) per requested probability."""
    vals = F.array_sort(F.transform(F.col("sample"), lambda s: s["v"]))
    n = F.size(vals)
    out = sketch
    for p in probs:
        pos = (n - 1).cast("double") * F.lit(float(p))
        lo = F.floor(pos).cast("int")
        frac = pos - F.floor(pos)
        est = (
            F.element_at(vals, lo + 1) * (F.lit(1.0) - frac)
            + F.element_at(vals, F.least(lo + F.lit(2), n)) * frac
        )
        out = out.withColumn(
            f"q_{str(p).replace('.', '_')}", F.round(est, 6)
        )
    return out


def kmv_rollup(sketch: DataFrame, group_cols: list[str], k: int = 64) -> DataFrame:
    """Merge KMV sketches UP a grouping hierarchy: collapse a
    finer-grained sketch table to ``group_cols`` by taking the bottom-k
    of the union of each group's sketches — the reason sketches beat
    exact distinct at 100 TB: count once at the finest grain, then
    derive every coarser rollup level from the k-bounded states
    without ever rescanning raw data. (bottom-k of a union ==
    bottom-k of concatenated bottom-ks, the kmv_merge property.)

    One map-side-combined aggregate over sketch rows (already tiny).
    Output: (group…, n_seen, kmv) — same shape as kmv_build, so
    kmv_distinct and further rollups compose.
    """
    merged = sketch.groupBy(*group_cols).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("kmv")))),
            1, k,
        ).alias("kmv")
    )
    return merged.withColumn("n_seen", F.size("kmv").cast("bigint")).select(
        *group_cols, "n_seen", "kmv"
    )


# ------------------------------------------------------------------ HLL --

# The HLL state is pure md5/integer arithmetic (like the CMS/KMV
# above), so — unlike Spark's opaque HLL++ binary behind k1 — the
# whole register table AND the estimate are engine-portable and
# hash-verifiable. Hash layout: the first 15 md5 hex chars parse to a
# 60-bit non-negative integer h; bucket = h mod 2^p, and rho is the
# position of the first 1-bit in the remaining (60-p)-bit field w
# (counted from the MSB, 1-based; w = 0 maps to width+1). The
# estimator is Flajolet et al. 2007: E = alpha_m·m²/Σ2^(-rho_j) with
# the linear-counting small-range correction E = m·ln(m/V) when
# E ≤ 2.5m and V (= zero registers) > 0.
#
# Bit-portability: Σ2^(-rho) is accumulated as the EXACT integer
# Σ2^(width+1-rho) (integer shifts, ≤ m·2^(width+1) — bigint-safe for
# p ≥ 4), so the only float ops are one division of exact values and
# (in the corrected branch) one ln of an exact rational — both single
# IEEE ops, identical in any engine at the rounded output precision.

_HLL_HEX_CHARS = 15  # 60 hash bits: bigint-safe through conv/CAST


def _hll_width(p: int) -> int:
    return 4 * _HLL_HEX_CHARS - p


def hll_build(
    df: DataFrame, group_cols: list[str], key_col: str, p: int = 9
) -> DataFrame:
    """Per-group HLL register table: (group…, reg, rho) with one row
    per OCCUPIED register (absent registers are zeros — the sparse
    representation; ≤ 2^p rows per group no matter the input).
    One distinct-free aggregate: groupBy (group, reg) max(rho) with
    map-side combine, the lightest possible distinct-count pass."""
    if not 4 <= p <= 14:
        raise ValueError("p must be in [4, 14]")
    m = 1 << p
    width = _hll_width(p)
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, _HLL_HEX_CHARS),
        16,
        10,
    ).cast("bigint")
    base = df.select(*group_cols, h.alias("_h"))
    base = base.select(
        *group_cols,
        (F.col("_h") % m).cast("int").alias("reg"),
        F.expr(f"_h div {m}").alias("_w"),
    )
    bitlen = F.length(F.bin(F.col("_w")))
    rho = (
        F.when(F.col("_w") == 0, F.lit(width + 1))
        .otherwise(F.lit(width + 1) - bitlen)
        .cast("int")
    )
    return (
        base.withColumn("rho", rho)
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").cast("int").alias("rho"))
    )


def hll_merge(a: DataFrame, b: DataFrame, group_cols: list[str]) -> DataFrame:
    """Union two register tables: max rho per (group, reg) — the HLL
    merge, associative/commutative/idempotent like the KMV bottom-k."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").cast("int").alias("rho"))
    )


def hll_distinct(
    registers: DataFrame, group_cols: list[str], p: int = 9
) -> DataFrame:
    """Estimate from the register table. Output per group:
    (group…, n_regs, n_zero_regs, reg_checksum, est_distinct 4 dp) —
    the checksum is md5 over the canonical ``reg:rho`` register string,
    so a hash oracle verifies the full state, not just the estimate."""
    m = 1 << p
    width = _hll_width(p)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    # alpha·m²·2^(width+1): ONE shared Python double literal — both
    # engines divide it by the exact integer S
    a_scaled = alpha * m * m * float(1 << (width + 1))
    per = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("int").alias("n_regs"),
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {width + 1} - rho)"))
        .cast("bigint")
        .alias("_s_present"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("reg", "rho"))),
                    lambda x: F.concat(
                        x["reg"].cast("string"), F.lit(":"), x["rho"].cast("string")
                    ),
                ),
                ",",
            )
        ).alias("reg_checksum"),
    )
    zeros = (F.lit(m) - F.col("n_regs")).cast("int")
    s_int = F.col("_s_present") + zeros.cast("bigint") * F.lit(
        1 << (width + 1)
    ).cast("bigint")
    e_raw = F.lit(a_scaled) / s_int.cast("double")
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(e_raw)
    return per.select(
        *group_cols,
        "n_regs",
        zeros.alias("n_zero_regs"),
        "reg_checksum",
        F.round(est, 4).alias("est_distinct"),
    )


def hll_rollup(
    registers: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Merge HLL register tables UP a grouping hierarchy (the
    kmv_rollup twin): max rho per (coarser group, reg) — count once at
    the finest grain, derive every coarser distinct estimate from the
    ≤ 2^p-row states without rescanning raw data. One map-side-combined
    aggregate; output composes with hll_distinct / further rollups."""
    return (
        registers.groupBy(*group_cols, "reg")
        .agg(F.max("rho").cast("int").alias("rho"))
    )


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970) — the classic membership sketch, built like the
# CMS/KMV/HLL above from pure md5 arithmetic so the packed state itself is
# engine-portable and hash-verifiable. Layout: m_bits bit positions packed
# into 32-bit words stored in BIGINTs (shift amounts stay < 32, so no sign
# games); position j of key x = _bucket(x, j, m_bits), the cms hash family.
# ---------------------------------------------------------------------------


def _bloom_positions(
    df: DataFrame, key_col: str, m_bits: int, k_hashes: int
) -> DataFrame:
    """Distinct (word_idx, bit) coordinates hit by any key — the
    pre-packing form shared by build and probe."""
    key = F.col(key_col).cast("string")
    pos = df.select(
        F.col(key_col).alias("_key"),
        F.explode(
            F.array(*[_bucket(key, j, m_bits) for j in range(k_hashes)])
        ).alias("_pos"),
    )
    return pos.select(
        "_key",
        (F.col("_pos") / 32).cast("int").alias("word_idx"),
        (F.col("_pos") % 32).cast("int").alias("bit"),
    )


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 4096, k_hashes: int = 4
) -> DataFrame:
    """Build a Bloom filter over ``key_col``: output one row per
    NON-ZERO 32-bit word, ``(word_idx, word)`` — at m_bits=4096 the
    whole state is ≤ 128 rows / ~2 KB, broadcastable to any probe
    side regardless of how many billions of rows built it.

    Packing: each distinct (word, bit) coordinate contributes
    ``2^bit`` exactly once, so the word is a plain exact SUM — the
    same value as a bitwise OR but expressible identically in any
    engine (the portable-sketch discipline of cms/kmv/hll). Build
    cost: one map-side-combined distinct + one tiny aggregate; the
    shuffle carries (word_idx, bit) int pairs, never keys.
    """
    if m_bits < 32 or m_bits % 32:
        raise ValueError("m_bits must be a positive multiple of 32")
    if k_hashes < 1:
        raise ValueError("k_hashes must be >= 1")
    coords = (
        _bloom_positions(df, key_col, m_bits, k_hashes)
        .select("word_idx", "bit")
        .distinct()
    )
    mask = F.expr("shiftleft(cast(1 as bigint), bit)")
    return (
        coords.groupBy("word_idx")
        .agg(F.sum(mask).cast("bigint").alias("word"))
    )


def bloom_probe(
    state: DataFrame,
    probes: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    k_hashes: int = 4,
) -> DataFrame:
    """Probe a :func:`bloom_build` state: per probe key, ``contained``
    = 1 iff ALL ``k_hashes`` bit positions are set (the one-sided
    Bloom contract — no false negatives, false-positive rate set by
    the load factor). The probe side joins the ≤ m_bits/32-row state
    broadcast on word_idx and never shuffles itself beyond its own
    positions — the shape that lets a 100 TB probe stream filter
    against a sketch of an equally large build side.
    """
    coords = _bloom_positions(probes, key_col, m_bits, k_hashes)
    mask = F.expr("shiftleft(cast(1 as bigint), bit)")
    hit = (
        F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(mask) > 0
    ).cast("int")
    per_pos = coords.join(F.broadcast(state), "word_idx", "left").select(
        F.col("_key").alias(key_col), hit.alias("_hit")
    )
    return per_pos.groupBy(key_col).agg(
        F.min("_hit").cast("int").alias("contained")
    )


def bloom_state_digest(state: DataFrame) -> DataFrame:
    """One-row canonical digest of a Bloom state: (n_words,
    n_set_bits, state_md5) with state_md5 = md5 over the sorted
    'idx:word' list — the register-checksum convention the HLL sketch
    uses, so two engines can prove they built the identical filter."""
    return state.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.sum(F.bit_count("word")).cast("bigint").alias("n_set_bits"),
        F.md5(
            F.array_join(
                F.sort_array(
                    F.collect_list(
                        F.format_string("%d:%d", "word_idx", "word")
                    )
                ),
                ",",
            )
        ).alias("state_md5"),
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two Bloom states built with the SAME (m_bits, k_hashes):
    the union filter is the bitwise OR of the word arrays — the
    property that lets partition-local / per-day filters fold into a
    global one without touching the raw keys (the cms_merge/kmv_merge/
    hll_merge contract, for membership). Implemented as a union +
    per-word bit_or aggregate over ≤ m_bits/32 rows; merging N states
    costs O(N · words), independent of how much data built them.

    ``bloom_merge(build(A), build(B))`` is bit-identical to
    ``build(A ∪ B)``: positions are a pure function of the key, OR is
    idempotent, and absent words stay absent on both sides.
    """
    both = a.select("word_idx", "word").unionByName(
        b.select("word_idx", "word")
    )
    return both.groupBy("word_idx").agg(
        F.bit_or("word").cast("bigint").alias("word")
    )
