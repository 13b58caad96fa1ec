"""Count-min sketch: overestimate-only bound, exactness when wide,
merge associativity, heavy-hitter recall."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from healthcare_api_spark.operators import sketches


@pytest.fixture(scope="module")
def skewed(spark):
    # key k appears k times, k = 1..40  →  N = 820, heavy tail is exact
    rows = [(k,) for k in range(1, 41) for _ in range(k)]
    return spark.createDataFrame(rows, "key int")


def _exact(spark, skewed):
    return {
        r["key"]: r["c"]
        for r in skewed.groupBy("key").agg(F.count("*").alias("c")).collect()
    }


def test_cms_never_underestimates(spark, skewed):
    sketch = sketches.cms_build(skewed, "key", depth=3, width=32)
    est = sketches.cms_lookup(
        sketch, skewed.select("key").distinct(), "key", depth=3, width=32
    )
    exact = _exact(spark, skewed)
    for r in est.collect():
        assert r["est"] >= exact[r["key"]], (r, exact[r["key"]])


def test_cms_exact_when_wide(spark, skewed):
    # width ≫ distinct keys → collisions vanish, estimates are exact
    sketch = sketches.cms_build(skewed, "key", depth=4, width=4096)
    est = sketches.cms_lookup(
        sketch, skewed.select("key").distinct(), "key", depth=4, width=4096
    )
    exact = _exact(spark, skewed)
    assert {r["key"]: r["est"] for r in est.collect()} == exact


def test_cms_error_bound(spark, skewed):
    # ε = e/width; N = 820 → overshoot ≤ εN with prob 1-(1/e)^depth;
    # assert the *average* overshoot respects the bound (prob. guarantee)
    import math

    depth, width = 4, 64
    sketch = sketches.cms_build(skewed, "key", depth=depth, width=width)
    est = sketches.cms_lookup(
        sketch, skewed.select("key").distinct(), "key", depth=depth, width=width
    )
    exact = _exact(spark, skewed)
    n_total = sum(exact.values())
    bound = math.e / width * n_total
    overs = [r["est"] - exact[r["key"]] for r in est.collect()]
    assert sum(overs) / len(overs) <= bound


def test_cms_merge_equals_whole(spark, skewed):
    half_a = skewed.filter(F.col("key") <= 20)
    half_b = skewed.filter(F.col("key") > 20)
    merged = sketches.cms_merge(
        sketches.cms_build(half_a, "key", depth=3, width=64),
        sketches.cms_build(half_b, "key", depth=3, width=64),
    )
    whole = sketches.cms_build(skewed, "key", depth=3, width=64)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_heavy_hitters_full_recall(spark, skewed):
    # CMS never underestimates → every key with true count ≥ T is present
    hh = sketches.cms_heavy_hitters(skewed, "key", depth=3, width=64, threshold=25)
    got = {r["key"] for r in hh.collect()}
    assert got >= {k for k in range(25, 41)}


def test_sketch_size_bounded(spark, skewed):
    sketch = sketches.cms_build(skewed, "key", depth=3, width=16)
    assert sketch.count() <= 3 * 16


def test_weighted_build(spark):
    freq = spark.createDataFrame([("a", 10), ("b", 5)], "key string, c int")
    sketch = sketches.cms_build(freq, "key", depth=2, width=256, weight_col="c")
    est = sketches.cms_lookup(sketch, freq.select("key"), "key", depth=2, width=256)
    assert {r["key"]: r["est"] for r in est.collect()} == {"a": 10, "b": 5}


def test_bad_params(spark, skewed):
    with pytest.raises(ValueError):
        sketches.cms_build(skewed, "key", depth=0)


def test_streaming_cms_merge_matches_batch(spark, tmp_path):
    """foreachBatch cms_merge over two micro-batches == one batch build
    — the sketch as streaming state (bounded at depth×width cells)."""
    import pyspark.sql.functions as F

    from healthcare_api_spark.operators.sketches import cms_build, cms_merge

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    rows1 = [(f"k{i % 7}",) for i in range(50)]
    rows2 = [(f"k{i % 11}",) for i in range(60)]
    spark.createDataFrame(rows1, "key string").write.mode("append").parquet(src)

    def _merge(batch_df, batch_id):
        s = batch_df.sparkSession
        delta = cms_build(batch_df, "key", depth=3, width=32)
        try:
            prev = s.read.parquet(state).localCheckpoint(eager=True)
            merged = cms_merge(prev, delta)
        except Exception as e:
            if "Path does not exist" not in str(e) and "PATH_NOT_FOUND" not in str(e):
                raise
            merged = delta
        merged.write.mode("overwrite").parquet(state)

    stream = spark.readStream.schema("key string").parquet(src)
    q = (stream.writeStream.foreachBatch(_merge).outputMode("update")
         .option("checkpointLocation", ckpt).start())
    q.processAllAvailable()
    spark.createDataFrame(rows2, "key string").write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    got = sorted(map(tuple, spark.read.parquet(state).collect()))
    want = sorted(map(tuple, cms_build(
        spark.createDataFrame(rows1 + rows2, "key string"), "key", depth=3, width=32
    ).collect()))
    assert got == want


def test_streaming_kmv_state_equals_batch(spark, tmp_path):
    """streaming/sketches.streaming_kmv over two micro-batches must
    leave a state BIT-IDENTICAL to one batch build (bottom-k merge is
    associative + duplicate-idempotent), and sketch algebra must work
    on the streaming state unchanged."""
    from healthcare_api_spark.operators.sketches import (
        kmv_build,
        kmv_set_ops,
    )
    from healthcare_api_spark.streaming.sketches import (
        read_kmv_state,
        streaming_kmv,
    )

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    rows1 = [("a", i) for i in range(150)] + [("b", i) for i in range(40)]
    rows2 = [("a", i) for i in range(100, 250)] + [("b", i) for i in range(20, 60)]
    schema = "g string, u long"
    spark.createDataFrame(rows1, schema).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = streaming_kmv(stream, state, ["g"], "u", k=32, checkpoint=ckpt)
    q.processAllAvailable()
    spark.createDataFrame(rows2, schema).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    # read-side params must match the writer's (k drives the
    # append-protocol read fold, like num_state_buckets drives
    # bucket resolution)
    got = {
        r["g"]: (r["n_seen"], list(r["kmv"]))
        for r in read_kmv_state(spark, state, ["g"], k=32).collect()
    }
    whole = kmv_build(
        spark.createDataFrame(rows1 + rows2, schema), ["g"], "u", k=32
    )
    want = {r["g"]: (r["n_seen"], list(r["kmv"])) for r in whole.collect()}
    assert got == want
    # downstream algebra on the live state: one pair row, sane jaccard
    pairs = kmv_set_ops(
        read_kmv_state(spark, state, ["g"], k=32), "g", k=32
    ).collect()
    assert len(pairs) == 1 and 0.0 <= pairs[0]["jaccard"] <= 1.0


# ------------------------------------------------------------------ KMV --


def test_kmv_exact_below_k(spark):
    from healthcare_api_spark.operators.sketches import kmv_build, kmv_distinct

    rows = [("g", i % 10) for i in range(200)]  # 10 distinct, heavy repeats
    df = spark.createDataFrame(rows, ["g", "u"])
    est = kmv_distinct(kmv_build(df, ["g"], "u", k=64), k=64).collect()[0]
    assert est["n_seen"] == 10 and est["est_distinct"] == 10


def test_kmv_estimate_within_bound(spark):
    from healthcare_api_spark.operators.sketches import kmv_build, kmv_distinct

    n = 2000
    df = spark.createDataFrame([("g", i) for i in range(n)], ["g", "u"])
    est = kmv_distinct(kmv_build(df, ["g"], "u", k=64), k=64).collect()[0]
    # standard error ≈ n/sqrt(k) = 12.5%; allow 3σ
    assert abs(est["est_distinct"] - n) < 0.375 * n, est["est_distinct"]


def test_kmv_merge_equals_whole(spark):
    from healthcare_api_spark.operators.sketches import kmv_build, kmv_merge

    df = spark.createDataFrame([("g", i) for i in range(500)], ["g", "u"])
    a = kmv_build(df.filter("u < 300"), ["g"], "u", k=32)
    b = kmv_build(df.filter("u >= 200"), ["g"], "u", k=32)  # overlap on purpose
    merged = kmv_merge(a, b, ["g"], k=32).collect()[0]
    whole = kmv_build(df, ["g"], "u", k=32).collect()[0]
    assert merged["kmv"] == whole["kmv"] and merged["n_seen"] == whole["n_seen"]


def test_kmv_set_ops_exact_branch(spark):
    # below-k sketches are complete sets → union/intersection/jaccard
    # must be EXACT, not estimates
    from healthcare_api_spark.operators.sketches import kmv_build, kmv_set_ops

    rows = [("a", i) for i in range(20)] + [("b", i) for i in range(10, 40)]
    df = spark.createDataFrame(rows, ["g", "u"])
    out = kmv_set_ops(kmv_build(df, ["g"], "u", k=64), "g", k=64).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["group_a"], r["group_b"]) == ("a", "b")
    # |A|=20, |B|=30, A∩B={10..19} → union 40, intersection 10
    assert r["n_union"] == 40 and r["est_union"] == 40
    assert r["n_inter_topk"] == 10 and r["est_intersection"] == 10
    assert abs(r["jaccard"] - 0.25) < 1e-9


def test_kmv_set_ops_estimate_within_bound(spark):
    # two 3000-element sets with 1500 shared → union 4500, inter 1500,
    # jaccard 1/3; k=256 → se ≈ 1/sqrt(k) ≈ 6.25%, allow 3σ
    from healthcare_api_spark.operators.sketches import kmv_build, kmv_set_ops

    rows = [("a", i) for i in range(3000)] + [
        ("b", i) for i in range(1500, 4500)
    ]
    df = spark.createDataFrame(rows, ["g", "u"])
    r = kmv_set_ops(kmv_build(df, ["g"], "u", k=256), "g", k=256).collect()[0]
    assert abs(r["est_union"] - 4500) < 0.19 * 4500, r["est_union"]
    assert abs(r["est_intersection"] - 1500) < 0.3 * 1500 + 200, (
        r["est_intersection"]
    )
    assert abs(r["jaccard"] - 1 / 3) < 0.15


def test_kmv_set_ops_all_pairs(spark):
    # 3 groups → 3 unordered pairs, lexicographic (group_a < group_b)
    from healthcare_api_spark.operators.sketches import kmv_build, kmv_set_ops

    rows = [(g, i) for g in ("x", "y", "z") for i in range(5)]
    df = spark.createDataFrame(rows, ["g", "u"])
    out = kmv_set_ops(kmv_build(df, ["g"], "u", k=8), "g", k=8).collect()
    assert sorted((r["group_a"], r["group_b"]) for r in out) == [
        ("x", "y"), ("x", "z"), ("y", "z")
    ]
    # identical membership → jaccard exactly 1 on every pair
    assert all(r["jaccard"] == 1.0 and r["est_intersection"] == 5 for r in out)


def test_kmv_rejects_tiny_k(spark):
    from healthcare_api_spark.operators.sketches import kmv_build

    df = spark.createDataFrame([("g", 1)], ["g", "u"])
    with pytest.raises(ValueError):
        kmv_build(df, ["g"], "u", k=1)


def test_hash_sample_exact_below_k(spark):
    from healthcare_api_spark.operators.sketches import (
        hash_sample_build,
        hash_sample_quantiles,
    )

    df = spark.createDataFrame([("g", i, float(i)) for i in range(9)], ["g", "id", "v"])
    sk = hash_sample_build(df, ["g"], "id", "v", k=64)
    r = hash_sample_quantiles(sk, [0.5]).collect()[0]
    # below k the sample IS the group → exact median
    assert r["n_seen"] == 9 and r["n_total"] == 9
    assert r["q_0_5"] == 4.0


def test_hash_sample_quantile_accuracy(spark):
    from healthcare_api_spark.operators.sketches import (
        hash_sample_build,
        hash_sample_quantiles,
    )

    n, k = 4000, 256
    df = spark.createDataFrame([("g", i, float(i)) for i in range(n)], ["g", "id", "v"])
    r = hash_sample_quantiles(
        hash_sample_build(df, ["g"], "id", "v", k=k), [0.25, 0.5, 0.9]
    ).collect()[0]
    assert r["n_seen"] == k and r["n_total"] == n
    # sampling error on the p-quantile rank ≈ sqrt(p(1-p)/k); allow 4σ
    for p, got in [(0.25, r["q_0_25"]), (0.5, r["q_0_5"]), (0.9, r["q_0_9"])]:
        tol = 4 * (p * (1 - p) / k) ** 0.5 * n
        assert abs(got - p * (n - 1)) < tol, (p, got, tol)


def test_hash_sample_merge_equals_whole(spark):
    from healthcare_api_spark.operators.sketches import (
        hash_sample_build,
        hash_sample_merge,
    )

    df = spark.createDataFrame(
        [("g", i, float(i * 7 % 101)) for i in range(600)], ["g", "id", "v"]
    )
    a = hash_sample_build(df.filter("id < 300"), ["g"], "id", "v", k=48)
    b = hash_sample_build(df.filter("id >= 300"), ["g"], "id", "v", k=48)
    merged = hash_sample_merge(a, b, ["g"], k=48).collect()[0]
    whole = hash_sample_build(df, ["g"], "id", "v", k=48).collect()[0]
    assert merged["sample"] == whole["sample"]
    assert merged["n_seen"] == whole["n_seen"] == 48
    assert merged["n_total"] == whole["n_total"] == 600


def test_streaming_hash_sample_merge_matches_batch(spark, tmp_path):
    """foreachBatch hash_sample_merge over two micro-batches == one
    batch build — the quantile sketch as streaming state (bounded at k
    (hash, value) pairs per group), same MV shape as the CMS test."""
    from healthcare_api_spark.operators.sketches import (
        hash_sample_build,
        hash_sample_merge,
    )

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    rows1 = [("g", i, float(i * 13 % 97)) for i in range(120)]
    rows2 = [("g", i, float(i * 7 % 89)) for i in range(120, 300)]
    schema = "g string, id long, v double"
    spark.createDataFrame(rows1, schema).write.mode("append").parquet(src)

    def _merge(batch_df, batch_id):
        s = batch_df.sparkSession
        delta = hash_sample_build(batch_df, ["g"], "id", "v", k=32)
        try:
            prev = s.read.parquet(state).localCheckpoint(eager=True)
            merged = hash_sample_merge(prev, delta, ["g"], k=32)
        except Exception as e:
            if "Path does not exist" not in str(e) and "PATH_NOT_FOUND" not in str(e):
                raise
            merged = delta
        merged.write.mode("overwrite").parquet(state)

    stream = spark.readStream.schema(schema).parquet(src)
    q = (stream.writeStream.foreachBatch(_merge).outputMode("update")
         .option("checkpointLocation", ckpt).start())
    q.processAllAvailable()
    spark.createDataFrame(rows2, schema).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    got = spark.read.parquet(state).collect()[0]
    want = hash_sample_build(
        spark.createDataFrame(rows1 + rows2, schema), ["g"], "id", "v", k=32
    ).collect()[0]
    assert sorted(map(tuple, got["sample"])) == sorted(map(tuple, want["sample"]))
    assert got["n_total"] == want["n_total"] == 300


def test_kmv_rollup_equals_direct_build(spark):
    from healthcare_api_spark.operators.sketches import kmv_build, kmv_rollup

    rows = [("a", d, u) for d in range(4) for u in range(d * 40, d * 40 + 60)] + [
        ("b", d, u) for d in range(2) for u in range(100)
    ]
    df = spark.createDataFrame(rows, ["g", "day", "u"])
    daily = kmv_build(df, ["g", "day"], "u", k=32)
    rolled = {r["g"]: r for r in kmv_rollup(daily, ["g"], k=32).collect()}
    direct = {r["g"]: r for r in kmv_build(df, ["g"], "u", k=32).collect()}
    for g in ("a", "b"):
        assert rolled[g]["kmv"] == direct[g]["kmv"]
        assert rolled[g]["n_seen"] == direct[g]["n_seen"]


# ------------------------------------------------------------------ HLL --


def test_hll_estimate_within_bound(spark):
    """p=9 standard error ≈ 1.04/√512 ≈ 4.6%; allow 3σ on 5000 keys
    (r8 k8 — the portable HLL behind the hash oracle)."""
    from healthcare_api_spark.operators.sketches import (
        hll_build,
        hll_distinct,
    )

    n = 5000
    df = spark.createDataFrame([("g", i) for i in range(n)], ["g", "u"])
    est = hll_distinct(hll_build(df, ["g"], "u", p=9), ["g"], p=9).collect()[0]
    assert abs(est["est_distinct"] - n) < 0.14 * n, est["est_distinct"]
    assert est["n_regs"] + est["n_zero_regs"] == 512


def test_hll_linear_counting_small_range(spark):
    """With most registers empty the linear-counting branch fires and
    tracks small cardinalities closely."""
    from healthcare_api_spark.operators.sketches import (
        hll_build,
        hll_distinct,
    )

    df = spark.createDataFrame([("g", i) for i in range(50)], ["g", "u"])
    est = hll_distinct(hll_build(df, ["g"], "u"), ["g"]).collect()[0]
    assert abs(est["est_distinct"] - 50) < 10
    assert est["n_zero_regs"] > 400


def test_hll_merge_equals_whole(spark):
    """max-register merge of overlapping halves == one whole build —
    bit-identical state (checksum) AND estimate; duplicates are
    absorbed (idempotent)."""
    from healthcare_api_spark.operators.sketches import (
        hll_build,
        hll_distinct,
        hll_merge,
    )

    a = spark.createDataFrame([("g", i) for i in range(3000)], ["g", "u"])
    b = spark.createDataFrame(
        [("g", i) for i in range(2000, 5000)], ["g", "u"]
    )
    whole = spark.createDataFrame([("g", i) for i in range(5000)], ["g", "u"])
    em = hll_distinct(
        hll_merge(
            hll_build(a, ["g"], "u"), hll_build(b, ["g"], "u"), ["g"]
        ),
        ["g"],
    ).collect()[0]
    ew = hll_distinct(hll_build(whole, ["g"], "u"), ["g"]).collect()[0]
    assert em["reg_checksum"] == ew["reg_checksum"]
    assert em["est_distinct"] == ew["est_distinct"]


def test_hll_validation(spark):
    import pytest
    from healthcare_api_spark.operators.sketches import hll_build

    df = spark.createDataFrame([("g", 1)], ["g", "u"])
    for bad in (3, 15):
        with pytest.raises(ValueError):
            hll_build(df, ["g"], "u", p=bad)


def test_hll_rollup_equals_direct_build(spark):
    """Rolling fine-grained registers up a hierarchy == building at the
    coarse grain directly — bit-identical state and estimate."""
    from healthcare_api_spark.operators.sketches import (
        hll_build,
        hll_distinct,
        hll_rollup,
    )

    rows = [(f"d{i % 3}", f"h{i % 7}", i) for i in range(2000)]
    df = spark.createDataFrame(rows, ["day", "host", "u"])
    fine = hll_build(df, ["day", "host"], "u")
    rolled = hll_distinct(hll_rollup(fine, ["day"]), ["day"])
    direct = hll_distinct(hll_build(df, ["day"], "u"), ["day"])
    got = {r["day"]: (r["reg_checksum"], r["est_distinct"]) for r in rolled.collect()}
    want = {r["day"]: (r["reg_checksum"], r["est_distinct"]) for r in direct.collect()}
    assert got == want


# ------------------------------------------------------------ k9 bloom --


def _py_bloom_positions(key, m_bits, k_hashes):
    import hashlib

    out = []
    for j in range(k_hashes):
        h = hashlib.md5(f"{j}:{key}".encode()).hexdigest()
        out.append(int(h[:8], 16) % m_bits)
    return out


def test_bloom_no_false_negatives_and_state_matches_python(spark):
    from healthcare_api_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
        bloom_state_digest,
    )

    keys = [f"k{i}" for i in range(40)]
    df = spark.createDataFrame([(k,) for k in keys], ["key"])
    state = bloom_build(df, "key", m_bits=256, k_hashes=3)
    # python reference words
    bits = set()
    for k in keys:
        for p in _py_bloom_positions(k, 256, 3):
            bits.add(p)
    want_words = {}
    for p in bits:
        want_words[p // 32] = want_words.get(p // 32, 0) + (1 << (p % 32))
    got_words = {r["word_idx"]: r["word"] for r in state.collect()}
    assert got_words == want_words
    # digest counts
    dig = bloom_state_digest(state).head()
    assert dig["n_set_bits"] == len(bits)
    assert dig["n_words"] == len(want_words)
    # every member must probe positive (no false negatives, ever)
    probed = bloom_probe(state, df, "key", m_bits=256, k_hashes=3)
    assert all(r["contained"] == 1 for r in probed.collect())


def test_bloom_probe_matches_python_reference(spark):
    from healthcare_api_spark.operators.sketches import bloom_build, bloom_probe

    members = [f"m{i}" for i in range(30)]
    others = [f"z{i}" for i in range(60)]
    state = bloom_build(
        spark.createDataFrame([(k,) for k in members], ["key"]),
        "key",
        m_bits=128,
        k_hashes=2,
    )
    bits = {
        p for k in members for p in _py_bloom_positions(k, 128, 2)
    }
    want = {
        k: int(all(p in bits for p in _py_bloom_positions(k, 128, 2)))
        for k in members + others
    }
    got = {
        r["key"]: r["contained"]
        for r in bloom_probe(
            state,
            spark.createDataFrame([(k,) for k in members + others], ["key"]),
            "key",
            m_bits=128,
            k_hashes=2,
        ).collect()
    }
    assert got == want
    # a saturated-enough 128-bit filter over 30 keys should show at
    # least one false positive among 60 non-members — the test corpus
    # is fixed, so this is deterministic
    assert any(want[k] == 1 for k in others)


def test_bloom_validation(spark):
    import pytest

    from healthcare_api_spark.operators.sketches import bloom_build

    df = spark.createDataFrame([("a",)], ["key"])
    with pytest.raises(ValueError):
        bloom_build(df, "key", m_bits=100)  # not a multiple of 32
    with pytest.raises(ValueError):
        bloom_build(df, "key", m_bits=0)
    with pytest.raises(ValueError):
        bloom_build(df, "key", k_hashes=0)


def test_bloom_merge_equals_whole(spark):
    from healthcare_api_spark.operators.sketches import bloom_build, bloom_merge

    a = spark.createDataFrame([(f"a{i}",) for i in range(25)], ["key"])
    b = spark.createDataFrame(
        [(f"b{i}",) for i in range(25)] + [("a3",), ("a7",)], ["key"]
    )
    merged = {
        (r["word_idx"], r["word"])
        for r in bloom_merge(
            bloom_build(a, "key", m_bits=256, k_hashes=3),
            bloom_build(b, "key", m_bits=256, k_hashes=3),
        ).collect()
    }
    whole = {
        (r["word_idx"], r["word"])
        for r in bloom_build(
            a.unionByName(b), "key", m_bits=256, k_hashes=3
        ).collect()
    }
    assert merged == whole
