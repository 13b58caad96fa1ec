"""Dedup operator unit tests on a corpus with known duplicate structure."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from healthcare_api_spark.operators import dedup

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 1
    (3, "the quick brown fox jumps over the lazy dog near the river bank tonight"),  # near dup
    (4, "completely different text about spark dataframes and catalyst optimizer plans"),
    (5, "THE QUICK  brown fox jumps over the lazy dog near the river bank today"),  # dup modulo norm
]


def _corpus(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


def test_exact_dedup_deterministic_survivor(spark):
    df = _corpus(spark)
    out = dedup.exact_dedup(df, ["text"], "doc_id")
    # rows 1/2 collapse to doc_id 1 (min order_col); 5 differs pre-norm
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3, 4, 5]


def test_exact_dedup_by_content_normalized(spark):
    out = dedup.exact_dedup_by_content(_corpus(spark), "doc_id", "text")
    canon = {r["doc_id"]: r["canonical_id"] for r in out.collect()}
    assert canon[1] == canon[2] == canon[5] == 1  # normalization folds case/space
    assert canon[3] == 3 and canon[4] == 4


def test_minhash_signatures_shape_and_dup_equality(spark):
    sig = dedup.minhash_signatures(_corpus(spark), "doc_id", "text", num_hashes=4)
    rows = {r["doc_id"]: r for r in sig.collect()}
    assert set(sig.columns) == {"doc_id", "mh0", "mh1", "mh2", "mh3"}
    for i in range(4):
        assert rows[1][f"mh{i}"] == rows[2][f"mh{i}"] == rows[5][f"mh{i}"]
    assert rows[1]["mh0"] != rows[4]["mh0"]


def test_minhash_rotation_family_distinct_at_k8(spark):
    sig = dedup.minhash_signatures(_corpus(spark), "doc_id", "text", num_hashes=8)
    row = sig.filter(F.col("doc_id") == 4).collect()[0]
    values = [row[f"mh{i}"] for i in range(8)]
    assert len(set(values)) == 8  # 4-char rotation step keeps all 8 distinct


def test_minhash_xxhash_family_production_path(spark):
    # native-hash fast path: long signatures, exact dups still collide
    sig = dedup.minhash_signatures(
        _corpus(spark), "doc_id", "text", num_hashes=4, family="xxhash"
    )
    assert dict(sig.dtypes)["mh0"] == "bigint"
    rows = {r["doc_id"]: r for r in sig.collect()}
    for i in range(4):
        assert rows[1][f"mh{i}"] == rows[2][f"mh{i}"] == rows[5][f"mh{i}"]
    assert rows[1]["mh0"] != rows[4]["mh0"]
    # banding keeps long bucket keys (xxhash64 of the band columns)
    pairs = dedup.lsh_candidate_pairs(
        _corpus(spark), "doc_id", "text", num_hashes=8, rows_per_band=2,
        family="xxhash",
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got and (1, 5) in got
    # plan: hashing stays in whole-stage codegen (no HOF lambda fold)
    plan = sig._jdf.queryExecution().executedPlan().toString()
    assert "aggregate(" not in plan  # the interpreted fold is md5-only


def test_minhash_unknown_family_raises(spark):
    import pytest

    with pytest.raises(ValueError, match="unknown minhash family"):
        dedup.minhash_signatures(
            _corpus(spark), "doc_id", "text", family="nope"
        ).collect()


def test_minhash_dedup_clusters(spark):
    out = dedup.minhash_dedup(_corpus(spark), "doc_id", "text", num_hashes=4)
    canon = {r["doc_id"]: r["canonical_id"] for r in out.collect()}
    assert canon[1] == canon[2] == canon[5] == 1
    assert canon[4] == 4


def test_lsh_candidate_pairs_find_near_dups(spark):
    pairs = dedup.lsh_candidate_pairs(
        _corpus(spark), "doc_id", "text", num_hashes=8, rows_per_band=2
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got and (1, 5) in got  # exact dups always collide
    assert all(a < b for a, b in got)


def test_ngram_jaccard_scores(spark):
    out = dedup.ngram_jaccard_pairs(_corpus(spark), "doc_id", "text", threshold=0.5)
    scores = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.collect()}
    assert scores[(1, 2)] == 1.0 and scores[(1, 5)] == 1.0
    assert all(a < b for a, b in scores)


def test_ngram_jaccard_multiband_recall(spark):
    """VERDICT r3 #3: single-band candidate recall at threshold 0.3 is
    ≈J (~30%); multi-band must recover most qualifying pairs. Measured
    against the EXHAUSTIVE all-pairs truth on a corpus of partially
    overlapping docs; precision is exact (verify step), recall grows
    monotonically with bands and clears a floor at bands=8."""
    import itertools

    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet".split()
    rows = []
    for i in range(40):
        # overlapping sliding windows over a shared vocabulary stream →
        # many pairs with jaccard in [0.3, 0.7]
        toks = [base[(i + j) % len(base)] + str((i + j) // len(base)) for j in range(12)]
        rows.append((i, " ".join(toks)))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    def shingles(text):
        w = text.split()
        return {" ".join(w[k : k + 3]) for k in range(len(w) - 2)}

    truth = set()
    sets = {i: shingles(t) for i, t in rows}
    for a, b in itertools.combinations(range(40), 2):
        inter = len(sets[a] & sets[b])
        if inter and inter / len(sets[a] | sets[b]) >= 0.3:
            truth.add((a, b))
    assert len(truth) >= 20  # the corpus actually exercises the regime

    def found(bands):
        got = dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.3, bands=bands
        )
        return {(r["id_a"], r["id_b"]) for r in got.collect()}

    f1, f4, f8 = found(1), found(4), found(8)
    # precision exact: every reported pair is a true pair
    assert f1 <= truth and f4 <= truth and f8 <= truth
    # recall monotone in bands, and the default clears the single band
    assert f1 <= f4 <= f8
    assert len(f8) / len(truth) >= 0.8, (len(f8), len(truth))
    with pytest.raises(ValueError, match="bands"):
        dedup.ngram_jaccard_pairs(docs, "doc_id", "text", bands=0)


def test_simhash_identical_for_dups(spark):
    out = dedup.simhash_dedup(_corpus(spark), "doc_id", "text")
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["simhash"] == rows[2]["simhash"] == rows[5]["simhash"]
    assert rows[1]["canonical_id"] == 1 and rows[2]["canonical_id"] == 1
    assert 0 <= rows[1]["simhash"] < (1 << 16)


def test_cluster_pairs_transitive(spark):
    # chain 1-2-3 plus pair 5-6 plus singleton 9: components {1,2,3},{5,6},{9}
    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], ["id_a", "id_b"])
    ids = spark.createDataFrame([(i,) for i in [1, 2, 3, 5, 6, 9]], ["id"])
    out = {r["id"]: r["cluster_id"] for r in dedup.cluster_pairs(pairs, ids).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 9: 9}


def test_cluster_pairs_long_chain_converges(spark):
    n = 12
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n)], ["id_a", "id_b"])
    ids = spark.createDataFrame([(i,) for i in range(n + 1)], ["id"])
    out = {r["id"]: r["cluster_id"] for r in dedup.cluster_pairs(pairs, ids, max_iter=20).collect()}
    assert set(out.values()) == {0}  # one component labeled by its min


def test_embedding_neardup(spark):
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0], 0),
            (2, [0.999, 0.01, 0.0], 0),   # near dup of 1
            (3, [0.0, 1.0, 0.0], 0),      # orthogonal
            (4, [1.0, 0.0, 0.0], 1),      # same vector, different bucket
        ],
        ["vec_id", "embedding", "label"],
    )
    out = dedup.embedding_neardup_pairs(emb, "vec_id", "embedding", "label", threshold=0.95)
    got = {(r["id_a"], r["id_b"]): r["cos"] for r in out.collect()}
    assert set(got) == {(1, 2)}  # bucket bound excludes 4; 3 below threshold
    assert got[(1, 2)] > 0.999


def test_exact_substring_flags(spark):
    shared = "the exact same forty character long run!"  # 40 chars
    assert len(shared) == 40
    df = spark.createDataFrame(
        [
            (1, "prefix one " + shared + " suffix a"),
            (2, "other text " + shared + " suffix b"),
            (3, "completely unrelated content with no overlap whatsoever here"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in dedup.exact_substring_flags(
        df, "doc_id", "text", gram_len=40, min_docs=2).collect()}
    assert rows[1]["flagged"] == 1 and rows[1]["n_repeated"] >= 1
    assert rows[2]["flagged"] == 1
    assert rows[3]["flagged"] == 0 and rows[3]["n_repeated"] == 0


def test_canonical_per_cluster_policies(spark):
    from healthcare_api_spark.operators import dedup

    members = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (9, 9)], ["doc_id", "cluster_id"]
    )
    ranking = spark.createDataFrame(
        [(1, 10), (2, 50), (3, 50), (9, 5)], ["doc_id", "score"]
    )
    # max policy: cluster 1 has a 50/50 tie between ids 2 and 3 → min id
    out = {
        r["cluster_id"]: (r["canonical_id"], r["n_members"])
        for r in dedup.canonical_per_cluster(
            members, ranking, "doc_id", "cluster_id", "score"
        ).collect()
    }
    assert out == {1: (2, 3), 9: (9, 1)}
    # min policy flips the pick
    out_min = {
        r["cluster_id"]: r["canonical_id"]
        for r in dedup.canonical_per_cluster(
            members, ranking, "doc_id", "cluster_id", "score", descending=False
        ).collect()
    }
    assert out_min == {1: 1, 9: 9}


def test_fuzzy_string_join_blocking_and_verify(spark):
    from healthcare_api_spark.operators import dedup

    left = spark.createDataFrame(
        [(1, "jonathan smith"), (2, "maria garcia"), (3, "zed")],
        ["id", "name"],
    )
    right = spark.createDataFrame(
        [(10, "jonathon smith"),   # 1 edit, shares 4-char prefix "jona"
         (11, "maria garcya"),     # 1 edit, shares "mari"
         (12, "XXria garcia"),     # close but edits in the BLOCK → missed
         (13, "jonathan smithers")],  # 3 trailing inserts
        ["id", "name"],
    )
    out = {
        (r["id_l"], r["id_r"]): r["dist"]
        for r in dedup.fuzzy_string_join(
            left, right, "id", "name", "id", "name", max_dist=3
        ).collect()
    }
    assert out == {(1, 10): 1, (2, 11): 1, (1, 13): 3}
    # blocking documented miss: (2, 12) is dist 2 but the prefix differs
    assert (2, 12) not in out


# ------------------------------------------------- sorted neighborhood --


def test_global_row_rank_is_exact(spark):
    from pyspark.sql import functions as F

    from healthcare_api_spark.operators.dedup import global_row_rank

    rows = [(i, f"k{i % 7:02d}") for i in range(50)]
    df = spark.createDataFrame(rows, ["id", "key"]).repartition(5)
    ranked = global_row_rank(df, ["key", "id"], "rank")
    got = [(r["key"], r["id"]) for r in ranked.orderBy("rank").collect()]
    assert got == sorted(got)
    assert ranked.agg(F.min("rank"), F.max("rank")).first() == (0, 49)
    assert ranked.select("rank").distinct().count() == 50


def test_sorted_neighborhood_finds_adjacent_near_dups(spark):
    from healthcare_api_spark.operators.dedup import sorted_neighborhood_pairs

    # near-dups share a long prefix → adjacent in sort order even though
    # the difference is mid-string (prefix blocking on 8 chars would
    # still pair these; difference at char 9)
    rows = [
        (1, "alpha-document-one"),
        (2, "alpha-docXment-one"),   # 1 sub vs id 1
        (3, "zulu-record-42"),
        (4, "zulu-recXrd-42"),       # 1 sub vs id 3
        (5, "middle-unrelated-aaaa"),
    ]
    df = spark.createDataFrame(rows, ["id", "key"])
    pairs = sorted_neighborhood_pairs(df, "id", "key", window=2).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # window=2 → only rank-adjacent pairs; both planted pairs are adjacent
    assert (1, 2) in got or (2, 1) in got
    assert (3, 4) in got or (4, 3) in got
    # candidate volume is O(n·(w-1)) = 4 here
    assert len(pairs) == 4


def test_sorted_neighborhood_candidate_bound_and_window(spark):
    import pytest as _pytest

    from healthcare_api_spark.operators.dedup import sorted_neighborhood_pairs

    df = spark.createDataFrame([(i, f"key{i:03d}") for i in range(30)], ["id", "key"])
    w4 = sorted_neighborhood_pairs(df, "id", "key", window=4)
    # exactly Σ_{δ=1..3} (n-δ) pairs
    assert w4.count() == (29 + 28 + 27)
    with _pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, "id", "key", window=1)


# -------------------------------------------------------------- PassJoin --


def test_passjoin_exact_recall_vs_brute_force(spark):
    """The whole point: PassJoin must find EVERY pair within k — compare
    against exhaustive all-pairs Levenshtein on randomized strings with
    planted edits (substitutions, insertions, deletions, transposes)."""
    import random

    from pyspark.sql import functions as F

    from healthcare_api_spark.operators.dedup import passjoin_pairs

    rng = random.Random(42)
    alphabet = "abcdef"
    base = ["".join(rng.choice(alphabet) for _ in range(rng.randint(6, 14)))
            for _ in range(25)]

    def mutate(s):
        ops = rng.randint(0, 3)
        s = list(s)
        for _ in range(ops):
            kind = rng.choice(["sub", "ins", "del", "swap"])
            if kind == "sub" and s:
                i = rng.randrange(len(s)); s[i] = rng.choice(alphabet)
            elif kind == "ins":
                i = rng.randrange(len(s) + 1); s.insert(i, rng.choice(alphabet))
            elif kind == "del" and len(s) > 1:
                i = rng.randrange(len(s)); del s[i]
            elif kind == "swap" and len(s) > 1:
                i = rng.randrange(len(s) - 1); s[i], s[i + 1] = s[i + 1], s[i]
        return "".join(s)

    lrows = [(i, s) for i, s in enumerate(base)]
    rrows = [(100 + i, mutate(rng.choice(base))) for i in range(40)]
    left = spark.createDataFrame(lrows, ["id", "s"])
    right = spark.createDataFrame(rrows, ["id", "s"])

    got = {
        (r["id_l"], r["id_r"], r["dist"])
        for r in passjoin_pairs(left, right, "id", "s", "id", "s", max_dist=2).collect()
    }

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[len(b)]

    want = {
        (li, ri, lev(ls, rs))
        for li, ls in lrows for ri, rs in rrows
        if lev(ls, rs) <= 2
    }
    assert got == want, (got - want, want - got)


def test_passjoin_identical_and_empty(spark):
    from healthcare_api_spark.operators.dedup import passjoin_pairs

    left = spark.createDataFrame([(1, "hello"), (2, "")], ["id", "s"])
    right = spark.createDataFrame([(3, "hello"), (4, "hellx")], ["id", "s"])
    got = {(r["id_l"], r["id_r"], r["dist"]) for r in
           passjoin_pairs(left, right, "id", "s", "id", "s", max_dist=1).collect()}
    # empty strings are excluded (no segments); exact + 1-sub matches found
    assert got == {(1, 3, 0), (1, 4, 1)}


def test_passjoin_rejects_zero_dist(spark):
    import pytest as _pytest

    from healthcare_api_spark.operators.dedup import passjoin_pairs

    df = spark.createDataFrame([(1, "x")], ["id", "s"])
    with _pytest.raises(ValueError):
        passjoin_pairs(df, df, "id", "s", "id", "s", max_dist=0)


def test_semdedup_removes_planted_semantic_dups(spark):
    import random

    from pyspark.sql import functions as F

    from healthcare_api_spark.operators.dedup import semdedup

    rng = random.Random(3)
    rows = []
    # two well-separated semantic regions; ids 0-19 around axis-x,
    # ids 100+ around axis-y; planted near-dups: i and i+1000 (tiny noise)
    for i in range(20):
        v = [1.0 + rng.uniform(-0.01, 0.01), rng.uniform(-0.05, 0.05), 0.0, 0.0]
        rows.append((i, v))
        rows.append((1000 + i, [x + rng.uniform(-1e-4, 1e-4) for x in v]))
    for i in range(100, 110):
        # widely separated directions (≈0.29 rad apart) — no near-dups
        rows.append((i, [(i - 105) * 0.3, 1.0, 0.0, 0.0]))
    df = spark.createDataFrame(rows, ["id", "vec"])
    out = semdedup(df, "id", "vec", k=2, threshold=0.999, iters=3).collect()
    by_id = {r["id"]: r for r in out}
    # every planted pair lands in the same semantic group (groups may
    # chain further — cosine 0.999 is transitive-ish in a tight region)
    for i in range(20):
        assert by_id[i]["semantic_group"] == by_id[1000 + i]["semantic_group"]
        # at most one of the planted pair survives
        assert by_id[i]["keep"] + by_id[1000 + i]["keep"] <= 1
    # dedup actually removed things in the x-region
    assert sum(by_id[i]["keep"] for i in list(range(20)) + [1000 + i for i in range(20)]) < 20
    # the separated docs are nobody's near-dup — all survive
    assert all(by_id[i]["keep"] == 1 for i in range(100, 110))
    # exactly one keeper per semantic group
    import collections

    per_group = collections.Counter(
        r["semantic_group"] for r in out if r["keep"] == 1
    )
    groups = {r["semantic_group"] for r in out}
    assert all(per_group[g] == 1 for g in groups)


def test_semdedup_rejects_unknown_keep(spark):
    import pytest as _pytest

    from healthcare_api_spark.operators.dedup import semdedup

    df = spark.createDataFrame([(1, [1.0, 0.0])], ["id", "vec"])
    with _pytest.raises(ValueError):
        semdedup(df, "id", "vec", k=1, keep="best")


def test_semdedup_oversized_cell_guard(spark):
    # VERDICT r6 #2: Σ|cell|² blows up silently when one k-means cell
    # swallows the corpus — deliberately under-partitioned centroids
    # (both near +x, every vector lands in cell 0) must warn/raise
    import warnings as _warnings

    import pytest as _pytest

    from healthcare_api_spark.operators.dedup import semdedup

    rows = [(i, [1.0, i * 1e-4, 0.0]) for i in range(30)]
    df = spark.createDataFrame(rows, ["id", "vec"])
    bad_cents = [[1.0, 0.0, 0.0], [0.999, 0.01, 0.0], [0.998, 0.02, 0.0],
                 [0.997, 0.03, 0.0], [0.996, 0.04, 0.0], [0.995, 0.05, 0.0],
                 [0.994, 0.06, 0.0], [0.993, 0.07, 0.0]]
    with _pytest.raises(RuntimeError, match="largest k-means cell"):
        semdedup(df, "id", "vec", centroids=bad_cents, threshold=0.9999,
                 on_oversized="raise")
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        semdedup(df, "id", "vec", centroids=bad_cents, threshold=0.9999)
        assert any("k-means cell" in str(w.message) for w in caught)
    # balanced centroids: no warning, and 'ignore' skips the check
    good_cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    spread = rows[:15] + [(100 + i, [0.0, 1.0, i * 1e-4]) for i in range(15)]
    df2 = spark.createDataFrame(spread, ["id", "vec"])
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        semdedup(df2, "id", "vec", centroids=good_cents, threshold=0.9999)
        assert not any("k-means cell" in str(w.message) for w in caught)
    with _pytest.raises(ValueError, match="on_oversized"):
        semdedup(df, "id", "vec", k=1, on_oversized="nope")


def test_semdedup_max_iter_forwarded(spark):
    # ADVICE r6: a dup CHAIN with component diameter > max_iter used to
    # be unfixable through semdedup's signature — the propagation budget
    # is now a parameter. A 14-link chain of ≥0.9999-cosine neighbors
    # (adjacent pairs similar, distant pairs less so) converges with a
    # raised budget and yields ONE semantic group.
    import math

    from healthcare_api_spark.operators.dedup import semdedup

    n = 15
    rows = []
    for i in range(n):
        a = i * 0.01  # adjacent cosine ≈ cos(0.01) > 0.9999
        rows.append((i, [math.cos(a), math.sin(a), 0.0]))
    df = spark.createDataFrame(rows, ["id", "vec"])
    out = semdedup(
        df, "id", "vec", centroids=[[1.0, 0.0, 0.0]], threshold=0.99995,
        max_iter=20, on_oversized="ignore",
    ).collect()
    groups = {r["semantic_group"] for r in out}
    assert groups == {0}
    assert sum(r["keep"] for r in out) == 1


def test_cluster_pairs_incremental_equals_full_recompute(spark):
    from healthcare_api_spark.operators.dedup import (
        cluster_pairs,
        cluster_pairs_incremental,
    )

    old_edges = [(1, 2), (3, 4), (6, 7)]
    # delta merges components {1,2}+{3,4}, extends {6,7}, adds new node 9
    delta = [(2, 3), (7, 8), (9, 9)]
    all_old = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 5, 6, 7]], ["id"])
    prev = cluster_pairs(
        spark.createDataFrame(old_edges, ["id_a", "id_b"]), all_old
    )
    inc = cluster_pairs_incremental(
        prev, spark.createDataFrame(delta, ["id_a", "id_b"])
    )
    full = cluster_pairs(
        spark.createDataFrame(old_edges + delta, ["id_a", "id_b"]),
        spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 5, 6, 7, 8, 9]], ["id"]),
    )
    assert sorted(map(tuple, inc.collect())) == sorted(map(tuple, full.collect()))


def test_cluster_pairs_incremental_chain_of_merges(spark):
    # successive deltas each merging previously separate components
    from healthcare_api_spark.operators.dedup import (
        cluster_pairs,
        cluster_pairs_incremental,
    )

    ids = spark.createDataFrame([(i,) for i in range(10)], ["id"])
    labels = cluster_pairs(
        spark.createDataFrame([(i, i + 1) for i in range(0, 10, 2)][:0] or [(0, 1)], ["id_a", "id_b"]),
        ids,
    )
    edges_so_far = [(0, 1)]
    for step_edges in [[(2, 3)], [(1, 2)], [(4, 5), (3, 4)]]:
        labels = cluster_pairs_incremental(
            labels, spark.createDataFrame(step_edges, ["id_a", "id_b"])
        )
        edges_so_far += step_edges
    want = cluster_pairs(
        spark.createDataFrame(edges_so_far, ["id_a", "id_b"]), ids
    )
    assert sorted(map(tuple, labels.collect())) == sorted(map(tuple, want.collect()))


# ------------------------------------------------- sparse cosine join --


def test_sparse_cosine_identical_and_disjoint(spark):
    import math

    from healthcare_api_spark.operators.dedup import sparse_cosine_pairs

    df = spark.createDataFrame(
        [(1, "x y"), (2, "x y"), (3, "z w q"), (4, "x q")],
        ["doc_id", "text"],
    )
    out = {(r["id_a"], r["id_b"]): r["cos"] for r in
           sparse_cosine_pairs(df, "doc_id", "text", threshold=0.1).collect()}
    assert out[(1, 2)] == 1.0                      # identical vectors
    assert (1, 3) not in out and (2, 3) not in out  # disjoint
    # hand-check (3,4): 'x' (df 3/4 > 0.5) is PRUNED by the default
    # max_df_frac, so doc4's retained vector is just {q}; share q:
    # cos = wq²/(√(2·wz²+wq²)·wq) with w(q)=ln(4/2), w(z)=w(w)=ln 4
    wq, wz = math.log(2.0), math.log(4.0)
    expect = wq * wq / (math.sqrt(2 * wz * wz + wq * wq) * wq)
    assert abs(out[(3, 4)] - expect) < 1e-6


def test_sparse_cosine_max_df_prunes_stop_tokens(spark):
    from healthcare_api_spark.operators.dedup import sparse_cosine_pairs

    # 'the' is in EVERY doc; without pruning all pairs look similar
    df = spark.createDataFrame(
        [(1, "the alpha"), (2, "the beta"), (3, "the gamma"), (4, "the alpha")],
        ["doc_id", "text"],
    )
    out = {(r["id_a"], r["id_b"]) for r in
           sparse_cosine_pairs(df, "doc_id", "text", threshold=0.5,
                               max_df_frac=0.5).collect()}
    assert out == {(1, 4)}  # only the true alpha-pair survives

    import pytest as _pytest

    with _pytest.raises(ValueError):
        sparse_cosine_pairs(df, "doc_id", "text", max_df_frac=0.0)


def test_sentence_dedup_keeps_first_occurrence_and_rebuilds(spark):
    rows = [
        (1, "alpha beta. shared footer. unique one"),
        (2, "gamma delta. shared footer. unique two"),
        (3, "alpha beta. shared footer. unique one"),  # full dup of 1
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in dedup.sentence_dedup(df, "doc_id", "text").collect()}
    # doc 1 keeps everything (all its sentences are globally first)
    assert out[1]["text_deduped"] == "alpha beta. shared footer. unique one"
    assert (out[1]["n_sentences"], out[1]["n_kept"]) == (3, 3)
    # doc 2 loses only the shared footer, order preserved
    assert out[2]["text_deduped"] == "gamma delta. unique two"
    assert (out[2]["n_sentences"], out[2]["n_kept"]) == (3, 2)
    # doc 3 is entirely shadowed by doc 1
    assert out[3]["text_deduped"] == ""
    assert (out[3]["n_sentences"], out[3]["n_kept"]) == (3, 0)


def test_sentence_dedup_no_global_single_partition(spark):
    df = spark.createDataFrame(
        [(i, f"s{i} common. tail {i % 3}") for i in range(40)], ["doc_id", "text"]
    )
    plan = dedup.sentence_dedup(df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    # survivor choice partitions by sentence, never a SinglePartition window
    assert "SinglePartition" not in plan


def test_sentence_dedup_null_text_keeps_doc(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, None)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in dedup.sentence_dedup(df, "doc_id", "text").collect()}
    assert set(out) == {1, 2}  # null-text doc is retained, not dropped
    assert out[2]["text_deduped"] == "" and out[2]["n_sentences"] == 1


def test_hamming_neardup_pairs_exact_recall(spark):
    from healthcare_api_spark.operators.dedup import hamming_neardup_pairs

    rows = [
        (0, "0000000000000000"),
        (1, "0000000000000001"),  # 1 bit from id 0
        (3, "0000000000000007"),  # 3 bits from id 0, 2 from id 1
        (4, "000000000000000f"),  # 4 bits from id 0 (must be dropped)
    ]
    df = spark.createDataFrame(rows, ["id", "h"])
    out = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_neardup_pairs(df, "id", "h").collect()
    }
    assert out == {(0, 1): 1, (0, 3): 3, (1, 3): 2, (1, 4): 3, (3, 4): 1}


def test_hamming_neardup_pairs_matches_brute_force(spark):
    # banded blocking must be lossless at max_hamming < bands — compare
    # against all-pairs on hashes spread across every band
    import itertools
    import random

    from healthcare_api_spark.operators.dedup import hamming_neardup_pairs

    rng = random.Random(7)
    base = rng.getrandbits(64)
    hashes = [base]
    for _ in range(30):
        h = hashes[rng.randrange(len(hashes))]
        for _ in range(rng.randrange(0, 5)):  # 0-4 bit flips
            h ^= 1 << rng.randrange(64)
        hashes.append(h)
    rows = [(i, f"{h:016x}") for i, h in enumerate(hashes)]
    df = spark.createDataFrame(rows, ["id", "h"])
    got = sorted(
        map(tuple, hamming_neardup_pairs(df, "id", "h", max_hamming=3).collect())
    )
    want = sorted(
        (a, b, bin(ha ^ hb).count("1"))
        for (a, ha), (b, hb) in itertools.combinations(enumerate(hashes), 2)
        if bin(ha ^ hb).count("1") <= 3
    )
    assert got == want and len(want) > 0


def test_hamming_neardup_pairs_rejects_lossy(spark):
    import pytest as _pytest

    from healthcare_api_spark.operators.dedup import hamming_neardup_pairs

    df = spark.createDataFrame([(1, "0" * 16)], ["id", "h"])
    with _pytest.raises(ValueError, match="pigeonhole"):
        hamming_neardup_pairs(df, "id", "h", max_hamming=4, bands=4)
    # explicit opt-in works
    assert (
        hamming_neardup_pairs(df, "id", "h", max_hamming=4, allow_lossy=True).count()
        == 0
    )


def test_hamming_neardup_pairs_case_insensitive(spark):
    # ADVICE r6: the band keys are string equality while the verify is
    # numeric — mixed-case hex for the SAME fingerprint must still pair
    from healthcare_api_spark.operators.dedup import hamming_neardup_pairs

    rows = [
        (1, "00000000DEADBEEF"),
        (2, "00000000deadbeef"),  # identical fingerprint, lower case
        (3, "00000000DEADBEEE"),  # 1 bit away, upper case
    ]
    df = spark.createDataFrame(rows, ["id", "h"])
    out = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_neardup_pairs(df, "id", "h").collect()
    }
    assert out == {(1, 2): 0, (1, 3): 1, (2, 3): 1}


def test_hamming_neardup_pairs_bands_distinct_hashes(spark):
    # r7 rework: banding runs over DISTINCT hashes, so duplicate-heavy
    # input (the near-dup use case) can't amplify band candidates by
    # group-size² per band — the plan must show a distinct aggregate on
    # the hash feeding the band joins, and the output must still be the
    # exact pair set (same-hash C(g,2) Hamming-0 pairs + cross pairs).
    from healthcare_api_spark.operators.dedup import hamming_neardup_pairs

    g = 40
    rows = [(i, "00000000000000aa") for i in range(g)] + [
        (1000 + i, "00000000000000ab") for i in range(g)  # 1 bit away
    ]
    df = spark.createDataFrame(rows, ["id", "h"])
    plan = hamming_neardup_pairs(df, "id", "h")
    txt = plan._jdf.queryExecution().optimizedPlan().toString()
    # the distinct on _h must appear (Deduplicate/Aggregate over the
    # hash alone) — raw-row banding would have no such node
    assert "Deduplicate" in txt or "Aggregate [_h" in txt
    out = plan.collect()
    same = [r for r in out if r["hamming"] == 0]
    cross = [r for r in out if r["hamming"] == 1]
    assert len(same) == 2 * g * (g - 1) // 2
    assert len(cross) == g * g
    assert len(out) == len(same) + len(cross)


def test_hamming_topk_matches_brute_force(spark):
    # probe-sided pigeonhole: full-scan Hamming ranking must equal the
    # band-filtered retrieval at max_hamming < bands
    import random

    from healthcare_api_spark.operators.dedup import hamming_topk

    rng = random.Random(11)
    probe = rng.getrandbits(64)
    hashes = []
    for _ in range(60):
        h = probe
        for _ in range(rng.randrange(0, 6)):  # 0-5 bit flips
            h ^= 1 << rng.randrange(64)
        hashes.append(h)
    rows = [(i, f"{h:016x}") for i, h in enumerate(hashes)]
    df = spark.createDataFrame(rows, ["id", "h"])
    got = [
        (r["id"], r["hamming"])
        for r in hamming_topk(df, "id", "h", f"{probe:016x}", k=15).collect()
    ]
    want = sorted(
        ((i, bin(h ^ probe).count("1")) for i, h in enumerate(hashes)),
        key=lambda t: (t[1], t[0]),
    )
    want = [(i, d) for i, d in want if d <= 3][:15]
    assert got == want and len(want) > 0


def test_hamming_topk_case_and_validation(spark):
    import pytest as _pytest

    from healthcare_api_spark.operators.dedup import hamming_topk

    df = spark.createDataFrame([(1, "00000000DEADBEEF")], ["id", "h"])
    out = hamming_topk(df, "id", "h", "00000000deadbeee", k=5).collect()
    assert [(r["id"], r["hamming"]) for r in out] == [(1, 1)]
    with _pytest.raises(ValueError, match="16 hex"):
        hamming_topk(df, "id", "h", "xyz")
    with _pytest.raises(ValueError, match="pigeonhole"):
        hamming_topk(df, "id", "h", "0" * 16, max_hamming=4, bands=4)


def test_hamming_topk_plan_no_join(spark):
    # the probe bands are literals: the plan must contain no Join and
    # its only exchange is the final global top-k
    from healthcare_api_spark.operators.dedup import hamming_topk

    df = spark.createDataFrame([(1, "0" * 16)], ["id", "h"])
    plan = hamming_topk(df, "id", "h", "0" * 16)
    txt = plan._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in txt
    assert "TakeOrderedAndProject" in txt


def test_embedding_neardup_arrow_matches_expr(spark):
    # r7: the pair_dot_arrow kernel must reproduce the interpreted
    # zip_with fold bit-for-bit on real embeddings (the ivf_assign
    # pinning precedent) — cos values compared EXACTLY, not approx
    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", "embedding", (F.col("vec_id") % 5).alias("bkt"))
        .limit(300)
    )
    kw = dict(threshold=-1.0, bucket_col="bkt")  # keep every pair
    expr = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in dedup.embedding_neardup_pairs(
            emb, "vec_id", "embedding", method="expr", **kw
        ).collect()
    }
    arrow = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in dedup.embedding_neardup_pairs(
            emb, "vec_id", "embedding", method="arrow", **kw
        ).collect()
    }
    assert expr == arrow and len(expr) > 0


def test_prefix_jaccard_exact_recall_vs_brute_force(spark):
    """d18: the prefix-filtered join must emit EXACTLY the pairs the
    naive all-pairs computation does, on a randomized corpus with
    planted near-dups — the lossless-prune contract."""
    import random

    from healthcare_api_spark.operators import dedup

    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(40)]
    texts = {}
    for i in range(30):
        texts[i] = " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 15)))
    # planted near-dups: copy with a one-word tweak
    for i in range(30, 36):
        base = texts[i - 30].split()
        if len(base) > 1:
            base[rng.randrange(len(base))] = rng.choice(vocab)
        texts[i] = " ".join(base)
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])

    def brute(tau_num, tau_den):
        sets = {
            i: {t for t in " ".join(t2.lower().split()).split(" ") if t}
            for i, t2 in texts.items()
        }
        out = set()
        ids = sorted(sets)
        for ai in range(len(ids)):
            for bi in range(ai + 1, len(ids)):
                a, b = ids[ai], ids[bi]
                if not sets[a] or not sets[b]:
                    continue
                o = len(sets[a] & sets[b])
                if o * tau_den >= (len(sets[a]) + len(sets[b]) - o) * tau_num:
                    out.add((a, b))
        return out

    for tn, td in [(3, 5), (4, 5), (9, 10)]:
        got = {
            (r["id_a"], r["id_b"])
            for r in dedup.prefix_jaccard_pairs(
                df, "doc_id", "text", tn, td
            ).collect()
        }
        assert got == brute(tn, td), (tn, td)

    import pytest

    with pytest.raises(ValueError):
        dedup.prefix_jaccard_pairs(df, "doc_id", "text", 0, 5)
    with pytest.raises(ValueError):
        dedup.prefix_jaccard_pairs(df, "doc_id", "text", 6, 5)
    with pytest.raises(ValueError):
        dedup.prefix_jaccard_pairs(df, "doc_id", "text", 3, 5, shingle_n=0)


def test_prefix_jaccard_shingle_mode_isolates_neardups(spark):
    # with a shared unigram vocabulary, unigram Jaccard conflates
    # everything; 2-shingle Jaccard only pairs the true near-dups
    from healthcare_api_spark.operators import dedup

    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "a b c d e g"),   # near-dup of 1 (shares 4 of the 2-shingles)
            (3, "f e d c b a"),   # same unigrams, reversed order
        ],
        ["doc_id", "text"],
    )
    uni = {
        (r["id_a"], r["id_b"])
        for r in dedup.prefix_jaccard_pairs(df, "doc_id", "text", 3, 5).collect()
    }
    assert (1, 3) in uni  # unigram sets identical
    sh = {
        (r["id_a"], r["id_b"])
        for r in dedup.prefix_jaccard_pairs(
            df, "doc_id", "text", 3, 5, shingle_n=2
        ).collect()
    }
    assert sh == {(1, 2)}  # only the true near-dup survives


# ------------------------------------------------------- d19 paragraph --


def test_paragraph_dedup_cross_and_within_doc(spark):
    from healthcare_api_spark.operators.dedup import paragraph_dedup

    # chunk_tokens=2: doc 0 = [a b][c d]; doc 1 repeats [a b] twice and
    # adds [x y]; doc 2 is entirely doc 0's first chunk
    rows = [
        (0, "a b c d"),
        (1, "a b a b x y"),
        (2, "a b"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: (r["n_chunks"], r["n_kept"], r["text_dedup"])
        for r in paragraph_dedup(df, "doc_id", "text", chunk_tokens=2).collect()
    }
    assert out[0] == (2, 2, "a b c d")
    # doc 1: both 'a b' occurrences lose to doc 0's, 'x y' survives
    assert out[1] == (3, 1, "x y")
    assert out[2] == (1, 0, "")


def test_paragraph_dedup_first_occurrence_is_positional(spark):
    from healthcare_api_spark.operators.dedup import paragraph_dedup

    # within one doc the EARLIER index wins; order of input rows is
    # irrelevant (lexicographic (doc_id, idx) winner)
    df = spark.createDataFrame(
        [(7, "p q p q"), (3, "p q z z")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: (r["n_kept"], r["text_dedup"])
        for r in paragraph_dedup(df, "doc_id", "text", chunk_tokens=2).collect()
    }
    assert out[3] == (2, "p q z z")
    assert out[7] == (0, "")


def test_paragraph_dedup_ragged_tail_and_validation(spark):
    import pytest

    from healthcare_api_spark.operators.dedup import paragraph_dedup

    # 5 tokens at width 2 → chunks [a b][c d][e]; the short tail is its
    # own chunk and dedups independently of any full-width 'e ...'
    df = spark.createDataFrame([(1, "a b c d e"), (2, "e")], ["doc_id", "text"])
    out = {
        r["doc_id"]: (r["n_chunks"], r["n_kept"])
        for r in paragraph_dedup(df, "doc_id", "text", chunk_tokens=2).collect()
    }
    assert out[1] == (3, 3)
    assert out[2] == (1, 0)  # 'e' tail already seen as doc 1's chunk 2
    with pytest.raises(ValueError):
        paragraph_dedup(df, "doc_id", "text", chunk_tokens=0)


def test_cdc_chunks_reassemble_and_resync(spark):
    """Chunks reassemble to the original text in index order, and a
    prefix-shifted copy re-synchronizes: most of its chunks dedup
    against the original (the property fixed-stride chunking lacks)."""
    from pyspark.sql import functions as F

    from healthcare_api_spark.operators.dedup import cdc_chunks

    base = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the spark engine chunks content at md5 mask boundaries "
        "so edits only perturb one chunk not the whole tail of the doc "
    ) * 4
    df = spark.createDataFrame(
        [(0, base), (1, "XY" + base)], ["doc_id", "text"]
    )
    out = cdc_chunks(df, "doc_id", "text", window=16, mask_bits=4)
    rows = out.collect()
    # reassembly: concat chunks of doc 0 in chunk_idx order == base
    got = "".join(
        base[r["start_pos"]: r["start_pos"] + r["chunk_len"]]
        for r in sorted(
            (r for r in rows if r["doc_id"] == 0),
            key=lambda r: r["chunk_idx"],
        )
    )
    assert got == base
    # resync: the shifted doc shares most chunk hashes with doc 0
    kept1 = [r for r in rows if r["doc_id"] == 1 and r["keep"] == 1]
    all1 = [r for r in rows if r["doc_id"] == 1]
    assert len(all1) >= 4
    assert len(kept1) <= max(2, len(all1) // 2), (
        f"shifted copy kept {len(kept1)}/{len(all1)} chunks — no resync"
    )

    import pytest

    with pytest.raises(ValueError):
        cdc_chunks(df, "doc_id", "text", window=0)
    with pytest.raises(ValueError):
        cdc_chunks(df, "doc_id", "text", mask_bits=0)


def test_cdc_chunks_short_doc_single_chunk(spark):
    """Docs shorter than the window are one whole-doc chunk."""
    from healthcare_api_spark.operators.dedup import cdc_chunks

    df = spark.createDataFrame([(0, "tiny")], ["doc_id", "text"])
    rows = cdc_chunks(df, "doc_id", "text", window=16).collect()
    assert len(rows) == 1
    assert rows[0]["chunk_len"] == 4 and rows[0]["start_pos"] == 0


def test_containment_quote_found_jaccard_blind(spark):
    from healthcare_api_spark.operators.dedup import (
        containment_pairs,
        prefix_jaccard_pairs,
    )

    long = " ".join(f"w{i}" for i in range(200))
    quote = " ".join(f"w{i}" for i in range(30))
    other = " ".join(f"z{i}" for i in range(50))
    docs = spark.createDataFrame(
        [(1, long), (2, quote), (3, other)], ["doc_id", "text"]
    )
    got = {
        (r["id_a"], r["id_b"]): r["overlap"]
        for r in containment_pairs(docs, "doc_id", "text", 9, 10, 3).collect()
    }
    # quote (28 shingles) fully inside long (198); NOT vice versa
    assert got == {(2, 1): 28}
    # Jaccard at the same strictness misses it: J = 28/198 ≈ 0.14
    j = prefix_jaccard_pairs(docs, "doc_id", "text", 9, 10, shingle_n=3)
    assert j.count() == 0


def test_containment_brute_force_parity_random(spark):
    import random

    from healthcare_api_spark.operators.dedup import containment_pairs

    rng = random.Random(55)
    vocab = [f"t{i}" for i in range(40)]
    rows = []
    for i in range(30):
        n = rng.randint(3, 20)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    for tn, td in ((1, 2), (7, 10), (1, 1)):
        got = {
            (r["id_a"], r["id_b"])
            for r in containment_pairs(docs, "doc_id", "text", tn, td, 1).collect()
        }
        sets = {
            i: set(t.lower().split())
            for i, t in rows
        }
        want = {
            (a, b)
            for a in sets
            for b in sets
            if a != b and len(sets[a] & sets[b]) * td >= len(sets[a]) * tn
        }
        assert got == want, (tn, td)


def test_containment_validation(spark):
    import pytest

    from healthcare_api_spark.operators.dedup import containment_pairs

    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        containment_pairs(docs, "doc_id", "text", 0, 10)
    with pytest.raises(ValueError):
        containment_pairs(docs, "doc_id", "text", 11, 10)
    with pytest.raises(ValueError):
        containment_pairs(docs, "doc_id", "text", 1, 2, shingle_n=0)


def test_dedup_eval_hand_computed(spark):
    from healthcare_api_spark.operators.dedup import dedup_eval

    pred = spark.createDataFrame(
        # (2,1) normalizes to (1,2); (3,3) self-pair dropped; (1,2)
        # duplicate collapses
        [(2, 1), (1, 2), (3, 4), (3, 3), (5, 6)], ["id_a", "id_b"]
    )
    truth = spark.createDataFrame([(1, 2), (3, 4), (7, 8)], ["id_a", "id_b"])
    r = dedup_eval(pred, truth).collect()[0]
    assert (r["n_pred"], r["n_truth"], r["n_hit"]) == (3, 3, 2)
    assert r["precision"] == round(2 / 3, 6) + (0.000001 if False else 0)
    assert abs(r["precision"] - 0.666667) < 1e-12
    assert abs(r["recall"] - 0.666667) < 1e-12
    assert abs(r["f1"] - 0.666667) < 1e-12


def test_dedup_eval_empty_sides_null_ratios(spark):
    from healthcare_api_spark.operators.dedup import dedup_eval

    empty = spark.createDataFrame([], "id_a long, id_b long")
    truth = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    r = dedup_eval(empty, truth).collect()[0]
    assert (r["n_pred"], r["n_truth"], r["n_hit"]) == (0, 1, 0)
    assert r["precision"] is None and r["recall"] == 0.0 and r["f1"] == 0.0
