"""PageRank: hand-computed small cases, invariants, dangling mass."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from healthcare_api_spark.operators.graph import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def test_pagerank_one_iteration_hand_computed(spark):
    # a→b, c→b, b→a ; n=3, d=0.85, no dangling
    # after 1 iter: rank(b) = 0.05 + 0.85·(1/3 + 1/3) = 0.616667
    #               rank(a) = 0.05 + 0.85·(1/3)       = 0.333333
    #               rank(c) = 0.05 + 0.85·0           = 0.05
    e = _edges(spark, [("a", "b"), ("c", "b"), ("b", "a")])
    r = {x["node"]: x["rank"] for x in pagerank(e, iters=1).collect()}
    assert abs(r["b"] - (0.05 + 0.85 * (2 / 3))) < 1e-12
    assert abs(r["a"] - (0.05 + 0.85 / 3)) < 1e-12
    assert abs(r["c"] - 0.05) < 1e-12


def test_pagerank_mass_conserved_and_symmetry(spark):
    # undirected 4-cycle (each node degree 2, symmetric) → uniform ranks
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    pairs += [(y, x) for x, y in pairs]
    r = pagerank(_edges(spark, pairs), iters=4).collect()
    total = sum(x["rank"] for x in r)
    assert abs(total - 1.0) < 1e-9  # mass conservation (no dangling)
    for x in r:
        assert abs(x["rank"] - 0.25) < 1e-12  # symmetry → uniform


def test_pagerank_dangling_mass_redistributed(spark):
    # a→b and b has NO out-edges: b's mass must be recycled, not lost
    e = _edges(spark, [("a", "b")])
    r = {x["node"]: x["rank"] for x in pagerank(e, iters=3).collect()}
    total = sum(r.values())
    assert abs(total - 1.0) < 1e-9
    assert r["b"] > r["a"]  # b receives a's full share


def test_pagerank_hub_ranks_highest(spark):
    # star: spokes all point at the hub (and hub points back at one)
    e = _edges(spark, [("s1", "h"), ("s2", "h"), ("s3", "h"), ("h", "s1")])
    r = {x["node"]: x["rank"] for x in pagerank(e, iters=5).collect()}
    assert r["h"] == max(r.values())


def test_pagerank_rejects_zero_iters(spark):
    with pytest.raises(ValueError):
        pagerank(_edges(spark, [("a", "b")]), iters=0)


def test_triangle_count_k4_plus_tail(spark):
    from healthcare_api_spark.operators.graph import triangle_count

    # K4 on {1,2,3,4} (4 triangles, each node in 3) + pendant 5-1
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (5, 1)]
    # feed duplicates + reversed + self-loop to exercise normalization
    edges += [(2, 1), (3, 3), (1, 2)]
    df = spark.createDataFrame(edges, ["s", "d"])
    out = {r["node"]: r for r in triangle_count(df, "s", "d").collect()}
    assert out[1]["degree"] == 4 and out[1]["triangles"] == 3
    for n in (2, 3, 4):
        assert out[n]["degree"] == 3 and out[n]["triangles"] == 3
        assert out[n]["clustering"] == 1.0
    assert out[5]["degree"] == 1 and out[5]["triangles"] == 0
    assert out[5]["clustering"] == 0.0
    # K4 node 1 has deg 4 (tail): C = 2*3/(4*3) = 0.5
    assert out[1]["clustering"] == 0.5


def test_triangle_count_triangle_free(spark):
    from healthcare_api_spark.operators.graph import triangle_count

    # bipartite C6 cycle — triangle-free
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 1)], ["s", "d"]
    )
    rows = triangle_count(df, "s", "d").collect()
    assert all(r["triangles"] == 0 for r in rows)
    assert all(r["degree"] == 2 for r in rows)


def test_kcore_peels_tail_keeps_clique(spark):
    from healthcare_api_spark.operators.graph import kcore

    # K4 {1,2,3,4} + chain 4-5-6: the 3-core is exactly the K4 (the
    # chain peels away over two rounds)
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    df = spark.createDataFrame(edges, ["s", "d"])
    out = {r["node"]: r["degree"] for r in kcore(df, "s", "d", k=3, iters=4).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}
    # 1-core of the same graph keeps everything
    assert kcore(df, "s", "d", k=1, iters=4).count() == 6


def test_kcore_cascading_peel_needs_iterations(spark):
    from healthcare_api_spark.operators.graph import kcore

    # path 1-2-3-4-5: 2-core is empty, but only after cascading peels
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (4, 5)], ["s", "d"])
    assert kcore(df, "s", "d", k=2, iters=4).count() == 0
    # a single peel round would NOT empty it (interior degrees are 2)
    assert kcore(df, "s", "d", k=2, iters=1).count() > 0


def test_kcore_sql_twin_matches(spark):
    import duckdb

    from healthcare_api_spark.operators.graph import kcore, kcore_sql

    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6), (6, 4)]
    df = spark.createDataFrame(edges, ["s", "d"])
    got = sorted(
        (r["node"], r["degree"]) for r in kcore(df, "s", "d", k=2, iters=5).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE e (s BIGINT, d BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    want = sorted(map(tuple, con.execute(kcore_sql("SELECT s, d FROM e", 2, 5)).fetchall()))
    assert got == want and got


def test_kcore_detects_underpeel_on_long_path(spark):
    import warnings

    from healthcare_api_spark.operators.graph import kcore

    # path 1-2-...-12 at k=2: true 2-core is EMPTY, but each peel round
    # only strips the two endpoints, so iters=2 leaves interior nodes —
    # the fixed-point check must flag the under-peel (VERDICT r5 #3)
    edges = [(i, i + 1) for i in range(1, 12)]
    df = spark.createDataFrame(edges, ["s", "d"])
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = kcore(df, "s", "d", k=2, iters=2)
        assert out.count() > 0  # under-peeled survivors exist
    assert any("fixed point" in str(w.message) for w in caught)

    with pytest.raises(RuntimeError, match="fixed point"):
        kcore(df, "s", "d", k=2, iters=2, on_nonconverged="raise").count()


def test_kcore_converged_emits_no_warning(spark):
    import warnings

    from healthcare_api_spark.operators.graph import kcore

    # K4 + short tail converges well inside 4 rounds: no warning, and
    # 'raise' mode must not raise either
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    df = spark.createDataFrame(edges, ["s", "d"])
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = {
            r["node"]
            for r in kcore(df, "s", "d", k=3, iters=4, on_nonconverged="raise").collect()
        }
    assert out == {1, 2, 3, 4}
    assert not any(isinstance(w.message, RuntimeWarning) for w in caught)


def test_kcore_rejects_bad_on_nonconverged(spark):
    from healthcare_api_spark.operators.graph import kcore

    df = spark.createDataFrame([(1, 2)], ["s", "d"])
    with pytest.raises(ValueError, match="on_nonconverged"):
        kcore(df, "s", "d", k=1, iters=1, on_nonconverged="explode")


def test_label_propagation_two_cliques_bridge(spark):
    """Two triangles joined by one bridge edge resolve to two
    communities labeled by each triangle's smallest id (r7 g4)."""
    from healthcare_api_spark.operators.graph import label_propagation

    edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    df = spark.createDataFrame(edges, ["s", "d"])
    got = {
        r["node"]: r["label"]
        for r in label_propagation(df, "s", "d", iters=4).collect()
    }
    assert got[1] == got[2] == got[3] == 1
    assert got[4] == got[5] == got[6] == 4


def test_label_propagation_sql_twin_matches(spark):
    import duckdb

    from healthcare_api_spark.operators.graph import (
        label_propagation,
        label_propagation_sql,
    )

    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (1, 3), (3, 5), (6, 7), (7, 8), (6, 8)]
    df = spark.createDataFrame(edges, ["s", "d"])
    got = sorted(
        (r["node"], r["label"])
        for r in label_propagation(df, "s", "d", iters=3, on_nonconverged="ignore").collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE e (s BIGINT, d BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    want = sorted(
        map(tuple, con.execute(label_propagation_sql("SELECT s, d FROM e", 3)).fetchall())
    )
    assert got == want and got


def test_label_propagation_nonconvergence_warn_and_raise(spark):
    """A long path with 1 round must still be moving; warn fires,
    raise raises, ignore stays silent (the kcore on_nonconverged
    contract)."""
    import warnings

    from healthcare_api_spark.operators.graph import label_propagation

    edges = [(i, i + 1) for i in range(1, 12)]
    df = spark.createDataFrame(edges, ["s", "d"])
    with warnings.catch_warnings(record=True) as wlist:
        warnings.simplefilter("always")
        label_propagation(df, "s", "d", iters=1).count()
    assert any("fixed point" in str(w.message) for w in wlist)
    with pytest.raises(RuntimeError, match="fixed point"):
        label_propagation(df, "s", "d", iters=1, on_nonconverged="raise").count()
    with warnings.catch_warnings(record=True) as wlist:
        warnings.simplefilter("always")
        label_propagation(df, "s", "d", iters=1, on_nonconverged="ignore").count()
    assert not any("fixed point" in str(w.message) for w in wlist)
    with pytest.raises(ValueError):
        label_propagation(df, "s", "d", iters=0)
    with pytest.raises(ValueError):
        label_propagation(df, "s", "d", on_nonconverged="bogus")


# ---------------------------------------------------------------- g5 CC --


def test_connected_components_two_components(spark):
    from healthcare_api_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12)], ["s", "d"]
    )
    out = {
        r["node"]: r["component"]
        for r in connected_components(edges, "s", "d", iters=4).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10}


def test_connected_components_long_chain_logarithmic(spark):
    # a 64-node path has diameter 63; plain min-propagation needs 63
    # rounds, pointer jumping must finish (and pass the convergence
    # check silently) in 8
    import warnings

    from healthcare_api_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], ["s", "d"]
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        out = connected_components(edges, "s", "d", iters=8).collect()
    assert all(r["component"] == 0 for r in out)
    assert len(out) == 64


def test_connected_components_sql_twin_matches(spark):
    import duckdb

    from healthcare_api_spark.operators.graph import (
        connected_components,
        connected_components_sql,
    )

    rows = [(1, 5), (5, 9), (2, 9), (7, 3), (3, 8), (20, 21)]
    edges = spark.createDataFrame(rows, ["s", "d"])
    got = {
        (r["node"], r["component"])
        for r in connected_components(edges, "s", "d", iters=4).collect()
    }
    vals = ", ".join(f"({s}, {d})" for s, d in rows)
    sql = connected_components_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(s, d)", iters=4
    )
    want = set(map(tuple, duckdb.connect().execute(sql).fetchall()))
    assert got == want


def test_connected_components_nonconvergence_warn_and_raise(spark):
    import warnings

    import pytest

    from healthcare_api_spark.operators.graph import connected_components

    # a 64-path cannot finish in 1 round
    edges = spark.createDataFrame([(i, i + 1) for i in range(63)], ["s", "d"])
    with pytest.raises(RuntimeError, match="did NOT reach a fixed point"):
        connected_components(edges, "s", "d", iters=1, on_nonconverged="raise")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        connected_components(edges, "s", "d", iters=1, on_nonconverged="warn")
    assert any("fixed point" in str(x.message) for x in w)
    with pytest.raises(ValueError):
        connected_components(edges, "s", "d", iters=0)
    with pytest.raises(ValueError):
        connected_components(edges, "s", "d", on_nonconverged="nope")


def test_adamic_adar_hand_computed(spark):
    import math

    from healthcare_api_spark.operators.graph import adamic_adar

    # K1,3 star 0-{1,2,3} plus edge 1-2: non-edges through shared
    # neighbors are (1,3) and (2,3) via hub 0 (deg 3), and 0 has no
    # non-neighbor. (1,2) IS an edge -> excluded.
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 2)], ["s", "d"]
    )
    got = {
        (r["u"], r["v"]): (r["common_neighbors"], r["aa"])
        for r in adamic_adar(edges, "s", "d").collect()
    }
    term = round(1e6 / math.log(3.0)) / 1e6
    assert got == {(1, 3): (1, term), (2, 3): (1, term)}


def test_adamic_adar_multi_witness_and_top_n(spark):
    import math

    from healthcare_api_spark.operators.graph import adamic_adar

    # square 1-2-3-4-1: (1,3) share {2,4}, (2,4) share {1,3}; all
    # degrees 2 so each term is 1/ln 2
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (4, 1)], ["s", "d"])
    rows = adamic_adar(edges, "s", "d", top_n=1).collect()
    assert len(rows) == 1
    r = rows[0]
    # tie on score -> (u, v) tiebreak picks (1, 3)
    assert (r["u"], r["v"], r["common_neighbors"]) == (1, 3, 2)
    assert r["aa"] == 2 * round(1e6 / math.log(2.0)) / 1e6


def test_adamic_adar_hub_cap_and_validation(spark):
    import pytest

    from healthcare_api_spark.operators.graph import adamic_adar

    # hub 0 with 3 leaves: capping wedge degree below 3 removes every
    # candidate (the hub is the only shared neighbor)
    edges = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], ["s", "d"])
    assert adamic_adar(edges, "s", "d").count() == 3
    assert adamic_adar(edges, "s", "d", max_wedge_degree=2).count() == 0
    with pytest.raises(ValueError):
        adamic_adar(edges, "s", "d", top_n=0)
    with pytest.raises(ValueError):
        adamic_adar(edges, "s", "d", max_wedge_degree=1)


def test_adamic_adar_sql_twin_parity(spark):
    import duckdb

    from healthcare_api_spark.operators.graph import adamic_adar, adamic_adar_sql

    rows = [(1, 2), (2, 3), (3, 4), (4, 5), (1, 3), (2, 5), (6, 7)]
    edges = spark.createDataFrame(rows, ["s", "d"])
    got = {
        (r["u"], r["v"]): (r["common_neighbors"], r["aa"])
        for r in adamic_adar(edges, "s", "d").collect()
    }
    vals = ", ".join(f"({s}, {d})" for s, d in rows)
    sql = adamic_adar_sql(f"SELECT * FROM (VALUES {vals}) AS t(s, d)")
    want = {
        (u, v): (cn, aa)
        for u, v, cn, aa in duckdb.connect().execute(sql).fetchall()
    }
    assert got == want


def test_personalized_pagerank_seed_locality_and_mass(spark):
    from healthcare_api_spark.operators.graph import personalized_pagerank

    # path 1-2-3-4-5 plus far pair 8-9: teleport to seed {1} keeps
    # mass near 1; 8/9 are unreachable from the seed -> rank 0
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3), (4, 5), (5, 4),
         (8, 9), (9, 8)],
        ["src", "dst"],
    )
    got = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(edges, [1], iters=8).collect()
    }
    assert abs(sum(got.values()) - 1.0) < 1e-9   # mass conserved
    assert got[1] > got[2] > got[3] > got[4]     # decays with distance
    assert got[8] == 0.0 and got[9] == 0.0       # unreachable


def test_personalized_pagerank_sql_twin_and_validation(spark):
    import duckdb
    import pytest

    from healthcare_api_spark.operators.graph import (
        personalized_pagerank,
        personalized_pagerank_sql,
    )

    rows = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 2), (5, 1)]
    edges = spark.createDataFrame(rows, ["src", "dst"])
    got = {
        (r["node"], round(r["rank"], 6))
        for r in personalized_pagerank(edges, [1, 4], iters=4).collect()
    }
    vals = ", ".join(f"({s}, {d})" for s, d in rows)
    sql = personalized_pagerank_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, dst)", [1, 4], iters=4
    )
    want = set(map(tuple, duckdb.connect().execute(sql).fetchall()))
    assert got == want
    with pytest.raises(ValueError):
        personalized_pagerank(edges, [], iters=3)
    # a seed absent from the node set would silently shrink Σ rank —
    # must raise instead (ADVICE r8)
    with pytest.raises(ValueError, match="seed"):
        personalized_pagerank(edges, [1, 99], iters=2)


def test_hits_hand_computed_one_round(spark):
    """u11 rule from birth: literal expected values derived BY HAND.
    Graph a→b, a→c, b→c, one round, scale 10⁶: a_raw = {b: 10⁶,
    c: 2·10⁶}, M = 2·10⁶ → authority micros {a: 0, b: 500000 (the
    (2raw·S+M) DIV 2M half rounds DOWN on the exact .5), c: 10⁶};
    h_raw = {a: 1.5·10⁶, b: 10⁶}, M = 1.5·10⁶ → hub micros
    {a: 10⁶, b: 666667 (666666.71 rounds up), c: 0}."""
    from healthcare_api_spark.operators.graph import hits

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")], ["src", "dst"]
    )
    got = {
        r["node"]: (r["hub"], r["authority"])
        for r in hits(edges, iters=1).collect()
    }
    assert got == {
        "a": (1.0, 0.0),
        "b": (0.666667, 0.5),
        "c": (0.0, 1.0),
    }


def test_hits_sql_twin_parity(spark):
    import duckdb

    from healthcare_api_spark.operators.graph import hits, hits_sql

    rows = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 2), (5, 1), (1, 4)]
    edges = spark.createDataFrame(rows, ["src", "dst"])
    got = sorted(
        (r["node"], r["hub"], r["authority"])
        for r in hits(edges, iters=4).collect()
    )
    vals = ", ".join(f"({s}, {d})" for s, d in rows)
    sql = hits_sql(f"SELECT * FROM (VALUES {vals}) AS t(src, dst)", iters=4)
    want = sorted(map(tuple, duckdb.connect().execute(sql).fetchall()))
    assert got == want  # exact equality — integer path, no rounding contract


def test_personalized_pagerank_sql_string_seeds(spark):
    """String seeds must be quoted/escaped, and a seed containing the
    substring 'node' must not be corrupted by the per-round preference
    rewrite (ADVICE r8: the old str.replace would mangle it)."""
    import duckdb

    from healthcare_api_spark.operators.graph import (
        personalized_pagerank,
        personalized_pagerank_sql,
    )

    rows = [("node1", "b"), ("b", "node1"), ("b", "c"), ("c", "node1")]
    edges = spark.createDataFrame(rows, ["src", "dst"])
    got = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(edges, ["node1"], iters=3).collect()
    }
    vals = ", ".join(f"('{s}', '{d}')" for s, d in rows)
    sql = personalized_pagerank_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, dst)", ["node1"], iters=3
    )
    want = dict(duckdb.connect().execute(sql).fetchall())
    # tolerance, not 6-dp set equality: this toy graph happens to land
    # a rank on a round-half boundary; the test's subject is the seed
    # quoting / 'node'-substring corruption, not rounding bit-parity
    # (hash-grade parity is g7's job, whose ranks sit off-boundary)
    assert set(got) == set(want)
    for n in got:
        assert abs(got[n] - want[n]) < 1e-6, n
    assert abs(sum(got.values()) - 1.0) < 1e-5
    with pytest.raises(ValueError):
        personalized_pagerank(edges, [1], iters=0)


def test_modularity_hand_computed_two_cliques(spark):
    from fractions import Fraction

    from healthcare_api_spark.operators.graph import modularity

    # two triangles joined by one bridge: m = 7
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        ["s", "d"],
    )
    labels = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "b"), (6, "b")],
        ["node", "label"],
    )
    got = {
        r["label"]: r
        for r in modularity(edges, labels, "s", "d").collect()
    }
    m = 7
    # community a: in=3, deg=2+2+3=7; b identical
    for c in ("a", "b"):
        r = got[c]
        assert (r["n_nodes"], r["internal_edges"], r["total_degree"]) == (3, 3, 7)
        assert r["q_num"] == 4 * m * 3 - 49
        assert r["q_term"] == r["q_num"] / (4.0 * m * m)
    q = sum(r["q_term"] for r in got.values())
    want = float(2 * (Fraction(3, 7) - Fraction(7, 14) ** 2))
    assert abs(q - want) < 1e-12


def test_modularity_singleton_and_cross_edges(spark):
    from healthcare_api_spark.operators.graph import modularity

    # all nodes in one community -> Q = in/m - 1 = 0 exactly
    edges = spark.createDataFrame([(1, 2), (2, 3)], ["s", "d"])
    labels = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "x")], ["node", "label"]
    )
    rows = modularity(edges, labels, "s", "d").collect()
    assert len(rows) == 1 and rows[0]["q_term"] == 0.0
    # every node its own community -> internal 0 everywhere
    solo = spark.createDataFrame(
        [(1, "p"), (2, "q"), (3, "r")], ["node", "label"]
    )
    for r in modularity(edges, solo, "s", "d").collect():
        assert r["internal_edges"] == 0 and r["q_num"] < 0


def test_bfs_hops_hand_computed_chain_and_branch(spark):
    from healthcare_api_spark.operators.graph import bfs_hops

    # 1-2-3-4-5 chain plus branch 3-6; seed {1}: hops are the chain
    # positions, independently derivable by eye
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (3, 6)], ["s", "d"]
    )
    got = {
        r["node"]: r["hops"]
        for r in bfs_hops(edges, "s", "d", seeds=[1], max_hops=6).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4, 6: 3}


def test_bfs_hops_multi_source_min_and_cap(spark):
    from healthcare_api_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], ["s", "d"]
    )
    # two seeds: every node takes the NEARER one (node 3 is 2 hops
    # from seed 1 but 1 hop from seed 4... wait: seeds {1,5})
    got = {
        r["node"]: r["hops"]
        for r in bfs_hops(edges, "s", "d", seeds=[1, 5], max_hops=6).collect()
    }
    assert got == {1: 0, 5: 0, 2: 1, 4: 1, 3: 2}
    # hop cap excludes the far tail; isolated seed still emits 0
    capped = {
        r["node"]: r["hops"]
        for r in bfs_hops(edges, "s", "d", seeds=[1, 99], max_hops=2).collect()
    }
    assert capped == {1: 0, 99: 0, 2: 1, 3: 2}


def test_bfs_hops_directed_and_validation(spark):
    import pytest

    from healthcare_api_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], ["s", "d"])
    got = {
        r["node"]: r["hops"]
        for r in bfs_hops(
            edges, "s", "d", seeds=[2], max_hops=4, directed=True
        ).collect()
    }
    # directed: 2->3->1; the reverse edges don't exist
    assert got == {2: 0, 3: 1, 1: 2}
    with pytest.raises(ValueError):
        bfs_hops(edges, "s", "d", seeds=[], max_hops=4)
    with pytest.raises(ValueError):
        bfs_hops(edges, "s", "d", seeds=[1], max_hops=0)


def test_bfs_hops_sql_twin_parity(spark):
    import duckdb

    from healthcare_api_spark.operators.graph import bfs_hops, bfs_hops_sql

    rows = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (4, 10)]
    edges = spark.createDataFrame(rows, ["s", "d"])
    got = sorted(
        (r["node"], r["hops"])
        for r in bfs_hops(edges, "s", "d", seeds=[1, 12], max_hops=3).collect()
    )
    vals = ", ".join(f"({a}, {b})" for a, b in rows)
    sql = bfs_hops_sql(
        f"SELECT s, d FROM (VALUES {vals}) AS t(s, d)",
        seeds=[1, 12],
        max_hops=3,
    )
    want = sorted(duckdb.sql(sql).fetchall())
    assert got == [(int(a), int(b)) for a, b in want]


def test_stress_centrality_hand_computed_path(spark):
    from healthcare_api_spark.operators.graph import stress_centrality

    # path 1-2-3-4-5, pivot {1}: paths through 2: 1→2→{3,4,5} = 3;
    # through 3: 1→..→{4,5} = 2; through 4: 1; endpoint 5: 0
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], ["s", "d"]
    )
    got = {
        r["node"]: r["stress"]
        for r in stress_centrality(
            edges, "s", "d", pivots=[1], max_depth=6
        ).collect()
    }
    assert got == {2: 3, 3: 2, 4: 1, 5: 0}


def test_stress_centrality_multiplicity_diamond(spark):
    from healthcare_api_spark.operators.graph import stress_centrality

    # diamond 1-{2,3}-4-5: two shortest 1→4 paths (sigma(4)=2), both
    # continue to 5, so 4 carries 2 paths; 2 and 3 each carry
    # {4, 5} = 2 paths
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)], ["s", "d"]
    )
    got = {
        r["node"]: r["stress"]
        for r in stress_centrality(
            edges, "s", "d", pivots=[1], max_depth=6
        ).collect()
    }
    assert got == {2: 2, 3: 2, 4: 2, 5: 0}


def test_stress_centrality_early_dead_end_branch(spark):
    from healthcare_api_spark.operators.graph import stress_centrality

    # branch 1-2-3 plus dead-end 1-4: node 4 sits at level 1 with NO
    # level-2 successors — it must come back with Q = 0 (the r12
    # backward pass restores no-successor rows by a left join onto the
    # level frame instead of the old edges left-join; this pins that
    # path). Through-2 paths from pivot 1: 1→2→3 = 1; 3 and 4 carry 0.
    edges = spark.createDataFrame([(1, 2), (2, 3), (1, 4)], ["s", "d"])
    got = {
        r["node"]: r["stress"]
        for r in stress_centrality(
            edges, "s", "d", pivots=[1], max_depth=6
        ).collect()
    }
    assert got == {2: 1, 3: 0, 4: 0}


def test_stress_centrality_depth_cap_and_multi_pivot(spark):
    import pytest

    from healthcare_api_spark.operators.graph import stress_centrality

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], ["s", "d"]
    )
    # depth 2: pivot 1 reaches {2,3}; through-2 paths: 1→2→3 only
    got = {
        r["node"]: r["stress"]
        for r in stress_centrality(
            edges, "s", "d", pivots=[1], max_depth=2
        ).collect()
    }
    assert got == {2: 1, 3: 0}
    # pivots at both ends: interior nodes carry paths from each side;
    # pivot nodes stay IN the output with their cross-pivot interior
    # stress (here 0 — each pivot is the other's path ENDPOINT); only
    # their self-rooted endpoint rows are excluded (ADVICE r9)
    both = {
        r["node"]: r["stress"]
        for r in stress_centrality(
            edges, "s", "d", pivots=[1, 5], max_depth=6
        ).collect()
    }
    assert both == {1: 0, 2: 3 + 1, 3: 2 + 2, 4: 1 + 3, 5: 0}
    # a pivot sitting INSIDE the other pivot's paths keeps that stress:
    # pivot 3 is interior to 1→{4,5} (2 paths) — the count the old
    # anti-join silently dropped
    mid = {
        r["node"]: r["stress"]
        for r in stress_centrality(
            edges, "s", "d", pivots=[1, 3], max_depth=6
        ).collect()
    }
    assert mid == {1: 0, 2: 3 + 1, 3: 2, 4: 1 + 1, 5: 0}
    with pytest.raises(ValueError):
        stress_centrality(edges, "s", "d", pivots=[], max_depth=2)
    with pytest.raises(ValueError):
        stress_centrality(edges, "s", "d", pivots=[1], max_depth=0)


def test_stress_centrality_sql_twin_parity(spark):
    import duckdb

    from healthcare_api_spark.operators.graph import (
        stress_centrality,
        stress_centrality_sql,
    )

    rows = [(1, 2), (2, 3), (3, 4), (4, 5), (2, 6), (6, 4), (5, 7), (10, 11)]
    edges = spark.createDataFrame(rows, ["s", "d"])
    got = sorted(
        (r["node"], r["stress"])
        for r in stress_centrality(
            edges, "s", "d", pivots=[1, 10], max_depth=4
        ).collect()
    )
    vals = ", ".join(f"({a}, {b})" for a, b in rows)
    sql = stress_centrality_sql(
        f"SELECT s, d FROM (VALUES {vals}) AS t(s, d)",
        pivots=[1, 10],
        max_depth=4,
    )
    want = sorted((int(a), int(b)) for a, b in duckdb.sql(sql).fetchall())
    assert got == want


def test_sssp_weighted_hand_computed(spark):
    from healthcare_api_spark.operators.graph import sssp_weighted

    # 1-2 (w5), 2-3 (w5), 1-3 (w20): the two-hop route beats the
    # direct edge; 3-4 (w1) extends it
    edges = spark.createDataFrame(
        [(1, 2, 5), (2, 3, 5), (1, 3, 20), (3, 4, 1)], ["s", "d", "w"]
    )
    got = {
        r["node"]: r["dist"]
        for r in sssp_weighted(
            edges, "s", "d", "w", sources=[1], rounds=6
        ).collect()
    }
    assert got == {1: 0, 2: 5, 3: 10, 4: 11}


def test_sssp_weighted_bounded_rounds_and_parallel_edges(spark):
    from healthcare_api_spark.operators.graph import sssp_weighted

    # rounds=1: only direct neighbors relax; parallel edges keep min
    edges = spark.createDataFrame(
        [(1, 2, 9), (1, 2, 4), (2, 3, 1)], ["s", "d", "w"]
    )
    got = {
        r["node"]: r["dist"]
        for r in sssp_weighted(
            edges, "s", "d", "w", sources=[1], rounds=1
        ).collect()
    }
    assert got == {1: 0, 2: 4}


def test_sssp_weighted_multi_source_directed_validation(spark):
    import pytest

    from healthcare_api_spark.operators.graph import sssp_weighted

    edges = spark.createDataFrame(
        [(1, 2, 3), (2, 3, 3), (5, 4, 1), (4, 3, 1)], ["s", "d", "w"]
    )
    got = {
        r["node"]: r["dist"]
        for r in sssp_weighted(
            edges, "s", "d", "w", sources=[1, 5], rounds=6, directed=True
        ).collect()
    }
    # node 3: via 1 costs 6, via 5 costs 2 — min wins; nothing flows
    # backwards in directed mode
    assert got == {1: 0, 5: 0, 2: 3, 4: 1, 3: 2}
    with pytest.raises(ValueError):
        sssp_weighted(edges, "s", "d", "w", sources=[], rounds=3)
    with pytest.raises(ValueError):
        sssp_weighted(edges, "s", "d", "w", sources=[1], rounds=0)
    neg = spark.createDataFrame([(1, 2, -1)], ["s", "d", "w"])
    with pytest.raises(ValueError, match="non-negative"):
        sssp_weighted(neg, "s", "d", "w", sources=[1], rounds=2)


def test_sssp_weighted_sql_twin_parity(spark):
    import duckdb

    from healthcare_api_spark.operators.graph import (
        sssp_weighted,
        sssp_weighted_sql,
    )

    rows = [(1, 2, 5), (2, 3, 5), (1, 3, 20), (3, 4, 1), (9, 10, 2)]
    edges = spark.createDataFrame(rows, ["s", "d", "w"])
    got = sorted(
        (r["node"], r["dist"])
        for r in sssp_weighted(
            edges, "s", "d", "w", sources=[1, 9], rounds=4
        ).collect()
    )
    vals = ", ".join(f"({a}, {b}, {c})" for a, b, c in rows)
    sql = sssp_weighted_sql(
        f"SELECT s, d, w FROM (VALUES {vals}) AS t(s, d, w)",
        sources=[1, 9],
        rounds=4,
    )
    want = sorted((int(a), int(b)) for a, b in duckdb.sql(sql).fetchall())
    assert got == want
