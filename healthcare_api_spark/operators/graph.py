"""Graph analytics over reference/edge tables (SURVEY.md §2.4's
"graph-view" reading of the store, generalized).

Connected components already lives in dedup.cluster_pairs (min-label
propagation — the dedup-cluster primitive). This module adds PageRank,
the canonical *iterative* distributed operator: each iteration is one
equi-join (ranks ⋈ edges on src) + one map-side-combined aggregate
(contributions by dst) — the textbook Spark shape, with
``localCheckpoint`` pinning each iteration so the lineage (and the plan)
stays O(1) instead of O(iters).

Fixed iteration count + deterministic arithmetic keeps the result
engine-reproducible: ``pagerank_sql`` emits the SAME computation as
chained SQL CTEs (one per iteration) for the DuckDB oracle — iterative
algorithms usually get a rows-only check; unrolling buys a hash check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank after ``iters`` power iterations (fixed count — the
    deterministic variant; convergence-threshold stopping would make
    the output depend on float noise). Dangling nodes (no out-edges)
    redistribute their mass uniformly each iteration, the standard
    correction. Output: (node, rank).

    Scale shape per iteration: contributions = ranks ⋈ edges on src
    (shuffle keyed by src — pre-partition both sides by src once and
    every iteration's join is co-located), then sum by dst (map-side
    combine), then one left join back to the node list. The dangling
    mass is a one-row aggregate. localCheckpoint between iterations
    cuts lineage — without it iteration k replans (and at high k,
    re-executes) all k−1 predecessors."""
    if iters < 1:
        raise ValueError("iters must be ≥ 1")
    # r12: hash-partition the edge frame by _s ONCE — localCheckpoint
    # preserves outputPartitioning in the LogicalRDD, so every
    # iteration's contribution join is co-located instead of
    # re-shuffling the (edge-scale) frame per round (guide §2.4; the
    # docstring's pre-partition note, now actually done)
    e = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .repartition(F.col("_s"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionByName(e.select(F.col("_d").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()  # one scalar to the driver, once
    # checkpoint the degree frame too: it is re-aggregated from e every
    # round otherwise, and its hash(_s) layout joins ranks without a
    # new exchange on this side
    out_deg = (
        e.groupBy("_s")
        .agg(F.count(F.lit(1)).alias("_deg"))
        .localCheckpoint(eager=True)
    )
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    for _ in range(iters):
        with_deg = ranks.join(out_deg, ranks["node"] == out_deg["_s"], "left")
        # mass of dangling nodes (no out-edges) — redistributed uniformly
        dm = with_deg.filter(F.col("_deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
        )
        contribs = (
            with_deg.filter(F.col("_deg").isNotNull())
            .select("node", (F.col("rank") / F.col("_deg")).alias("_share"))
            .join(e, F.col("node") == F.col("_s"))
            .groupBy("_d")
            .agg(F.sum("_share").alias("_in"))
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["_d"], "left")
            .crossJoin(F.broadcast(dm))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n_nodes)
                    + F.lit(damping)
                    * (F.coalesce(F.col("_in"), F.lit(0.0)) + F.col("_dm") / n_nodes)
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def pagerank_sql(
    edges_sql: str,
    iters: int = 5,
    damping: float = 0.85,
) -> str:
    """The identical fixed-iteration PageRank as chained CTEs for the
    DuckDB oracle (``edges_sql`` must yield columns (src, dst)). Keep in
    lockstep with ``pagerank``. Emits round(rank, 6) to absorb the
    engines' differing float-sum orders."""
    d = damping
    # Every CTE that is referenced more than once is MATERIALIZED:
    # DuckDB inlines plain CTEs per reference, so the r0→r5 chain would
    # otherwise re-evaluate the whole prefix exponentially (observed:
    # 30 GB of spill at sf0.1 before the hint; sub-second after).
    parts = [
        f"WITH e AS MATERIALIZED ({edges_sql}),",
        " nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),",
        " nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),",
        " deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM e GROUP BY src),",
        " r0 AS MATERIALIZED (SELECT node, 1.0 / n AS rank FROM nodes, nn),",
    ]
    for i in range(iters):
        p, q = f"r{i}", f"r{i + 1}"
        parts += [
            f" dm{i} AS (SELECT coalesce(sum(rank), 0.0) AS dm FROM {p}"
            f"  LEFT JOIN deg ON {p}.node = deg.src WHERE deg.src IS NULL),",
            f" c{i} AS (SELECT e.dst AS node, sum({p}.rank / deg.deg) AS cin"
            f"  FROM {p} JOIN deg ON {p}.node = deg.src"
            f"  JOIN e ON e.src = {p}.node GROUP BY e.dst),",
            f" {q} AS MATERIALIZED (SELECT nodes.node,"
            f"  (1.0 - {d}) / n + {d} * (coalesce(c{i}.cin, 0.0) + dm{i}.dm / n)"
            f"  AS rank FROM nodes LEFT JOIN c{i} ON nodes.node = c{i}.node,"
            f"  nn, dm{i}),",
        ]
    body = "".join(parts).rstrip(",")
    return f"{body} SELECT node, round(rank, 6) AS rank FROM r{iters}"


def triangle_count(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Per-node triangle count + local clustering coefficient over an
    undirected graph (edges may arrive in either/both directions;
    self-loops dropped).

    Algorithm: the standard degree-ordered orientation (Schank &
    Wagner 2005 "forward") — direct every edge from its lower-(degree,
    id) endpoint to the higher one, join oriented edges on their source
    to enumerate wedges, then semi-join the wedge's far pair against
    the oriented edge set. Each triangle is emitted exactly once.

    Why orientation matters at 100 TB: the wedge join's fan-out is
    Σ outdeg(v)² and orientation bounds every outdeg by O(√|E|)
    (a high-degree hub contributes wedges only through its LOW-degree
    neighbors), so the shuffle is O(|E|^1.5) worst case instead of
    Σ deg² — the difference between a skewed hub exploding and not.
    All joins are equi-joins on node ids; no driver-side state.

    Output: (node, degree, triangles, clustering) with clustering =
    2·T / (deg·(deg−1)) rounded to 6 dp (0.0 for degree < 2).
    """
    u = F.least(F.col(src), F.col(dst))
    v = F.greatest(F.col(src), F.col(dst))
    # The edge set and its derivatives are each read by MULTIPLE
    # downstream branches (deg ×3, oriented ×3); Spark re-executes the
    # full lineage per branch, so pin the bounded intermediates with
    # localCheckpoint — without the barriers the wedge stage re-derives
    # the input graph ~10× (observed: 238 Exchanges → ~15).
    und = (
        edges.select(u.alias("u"), v.alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("u").alias("n"))
        .unionByName(und.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
        .localCheckpoint(eager=True)
    )
    # total order (deg, node): orient from smaller to larger
    du = deg.select(F.col("n").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("deg").alias("dv"))
    ed = und.join(du, "u").join(dv, "v")
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ed.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(lower_first, F.col("du")).otherwise(F.col("dv")).alias("da"),
        F.when(lower_first, F.col("dv")).otherwise(F.col("du")).alias("db"),
    ).localCheckpoint(eager=True)
    e1 = oriented.select(F.col("a"), F.col("b"), F.col("db").alias("ob"))
    e2 = oriented.select(
        F.col("a"), F.col("b").alias("c"), F.col("db").alias("oc")
    )
    # wedges a→{b,c}: order the far pair by the SAME (deg, id) total
    # order so the closing edge (if present) is oriented exactly b→c
    wedges = (
        e1.join(e2, "a")
        .filter(
            (F.col("ob") < F.col("oc"))
            | ((F.col("ob") == F.col("oc")) & (F.col("b") < F.col("c")))
        )
        .select("a", "b", "c")
    )
    closing = oriented.select(F.col("a").alias("b"), F.col("b").alias("c"))
    tris = wedges.join(closing, ["b", "c"], "left_semi")
    per_node = (
        tris.select(F.col("a").alias("n"))
        .unionByName(tris.select(F.col("b").alias("n")))
        .unionByName(tris.select(F.col("c").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("triangles"))
    )
    out = deg.join(per_node, "n", "left").select(
        F.col("n").alias("node"),
        F.col("deg").alias("degree"),
        F.coalesce(F.col("triangles"), F.lit(0)).cast("bigint").alias("triangles"),
        F.round(
            F.when(
                F.col("deg") >= 2,
                2.0
                * F.coalesce(F.col("triangles"), F.lit(0))
                / (F.col("deg") * (F.col("deg") - F.lit(1))),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("clustering"),
    )
    return out


def triangle_count_sql(edges_sql: str, src: str = "s", dst: str = "d") -> str:
    """DuckDB oracle twin of :func:`triangle_count` — the same
    degree-ordered orientation, wedge join, and closing-edge
    semi-join, expressed as CTEs over ``edges_sql`` (columns
    ``src``/``dst``). Multiply-referenced CTEs are MATERIALIZED —
    DuckDB inlines plain CTEs per reference (see pagerank_sql)."""
    lower = "(du < dv OR (du = dv AND u < v))"
    return (
        f"WITH e0 AS MATERIALIZED ({edges_sql}),"
        f" und AS MATERIALIZED (SELECT DISTINCT least({src}, {dst}) AS u,"
        f"  greatest({src}, {dst}) AS v FROM e0 WHERE {src} <> {dst}),"
        " degs AS MATERIALIZED (SELECT n, CAST(count(*) AS BIGINT) AS deg FROM"
        "  (SELECT u AS n FROM und UNION ALL SELECT v AS n FROM und)"
        "  GROUP BY n),"
        " ed AS (SELECT u, v, d1.deg AS du, d2.deg AS dv FROM und"
        "  JOIN degs d1 ON und.u = d1.n JOIN degs d2 ON und.v = d2.n),"
        f" ori AS MATERIALIZED (SELECT CASE WHEN {lower} THEN u ELSE v END AS a,"
        f"  CASE WHEN {lower} THEN v ELSE u END AS b,"
        f"  CASE WHEN {lower} THEN dv ELSE du END AS db FROM ed),"
        " w AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c FROM ori e1"
        "  JOIN ori e2 ON e1.a = e2.a AND (e1.db < e2.db"
        "   OR (e1.db = e2.db AND e1.b < e2.b))),"
        " t AS (SELECT a, b, c FROM w WHERE EXISTS"
        "  (SELECT 1 FROM ori o WHERE o.a = w.b AND o.b = w.c)),"
        " pn AS (SELECT n, CAST(count(*) AS BIGINT) AS triangles FROM"
        "  (SELECT a AS n FROM t UNION ALL SELECT b AS n FROM t"
        "   UNION ALL SELECT c AS n FROM t) GROUP BY n)"
        " SELECT degs.n AS node, degs.deg AS degree,"
        "  COALESCE(pn.triangles, 0) AS triangles,"
        "  round(CASE WHEN degs.deg >= 2 THEN 2.0 * COALESCE(pn.triangles, 0)"
        "   / (degs.deg * (degs.deg - 1)) ELSE 0.0 END, 6) AS clustering"
        " FROM degs LEFT JOIN pn ON degs.n = pn.n"
    )


def kcore(
    edges: DataFrame,
    src: str,
    dst: str,
    k: int,
    iters: int = 8,
    on_nonconverged: str = "warn",
) -> DataFrame:
    """k-core decomposition by iterative peeling (fixed ``iters``
    rounds — the deterministic variant, same rationale as pagerank's
    fixed power iterations): repeatedly drop nodes whose degree in the
    SURVIVING subgraph is < k. A fixed round count keeps the result
    engine-reproducible and lets the oracle unroll the same rounds as
    chained CTEs.

    Convergence is NOT guaranteed in ``iters`` rounds: peeling can need
    up to O(n) rounds (a length-n path at k=2 strips only its two
    endpoints per round), so a fixed budget can return nodes that are
    not in the true k-core. That is why this operator checks the fixed
    point explicitly: the surviving edge count of the final two rounds
    is compared (peeling is monotone, so equal counts ⇒ identical edge
    sets ⇒ fixed point). When they differ the behavior follows
    ``on_nonconverged``: ``"warn"`` (default — result still matches the
    same-round-count oracle), ``"raise"``, or ``"ignore"``.

    Scale shape per round: one degree aggregate (map-side combined) +
    two semi-joins restricting edges to surviving endpoints — all
    equi-joins on node ids; localCheckpoint pins each round so lineage
    stays O(1). The convergence check costs two counts on already-
    checkpointed data — no extra shuffles.

    Output: (node, degree) for nodes alive after ``iters`` rounds,
    with their degree in the surviving subgraph.
    """
    if k < 1:
        raise ValueError("k must be ≥ 1")
    if iters < 1:
        raise ValueError("iters must be ≥ 1")
    if on_nonconverged not in ("warn", "raise", "ignore"):
        raise ValueError("on_nonconverged must be 'warn', 'raise', or 'ignore'")
    u = F.least(F.col(src), F.col(dst))
    v = F.greatest(F.col(src), F.col(dst))
    e = (
        edges.select(u.alias("u"), v.alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Edge counts of the last two materialized rounds (plus the initial
    # edge set when iters == 1) — peeling only ever removes edges, so
    # count-stable ⇒ set-stable ⇒ true fixed point.
    tail_counts: list[int] = []
    if on_nonconverged != "ignore" and iters == 1:
        tail_counts.append(e.count())
    for i in range(iters):
        deg = (
            e.select(F.col("u").alias("n"))
            .unionByName(e.select(F.col("v").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
        )
        alive = deg.filter(F.col("degree") >= k).select("n")
        e = (
            e.join(alive.withColumnRenamed("n", "u"), "u", "left_semi")
            .join(alive.withColumnRenamed("n", "v"), "v", "left_semi")
            .localCheckpoint(eager=True)
        )
        if on_nonconverged != "ignore" and i >= iters - 2:
            tail_counts.append(e.count())
    if len(tail_counts) == 2 and tail_counts[0] != tail_counts[1]:
        msg = (
            f"kcore(k={k}, iters={iters}) did NOT reach a fixed point: "
            f"the final round still removed edges "
            f"({tail_counts[0]} -> {tail_counts[1]}); survivors may not "
            f"be in the true k-core. Increase iters."
        )
        if on_nonconverged == "raise":
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    final_deg = (
        e.select(F.col("u").alias("n"))
        .unionByName(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    return final_deg.filter(F.col("degree") >= k).select(
        F.col("n").alias("node"), "degree"
    )


def kcore_sql(edges_sql: str, k: int, iters: int = 8, src: str = "s", dst: str = "d") -> str:
    """DuckDB oracle twin of :func:`kcore` — the same fixed peeling
    rounds as chained CTEs, every multiply-referenced CTE MATERIALIZED
    (DuckDB inlines per reference; see pagerank_sql).

    Deliberately mirrors the FIXED round budget, including any
    under-peeling when ``iters`` rounds don't reach the fixed point —
    the oracle checks the engine computed the declared rounds exactly;
    :func:`kcore`'s own convergence check is what flags an insufficient
    budget."""
    parts = [
        f"WITH e0 AS MATERIALIZED (SELECT DISTINCT least({src}, {dst}) AS u,"
        f" greatest({src}, {dst}) AS v FROM ({edges_sql}) WHERE {src} <> {dst}),",
    ]
    for i in range(iters):
        parts.append(
            f" d{i} AS MATERIALIZED (SELECT n, CAST(count(*) AS BIGINT) AS degree"
            f"  FROM (SELECT u AS n FROM e{i} UNION ALL SELECT v AS n FROM e{i})"
            f"  GROUP BY n),"
            f" a{i} AS MATERIALIZED (SELECT n FROM d{i} WHERE degree >= {k}),"
            f" e{i + 1} AS MATERIALIZED (SELECT u, v FROM e{i}"
            f"  WHERE u IN (SELECT n FROM a{i}) AND v IN (SELECT n FROM a{i})),"
        )
    body = "".join(parts).rstrip(",")
    return (
        f"{body} SELECT n AS node, degree FROM"
        f" (SELECT n, CAST(count(*) AS BIGINT) AS degree FROM"
        f"  (SELECT u AS n FROM e{iters} UNION ALL SELECT v AS n FROM e{iters})"
        f"  GROUP BY n) WHERE degree >= {k}"
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 4,
    on_nonconverged: str = "warn",
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007), the deterministic variant: every node starts with its
    own id as label; each round every node adopts the most frequent
    label among its neighbors PLUS one self-vote (the self-vote damps
    the 2-cycle oscillation synchronous LPA exhibits on bipartite-ish
    structures), ties broken by the smallest label. A FIXED round
    budget keeps the output engine-reproducible — the oracle unrolls
    the identical rounds as chained CTEs
    (:func:`label_propagation_sql`), the pagerank/kcore pattern.

    Convergence is not guaranteed in ``iters`` rounds; like
    :func:`kcore` the final two label frames are compared and
    ``on_nonconverged`` ("warn"/"raise"/"ignore") governs what happens
    when labels were still moving — the result still matches the
    same-round-count oracle either way.

    Scale shape per round: one labels ⋈ symmetrized-edges equi-join
    keyed by neighbor id, a (node, label) count aggregate (map-side
    combined), and an argmax via ``min(struct(-cnt, label))`` — NO
    per-node window. localCheckpoint every SECOND round bounds lineage
    while halving the materialization barriers (measured at sf0.1:
    every-round 4.7 s, every-2 3.9 s, every-4 5.3 s — replanning cost
    overtakes checkpoint cost past 2). Skewed hub nodes cost their
    degree in the count aggregate, not a cross product.

    Output: (node, label) — nodes sharing a label form one community.
    """
    if iters < 1:
        raise ValueError("iters must be ≥ 1")
    if on_nonconverged not in ("warn", "raise", "ignore"):
        raise ValueError("on_nonconverged must be 'warn', 'raise', or 'ignore'")
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # r12: hash-partition by the join key ONCE — the checkpointed
    # LogicalRDD keeps the layout, so the per-round vote join stops
    # re-shuffling the symmetric edge frame (guide §2.4)
    sym = (
        fwd.unionByName(fwd.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .repartition(F.col("b"))
        .localCheckpoint(eager=True)
    )
    labels = sym.select(F.col("a").alias("node"), F.col("a").alias("lab")).distinct()
    prev = None
    for i in range(iters):
        prev = labels
        # r13 (guide §2.4): ONE exchange for the whole vote instead of
        # two — the raw votes repartition by node once; hash(node)
        # satisfies the clustering of BOTH the (node, lab) count and
        # the per-node argmax, so the two aggregates fuse into a single
        # exchange-free stage. Trade (documented): the count loses its
        # map-side partial aggregation, so the one exchange carries raw
        # vote rows (|E|+|V|) instead of per-partition-deduped pairs —
        # measured a net win here and the exchange count is what grows
        # quadratically with cluster size (guide §2.2).
        votes = (
            sym.join(labels.withColumnRenamed("node", "b"), "b")
            .select(F.col("a").alias("node"), "lab")
            .unionByName(labels.select("node", "lab"))  # self-vote
            .repartition(F.col("node"))
            .groupBy("node", "lab")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        labels = (
            votes.groupBy("node")
            .agg(
                F.min(
                    F.struct((-F.col("cnt")).alias("nc"), F.col("lab").alias("l"))
                ).alias("m")
            )
            .select("node", F.col("m.l").alias("lab"))
        )
        if (i + 1) % 2 == 0 or i == iters - 1:
            # lazy: same every-2-rounds lineage cut, but the round's
            # result stage materializes inside the next consumer's job
            # instead of a dedicated count job (r12 opt, guide §1.2)
            labels = labels.localCheckpoint(eager=False)
    if on_nonconverged != "ignore":
        moved = (
            labels.join(
                prev.withColumnRenamed("lab", "_prev"), "node"
            )
            .filter(F.col("lab") != F.col("_prev"))
            .count()
        )
        if moved:
            msg = (
                f"label_propagation(iters={iters}) did NOT reach a fixed "
                f"point: {moved} labels changed in the final round. "
                f"Increase iters."
            )
            if on_nonconverged == "raise":
                raise RuntimeError(msg)
            import warnings

            warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels.select("node", F.col("lab").alias("label"))


def label_propagation_sql(
    edges_sql: str, iters: int = 4, src: str = "s", dst: str = "d"
) -> str:
    """DuckDB oracle twin of :func:`label_propagation` — the same fixed
    rounds unrolled as chained MATERIALIZED CTEs (DuckDB inlines CTEs
    per reference; see pagerank_sql), identical self-vote and
    (count desc, label asc) tie-break."""
    parts = [
        f"WITH sym AS MATERIALIZED (SELECT DISTINCT a, b FROM ("
        f"SELECT {src} AS a, {dst} AS b FROM ({edges_sql})"
        f" UNION ALL SELECT {dst} AS a, {src} AS b FROM ({edges_sql}))"
        f" WHERE a <> b),"
        f" l0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS lab FROM sym),",
    ]
    for i in range(iters):
        parts.append(
            f" c{i} AS MATERIALIZED (SELECT node, lab, count(*) AS cnt FROM ("
            f"  SELECT s.a AS node, l.lab FROM sym s"
            f"  JOIN l{i} l ON s.b = l.node"
            f"  UNION ALL SELECT node, lab FROM l{i}) GROUP BY 1, 2),"
            f" l{i + 1} AS MATERIALIZED (SELECT node, lab FROM"
            f"  (SELECT node, lab, row_number() OVER (PARTITION BY node"
            f"   ORDER BY cnt DESC, lab ASC) AS rn FROM c{i}) WHERE rn = 1),"
        )
    body = "".join(parts).rstrip(",")
    return f"{body} SELECT node, lab AS label FROM l{iters}"


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 8,
    on_nonconverged: str = "warn",
) -> DataFrame:
    """Connected components by ALTERNATING large-star / small-star
    contraction (Kiveris et al. 2014, "Connected Components in
    MapReduce and Beyond") — the published O(log² n)-round algorithm
    behind every serious MapReduce/Spark CC job, vs
    dedup.cluster_pairs' plain min-propagation which needs O(diameter)
    rounds (~200 on this repo's band-3 rank chains at sf0.1; naive
    pointer jumping stalls too once node ids sit permuted along the
    chain — measured: >30 rounds at 600 nodes, while alternating star
    finishes in 7).

    Each round rewrites the EDGE set twice, both steps plain
    groupBy-min + equi-join DataFrame ops on (a < b)-canonical edges:

    1. **large-star**: every node links its LARGER neighbors to the
       minimum of its neighborhood (incl. itself) — long chains fold
       toward local minima.
    2. **small-star**: every node links its not-larger neighbors and
       itself to their minimum — stars re-center on the smallest
       member.

    Both steps preserve connectivity exactly (Kiveris Thm 1-2) and
    monotonically shrink toward one star per component centered at the
    component minimum; at the fixed point every non-center node has
    exactly one edge to its component min. Because the round count is
    FIXED, the DuckDB oracle unrolls the identical rounds as chained
    MATERIALIZED CTEs (:func:`connected_components_sql`) and
    hash-matches even when unconverged; ``on_nonconverged``
    ("warn"/"raise"/"ignore") compares the final two edge sets, the
    kcore contract.

    Scale shape per round: two aggregates + two equi-joins keyed by
    node ids, all map-side combined, edge count never grows above the
    input's (star edges replace path edges); localCheckpoint per round
    bounds lineage. A mega-hub costs its degree in the min aggregate —
    never a cross product. Isolated nodes (no edges) are absent from
    input and output alike, same as the oracle.

    Output: (node, component) with component = min node id of the
    node's component (once converged).
    """
    if iters < 1:
        raise ValueError("iters must be ≥ 1")
    if on_nonconverged not in ("warn", "raise", "ignore"):
        raise ValueError("on_nonconverged must be 'warn', 'raise', or 'ignore'")
    e0 = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e0.select(F.col("a").alias("node"))
        .unionByName(e0.select(F.col("b").alias("node")))
        .distinct()
    )
    from pyspark.sql import Window

    wu = Window.partitionBy("u")
    e = e0
    prev = None
    for _i in range(iters):
        prev = e
        # large-star: for every directed perspective (u, v): attach the
        # larger neighbors v > u to mu = min(neighborhood(u) ∪ {u}).
        # r12: the neighborhood minimum is a WINDOW over the one
        # hash(u) exchange instead of groupBy-min + equi-join — the
        # join re-shuffled (and sort-merge-sorted) the full sym frame a
        # second time for identical values (guide §2.4: a window
        # partitioned like the preceding shuffle needs no new exchange)
        sym = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
            e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        # r13 (guide §2.4): el's dedup exchange doubles as the
        # small-star window's exchange — repartition by b (the next
        # step's window key), then dropDuplicates runs exchange-free
        # (hash(b) satisfies the (a, b) clustering) and the window over
        # u = b below needs only a local sort. 4 → 3 exchanges per
        # round; the trade is the dedup losing its map-side partial
        # (raw large-star rows cross the one exchange).
        el = (
            sym.withColumn(
                "mu", F.least(F.min("v").over(wu), F.col("u"))
            )
            .filter(F.col("v") > F.col("u"))
            .select(
                F.least(F.col("v"), F.col("mu")).alias("a"),
                F.greatest(F.col("v"), F.col("mu")).alias("b"),
            )
            .repartition(F.col("b"))
            .dropDuplicates(["a", "b"])
        )
        # small-star: per node u, link its smaller neighbors AND itself
        # to their minimum — same one-exchange window form; the (mv, u)
        # self-link appears once per neighbor and the existing distinct
        # collapses it
        dd = el.select(F.col("b").alias("u"), F.col("a").alias("v"))
        ddw = dd.withColumn("mv", F.min("v").over(wu))
        e = (
            ddw.filter(F.col("v") != F.col("mv"))
            .select(
                F.least(F.col("v"), F.col("mv")).alias("a"),
                F.greatest(F.col("v"), F.col("mv")).alias("b"),
            )
            .unionByName(
                ddw.select(F.col("mv").alias("a"), F.col("u").alias("b"))
            )
            .distinct()
            # checkpoint EVERY round: e feeds the next round twice (both
            # directions of sym) and the final round twice more (the
            # convergence diff + label extraction) — measured at sf0.1:
            # every-round 7.6 s, every-2nd 10.1 s (the opposite of LPA's
            # cadence, whose label frame is referenced once)
            .localCheckpoint(eager=True)
        )
    if on_nonconverged != "ignore":
        # ONE action for the symmetric diff (two sequential counts
        # before — pure job latency on converged inputs)
        moved = (
            e.exceptAll(prev).limit(1)
            .unionAll(prev.exceptAll(e).limit(1))
            .count()
        )
        if moved:
            msg = (
                f"connected_components(iters={iters}) did NOT reach a "
                f"fixed point: the edge set changed in the final round. "
                f"Increase iters (alternating star needs O(log² n))."
            )
            if on_nonconverged == "raise":
                raise RuntimeError(msg)
            import warnings

            warnings.warn(msg, RuntimeWarning, stacklevel=2)
    fin = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    mins = fin.groupBy("u").agg(F.min("v").alias("mn"))
    return (
        nodes.join(mins, nodes["node"] == mins["u"], "left")
        .select(
            "node",
            F.least(F.col("node"), F.coalesce(F.col("mn"), F.col("node"))).alias(
                "component"
            ),
        )
    )


def connected_components_sql(
    edges_sql: str, iters: int = 8, src: str = "s", dst: str = "d"
) -> str:
    """DuckDB oracle twin of :func:`connected_components` — the same
    fixed alternating large-star / small-star rounds unrolled as
    chained MATERIALIZED CTEs (DuckDB inlines CTEs per reference; see
    pagerank_sql)."""
    parts = [
        f"WITH e0 AS MATERIALIZED (SELECT DISTINCT least({src}, {dst}) AS a,"
        f" greatest({src}, {dst}) AS b FROM ({edges_sql})"
        f" WHERE {src} <> {dst}),"
        f" nodes AS MATERIALIZED (SELECT DISTINCT a AS node FROM ("
        f"SELECT a FROM e0 UNION ALL SELECT b AS a FROM e0)),",
    ]
    for i in range(iters):
        parts.append(
            f" sym{i} AS MATERIALIZED (SELECT a AS u, b AS v FROM e{i}"
            f"  UNION ALL SELECT b AS u, a AS v FROM e{i}),"
            f" lm{i} AS MATERIALIZED (SELECT u, least(min(v), u) AS mu"
            f"  FROM sym{i} GROUP BY u),"
            f" el{i} AS MATERIALIZED (SELECT DISTINCT"
            f"  least(s.v, m.mu) AS a, greatest(s.v, m.mu) AS b"
            f"  FROM sym{i} s JOIN lm{i} m USING (u) WHERE s.v > s.u),"
            f" dd{i} AS MATERIALIZED (SELECT b AS u, a AS v FROM el{i}),"
            f" sm{i} AS MATERIALIZED (SELECT u, min(v) AS mv FROM dd{i}"
            f"  GROUP BY u),"
            f" e{i + 1} AS MATERIALIZED (SELECT DISTINCT a, b FROM ("
            f"  SELECT least(d.v, s.mv) AS a, greatest(d.v, s.mv) AS b"
            f"  FROM dd{i} d JOIN sm{i} s USING (u) WHERE d.v <> s.mv"
            f"  UNION ALL SELECT s.mv AS a, s.u AS b FROM sm{i} s)),"
        )
    body = "".join(parts).rstrip(",")
    return (
        f"{body} SELECT n.node,"
        f" least(n.node, coalesce(min(f.v), n.node)) AS component"
        f" FROM nodes n LEFT JOIN ("
        f"SELECT a AS u, b AS v FROM e{iters}"
        f" UNION ALL SELECT b AS u, a AS v FROM e{iters}) f"
        f" ON f.u = n.node GROUP BY n.node"
    )


def adamic_adar(
    edges: DataFrame,
    src: str,
    dst: str,
    top_n: int | None = None,
    max_wedge_degree: int | None = None,
) -> DataFrame:
    """Common-neighbor / Adamic-Adar link prediction over an undirected
    graph (Adamic & Adar 2003; the standard similarity-graph "suggest
    an edge" primitive — in a curation pipeline, the near-dup-graph
    densifier that proposes pairs LSH banding missed).

    For every NON-edge pair (u, v) with at least one shared neighbor:

    - ``common_neighbors`` — |Γ(u) ∩ Γ(v)| (exact integer), and
    - ``aa`` — Σ_w 1/ln(deg(w)) over the shared neighbors w, the
      Adamic-Adar weight that discounts promiscuous hubs.

    Distributed shape: one adjacency self-join on the wedge center
    (candidates = Σ_w C(deg(w), 2) — NEVER |V|² pair enumeration),
    one anti-join against the edge set, one map-side-combined
    aggregate. Engine-portability: each wedge term is quantized to
    exact int64 micros (round(1e6/ln(deg)) — ln on a small-integer
    domain, the t17/u8 precedent) so the per-pair sum is exact integer
    arithmetic and ``aa`` is ONE correctly-rounded int64/1e6 division.

    Skew: a degree-D hub contributes C(D, 2) wedge pairs; at corpus
    scale cap it with ``max_wedge_degree`` — hubs are exactly the
    neighbors Adamic-Adar down-weights toward zero, so the cut is
    lossy only in the scores the metric already considers noise
    (documented, like sax_similarity_join's ``max_df``).

    ``top_n`` keeps the strongest proposals by (aa, cn, u, v) —
    a TakeOrderedAndProject, never a global sort.
    """
    if top_n is not None and top_n < 1:
        raise ValueError("top_n must be >= 1")
    if max_wedge_degree is not None and max_wedge_degree < 2:
        raise ValueError("max_wedge_degree must be >= 2")
    u = F.least(F.col(src), F.col(dst))
    v = F.greatest(F.col(src), F.col(dst))
    und = (
        edges.select(u.alias("u"), v.alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)  # read by adj (x2) and the anti-join
    )
    adj = und.select(F.col("u").alias("w"), F.col("v").alias("x")).unionByName(
        und.select(F.col("v").alias("w"), F.col("u").alias("x"))
    )
    deg = adj.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    centers = deg if max_wedge_degree is None else deg.filter(
        F.col("deg") <= F.lit(max_wedge_degree)
    )
    a = adj.select("w", F.col("x").alias("u"))
    b = adj.select("w", F.col("x").alias("v"))
    wedges = (
        a.join(b, "w")
        .filter(F.col("u") < F.col("v"))
        .join(centers.select("w", "deg"), "w")
    )
    non_edge = wedges.join(und, ["u", "v"], "left_anti")
    term = F.round(F.lit(1000000.0) / F.log(F.col("deg").cast("double"))).cast(
        "bigint"
    )
    scored = non_edge.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("common_neighbors"),
        F.sum(term).cast("bigint").alias("aa_micros"),
    )
    out = scored.select(
        "u",
        "v",
        "common_neighbors",
        (F.col("aa_micros") / F.lit(1000000.0)).alias("aa"),
    )
    if top_n is not None:
        out = out.orderBy(
            F.col("aa").desc(),
            F.col("common_neighbors").desc(),
            F.col("u"),
            F.col("v"),
        ).limit(top_n)
    return out


def adamic_adar_sql(
    edges_sql: str,
    src: str = "s",
    dst: str = "d",
    top_n: int | None = None,
    max_wedge_degree: int | None = None,
) -> str:
    """DuckDB oracle twin of :func:`adamic_adar` — identical adjacency
    self-join, hub cap, anti-join, and int64-micros term arithmetic."""
    cap = (
        ""
        if max_wedge_degree is None
        else f" WHERE deg <= {int(max_wedge_degree)}"
    )
    tail = (
        ""
        if top_n is None
        else f" ORDER BY aa DESC, common_neighbors DESC, u, v LIMIT {int(top_n)}"
    )
    return (
        f"WITH e0 AS MATERIALIZED (SELECT DISTINCT least({src}, {dst}) AS u,"
        f" greatest({src}, {dst}) AS v FROM ({edges_sql}) WHERE {src} <> {dst}),"
        " adj AS MATERIALIZED (SELECT u AS w, v AS x FROM e0"
        "  UNION ALL SELECT v AS w, u AS x FROM e0),"
        " degs AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS deg"
        f"  FROM adj GROUP BY w),"
        f" ctr AS (SELECT * FROM degs{cap}),"
        " wed AS (SELECT a.x AS u, b.x AS v, c.deg AS deg FROM adj a"
        "  JOIN adj b ON a.w = b.w AND a.x < b.x JOIN ctr c ON c.w = a.w),"
        " nw AS (SELECT u, v, deg FROM wed WHERE NOT EXISTS"
        "  (SELECT 1 FROM e0 WHERE e0.u = wed.u AND e0.v = wed.v))"
        " SELECT u, v, CAST(count(*) AS BIGINT) AS common_neighbors,"
        "  CAST(sum(CAST(round(1000000.0 / ln(CAST(deg AS DOUBLE))) AS BIGINT))"
        "   AS BIGINT) / 1000000.0 AS aa"
        f" FROM nw GROUP BY u, v{tail}"
    )


def personalized_pagerank(
    edges: DataFrame,
    seeds: list,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Personalized PageRank (Haveliwala 2002): PageRank whose teleport
    mass returns to a SEED SET instead of spreading uniformly — rank
    becomes "relevance to the seeds", the production variant behind
    related-item expansion and seed-guided graph curation (here: grow
    a trusted-document set through the similarity graph).

    Identical distributed shape to :func:`pagerank` (per iteration:
    one src-keyed contribution join + one map-side-combined sum +
    one node join; dangling mass is a one-row aggregate and teleports
    to the seeds, the standard PPR convention). Seeds are a bounded
    literal list — the preference vector is a narrow CASE expression,
    never a join. Fixed iteration count keeps the output
    deterministic; the SQL twin unrolls the same rounds.

    Output: (node, rank); Σ rank = 1 over the graph's nodes.
    """
    if iters < 1:
        raise ValueError("iters must be ≥ 1")
    if not seeds:
        raise ValueError("seeds must be non-empty")
    # r12: same one-time hash(_s) layout as pagerank — the per-round
    # contribution join stops re-shuffling the edge frame
    e = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .repartition(F.col("_s"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionByName(e.select(F.col("_d").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # a seed absent from the edge-derived node set would silently lose
    # its 1/|seeds| share of teleport mass every round (Σ rank < 1 with
    # no warning) — the preference vector is only valid over nodes that
    # exist, so reject the call instead (one bounded IN-list count)
    n_present = nodes.filter(F.col("node").isin(list(seeds))).count()
    if n_present != len(set(seeds)):
        raise ValueError(
            f"{len(set(seeds)) - n_present} seed(s) are not nodes of the "
            f"edge set — Σ rank = 1 requires every seed to be present"
        )
    p = F.when(
        F.col("node").isin(list(seeds)), F.lit(1.0 / len(seeds))
    ).otherwise(F.lit(0.0))
    out_deg = (
        e.groupBy("_s")
        .agg(F.count(F.lit(1)).alias("_deg"))
        .localCheckpoint(eager=True)
    )
    ranks = nodes.withColumn("rank", p)
    for _ in range(iters):
        with_deg = ranks.join(out_deg, ranks["node"] == out_deg["_s"], "left")
        dm = with_deg.filter(F.col("_deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
        )
        contribs = (
            with_deg.filter(F.col("_deg").isNotNull())
            .select("node", (F.col("rank") / F.col("_deg")).alias("_share"))
            .join(e, F.col("node") == F.col("_s"))
            .groupBy("_d")
            .agg(F.sum("_share").alias("_in"))
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["_d"], "left")
            .crossJoin(F.broadcast(dm))
            .select(
                "node",
                (
                    F.lit(1.0 - damping) * p
                    + F.lit(damping)
                    * (F.coalesce(F.col("_in"), F.lit(0.0)) + F.col("_dm") * p)
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def personalized_pagerank_sql(
    edges_sql: str,
    seeds: list,
    iters: int = 5,
    damping: float = 0.85,
) -> str:
    """DuckDB oracle twin of :func:`personalized_pagerank` — the same
    seeded-teleport rounds unrolled as MATERIALIZED CTEs (see
    pagerank_sql for the materialization rationale)."""
    d = damping
    ns = len(seeds)

    def _lit(s) -> str:
        # numeric seeds inline as-is; anything else must be a quoted,
        # escaped SQL string literal or the IN list is invalid SQL
        if isinstance(s, bool) or not isinstance(s, (int, float)):
            return "'" + str(s).replace("'", "''") + "'"
        return str(s)

    inlist = ", ".join(_lit(s) for s in seeds)
    # a format template, NOT str.replace on the assembled CASE: a seed
    # literal containing the substring 'node' must never be rewritten
    pv_tpl = f"CASE WHEN {{col}} IN ({inlist}) THEN 1.0 / {ns} ELSE 0.0 END"
    pv = pv_tpl.format(col="node")
    parts = [
        f"WITH e AS MATERIALIZED ({edges_sql}),",
        " nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),",
        " deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM e GROUP BY src),",
        f" r0 AS MATERIALIZED (SELECT node, {pv} AS rank FROM nodes),",
    ]
    for i in range(iters):
        p_, q = f"r{i}", f"r{i + 1}"
        parts += [
            f" dm{i} AS (SELECT coalesce(sum(rank), 0.0) AS dm FROM {p_}"
            f"  LEFT JOIN deg ON {p_}.node = deg.src WHERE deg.src IS NULL),",
            f" c{i} AS (SELECT e.dst AS node, sum({p_}.rank / deg.deg) AS cin"
            f"  FROM {p_} JOIN deg ON {p_}.node = deg.src"
            f"  JOIN e ON e.src = {p_}.node GROUP BY e.dst),",
            f" {q} AS MATERIALIZED (SELECT nodes.node,"
            f"  (1.0 - {d}) * ({pv_tpl.format(col='nodes.node')})"
            f"  + {d} * (coalesce(c{i}.cin, 0.0)"
            f"   + dm{i}.dm * ({pv_tpl.format(col='nodes.node')}))"
            f"  AS rank FROM nodes LEFT JOIN c{i} ON nodes.node = c{i}.node,"
            f"  dm{i}),",
        ]
    body = "".join(parts).rstrip(",")
    return f"{body} SELECT node, round(rank, 6) AS rank FROM r{iters}"


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    scale: int = 1_000_000,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) over a directed graph:
    per round, authority(v) = Σ_{u→v} hub(u) and hub(u) = Σ_{u→v}
    authority(v), each renormalized — the link-analysis complement of
    PageRank (g1) that separates "points at good things" from "is
    pointed at by good things".

    Engine-portability: scores are exact int64 micros and the per-round
    renormalization divides by the MAX raw score — a max is
    order-independent where PageRank's L1 sums are not, so every round
    is pure integer arithmetic ((2·raw·scale + M) DIV (2·M), the t30
    correctly-rounded division) and the result carries NO rounding
    contract; the only float op is the final /scale display division.
    Overflow bound: raw ≤ scale·max_degree, so the scaled numerator
    stays under 2⁶³ for degrees below ~4.6·10⁶ (raise via ``scale``
    if a hub ever exceeds that).

    Distributed shape per round (the g1 template): two equi-joins keyed
    by the edge endpoints + two map-side-combined aggregates + two
    1-row max aggregates broadcast back; localCheckpoint truncates the
    per-round lineage. Output: (node, hub, authority).
    """
    if iters < 1:
        raise ValueError("iters must be ≥ 1")
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionByName(e.select(F.col("_d").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # r12: the rounds join the edge frame by _s (authority pass) AND
    # by _d (hub pass) — keep one checkpointed copy in each layout so
    # neither pass re-shuffles edges (guide §2.4)
    e_s = e.repartition(F.col("_s")).localCheckpoint(eager=True)
    e_d = e.repartition(F.col("_d")).localCheckpoint(eager=True)
    s = F.lit(int(scale)).cast("bigint")
    h = nodes.withColumn("h", s)
    a = None
    for _ in range(iters):
        a_raw = (
            e_s.join(h, h["node"] == e_s["_s"])
            .groupBy("_d")
            .agg(F.sum("h").alias("_raw"))
        )
        am = a_raw.agg(F.max("_raw").alias("_m"))
        a = (
            nodes.join(a_raw, nodes["node"] == a_raw["_d"], "left")
            .crossJoin(F.broadcast(am))
            .select(
                "node",
                F.coalesce(
                    F.expr(f"(2 * _raw * {int(scale)} + _m) DIV (2 * _m)"),
                    F.lit(0),
                ).cast("bigint").alias("a"),
            )
            .localCheckpoint(eager=True)
        )
        h_raw = (
            e_d.join(a, a["node"] == e_d["_d"])
            .groupBy("_s")
            .agg(F.sum("a").alias("_raw"))
        )
        hm = h_raw.agg(F.max("_raw").alias("_m"))
        h = (
            nodes.join(h_raw, nodes["node"] == h_raw["_s"], "left")
            .crossJoin(F.broadcast(hm))
            .select(
                "node",
                F.coalesce(
                    F.expr(f"(2 * _raw * {int(scale)} + _m) DIV (2 * _m)"),
                    F.lit(0),
                ).cast("bigint").alias("h"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        h.join(a.withColumnRenamed("node", "_an"), h["node"] == F.col("_an"))
        .select(
            "node",
            (F.col("h").cast("double") / F.lit(float(scale))).alias("hub"),
            (F.col("a").cast("double") / F.lit(float(scale))).alias("authority"),
        )
    )


def hits_sql(edges_sql: str, iters: int = 5, scale: int = 1_000_000) -> str:
    """DuckDB oracle twin of :func:`hits` — the same exact-integer
    max-normalized rounds unrolled as MATERIALIZED CTEs (see
    pagerank_sql for the materialization rationale). ``//`` on
    positive operands floors exactly like Spark's DIV."""
    s = int(scale)
    parts = [
        f"WITH e AS MATERIALIZED ({edges_sql}),",
        " nodes AS MATERIALIZED (SELECT src AS node FROM e"
        "  UNION SELECT dst FROM e),",
        f" h0 AS MATERIALIZED (SELECT node, CAST({s} AS BIGINT) AS h"
        f"  FROM nodes),",
    ]
    for i in range(iters):
        parts += [
            f" ar{i} AS (SELECT e.dst AS node, CAST(sum(h) AS BIGINT) AS raw"
            f"  FROM e JOIN h{i} ON h{i}.node = e.src GROUP BY e.dst),",
            f" am{i} AS (SELECT max(raw) AS m FROM ar{i}),",
            f" a{i + 1} AS MATERIALIZED (SELECT nodes.node,"
            f"  CAST(coalesce((2 * ar{i}.raw * {s} + am{i}.m)"
            f"   // (2 * am{i}.m), 0) AS BIGINT) AS a"
            f"  FROM nodes LEFT JOIN ar{i} ON nodes.node = ar{i}.node,"
            f"  am{i}),",
            f" hr{i} AS (SELECT e.src AS node, CAST(sum(a) AS BIGINT) AS raw"
            f"  FROM e JOIN a{i + 1} ON a{i + 1}.node = e.dst"
            f"  GROUP BY e.src),",
            f" hm{i} AS (SELECT max(raw) AS m FROM hr{i}),",
            f" h{i + 1} AS MATERIALIZED (SELECT nodes.node,"
            f"  CAST(coalesce((2 * hr{i}.raw * {s} + hm{i}.m)"
            f"   // (2 * hm{i}.m), 0) AS BIGINT) AS h"
            f"  FROM nodes LEFT JOIN hr{i} ON nodes.node = hr{i}.node,"
            f"  hm{i}),",
        ]
    body = "".join(parts).rstrip(",")
    return (
        f"{body} SELECT h{iters}.node,"
        f" CAST(h{iters}.h AS DOUBLE) / {float(s)} AS hub,"
        f" CAST(a{iters}.a AS DOUBLE) / {float(s)} AS authority"
        f" FROM h{iters} JOIN a{iters} ON h{iters}.node = a{iters}.node"
    )


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "s",
    dst: str = "d",
    node_col: str = "node",
    label_col: str = "label",
) -> DataFrame:
    """Per-community modularity decomposition (Newman 2004) — the
    clustering-quality eval for ANY community assignment (LPA,
    connected components, external labels): for community c over an
    undirected graph with m edges,

        Q_c = in_c/m − (deg_c / 2m)²,   Q = Σ_c Q_c

    Everything is exact integer arithmetic until one final division:
    ``q_num = 4·m·in_c − deg_c²`` (int64; deg_c ≤ 2m so the square is
    bounded by 4m²) and ``q_term = q_num / (4m²)`` — one
    correctly-rounded int64/double op per row, hash-portable with no
    rounding contract. Output: (label, n_nodes, internal_edges,
    total_degree, q_num, q_term); Σ q_term is the graph's modularity.

    Shape: one distinct over canonical edges, one degree aggregate,
    two label joins, two map-side-combined label aggregates — the
    eval costs one pass over the edge set, never communities².
    """
    u = F.least(F.col(src), F.col(dst))
    v = F.greatest(F.col(src), F.col(dst))
    und = (
        edges.select(u.alias("u"), v.alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)  # feeds m, degrees, and internal
    )
    m = und.agg(F.count(F.lit(1)).cast("bigint").alias("_m"))
    lab = labels.select(
        F.col(node_col).alias("_n"), F.col(label_col).alias("label")
    )
    deg = (
        und.select(F.col("u").alias("_n"))
        .unionByName(und.select(F.col("v").alias("_n")))
        .groupBy("_n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_deg"))
    )
    per_label = (
        deg.join(lab, "_n")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum("_deg").cast("bigint").alias("total_degree"),
        )
    )
    lu = lab.select(F.col("_n").alias("u"), F.col("label").alias("_lu"))
    lv = lab.select(F.col("_n").alias("v"), F.col("label").alias("_lv"))
    internal = (
        und.join(lu, "u")
        .join(lv, "v")
        .filter(F.col("_lu") == F.col("_lv"))
        .groupBy(F.col("_lu").alias("label"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("internal_edges"))
    )
    out = (
        per_label.join(internal, "label", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "label",
            "n_nodes",
            F.coalesce("internal_edges", F.lit(0)).cast("bigint").alias(
                "internal_edges"
            ),
            "total_degree",
            (
                F.lit(4) * F.col("_m") * F.coalesce("internal_edges", F.lit(0))
                - F.col("total_degree") * F.col("total_degree")
            ).cast("bigint").alias("q_num"),
            (
                (
                    F.lit(4) * F.col("_m") * F.coalesce("internal_edges", F.lit(0))
                    - F.col("total_degree") * F.col("total_degree")
                ).cast("double")
                / (F.lit(4.0) * F.col("_m") * F.col("_m")).cast("double")
            ).alias("q_term"),
        )
    )
    return out


def bfs_hops(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    seeds: list | None = None,
    max_hops: int = 6,
    directed: bool = False,
) -> DataFrame:
    """Multi-source BFS: hop distance from the nearest seed, the
    Pregel frontier-expansion primitive (neighborhood queries,
    blast-radius analysis, "within k references of these resources").
    Output: (node, hops) for every node reachable in ≤ ``max_hops``
    hops; seeds emit hops = 0 whether or not they touch an edge.

    Round i is one equi-join (frontier ⋈ edges on the source endpoint,
    shuffle keyed by node id — the checkpointed edge frame keeps its
    partitioning, so every round's join reuses one layout) plus one
    LEFT-ANTI join against the visited set (keyed the same way). The
    frontier never revisits: BFS level i is exact because every node
    enters `dist` at its FIRST reachable level. Rounds stop early when
    a frontier empties — semantics-neutral (later frontiers would be
    empty too), so the fixed-round DuckDB twin (:func:`bfs_hops_sql`)
    still hash-matches.

    Scale shape: per round the shuffle carries |frontier ⋈ edges|
    rows of two int64s; the visited anti-join carries the visited set
    (≤ |V|). A 1000-executor BFS over 100 TB of edges is exactly this
    loop — what matters is that the per-round work is frontier-local,
    never |V|², and lineage is cut per round (localCheckpoint) so round
    k doesn't replan rounds 1..k−1.
    """
    if not seeds:
        raise ValueError("seeds must be a non-empty list")
    if max_hops < 1:
        raise ValueError("max_hops must be ≥ 1")
    spark = edges.sparkSession
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    if not directed:
        e = e.unionByName(
            edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
        )
    e = e.filter(F.col("u") != F.col("v")).distinct().localCheckpoint(eager=True)
    seed_df = spark.createDataFrame(
        [(s,) for s in seeds], schema="node bigint"
    ).distinct()
    dist = seed_df.select(
        "node", F.lit(0).cast("bigint").alias("hops")
    ).localCheckpoint(eager=True)
    frontier = dist.select("node")
    for i in range(1, max_hops + 1):
        # shuffle_hash hints on the corpus-sized sides (edge set,
        # visited set): both grow with the graph, and letting either
        # broadcast OOMs the driver at replicated volume (the c3db30a
        # lesson, measured again by the r9b x100 sweep); the frontier
        # side stays free to broadcast when it is genuinely small
        nxt = (
            frontier.join(e.hint("shuffle_hash"), frontier["node"] == e["u"])
            .select(F.col("v").alias("node"))
            .distinct()
            .join(
                dist.select("node").hint("shuffle_hash"),
                "node",
                "left_anti",
            )
            .localCheckpoint(eager=False)
        )
        # the full count doubles as the emptiness probe AND the
        # checkpoint-materialization action — one job per round instead
        # of checkpoint + limit-probe (r12 opt, the k-center fusion)
        if nxt.count() == 0:
            break
        dist = dist.unionByName(
            nxt.select("node", F.lit(i).cast("bigint").alias("hops"))
        ).localCheckpoint(eager=False)
        frontier = nxt
    return dist


def bfs_hops_sql(
    edges_sql: str,
    seeds: list,
    max_hops: int = 6,
    src: str = "s",
    dst: str = "d",
    directed: bool = False,
) -> str:
    """DuckDB oracle twin of :func:`bfs_hops` — the same frontier
    rounds unrolled as chained MATERIALIZED CTEs (fixed round count;
    the engine's early stop only skips provably-empty rounds)."""
    if not seeds:
        raise ValueError("seeds must be a non-empty list")
    sym = f"SELECT {src} AS u, {dst} AS v FROM ({edges_sql})"
    if not directed:
        sym += f" UNION ALL SELECT {dst} AS u, {src} AS v FROM ({edges_sql})"
    seed_rows = ", ".join(f"({int(s)})" for s in sorted(set(int(s) for s in seeds)))
    parts = [
        f"WITH e AS MATERIALIZED (SELECT DISTINCT u, v FROM ({sym})"
        f"  WHERE u <> v),"
        f" d0 AS MATERIALIZED (SELECT CAST(node AS BIGINT) AS node,"
        f"  CAST(0 AS BIGINT) AS hops FROM (VALUES {seed_rows}) AS t(node)),"
        f" f0 AS MATERIALIZED (SELECT node FROM d0),",
    ]
    for i in range(1, max_hops + 1):
        parts.append(
            f" f{i} AS MATERIALIZED (SELECT DISTINCT e.v AS node"
            f"  FROM f{i - 1} JOIN e ON e.u = f{i - 1}.node"
            f"  WHERE e.v NOT IN (SELECT node FROM d{i - 1})),"
            f" d{i} AS MATERIALIZED (SELECT node, hops FROM d{i - 1}"
            f"  UNION ALL SELECT node, CAST({i} AS BIGINT) AS hops FROM f{i}),"
        )
    body = "".join(parts).rstrip(",")
    return f"{body} SELECT node, hops FROM d{max_hops}"


def stress_centrality(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    pivots: list | None = None,
    max_depth: int = 8,
) -> DataFrame:
    """Depth-bounded STRESS centrality (Shimbel 1953) from a fixed
    pivot set — the exact-integer sibling of betweenness: for each
    node v, the number of shortest paths (from any pivot s, within
    ``max_depth`` hops) that pass THROUGH v as an interior node,

        stress(v) = Σ_s σ_sv · Q_s(v),
        Q_s(v) = Σ_{w ∈ succ_s(v)} (1 + Q_s(w)),

    where σ_sv counts shortest s→v paths (the Brandes forward pass)
    and succ_s(v) = neighbors one BFS level deeper. Betweenness
    proper divides by σ_st — a data-dependent RATIONAL whose
    float summation order differs across engines; stress keeps the
    same "how much traffic routes over v" signal in pure int64, so
    the unrolled oracle matches with no rounding contract (the g9
    HITS trade, applied to centrality).

    Shape: the forward pass is ``max_depth`` rounds of frontier ⋈
    edges + groupBy-sum(σ) + anti-join visited, ALL pivots carried as
    a key column (one round = one shuffle regardless of pivot count);
    the backward pass replays the ≤``max_depth`` levels in DESCENDING
    order, each level joining the forward pass's CHECKPOINTED
    frontier ⋈ edges frame against the level below's (σ, Q) frame —
    the corpus-sized edge shuffle is paid once per level, not twice.
    Per-pivot state is one row per reached node — at 100 TB
    the pivot set is the sampling knob (pivot-sampled centrality is
    the published scalable estimator; the sample size trades variance
    for rounds, never correctness of the sampled sum).

    Space bound of the join reuse (ADVICE r12): the forward pass
    retains every level's frontier ⋈ edges frame in local-checkpoint
    storage until the backward pass consumes it — peak storage is
    O(Σ_d |levels[d] ⋈ edges|), i.e. the whole traversal's edge
    expansion, spilled to executor disk under MEMORY_AND_DISK. That is
    the explicit trade for not re-shuffling the edge frame per
    backward level; deployments whose level expansions exceed executor
    disk should lower ``max_depth`` or the pivot count (the same knob
    that bounds rounds). The dead final round's frame is released
    before the backward pass (it is never appended to ``joins``).

    Output: (node, stress) for every node reached by any pivot, the
    pivots themselves included (their stress counts only paths they
    sit INSIDE, from other pivots).
    """
    if not pivots:
        raise ValueError("pivots must be a non-empty list")
    if max_depth < 1:
        raise ValueError("max_depth must be ≥ 1")
    spark = edges.sparkSession
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    piv = spark.createDataFrame(
        [(int(p),) for p in sorted(set(int(p) for p in pivots))],
        schema="p bigint",
    )
    # forward: levels[d] = (p, node, sigma) at BFS distance d from p
    lvl = piv.select(
        "p", F.col("p").alias("node"), F.lit(1).cast("bigint").alias("sigma")
    ).localCheckpoint(eager=True)
    levels = [lvl]
    # joins[d] = levels[d] ⋈ edges, checkpointed so the backward pass
    # replays each level WITHOUT re-joining the corpus-sized edge frame
    # (r12 opt: the forward pass already paid that shuffle; guide §2.4)
    joins: list = []
    seen = lvl.select("p", "node")
    for _ in range(max_depth):
        # shuffle_hash on the corpus-sized sides (edges, visited) —
        # the bfs_hops broadcast-OOM lesson applies verbatim here
        jf = (
            levels[-1]
            .join(e.hint("shuffle_hash"), levels[-1]["node"] == e["u"])
            .select("p", "node", "sigma", "v")
            .localCheckpoint(eager=False)
        )
        nxt = (
            jf.groupBy("p", F.col("v").alias("node"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(seen.hint("shuffle_hash"), ["p", "node"], "left_anti")
            .localCheckpoint(eager=False)
        )
        # full count = emptiness probe + checkpoint materialization of
        # BOTH jf and nxt in one job (the k-center fusion, r12 opt)
        if nxt.count() == 0:
            # drop the Python refs to the dead round's frames so their
            # checkpoint blocks are collectible during the backward
            # pass instead of pinned to function exit (ADVICE r12)
            jf = nxt = None  # noqa: F841
            break
        joins.append(jf)
        levels.append(nxt)
        seen = seen.unionByName(nxt.select("p", "node")).localCheckpoint(
            eager=False
        )
    # backward: Q[d] over levels[d], deepest level has Q = 0
    q = levels[-1].select(
        "p", "node", "sigma", F.lit(0).cast("bigint").alias("qn")
    )
    acc = q.select(
        "p", "node", (F.col("sigma") * F.col("qn")).alias("through")
    )
    for d in range(len(levels) - 2, -1, -1):
        below = q.select(
            F.col("p").alias("_pw"),
            F.col("node").alias("_w"),
            F.col("qn").alias("_qw"),
        )
        # joins[d] holds exactly the (p, node, sigma, v) rows the old
        # levels[d] ⋈ edges left-join produced for nodes WITH edges; the
        # successor sum over its inner join with the level below is the
        # same conditional sum, and the left join back onto levels[d]
        # restores the no-successor rows as qn = 0 (the old coalesce)
        contrib = (
            joins[d]
            .join(
                below,
                (F.col("v") == F.col("_w")) & (F.col("p") == F.col("_pw")),
            )
            .groupBy("p", "node")
            .agg(
                F.sum(F.lit(1) + F.col("_qw")).cast("bigint").alias("_qc")
            )
        )
        qd = (
            levels[d]
            .join(contrib, ["p", "node"], "left")
            .select(
                "p",
                "node",
                "sigma",
                F.coalesce(F.col("_qc"), F.lit(0)).cast("bigint").alias("qn"),
            )
            .localCheckpoint(eager=False)
        )
        q = qd
        acc = acc.unionByName(
            qd.select(
                "p", "node", (F.col("sigma") * F.col("qn")).alias("through")
            )
        )
    # Exclude only SELF-ROOTED contributions (p == node): the pivot is
    # the path's endpoint there, not interior (Q_s(s) would count s
    # inside its own paths). Rows with p != node where node is another
    # pivot are legitimate cross-pivot interior stress and are KEPT —
    # anti-joining all pivots out would silently drop them (ADVICE r9).
    return (
        acc.filter(F.col("p") != F.col("node"))
        .groupBy("node")
        .agg(F.sum("through").cast("bigint").alias("stress"))
    )


def stress_centrality_sql(
    edges_sql: str,
    pivots: list,
    max_depth: int = 8,
    src: str = "s",
    dst: str = "d",
) -> str:
    """DuckDB oracle twin of :func:`stress_centrality` — the same
    fixed forward/backward rounds unrolled as chained MATERIALIZED
    CTEs, all pivots carried as a column."""
    if not pivots:
        raise ValueError("pivots must be a non-empty list")
    ps = ", ".join(f"({int(p)})" for p in sorted(set(int(p) for p in pivots)))
    parts = [
        f"WITH e AS MATERIALIZED (SELECT DISTINCT u, v FROM ("
        f"SELECT {src} AS u, {dst} AS v FROM ({edges_sql})"
        f" UNION ALL SELECT {dst} AS u, {src} AS v FROM ({edges_sql}))"
        f" WHERE u <> v),"
        f" piv AS MATERIALIZED (SELECT CAST(p AS BIGINT) AS p"
        f"  FROM (VALUES {ps}) AS t(p)),"
        f" l0 AS MATERIALIZED (SELECT p, p AS node,"
        f"  CAST(1 AS BIGINT) AS sigma FROM piv),"
        f" seen0 AS MATERIALIZED (SELECT p, node FROM l0),",
    ]
    for i in range(1, max_depth + 1):
        parts.append(
            f" l{i} AS MATERIALIZED (SELECT x.p, x.node,"
            f"  CAST(x.sigma AS BIGINT) AS sigma FROM ("
            f"  SELECT l.p, e.v AS node, sum(l.sigma) AS sigma"
            f"  FROM l{i - 1} l JOIN e ON e.u = l.node GROUP BY l.p, e.v) x"
            f"  WHERE NOT EXISTS (SELECT 1 FROM seen{i - 1} s"
            f"   WHERE s.p = x.p AND s.node = x.node)),"
            f" seen{i} AS MATERIALIZED (SELECT p, node FROM seen{i - 1}"
            f"  UNION ALL SELECT p, node FROM l{i}),"
        )
    last = max_depth
    parts.append(
        f" q{last} AS MATERIALIZED (SELECT p, node, sigma,"
        f"  CAST(0 AS BIGINT) AS qn FROM l{last}),"
    )
    for d in range(max_depth - 1, -1, -1):
        parts.append(
            f" q{d} AS MATERIALIZED (SELECT l.p, l.node, l.sigma,"
            f"  coalesce(CAST(sum(1 + w.qn) AS BIGINT), 0) AS qn"
            f"  FROM l{d} l LEFT JOIN e ON e.u = l.node"
            f"  LEFT JOIN q{d + 1} w ON w.p = l.p AND w.node = e.v"
            f"  GROUP BY l.p, l.node, l.sigma),"
        )
    union = " UNION ALL ".join(
        f"SELECT p, node, sigma * qn AS through FROM q{d}"
        for d in range(max_depth + 1)
    )
    body = "".join(parts).rstrip(",")
    # p <> node mirrors the Spark twin: drop endpoint-not-interior
    # self-rooted rows only; pivots keep cross-pivot interior stress
    return (
        f"{body} SELECT node, CAST(sum(through) AS BIGINT) AS stress"
        f" FROM ({union}) t WHERE p <> node"
        f" GROUP BY node"
    )


def sssp_weighted(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    sources: list | None = None,
    rounds: int = 8,
    directed: bool = False,
) -> DataFrame:
    """Bounded Bellman-Ford single/multi-source shortest paths with
    non-negative INTEGER weights — the weighted sibling of
    :func:`bfs_hops` (hop counts ignore cost; this is "cheapest
    reference chain", routing cost, weighted blast radius). After
    ``rounds`` relaxation rounds the output is the exact cheapest
    ≤``rounds``-edge path cost per reached node — a well-defined
    semantics of its own (and the exact SSSP whenever the graph's
    shortest paths use ≤``rounds`` edges), so the fixed-round
    unrolled oracle (:func:`sssp_weighted_sql`) hash-matches even
    before global convergence, the kcore/CC contract.

    Each round is ONE equi-join (current distances ⋈ edges on the
    source endpoint) + one min-aggregate keyed by node — the textbook
    distributed SSSP; the edge side carries a shuffle_hash pin (the
    bfs_hops broadcast-OOM lesson). All arithmetic is int64; ties
    need no break (min is total on integers). Output: (node, dist).
    """
    if not sources:
        raise ValueError("sources must be a non-empty list")
    if rounds < 1:
        raise ValueError("rounds must be ≥ 1")
    spark = edges.sparkSession
    e = edges.select(
        F.col(src).alias("u"),
        F.col(dst).alias("v"),
        F.col(weight).cast("bigint").alias("w"),
    )
    if not directed:
        e = e.unionByName(
            edges.select(
                F.col(dst).alias("u"),
                F.col(src).alias("v"),
                F.col(weight).cast("bigint").alias("w"),
            )
        )
    e = (
        e.filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.min("w").alias("w"))  # parallel edges keep the cheapest
        .localCheckpoint(eager=True)
    )
    neg = e.filter(F.col("w") < 0).limit(1).count()
    if neg:
        raise ValueError("weights must be non-negative")
    dist = spark.createDataFrame(
        [(int(s), 0) for s in sorted(set(int(s) for s in sources))],
        schema="node bigint, dist bigint",
    ).localCheckpoint(eager=True)
    for _ in range(rounds):
        # fixed round count, no early-stop probe: a convergence check
        # costs two driver round-trips per round (pure latency) and a
        # converged frame makes the remaining rounds no-ops anyway —
        # the bounded-rounds semantics is exact either way. The
        # checkpoint is LAZY: it still truncates each round's plan (the
        # next round sees one LogicalRDD leaf), but the round's result
        # stage materializes inside the next round's first job instead
        # of paying a dedicated job per round (r12 opt, guide §1.2)
        dist = (
            dist.join(e.hint("shuffle_hash"), dist["node"] == e["u"])
            .select(F.col("v").alias("node"), (F.col("dist") + F.col("w")).alias("dist"))
            .unionByName(dist)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=False)
        )
    return dist


def sssp_weighted_sql(
    edges_sql: str,
    sources: list,
    rounds: int = 8,
    src: str = "s",
    dst: str = "d",
    weight: str = "w",
    directed: bool = False,
) -> str:
    """DuckDB oracle twin of :func:`sssp_weighted` — the same fixed
    relaxation rounds unrolled as chained MATERIALIZED CTEs."""
    if not sources:
        raise ValueError("sources must be a non-empty list")
    ss = ", ".join(f"({int(s)})" for s in sorted(set(int(s) for s in sources)))
    sym = (
        f"SELECT {src} AS u, {dst} AS v, CAST({weight} AS BIGINT) AS w"
        f" FROM ({edges_sql})"
    )
    if not directed:
        sym += (
            f" UNION ALL SELECT {dst} AS u, {src} AS v,"
            f" CAST({weight} AS BIGINT) AS w FROM ({edges_sql})"
        )
    parts = [
        f"WITH e AS MATERIALIZED (SELECT u, v, min(w) AS w FROM ({sym})"
        f" WHERE u <> v GROUP BY u, v),"
        f" d0 AS MATERIALIZED (SELECT CAST(node AS BIGINT) AS node,"
        f"  CAST(0 AS BIGINT) AS dist FROM (VALUES {ss}) AS t(node)),",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f" d{i} AS MATERIALIZED (SELECT node, min(dist) AS dist FROM ("
            f"  SELECT e.v AS node, d{i - 1}.dist + e.w AS dist"
            f"  FROM d{i - 1} JOIN e ON e.u = d{i - 1}.node"
            f"  UNION ALL SELECT node, dist FROM d{i - 1}) x GROUP BY node),"
        )
    body = "".join(parts).rstrip(",")
    return f"{body} SELECT node, dist FROM d{rounds}"
