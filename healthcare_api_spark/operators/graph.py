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
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionByName(e.select(F.col("_d").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()  # one scalar to the driver, once
    out_deg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg"))
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
    parts = [
        f"WITH e AS ({edges_sql}),",
        " nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),",
        " nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),",
        " deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),",
        " r0 AS (SELECT node, 1.0 / n AS rank FROM nodes, nn),",
    ]
    for i in range(iters):
        p, q = f"r{i}", f"r{i + 1}"
        parts += [
            f" dm{i} AS (SELECT coalesce(sum(rank), 0.0) AS dm FROM {p}"
            f"  LEFT JOIN deg ON {p}.node = deg.src WHERE deg.src IS NULL),",
            f" c{i} AS (SELECT e.dst AS node, sum({p}.rank / deg.deg) AS cin"
            f"  FROM {p} JOIN deg ON {p}.node = deg.src"
            f"  JOIN e ON e.src = {p}.node GROUP BY e.dst),",
            f" {q} AS (SELECT nodes.node,"
            f"  (1.0 - {d}) / n + {d} * (coalesce(c{i}.cin, 0.0) + dm{i}.dm / n)"
            f"  AS rank FROM nodes LEFT JOIN c{i} ON nodes.node = c{i}.node,"
            f"  nn, dm{i}),",
        ]
    body = "".join(parts).rstrip(",")
    return f"{body} SELECT node, round(rank, 6) AS rank FROM r{iters}"
