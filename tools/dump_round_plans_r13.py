"""One-round plan dumps for the r13 LPA / CC exchange fusions.

The gates' returned frames are checkpoint-truncated (per-round
localCheckpoint replaces lineage with a Scan ExistingRDD), so — exactly
like the r12 evidence — this dumps the plan of ONE representative round
body, built on a materialized edge frame at sf0.01, in BOTH forms:

- lpa_vote: the per-round mode vote. before = two aggregates, each with
  its own Exchange (hash(node, lab) then hash(node)); after = one
  repartition(node) Exchange feeding both aggregates exchange-free.
- cc_round: one large-star + small-star round. before = el deduped by
  distinct() (Exchange hash(a, b)) followed by the small-star window's
  own Exchange hash(u); after = el repartitioned by b once —
  dropDuplicates and the window both reuse that layout.

Usage: python tools/dump_round_plans_r13.py <tag>   # before|after
(run "before" on the stashed pre-change tree, "after" on HEAD — the
round bodies below import nothing from operators/graph.py; they are
verbatim copies of the two variants so either tag can be dumped from
either tree, but the convention keeps the evidence honest.)
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from healthcare_api_spark import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _dump(df, name: str, tag: str, header: str) -> None:
    buf = io.StringIO()
    stdout = sys.stdout
    sys.stdout = buf
    try:
        df.explain("formatted")
    finally:
        sys.stdout = stdout
    os.makedirs("plans/r13", exist_ok=True)
    path = f"plans/r13/{name}_{tag}.txt"
    with open(path, "w") as f:
        f.write(f"# {name} ({tag}) — sf_dir={SF_DIR}\n# {header}\n\n")
        f.write(buf.getvalue())
    print(f"wrote {path}")


def main() -> None:
    tag = sys.argv[1]
    spark = get_spark("dump-round-plans-r13")
    import __spark_entry__ as entrymod

    # the gates' own edge substrate (the banded k-NN customer graph)
    enc = entrymod._knn_customer_edges(spark, SF_DIR).select(
        F.col("s").alias("src"), F.col("d").alias("dst")
    )

    # --- LPA vote round ------------------------------------------------
    fwd = enc.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    sym = (
        fwd.unionByName(fwd.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .repartition(F.col("b"))
        .localCheckpoint(eager=True)
    )
    labels = sym.select(
        F.col("a").alias("node"), F.col("a").alias("lab")
    ).distinct().localCheckpoint(eager=True)
    raw = (
        sym.join(labels.withColumnRenamed("node", "b"), "b")
        .select(F.col("a").alias("node"), "lab")
        .unionByName(labels.select("node", "lab"))
    )
    if tag == "before":
        votes = raw.groupBy("node", "lab").agg(F.count(F.lit(1)).alias("cnt"))
    else:
        votes = (
            raw.repartition(F.col("node"))
            .groupBy("node", "lab")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
    new_labels = (
        votes.groupBy("node")
        .agg(
            F.min(
                F.struct((-F.col("cnt")).alias("nc"), F.col("lab").alias("l"))
            ).alias("m")
        )
        .select("node", F.col("m.l").alias("lab"))
    )
    _dump(
        new_labels,
        "g4_lpa_vote_round",
        tag,
        "one LPA mode-vote round over a checkpointed sym/labels pair",
    )

    # --- CC large-star + small-star round ------------------------------
    e0 = (
        enc.select(
            F.least(F.col("src"), F.col("dst")).alias("a"),
            F.greatest(F.col("src"), F.col("dst")).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    wu = Window.partitionBy("u")
    symc = e0.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
        e0.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    el = (
        symc.withColumn("mu", F.least(F.min("v").over(wu), F.col("u")))
        .filter(F.col("v") > F.col("u"))
        .select(
            F.least(F.col("v"), F.col("mu")).alias("a"),
            F.greatest(F.col("v"), F.col("mu")).alias("b"),
        )
    )
    if tag == "before":
        el = el.distinct()
    else:
        el = el.repartition(F.col("b")).dropDuplicates(["a", "b"])
    dd = el.select(F.col("b").alias("u"), F.col("a").alias("v"))
    ddw = dd.withColumn("mv", F.min("v").over(wu))
    e = (
        ddw.filter(F.col("v") != F.col("mv"))
        .select(
            F.least(F.col("v"), F.col("mv")).alias("a"),
            F.greatest(F.col("v"), F.col("mv")).alias("b"),
        )
        .unionByName(ddw.select(F.col("mv").alias("a"), F.col("u").alias("b")))
        .distinct()
    )
    _dump(
        e,
        "g5_cc_round",
        tag,
        "one large-star + small-star round over a checkpointed edge frame",
    )


if __name__ == "__main__":
    main()
