"""Hierarchical rollup correctness + sketch accuracy bounds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from healthcare_api_spark.operators.rollup import hierarchical_rollup, rollup_union
from healthcare_api_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_tiers_compose_exactly(spark):
    ev = load_table(spark, SF_DIR, "events")
    tiers = hierarchical_rollup(ev, "ts", "value", ["hour", "day"], ("event_type",))
    # the day tier derived from hours must equal a direct day aggregation
    direct = ev.groupBy(
        F.date_trunc("day", "ts").alias("bucket"), "event_type"
    ).agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum(F.col("value").cast("double")), 6).alias("s"))
    derived = tiers["day"].select("bucket", "event_type", "cnt", F.round("sum_v", 6).alias("s"))
    assert sorted(map(tuple, direct.collect())) == sorted(map(tuple, derived.collect()))


def test_rollup_union_levels(spark):
    ev = load_table(spark, SF_DIR, "events")
    u = rollup_union(hierarchical_rollup(ev, "ts", "value", ["hour", "day"]))
    levels = {r["level"] for r in u.select("level").distinct().collect()}
    assert levels == {"hour", "day"}


def test_week_tier_never_feeds_month(spark):
    # weeks straddle month boundaries; month must derive from day
    ev = load_table(spark, SF_DIR, "events")
    tiers = hierarchical_rollup(ev, "ts", "value", ["day", "week", "month"])
    direct_month = ev.groupBy(F.date_trunc("month", "ts").alias("bucket")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    derived = tiers["month"].select("bucket", "cnt")
    assert sorted(map(tuple, direct_month.collect())) == sorted(
        map(tuple, derived.select("bucket", "cnt").collect())
    )


def test_week_finest_still_correct_coarser_tiers(spark):
    # ADVICE r1: levels=['week','month'] — month must NOT derive from
    # week buckets (they straddle month boundaries); an internal day base
    # feeds both.
    ev = load_table(spark, SF_DIR, "events")
    tiers = hierarchical_rollup(ev, "ts", "value", ["week", "month"])
    assert set(tiers) == {"week", "month"}
    for lv in ("week", "month"):
        direct = ev.groupBy(F.date_trunc(lv, "ts").alias("bucket")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        derived = tiers[lv].select("bucket", "cnt")
        assert sorted(map(tuple, direct.collect())) == sorted(map(tuple, derived.collect()))


def test_unknown_level_raises(spark):
    ev = load_table(spark, SF_DIR, "events")
    with pytest.raises(ValueError):
        hierarchical_rollup(ev, "ts", "value", ["fortnight"])


def test_incremental_refresh_equals_full_rebuild(spark):
    from healthcare_api_spark.operators.rollup import refresh_tier

    ev = load_table(spark, SF_DIR, "events")
    old = ev.filter(F.col("event_id") % 2 == 0)
    new = ev.filter(F.col("event_id") % 2 == 1)
    base = hierarchical_rollup(old, "ts", "value", ["hour"], ("event_type",))["hour"]
    refreshed = refresh_tier(base, new, "ts", "value", "hour", ("event_type",))
    full = hierarchical_rollup(ev, "ts", "value", ["hour"], ("event_type",))["hour"]
    r = sorted((str(x["bucket"]), x["event_type"], x["cnt"], round(x["sum_v"], 6))
               for x in refreshed.collect())
    f = sorted((str(x["bucket"]), x["event_type"], x["cnt"], round(x["sum_v"], 6))
               for x in full.collect())
    assert r == f


def test_sketch_accuracy_bounds(spark):
    ev = load_table(spark, SF_DIR, "events")
    approx = {r["event_type"]: r["a"] for r in ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("a")).collect()}
    exact = {r["event_type"]: r["e"] for r in ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("e")).collect()}
    for k in exact:
        assert abs(approx[k] - exact[k]) <= max(3, 0.05 * exact[k])

    q = ev.agg(F.percentile_approx("value", 0.5, 10000).alias("m")).collect()[0]["m"]
    exact_m = ev.agg(F.expr("percentile(value, 0.5)").alias("m")).collect()[0]["m"]
    assert abs(q - exact_m) <= max(1.0, 0.05 * abs(exact_m))
