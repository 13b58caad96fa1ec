"""Z-order layout key: bit-exact Morton interleaving."""

from __future__ import annotations

from pyspark.sql import functions as F

from healthcare_api_spark.operators.layout import morton_key, zorder_by


def _key(spark, a, b):
    df = spark.createDataFrame([(a, b)], ["a", "b"])
    return df.select(morton_key(F.col("a"), F.col("b")).alias("k")).collect()[0]["k"]


def test_morton_key_known_values(spark):
    def ref(a, b):  # independent per-bit reference
        k = 0
        for i in range(16):
            k |= ((a >> i) & 1) << (2 * i)
            k |= ((b >> i) & 1) << (2 * i + 1)
        return k

    cases = [(0, 0), (3, 0), (0, 3), (2, 2), (0xFFFF, 0xFFFF), (12345, 54321)]
    for a, b in cases:
        assert _key(spark, a, b) == ref(a, b), (a, b)


def test_morton_low16_only_and_interleaving(spark):
    # bits above 16 are masked off
    assert _key(spark, 0x1_0003, 0) == _key(spark, 3, 0) == 0b101
    assert _key(spark, 0, 3) == 0b1010


def test_zorder_by_sorts_and_attaches_key(spark):
    df = spark.createDataFrame(
        [(3, 3), (0, 0), (1, 1), (2, 0)], ["x", "y"]
    ).repartition(1)
    rows = zorder_by(df, "x", "y").collect()
    keys = [r["zkey"] for r in rows]
    assert keys == sorted(keys)
    # the z-curve visits (0,0) then (1,0)-ish neighborhood before (3,3)
    assert (rows[0]["x"], rows[0]["y"]) == (0, 0)
    assert (rows[-1]["x"], rows[-1]["y"]) == (3, 3)
    # narrow: no Exchange introduced by sortWithinPartitions
    plan = zorder_by(df, "x", "y")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
