"""profile_table: one-pass column profiling."""

from __future__ import annotations

from healthcare_api_spark.operators.relational import profile_table


def _by_col(rows):
    return {r["column"]: r for r in rows}


def test_profile_exact_metrics(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (2, None), (None, None)], ["a", "b"]
    )
    out = _by_col(profile_table(df, exact=True).collect())
    assert out["a"]["n_rows"] == 4 and out["a"]["n_nulls"] == 1
    assert out["a"]["n_distinct"] == 2
    assert (out["a"]["min_str"], out["a"]["max_str"]) == ("1", "2")
    assert out["b"]["n_nulls"] == 2 and out["b"]["n_distinct"] == 1
    assert (out["b"]["min_str"], out["b"]["max_str"]) == ("x", "x")


def test_profile_approx_is_single_shuffle(spark):
    df = spark.createDataFrame([(i, str(i % 7)) for i in range(100)], ["a", "b"])
    prof = profile_table(df)  # approx mode: the 100 TB default
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # one partial-agg shuffle, no Expand
    out = _by_col(prof.collect())
    # HLL++ at default precision is exact-ish at this cardinality
    assert out["b"]["n_distinct"] == 7 and out["a"]["n_rows"] == 100


def test_pivot_counts_declared_values(spark):
    from healthcare_api_spark.operators.relational import pivot_counts

    df = spark.createDataFrame(
        [("O", "HI"), ("O", "HI"), ("O", "LO"), ("F", "LO")], ["status", "prio"]
    )
    rows = {r["status"]: r for r in pivot_counts(
        df, "status", "prio", ["HI", "LO", "NONE"], ["hi", "lo", "none"]).collect()}
    assert (rows["O"]["hi"], rows["O"]["lo"], rows["O"]["none"]) == (2, 1, 0)
    assert (rows["F"]["hi"], rows["F"]["lo"]) == (0, 1)
    # values NOT in the declared list are dropped, not invented
    extra = spark.createDataFrame([("O", "XX")], ["status", "prio"])
    r = pivot_counts(extra, "status", "prio", ["HI"], ["hi"]).collect()[0]
    assert r["hi"] == 0


def test_histogram_buckets_and_overflow(spark):
    import pytest

    from healthcare_api_spark.operators.relational import histogram

    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (5.0,), (9.9,), (10.0,), (25.0,), (None,)], ["v"]
    )
    out = {r["bucket"]: r["cnt"] for r in histogram(df, "v", 0.0, 10.0, 2).collect()}
    assert out[-1] == 1          # underflow
    assert out[0] == 1           # [0, 5): just 0.0
    assert out[1] == 2           # [5, 10): 5.0, 9.9
    assert out[2] == 2           # overflow: 10.0, 25.0
    assert out[None] == 1
    with pytest.raises(ValueError, match="bins >= 1"):
        histogram(df, "v", 10.0, 0.0, 2)
