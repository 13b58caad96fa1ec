"""As-of and interval join edge semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from healthcare_api_spark.operators.temporal import asof_join, interval_join


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "u1", "2024-01-01 10:00:00"), (2, "u1", "2024-01-01 12:00:00"),
         (3, "u2", "2024-01-01 09:00:00")],
        ["event_id", "user_id", "ts"],
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [("u1", "2024-01-01 09:30:00", 100.0), ("u1", "2024-01-01 11:00:00", 200.0),
         ("u2", "2024-01-01 10:00:00", 300.0)],
        ["user_id", "ts", "value"],
    ).withColumn("ts", F.to_timestamp("ts"))
    return left, right


def test_asof_backward(spark):
    left, right = _frames(spark)
    out = {r["event_id"]: r["value"]
           for r in asof_join(left, right, "user_id", "ts", "ts", ["value"]).collect()}
    assert out[1] == 100.0   # latest prior
    assert out[2] == 200.0   # newer state picked at 12:00
    assert out[3] is None    # u2 has no prior purchase at 09:00


def test_asof_tie_inclusive(spark):
    left, right = _frames(spark)
    tied = left.withColumn("ts", F.to_timestamp(F.lit("2024-01-01 11:00:00")))
    out = {r["event_id"]: r["value"]
           for r in asof_join(tied.filter(F.col("user_id") == "u1"), right,
                               "user_id", "ts", "ts", ["value"]).collect()}
    assert out[1] == 200.0  # right row at exactly left_ts matches (>=)


def test_asof_forward(spark):
    left, right = _frames(spark)
    out = {r["event_id"]: r["value"]
           for r in asof_join(left, right, "user_id", "ts", "ts", ["value"],
                               direction="forward").collect()}
    assert out[1] == 200.0  # next right at 11:00
    assert out[3] == 300.0  # u2's purchase comes later
    assert out[2] is None   # nothing after 12:00


def test_asof_bad_direction(spark):
    left, right = _frames(spark)
    with pytest.raises(ValueError):
        asof_join(left, right, "user_id", "ts", "ts", ["value"], direction="sideways")


def test_asof_payload_from_one_right_row(spark):
    # ADVICE r1: a matched right row's NULL field must NOT be backfilled
    # from an older right row — the whole matched row travels together.
    left = spark.createDataFrame(
        [(1, "u1", "2024-01-01 12:00:00")], ["event_id", "user_id", "ts"]
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [("u1", "2024-01-01 09:00:00", 100.0, "old"),
         ("u1", "2024-01-01 11:00:00", None, "new")],
        "user_id string, ts string, value double, tag string",
    ).withColumn("ts", F.to_timestamp("ts"))
    row = asof_join(left, right, "user_id", "ts", "ts", ["value", "tag"]).collect()[0]
    assert row["tag"] == "new" and row["value"] is None  # not 100.0 from 'old'


def test_interval_join_boundaries(spark):
    events = spark.createDataFrame(
        [(1, "2024-01-05"), (2, "2024-01-10"), (3, "2024-02-15")], ["id", "ts"]
    ).withColumn("ts", F.to_timestamp("ts"))
    intervals = spark.createDataFrame(
        [(10, "2024-01-01", "2024-01-10"), (20, "2024-01-10", "2024-02-01")],
        ["iid", "s", "e"],
    ).withColumn("s", F.to_timestamp("s")).withColumn("e", F.to_timestamp("e"))
    out = {(r["id"], r["iid"]) for r in
           interval_join(events, intervals, "ts", "s", "e", chunk="2 days").collect()}
    # [start, end): event 2 at the boundary belongs to the second interval
    assert out == {(1, 10), (2, 20)}


def test_interval_join_left_outer_keeps_unmatched(spark):
    # ADVICE r1: outer rows must survive — the range predicate is in the
    # join condition, not a post-join filter that nulls them out.
    events = spark.createDataFrame(
        [(1, "2024-01-05"), (3, "2024-03-15")], ["id", "ts"]
    ).withColumn("ts", F.to_timestamp("ts"))
    intervals = spark.createDataFrame(
        [(10, "2024-01-01", "2024-01-10")], ["iid", "s", "e"]
    ).withColumn("s", F.to_timestamp("s")).withColumn("e", F.to_timestamp("e"))
    rows = {r["id"]: r["iid"] for r in
            interval_join(events, intervals, "ts", "s", "e",
                          chunk="2 days", how="left").collect()}
    assert rows == {1: 10, 3: None}
    semi = interval_join(events, intervals, "ts", "s", "e",
                         chunk="2 days", how="left_semi")
    assert [r["id"] for r in semi.collect()] == [1]
    with pytest.raises(ValueError, match="inner"):
        interval_join(events, intervals, "ts", "s", "e", how="full")


def test_duration_parse_errors(spark):
    from healthcare_api_spark.operators.temporal import _parse_duration_secs

    assert _parse_duration_secs("2 weeks") == 2 * 604800
    with pytest.raises(ValueError, match="unsupported duration unit"):
        _parse_duration_secs("3 fortnights")
    with pytest.raises(ValueError, match="look like"):
        _parse_duration_secs("monthly")
    with pytest.raises(ValueError, match="positive"):
        _parse_duration_secs("-1 days")


def test_gapfill_zero_locf_null(spark):
    from pyspark.sql import functions as F

    from healthcare_api_spark.operators.temporal import gapfill_buckets

    df = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00", 2, 1.0), ("a", "2024-01-01 03:00:00", 5, 4.0),
         ("b", "2024-01-01 01:00:00", 7, 9.0)],
        ["g", "bucket", "cnt", "v"],
    ).withColumn("bucket", F.to_timestamp("bucket"))
    out = gapfill_buckets(df, "bucket", "1 HOUR", ("g",), {"cnt": "zero", "v": "locf"})
    rows = {(r["g"], str(r["bucket"])): (r["cnt"], r["v"]) for r in out.collect()}
    # group a densifies to 4 hourly buckets
    assert rows[("a", "2024-01-01 00:00:00")] == (2, 1.0)
    assert rows[("a", "2024-01-01 01:00:00")] == (0, 1.0)  # zero + locf
    assert rows[("a", "2024-01-01 02:00:00")] == (0, 1.0)
    assert rows[("a", "2024-01-01 03:00:00")] == (5, 4.0)
    # group b spans a single bucket - no gaps invented
    assert [k for k in rows if k[0] == "b"] == [("b", "2024-01-01 01:00:00")]

    # null mode leaves the gap visible
    nulls = gapfill_buckets(df, "bucket", "1 HOUR", ("g",), {"cnt": "null"})
    got = {(r["g"], str(r["bucket"])): r["cnt"] for r in nulls.collect()}
    assert got[("a", "2024-01-01 02:00:00")] is None

    import pytest

    with pytest.raises(ValueError, match="unknown fill mode"):
        gapfill_buckets(df, "bucket", "1 HOUR", ("g",), {"cnt": "cubic"})


def test_gapfill_interpolate(spark):
    from pyspark.sql import functions as F

    from healthcare_api_spark.operators.temporal import gapfill_buckets

    df = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00", 1.0), ("a", "2024-01-01 03:00:00", 4.0),
         ("a", "2024-01-01 05:00:00", None)],
        ["g", "bucket", "v"],
    ).withColumn("bucket", F.to_timestamp("bucket"))
    out = gapfill_buckets(df, "bucket", "1 HOUR", ("g",), {"v": "interpolate"})
    rows = {str(r["bucket"]): r["v"] for r in out.collect()}
    assert rows["2024-01-01 00:00:00"] == 1.0
    assert rows["2024-01-01 01:00:00"] == 2.0  # linear between 1.0 and 4.0
    assert rows["2024-01-01 02:00:00"] == 3.0
    assert rows["2024-01-01 03:00:00"] == 4.0
    # trailing gap has no next observation: stays null (no extrapolation)
    assert rows["2024-01-01 04:00:00"] is None and rows["2024-01-01 05:00:00"] is None


def test_mad_anomalies_flags_outlier(spark):
    from healthcare_api_spark.operators.temporal import mad_anomalies

    rows = [("s1", float(v)) for v in [10, 11, 9, 10, 12, 10, 11, 300]] + [
        ("s2", 5.0), ("s2", 5.0), ("s2", 5.0)  # constant series: mad 0
    ]
    df = spark.createDataFrame(rows, ["series", "v"])
    out = mad_anomalies(df, ("series",), "v", k=3.5).collect()
    flagged = [(r["series"], r["v"]) for r in out if r["anomaly"] == 1]
    assert flagged == [("s1", 300.0)]
    # constant series flags nothing (|v - med| = 0 is never > 0)
    assert all(r["anomaly"] == 0 for r in out if r["series"] == "s2")


def test_ltob_downsample_keeps_extremes_and_endpoints(spark):
    import pytest
    from pyspark.sql import functions as F

    from healthcare_api_spark.operators.temporal import ltob_downsample

    # flat series with one huge spike: the spike's bucket must pick it
    rows = []
    for i in range(100):
        v = 500.0 if i == 57 else float(i % 3)
        rows.append(("s", f"2024-01-01 00:{i//60:02d}:{i%60:02d}", v))
    df = spark.createDataFrame(rows, ["series", "ts", "v"]).withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = ltob_downsample(df, ("series",), "ts", "v", n_out=10).collect()
    assert len(out) == 10
    vals = [r["v"] for r in out]
    assert 500.0 in vals  # the spike survives
    tss = sorted(str(r["ts"]) for r in out)
    assert tss[0].endswith("00:00:00") and tss[-1].endswith("01:39")  # endpoints
    # short series pass through unchanged
    short = ltob_downsample(df.limit(5), ("series",), "ts", "v", n_out=10)
    assert short.count() == 5
    with pytest.raises(ValueError, match="n_out"):
        ltob_downsample(df, ("series",), "ts", "v", n_out=2)


def test_lttb_downsample_exact_algorithm(spark):
    import pytest
    from pyspark.sql import functions as F

    from healthcare_api_spark.operators.temporal import lttb_downsample

    # hand-computed: 6 points → n_out=4 → 2 interior buckets [1,2] [3,4]
    # bucket1 candidates idx1(y=0),idx2(y=10): vs prev-chosen idx0 and
    # avg of next bucket ((3.5s, 0.5)): the spike at idx2 wins; bucket2
    # then picks vs chosen idx2 and the last point.
    pts = [(0, 0.0), (1, 0.0), (2, 10.0), (3, 0.0), (4, 1.0), (5, 0.0)]
    rows = [("s", f"2024-01-01 00:00:0{i}", v) for i, v in pts]
    df = spark.createDataFrame(rows, ["series", "ts", "v"]).withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = lttb_downsample(df, ("series",), "ts", "v", n_out=4).collect()
    got = sorted((str(r["ts"])[-2:], r["v"]) for r in out)
    assert [g[1] for g in got] == [0.0, 10.0, 0.0, 0.0]  # 00, 02, 03, 05
    assert [g[0] for g in got] == ["00", "02", "03", "05"]

    # spike survival + endpoints + count on a longer series
    rows = []
    for i in range(100):
        v = 500.0 if i == 57 else float(i % 3)
        rows.append(("s", f"2024-01-01 00:{i//60:02d}:{i%60:02d}", v))
    df = spark.createDataFrame(rows, ["series", "ts", "v"]).withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = lttb_downsample(df, ("series",), "ts", "v", n_out=10).collect()
    assert len(out) == 10
    assert 500.0 in [r["v"] for r in out]
    tss = sorted(str(r["ts"]) for r in out)
    assert tss[0].endswith("00:00:00") and tss[-1].endswith("01:39")
    # short series pass through; bad n_out raises
    assert lttb_downsample(df.limit(4), ("series",), "ts", "v", n_out=10).count() == 4
    with pytest.raises(ValueError, match="n_out"):
        lttb_downsample(df, ("series",), "ts", "v", n_out=2)


def test_scd2_history_collapses_and_bounds(spark):
    from datetime import datetime

    from healthcare_api_spark.operators.temporal import scd2_history

    t = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # user 1: A, A (no-op), B, B (no-op), A  → 3 versions A/B/A
        (1, t(0), "A"), (1, t(1), "A"), (1, t(2), "B"),
        (1, t(3), "B"), (1, t(4), "A"),
        # user 2: single row → one current version
        (2, t(0), "X"),
        # user 3: NULL attr then value (NULL-safe change detection)
        (3, t(0), None), (3, t(1), "Y"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, state string")
    out = scd2_history(df, "user_id", "ts", ["state"]).collect()
    byu = {}
    for r in sorted(out, key=lambda r: (r["user_id"], r["version"])):
        byu.setdefault(r["user_id"], []).append(r)
    u1 = byu[1]
    assert [r["state"] for r in u1] == ["A", "B", "A"]
    assert [r["version"] for r in u1] == [1, 2, 3]
    assert u1[0]["effective_from"] == t(0) and u1[0]["effective_to"] == t(2)
    assert u1[1]["effective_to"] == t(4)
    assert u1[2]["effective_to"] is None and u1[2]["is_current"] == 1
    assert [r["is_current"] for r in u1] == [0, 0, 1]
    assert byu[2][0]["is_current"] == 1
    assert [r["state"] for r in byu[3]] == [None, "Y"]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="attr_cols"):
        scd2_history(df, "user_id", "ts", [])


# --------------------------------------------------- seasonal decompose --


def test_seasonal_decompose_recovers_planted_cycle(spark):
    import math

    from pyspark.sql import functions as F

    from healthcare_api_spark.operators.temporal import seasonal_decompose

    # series = linear trend + exact period-4 cycle (+2,0,-2,0)
    cyc = [2.0, 0.0, -2.0, 0.0]
    rows = [(0, i, 0.5 * i + cyc[i % 4], i % 4) for i in range(40)]
    df = spark.createDataFrame(rows, ["s", "bucket", "v", "phase"])
    # ma_window = 5 (one full cycle + 1) keeps the cycle out of the trend
    out = seasonal_decompose(df, ("s",), "bucket", "v", "phase", ma_window=5).collect()
    by_bucket = {r["bucket"]: r for r in out}
    # interior points: trend ≈ 0.5·i + cycle MA bias; with window 5 the
    # cycle contributes (2+0-2+0+v_i)/5 — check residuals are tiny
    for i in range(10, 30):
        r = by_bucket[i]
        assert r["trend"] is not None
        assert abs(r["resid"]) < 0.5, (i, r)
    # edges have no full window → trend/resid null
    assert by_bucket[0]["trend"] is None and by_bucket[39]["trend"] is None
    # seasonal sums to ~0 over one period
    season = {r["phase"]: r["seasonal"] for r in out if r["seasonal"] is not None}
    assert abs(sum(season.values())) < 1e-9
    assert season[0] > season[2]  # +2 phase above -2 phase


def test_seasonal_decompose_hand_computed_literals(spark):
    """u11-lesson retro (VERDICT r8 task #4): literal expected values
    derived BY HAND, not from either engine. With v_i = 0.5·i +
    cyc[i%4], cyc = [2,0,−2,0], ma_window=5: the centered window covers
    one full cycle (sum 0) plus a repeat of phase (i+2)%4, so
    trend(i) = 0.5·i + cyc[(i+2)%4]/5, and since cyc[p+2] = −cyc[p],
    detrended(i) = cyc[p] + cyc[p]/5 = 1.2·cyc[p] — constant per phase.
    Hence seasonal = [2.4, 0, −2.4, 0] (already mean-centered) and
    resid ≡ 0 on every full-window row. trend(10) = 5 + 2/5 = 5.4."""
    from healthcare_api_spark.operators.temporal import seasonal_decompose

    cyc = [2.0, 0.0, -2.0, 0.0]
    rows = [(0, i, 0.5 * i + cyc[i % 4], i % 4) for i in range(40)]
    df = spark.createDataFrame(rows, ["s", "bucket", "v", "phase"])
    out = {r["bucket"]: r for r in seasonal_decompose(
        df, ("s",), "bucket", "v", "phase", ma_window=5
    ).collect()}
    assert abs(out[10]["trend"] - 5.4) < 1e-9
    assert abs(out[11]["trend"] - (5.5 + cyc[1] / 5)) < 1e-9   # 5.5
    want_seasonal = {0: 2.4, 1: 0.0, 2: -2.4, 3: 0.0}
    for i in range(2, 38):
        assert abs(out[i]["seasonal"] - want_seasonal[i % 4]) < 1e-9, i
        assert abs(out[i]["resid"]) < 1e-9, i


def test_seasonal_decompose_rejects_even_window(spark):
    import pytest as _pytest

    from healthcare_api_spark.operators.temporal import seasonal_decompose

    df = spark.createDataFrame([(0, 1, 1.0, 0)], ["s", "bucket", "v", "phase"])
    with _pytest.raises(ValueError):
        seasonal_decompose(df, ("s",), "bucket", "v", "phase", ma_window=4)


def test_series_correlation_known_values(spark):
    from healthcare_api_spark.operators.temporal import series_correlation

    rows = []
    for i in range(20):
        rows += [("up", i, float(i)), ("up2", i, 2.0 * i + 5), ("down", i, float(-i))]
    df = spark.createDataFrame(rows, ["s", "bucket", "v"])
    out = {(r["series_a"], r["series_b"]): r for r in
           series_correlation(df, "s", "bucket", "v").collect()}
    # perfectly correlated / anti-correlated pairs; pairs emitted a < b once
    assert abs(out[("up", "up2")]["corr"] - 1.0) < 1e-12
    assert abs(out[("down", "up")]["corr"] + 1.0) < 1e-12
    assert len(out) == 3 and all(r["n"] == 20 for r in out.values())


def test_series_correlation_hand_computed_non_unit(spark):
    """u11-lesson retro: ±1 correlations survive many scaling bugs (any
    monotone distortion of covariance keeps |corr| = 1), so pin one
    NON-unit literal derived by hand: x = [1,2,3,4], y = [1,2,4,3] →
    means 2.5/2.5, Σxy-dev = 2.25+0.25+0.75+0.75 = 4, Σx-dev² =
    Σy-dev² = 5 → corr = 4/5 = 0.8 exactly."""
    from healthcare_api_spark.operators.temporal import series_correlation

    rows = []
    for i, (xa, ya) in enumerate([(1.0, 1.0), (2.0, 2.0), (3.0, 4.0), (4.0, 3.0)]):
        rows += [("x", i, xa), ("y", i, ya)]
    df = spark.createDataFrame(rows, ["s", "bucket", "v"])
    out = series_correlation(df, "s", "bucket", "v").collect()
    assert len(out) == 1
    assert out[0]["n"] == 4
    assert abs(out[0]["corr"] - 0.8) < 1e-12


def test_series_correlation_aligns_buckets(spark):
    from healthcare_api_spark.operators.temporal import series_correlation

    rows = [("a", 1, 1.0), ("a", 2, 2.0), ("a", 9, 5.0),
            ("b", 1, 3.0), ("b", 2, 1.0)]
    df = spark.createDataFrame(rows, ["s", "bucket", "v"])
    out = series_correlation(df, "s", "bucket", "v").collect()
    # only buckets present in BOTH series count
    assert out[0]["n"] == 2


def test_rolling_median_exact_and_edges(spark):
    from healthcare_api_spark.operators.temporal import rolling_median

    vals = [1.0, 100.0, 2.0, 3.0, 2.0]  # spike at index 1
    df = spark.createDataFrame(
        [("s", i, v) for i, v in enumerate(vals)], ["s", "bucket", "v"]
    )
    out = {r["bucket"]: r["med"] for r in
           rolling_median(df, ("s",), "bucket", "v", window=3).collect()}
    # interior: median of the 3-row frame suppresses the spike
    assert out[1] == 2.0 and out[2] == 3.0
    # edges: partial frame (2 rows) → interpolated median
    assert out[0] == 50.5 and out[4] == 2.5
    import pytest as _pytest

    with _pytest.raises(ValueError):
        rolling_median(df, ("s",), "bucket", "v", window=4)


def test_holt_winters_hand_computed(spark):
    """u11 rule from birth: dyadic params (α=β=γ=1/2, period 2) make
    every state exact. xs = [10, 14, 8]:
    i0: l=10, b=0, s=0, f=10 (no seasonal history yet);
    i1: l=.5·14+.5·10=12, b=.5·2=1, s=.5·2=1, f=13 (sh=[0,1], lag=0);
    i2: sp=sh[0]=0 → l=.5·8+.5·13=10.5, b=.5·(−1.5)+.5=−0.25,
        s=.5·(−2.5)=−1.25, sh→[1,−1.25], f=10.5−0.25+1=11.25."""
    from healthcare_api_spark.operators.temporal import holt_winters_add

    rows = [("s", i, x) for i, x in enumerate([10.0, 14.0, 8.0])]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    out = sorted(
        holt_winters_add(
            df, ("k",), "t", "v", period=2, alpha=0.5, beta=0.5, gamma=0.5
        ).collect(),
        key=lambda r: r["t"],
    )
    got = [(r["level"], r["trend"], r["seasonal"], r["forecast"]) for r in out]
    assert got == [
        (10.0, 0.0, 0.0, 10.0),
        (12.0, 1.0, 1.0, 13.0),
        (10.5, -0.25, -1.25, 11.25),
    ]


def test_holt_winters_sql_twin_parity(spark):
    import duckdb

    from healthcare_api_spark.operators.temporal import (
        holt_winters_add,
        holt_winters_add_sql,
    )

    rows = [("a", i, float((i * 7) % 13) + (3.0 if i % 4 == 0 else 0.0))
            for i in range(30)]
    rows += [("b", i, float(i % 5) * 1.5) for i in range(11)]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    got = sorted(
        (r["k"], r["t"], r["level"], r["trend"], r["seasonal"], r["forecast"])
        for r in holt_winters_add(
            df, ("k",), "t", "v", period=4, alpha=0.3, beta=0.2, gamma=0.25
        ).collect()
    )
    vals = ", ".join(f"('{k}', {t}, {v!r})" for k, t, v in rows)
    sql = holt_winters_add_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(k, t, v)",
        "k", "t", "v", 4, 0.3, 0.2, 0.25,
    )
    want = sorted(
        (k, t, l, b, s, f)
        for k, t, _x, l, b, s, f in duckdb.connect().execute(sql).fetchall()
    )
    assert got == want  # exact — identical IEEE op order, no rounding


def test_time_weighted_avg_hand_computed(spark):
    from pyspark.sql import functions as F

    from healthcare_api_spark.operators.temporal import time_weighted_avg

    # one bucket [10:00, 11:00): v=10 holds 00:00→00:30 (1800 s),
    # v=20 holds 00:30→bucket end (1800 s) → TWA = 15
    rows = [
        ("s", "2024-01-01 10:00:00", 10.0),
        ("s", "2024-01-01 10:30:00", 20.0),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "value"]).withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = time_weighted_avg(df, ("k",), "ts", "value", "1 hour").collect()
    assert len(out) == 1 and abs(out[0]["twa"] - 15.0) < 1e-9


def test_time_weighted_avg_unequal_segments_literal(spark):
    """u11-lesson retro: the 50/50-segment case (TWA 15) can't catch a
    swapped-weight bug (symmetric), so pin an ASYMMETRIC literal:
    v=10 holds 15 min, v=30 holds 45 min →
    TWA = (10·900 + 30·2700)/3600 = 25 exactly."""
    from pyspark.sql import functions as F

    from healthcare_api_spark.operators.temporal import time_weighted_avg

    rows = [
        ("s", "2024-01-01 10:00:00", 10.0),
        ("s", "2024-01-01 10:15:00", 30.0),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "value"]).withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = time_weighted_avg(df, ("k",), "ts", "value", "1 hour").collect()
    assert len(out) == 1 and abs(out[0]["twa"] - 25.0) < 1e-9


def test_time_weighted_avg_ignores_sampling_density(spark):
    from pyspark.sql import functions as F

    from healthcare_api_spark.operators.temporal import time_weighted_avg

    # v=0 sampled 10× in the first minute, v=60 once at 10:01 holding
    # 59 min: plain avg ≈ 5.45, TWA must weight by TIME ≈ 59
    rows = [("s", f"2024-01-01 10:00:{i:02d}", 0.0) for i in range(0, 60, 6)]
    rows.append(("s", "2024-01-01 10:01:00", 60.0))
    df = spark.createDataFrame(rows, ["k", "ts", "value"]).withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = time_weighted_avg(df, ("k",), "ts", "value", "1 hour").collect()[0]
    assert out["twa"] > 55.0 and out["n_points"] == 11


def test_ewma_pinned_recursion(spark):
    from healthcare_api_spark.operators.temporal import ewma

    rows = [("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 0.0), ("b", 1, 4.0)]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    out = {(r["k"], r["t"]): r["ewma"] for r in ewma(df, ("k",), "t", "v", 0.5).collect()}
    # s1=10; s2=.5*20+.5*10=15; s3=.5*0+.5*15=7.5; series b independent
    assert out[("a", 1)] == 10.0
    assert out[("a", 2)] == 15.0
    assert out[("a", 3)] == 7.5
    assert out[("b", 1)] == 4.0


def test_ewma_alpha_one_is_identity(spark):
    from healthcare_api_spark.operators.temporal import ewma

    df = spark.createDataFrame([("a", i, float(i * 3)) for i in range(10)], ["k", "t", "v"])
    out = ewma(df, ("k",), "t", "v", 1.0)
    assert all(r["ewma"] == r["v"] for r in out.collect())


def test_ewma_rejects_bad_alpha(spark):
    import pytest as _pytest

    from healthcare_api_spark.operators.temporal import ewma

    df = spark.createDataFrame([("a", 1, 1.0)], ["k", "t", "v"])
    with _pytest.raises(ValueError):
        ewma(df, ("k",), "t", "v", 0.0)


def test_ewma_sql_twin_matches(spark):
    import duckdb

    from healthcare_api_spark.operators.temporal import ewma, ewma_sql

    rows = [("a", i, float((i * 17) % 23)) for i in range(50)] + [
        ("b", i, float(i)) for i in range(5)
    ]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    got = {
        (r["k"], r["t"]): round(r["ewma"], 6)
        for r in ewma(df, ("k",), "t", "v", 0.3).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE src (k VARCHAR, t INT, v DOUBLE)")
    con.executemany("INSERT INTO src VALUES (?, ?, ?)", rows)
    sql = ewma_sql("SELECT k, t, v FROM src", "k", "t", "v", 0.3)
    want = {(k, t): round(s, 6) for k, t, _x, s in con.execute(sql).fetchall()}
    assert got == want


def test_cusum_flags_hand_computed(spark):
    from healthcare_api_spark.operators.temporal import cusum_flags

    # v = [1,1,1,9,9] → μ=4.2; slack .5 → dpos = v−4.7, dneg = 3.7−v
    # S⁺ = [0,0,0,4.3,8.6]; S⁻ = [2.7,5.4,8.1,2.8,0]; h=5
    df = spark.createDataFrame(
        [("a", i, v) for i, v in enumerate([1.0, 1.0, 1.0, 9.0, 9.0])],
        ["k", "t", "v"],
    )
    rows = sorted(
        cusum_flags(df, ("k",), "t", "v", slack=0.5, threshold=5.0).collect(),
        key=lambda r: r["t"],
    )
    assert [r["cusum_pos"] for r in rows] == [0.0, 0.0, 0.0, 4.3, 8.6]
    assert [r["cusum_neg"] for r in rows] == [2.7, 5.4, 8.1, 2.8, 0.0]
    assert [r["alarm"] for r in rows] == [0, 1, 1, 0, 1]


def test_cusum_no_alarm_on_stationary_series(spark):
    from healthcare_api_spark.operators.temporal import cusum_flags

    df = spark.createDataFrame(
        [("a", i, float(i % 2)) for i in range(50)], ["k", "t", "v"]
    )
    out = cusum_flags(df, ("k",), "t", "v", slack=0.5, threshold=5.0)
    assert out.filter("alarm = 1").count() == 0


def test_cusum_no_single_partition_window(spark):
    from healthcare_api_spark.operators.temporal import cusum_flags

    df = spark.createDataFrame([("a", 1, 1.0), ("b", 1, 2.0)], ["k", "t", "v"])
    plan = (
        cusum_flags(df, ("k",), "t", "v")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" not in plan


def test_matrix_profile_planted_motif(spark):
    """A repeated pattern at lag ≥ w scores ~0 against its twin; a
    discord scores high; constant-window conventions hold (r7 x13)."""
    import math

    from healthcare_api_spark.operators.temporal import matrix_profile

    # series: motif [1,5,2,9] at i=1 and i=9 (lag 8 ≥ w=4); noise between;
    # a constant stretch at the end
    vals = [1, 5, 2, 9, 7, 3, 8, 4, 1, 5, 2, 9, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6]
    rows = [("a", i + 1, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["series", "i", "v"])
    out = {
        r["i"]: r
        for r in matrix_profile(df, "series", "i", "v", w=4, max_lag=12).collect()
    }
    # window 1 = [1,5,2,9], window 9 = [1,5,2,9] → exact motif, dist 0
    assert out[1]["dist"] == 0.0 and out[1]["nn_idx"] == 9
    assert out[9]["dist"] == 0.0 and out[9]["nn_idx"] == 1
    # constant windows: 14 and 18 are both [6,6,6,6] at lag 4 ≥ w —
    # the both-constant convention gives 0
    assert out[14]["dist"] == 0.0 and out[14]["nn_idx"] == 18
    # window 10 = [5,2,9,6] is non-constant; its band includes constant
    # windows — the either-constant convention caps those at sqrt(2w)
    assert out[10]["dist"] <= math.sqrt(8.0) + 1e-9
    # a window whose band contains one constant window: either-constant
    # convention = sqrt(2w) unless a better non-constant match exists
    assert all(r["dist"] >= 0.0 for r in out.values())
    # discord: window 5 = [7,3,8,4] has no repeat — strictly positive
    assert out[5]["dist"] > 0.5
    import pytest as _pytest

    with _pytest.raises(ValueError):
        matrix_profile(df, "series", "i", "v", w=1)
    with _pytest.raises(ValueError):
        matrix_profile(df, "series", "i", "v", w=4, max_lag=3)


def test_sax_symbols_hand_computed(spark):
    """Known series -> known PAA frames, z-scores and letters,
    including the short tail frame and the frame-mean rounding."""
    import math

    from healthcare_api_spark.operators.temporal import sax_symbols

    # series: [0, 0, 10, 10, 20, 20, 100]  (frame=2, alphabet=4)
    vals = [0, 0, 10, 10, 20, 20, 100]
    df = spark.createDataFrame(
        [("s", i, v) for i, v in enumerate(vals)], ["g", "o", "v"]
    )
    out = {
        r["frame_idx"]: r
        for r in sax_symbols(df, "g", "o", "v", frame=2, alphabet=4).collect()
    }
    n = len(vals)
    mu = sum(vals) / n
    sd = math.sqrt(sum(v * v for v in vals) / n - mu * mu)
    bps = [-0.6744897501960817, 0.0, 0.6744897501960817]
    for fi, frame_vals in enumerate([[0, 0], [10, 10], [20, 20], [100]]):
        r = out[fi]
        paa = sum(frame_vals) / len(frame_vals)
        z = (paa - mu) / sd
        want = chr(ord("a") + sum(1 for b in bps if z > b))
        assert r["m"] == len(frame_vals)
        assert abs(r["paa"] - paa) < 1e-9
        assert r["symbol"] == want, (fi, z, r["symbol"], want)
    # the letters must actually spread: min frame 'a', max frame 'd'
    assert out[0]["symbol"] == "a" and out[3]["symbol"] == "d"


def test_sax_symbols_constant_series_and_validation(spark):
    import pytest as _pytest

    from healthcare_api_spark.operators.temporal import (
        sax_breakpoints,
        sax_symbols,
    )

    df = spark.createDataFrame(
        [("c", i, 7) for i in range(6)], ["g", "o", "v"]
    )
    rows = sax_symbols(df, "g", "o", "v", frame=3, alphabet=4).collect()
    # sigma = 0 -> z pinned to 0 -> one breakpoint (-0.674) strictly
    # below -> 'b' everywhere
    assert {r["symbol"] for r in rows} == {"b"}
    assert all(r["paa"] == 7.0 for r in rows)
    with _pytest.raises(ValueError):
        sax_symbols(df, "g", "o", "v", frame=0)
    with _pytest.raises(ValueError):
        sax_breakpoints(9)
    assert len(sax_breakpoints(8)) == 7


def test_sax_motif_candidates_repeats_only(spark):
    """A series with an embedded repeated pattern yields that word
    (twice) and nothing else; word windows never cross series."""
    from healthcare_api_spark.operators.temporal import sax_motif_candidates

    # pattern P = [0, 0, 9, 9] (2 frames of 2) repeated at frames 0-1
    # and 4-5, separated by a distinct middle
    vals = [0, 0, 9, 9, 50, 50, -50, -50, 0, 0, 9, 9]
    rows = [("s", i, v) for i, v in enumerate(vals)]
    rows += [("t", i, v) for i, v in enumerate([1, 2, 3, 4])]  # too short
    df = spark.createDataFrame(rows, ["g", "o", "v"])
    out = sax_motif_candidates(
        df, "g", "o", "v", frame=2, alphabet=4, word_len=2
    ).collect()
    by = {(r["g"], r["word"]): r for r in out}
    assert all(g == "s" for g, _ in by)  # 't' has < word_len+1 frames
    assert len(by) >= 1
    for r in out:
        assert r["n_occ"] >= 2 and r["first_idx"] < r["last_idx"]
    # the repeated 2-frame pattern: frames 0,1 == frames 4,5 as symbols
    # -> the word starting at frame 0 repeats at frame 4
    rep = [r for r in out if r["first_idx"] == 0]
    assert rep and rep[0]["last_idx"] == 4

    import pytest

    with pytest.raises(ValueError):
        sax_motif_candidates(df, "g", "o", "v", word_len=1)


def test_sax_similarity_join_identical_and_disjoint(spark):
    """Two copies of one shape share their whole vocabulary (jaccard
    1.0); a structurally different third series pairs with neither or
    with low overlap; output is symmetric-free (a < b only)."""
    from healthcare_api_spark.operators.temporal import sax_similarity_join

    shape = [0, 0, 9, 9, 0, 0, 9, 9, 0, 0, 9, 9]
    rows = [("a", i, v) for i, v in enumerate(shape)]
    rows += [("b", i, v * 3) for i, v in enumerate(shape)]  # same z-shape
    rows += [("c", i, v) for i, v in enumerate(range(12))]  # ramp
    df = spark.createDataFrame(rows, ["g", "o", "v"])
    out = sax_similarity_join(
        df, "g", "o", "v", frame=2, alphabet=4, word_len=2
    ).collect()
    pairs = {(r["series_a"], r["series_b"]): r for r in out}
    assert ("a", "b") in pairs
    ab = pairs[("a", "b")]
    # z-normalization makes b identical to a symbol-wise
    assert ab["n_shared"] == ab["n_a"] == ab["n_b"]
    assert ab["jaccard"] == 1.0
    for (x, y) in pairs:
        assert x < y


def test_sax_similarity_join_max_df_cut_and_validation(spark):
    import pytest

    from healthcare_api_spark.operators.temporal import sax_similarity_join

    shape = [0, 0, 9, 9, 0, 0, 9, 9]
    rows = []
    for g in ("a", "b", "c"):
        rows += [(g, i, v) for i, v in enumerate(shape)]
    df = spark.createDataFrame(rows, ["g", "o", "v"])
    # every word is shared by all 3 series; max_df=2 removes them all
    out = sax_similarity_join(
        df, "g", "o", "v", frame=2, alphabet=4, word_len=2, max_df=2
    ).collect()
    assert out == []
    with pytest.raises(ValueError):
        sax_similarity_join(df, "g", "o", "v", word_len=1)
    with pytest.raises(ValueError):
        sax_similarity_join(df, "g", "o", "v", max_df=1)


def test_holt_linear_hand_computed(spark):
    from healthcare_api_spark.operators.temporal import holt_linear

    rows = [("a", 1, 10.0), ("a", 2, 12.0), ("a", 3, 15.0)]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    got = {
        r["t"]: (r["level"], r["trend"], r["forecast"])
        for r in holt_linear(df, ("k",), "t", "v", alpha=0.5, beta=0.5).collect()
    }
    # l1=10, b1=x2-x1=2
    assert got[1] == (10.0, 2.0, 12.0)
    # l2 = .5*12 + .5*(10+2) = 12; b2 = .5*(12-10) + .5*2 = 2
    assert got[2] == (12.0, 2.0, 14.0)
    # l3 = .5*15 + .5*14 = 14.5; b3 = .5*2.5 + .5*2 = 2.25
    assert got[3] == (14.5, 2.25, 16.75)


def test_holt_linear_perfectly_linear_series_stays_on_line(spark):
    from healthcare_api_spark.operators.temporal import holt_linear

    rows = [("a", i, 1.0 + 2.0 * i) for i in range(10)]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    for r in holt_linear(df, ("k",), "t", "v", alpha=0.3, beta=0.2).collect():
        # α·x + (1−α)·x reassociates (0.3·3 + 0.7·3 = 2.9999999999999996)
        # so on-the-line is a 1e-9 property, not bit equality
        assert abs(r["level"] - r["v"]) < 1e-9
        assert abs(r["trend"] - 2.0) < 1e-9
        assert abs(r["forecast"] - (r["v"] + 2.0)) < 1e-9


def test_holt_linear_single_point_and_validation(spark):
    import pytest

    from healthcare_api_spark.operators.temporal import holt_linear

    df = spark.createDataFrame([("a", 1, 7.0)], ["k", "t", "v"])
    r = holt_linear(df, ("k",), "t", "v", alpha=0.4, beta=0.4).collect()[0]
    assert (r["level"], r["trend"], r["forecast"]) == (7.0, 0.0, 7.0)
    with pytest.raises(ValueError):
        holt_linear(df, ("k",), "t", "v", alpha=0.0, beta=0.5)
    with pytest.raises(ValueError):
        holt_linear(df, ("k",), "t", "v", alpha=0.5, beta=1.5)


def test_holt_linear_sql_twin_parity(spark):
    import random

    import duckdb

    from healthcare_api_spark.operators.temporal import (
        holt_linear,
        holt_linear_sql,
    )

    rng = random.Random(17)
    rows = [
        (k, i, round(rng.uniform(-50, 50), 6))
        for k in ("a", "b")
        for i in range(25)
    ]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    got = {
        (r["k"], r["t"]): (r["level"], r["trend"], r["forecast"])
        for r in holt_linear(df, ("k",), "t", "v", alpha=0.3, beta=0.2).collect()
    }
    vals = ", ".join(f"('{k}', {t}, {v!r})" for k, t, v in rows)
    sql = holt_linear_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(k, t, v)", "k", "t", "v", 0.3, 0.2
    )
    want = {
        (k, t): (l, b, f)
        for k, t, _x, l, b, f in duckdb.connect().execute(sql).fetchall()
    }
    assert got == want


def test_acf_detects_planted_period(spark):
    import math
    from datetime import datetime, timedelta

    from healthcare_api_spark.operators.temporal import acf

    # exact period-4 integer cycle -> r(4) = 1.0, r(2) strongly negative
    base = datetime(2024, 1, 1)
    cyc = [10, 40, 10, -20]
    rows = [
        ("a", base + timedelta(hours=i), float(cyc[i % 4])) for i in range(48)
    ]
    df = spark.createDataFrame(rows, ["k", "bucket", "v"])
    got = {
        r["lag"]: r["corr"]
        for r in acf(df, "k", "bucket", "v", max_lag=6,
                     interval_micros=3_600_000_000, quantize=1).collect()
    }
    assert math.isclose(got[4], 1.0, abs_tol=1e-9)
    assert got[2] < -0.5
    assert math.isclose(got[1], got[3], abs_tol=1e-9)  # symmetric cycle


def test_acf_pairwise_means_match_pandas_autocorr(spark):
    import math
    import random
    from datetime import datetime, timedelta

    import pandas as pd

    from healthcare_api_spark.operators.temporal import acf

    rng = random.Random(9)
    base = datetime(2024, 1, 1)
    vals = [round(rng.uniform(-5, 5), 2) for _ in range(60)]
    rows = [("a", base + timedelta(hours=i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["k", "bucket", "v"])
    got = {
        r["lag"]: r["corr"]
        for r in acf(df, "k", "bucket", "v", max_lag=3,
                     interval_micros=3_600_000_000, quantize=100).collect()
    }
    s = pd.Series(vals)
    for lag in (1, 2, 3):
        assert math.isclose(got[lag], s.autocorr(lag), rel_tol=1e-9), lag


def test_acf_gap_tolerant_and_validation(spark):
    from datetime import datetime, timedelta

    import pytest

    from healthcare_api_spark.operators.temporal import acf

    base = datetime(2024, 1, 1)
    rows = [
        ("a", base + timedelta(hours=i), float(i)) for i in (0, 1, 2, 5, 6)
    ]
    df = spark.createDataFrame(rows, ["k", "bucket", "v"])
    got = {
        r["lag"]: r["n"]
        for r in acf(df, "k", "bucket", "v", max_lag=2,
                     interval_micros=3_600_000_000, quantize=1).collect()
    }
    # lag-1 pairs: (1,0), (2,1), (6,5) -> 3; lag-2: (2,0) -> 1... plus (6, nothing at 4), (5, nothing at 3)
    assert got[1] == 3
    assert got[2] == 1
    with pytest.raises(ValueError):
        acf(df, "k", "bucket", "v", max_lag=0, interval_micros=1)
    with pytest.raises(ValueError):
        acf(df, "k", "bucket", "v", max_lag=2, interval_micros=0)


def test_dtw_band_hand_computed(spark):
    from healthcare_api_spark.operators.temporal import dtw_band_join

    # a=[0,0,1], b=[0,1,1]: DTW aligns the step perfectly -> 0;
    # c=[2,2,2]: vs a -> best path cost hand-derivable
    rows = (
        [("a", i, v) for i, v in enumerate([0, 0, 1])]
        + [("b", i, v) for i, v in enumerate([0, 1, 1])]
        + [("c", i, v) for i, v in enumerate([2, 2, 2])]
    )
    series = spark.createDataFrame(rows, "k string, i int, v long")
    got = {
        (r["key_a"], r["key_b"]): (r["n"], r["m"], r["dtw"])
        for r in dtw_band_join(series, "k", "i", "v", band=2).collect()
    }
    # (a,b): D — warping absorbs the shift: path cost 0+0+0+0 = 0
    assert got[("a", "b")] == (3, 3, 0)
    # (a,c): diag path (0-2)²+(0-2)²+(1-2)² = 4+4+1 = 9
    assert got[("a", "c")] == (3, 3, 9)
    # (b,c): (0-2)² + (1-2)² + (1-2)² = 6
    assert got[("b", "c")] == (3, 3, 6)


def test_dtw_band_unequal_lengths_and_validation(spark):
    import pytest

    from healthcare_api_spark.operators.temporal import dtw_band_join

    rows = [("p", i, v) for i, v in enumerate([5, 5, 5, 5])] + [
        ("q", 0, 5),
        ("q", 1, 5),
    ]
    series = spark.createDataFrame(rows, "k string, i int, v long")
    got = dtw_band_join(series, "k", "i", "v", band=2).collect()
    assert len(got) == 1 and got[0]["dtw"] == 0  # identical values warp free
    with pytest.raises(ValueError, match="band"):
        dtw_band_join(series, "k", "i", "v", band=1)  # |4-2| > 1
    with pytest.raises(ValueError):
        dtw_band_join(series, "k", "i", "v", band=-1)


def test_dtw_band_tight_band_blocks_alignment(spark):
    from healthcare_api_spark.operators.temporal import dtw_band_join

    # interior spike shifted by one: a wide band lets the warp line
    # the spikes up (cost 0); band 0 forces the diagonal and pays both
    rows = [("u", i, v) for i, v in enumerate([0, 9, 0, 0])] + [
        ("v", i, v) for i, v in enumerate([0, 0, 9, 0])
    ]
    series = spark.createDataFrame(rows, "k string, i int, v long")
    wide = dtw_band_join(series, "k", "i", "v", band=3).collect()[0]["dtw"]
    tight = dtw_band_join(series, "k", "i", "v", band=0).collect()[0]["dtw"]
    assert tight == 81 + 81
    assert wide == 0


def test_dtw_band_sql_twin_parity_random(spark):
    import random

    import duckdb

    from healthcare_api_spark.operators.temporal import (
        dtw_band_join,
        dtw_band_sql,
    )

    rng = random.Random(3)
    series = {
        k: [rng.randint(-50, 50) for _ in range(L)]
        for k, L in (("a", 9), ("b", 12), ("c", 7), ("d", 8))
    }
    rows = [(k, i, v) for k, vs in series.items() for i, v in enumerate(vs)]
    df = spark.createDataFrame(rows, "k string, i int, v long")
    got = sorted(
        (r["key_a"], r["key_b"], r["n"], r["m"], r["dtw"])
        for r in dtw_band_join(df, "k", "i", "v", band=5).collect()
    )
    vals = ", ".join(f"('{k}', {i}, {v})" for k, i, v in rows)
    sql = dtw_band_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(k, i, v)", "k", "i", "v", band=5
    )
    want = sorted(duckdb.sql(sql).fetchall())
    assert got == [tuple(int(x) if not isinstance(x, str) else x for x in w) for w in want]


def test_dtw_band_explicit_pairs_path(spark):
    from healthcare_api_spark.operators.temporal import dtw_band_join

    rows = [("a", 0, 1), ("a", 1, 2), ("b", 0, 1), ("b", 1, 2), ("c", 0, 9)]
    series = spark.createDataFrame(rows, "k string, i int, v long")
    pairs = spark.createDataFrame([("a", "b")], ["key_a", "key_b"])
    got = dtw_band_join(series, "k", "i", "v", band=1, pairs=pairs).collect()
    assert len(got) == 1
    assert (got[0]["key_a"], got[0]["key_b"], got[0]["dtw"]) == ("a", "b", 0)


def test_binseg_hand_computed_step_function(spark):
    from healthcare_api_spark.operators.temporal import binseg_changepoints

    # 0,0,0,10,10,10,10,5,5,5 — first split isolates the 0→10 jump at
    # t=3 (gain hand-derivable: A=0,a=3; B=65,b=7; C=65,n=10 →
    # 65²/7 − 65²/10 = 4225·3/70 = 181.07... wait, recompute:
    # 0 + 4225/7 − 4225/10 = 603.571 − 422.5 = 181.07) — hmm, values
    # scaled by the fixture below; assert positions + monotone gains
    df = spark.createDataFrame(
        [("a", i, v) for i, v in enumerate([0, 0, 0, 10, 10, 10, 10, 5, 5, 5])],
        "k string, i int, v long",
    )
    got = {
        r["step"]: (r["cp"], r["gain"])
        for r in binseg_changepoints(df, "k", "i", "v", k=2).collect()
    }
    assert got[1][0] == 3 and got[2][0] == 7
    # independently derived gains: step 1 splits [1,10] at 3:
    # A=0/3, B=55/7, C=55/10 -> 55²/7 − 55²/10 = 3025·3/70
    assert abs(got[1][1] - (3025 * 3 / 70)) < 1e-9
    assert got[1][1] > got[2][1] > 0


def test_binseg_constant_series_zero_gain_lowest_t(spark):
    from healthcare_api_spark.operators.temporal import binseg_changepoints

    df = spark.createDataFrame(
        [("c", i, 7) for i in range(6)], "k string, i int, v long"
    )
    got = sorted(
        (r["step"], r["cp"], r["gain"])
        for r in binseg_changepoints(df, "k", "i", "v", k=3).collect()
    )
    # all gains 0 -> ties break to the lowest valid t each step
    assert got == [(1, 1, 0.0), (2, 2, 0.0), (3, 3, 0.0)]


def test_binseg_validation_and_short_series(spark):
    import pytest

    from healthcare_api_spark.operators.temporal import binseg_changepoints

    df = spark.createDataFrame(
        [("s", 0, 1), ("s", 1, 9)], "k string, i int, v long"
    )
    with pytest.raises(ValueError):
        binseg_changepoints(df, "k", "i", "v", k=0)
    # n=2: only one valid split ever; steps 2-3 produce no row
    got = binseg_changepoints(df, "k", "i", "v", k=3).collect()
    assert [(r["step"], r["cp"]) for r in got] == [(1, 1)]


def test_binseg_sql_twin_parity_random(spark):
    import random

    import duckdb

    from healthcare_api_spark.operators.temporal import (
        binseg_changepoints,
        binseg_changepoints_sql,
    )

    rng = random.Random(5)
    rows = []
    for kk in ("p", "q"):
        level = 0
        for i in range(40):
            if i in (13, 27):
                level += rng.randint(-30, 30)
            rows.append((kk, i, level + rng.randint(-3, 3)))
    df = spark.createDataFrame(rows, "k string, i int, v long")
    got = sorted(
        (r["k"], r["step"], r["cp"], round(r["gain"], 9))
        for r in binseg_changepoints(df, "k", "i", "v", k=4).collect()
    )
    vals = ", ".join(f"('{kk}', {i}, {v})" for kk, i, v in rows)
    sql = binseg_changepoints_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(k, i, v)", "k", "i", "v", k=4
    )
    want = sorted(
        (a, int(b), int(c), round(d, 9)) for a, b, c, d in duckdb.sql(sql).fetchall()
    )
    assert got == want


def test_forecast_eval_hand_computed(spark):
    from healthcare_api_spark.operators.temporal import forecast_eval

    # lag=2; rows t=3,4 evaluated (1-based). forecast is one-step-
    # ahead: err_f(t) = |x(t) - f(t-1)|, err_n(t) = |x(t) - x(t-2)|.
    # x = [10, 20, 30, 40], f = [28, 41, 0, 0]:
    #  t=3: |30-41|=11, naive |30-10|=20
    #  t=4: |40-0|=40,  naive |40-20|=20
    rows = [
        ("a", 1, 10.0, 28.0),
        ("a", 2, 20.0, 41.0),
        ("a", 3, 30.0, 0.0),
        ("a", 4, 40.0, 0.0),
    ]
    df = spark.createDataFrame(rows, "k string, t int, x double, f double")
    got = forecast_eval(df, ("k",), "t", "x", "f", naive_lag=2).collect()[0]
    assert got["n_eval"] == 2
    assert got["err_model_micros"] == (11 + 40) * 1_000_000
    assert got["err_naive_micros"] == (20 + 20) * 1_000_000
    assert got["mase"] == round(51 / 40, 6)


def test_forecast_eval_perfect_and_degenerate(spark):
    import pytest

    from healthcare_api_spark.operators.temporal import forecast_eval

    # perfect one-step forecast -> mase 0; constant series -> naive
    # error 0 -> mase NULL
    rows = [("p", t, float(t), float(t + 1)) for t in range(1, 8)] + [
        ("c", t, 5.0, 9.0) for t in range(1, 8)
    ]
    df = spark.createDataFrame(rows, "k string, t int, x double, f double")
    got = {
        r["k"]: r for r in forecast_eval(
            df, ("k",), "t", "x", "f", naive_lag=3
        ).collect()
    }
    assert got["p"]["err_model_micros"] == 0 and got["p"]["mase"] == 0.0
    assert got["c"]["err_naive_micros"] == 0 and got["c"]["mase"] is None
    with pytest.raises(ValueError):
        forecast_eval(df, ("k",), "t", "x", "f", naive_lag=0)


def test_series_features_hand_computed(spark):
    from healthcare_api_spark.operators.temporal import series_features

    # values 1,1,1,5,1,9: n=6, sum=18, sumsq=110, var_num=6*110-324=336
    # lower median (sorted 1,1,1,1,5,9; rank (6+1)//2=3) = 1;
    # crossings around 1: products are 0 at every step touching the
    # median -> 0 crossings; longest flat = the leading 1,1,1 run
    df = spark.createDataFrame(
        [("a", i, v) for i, v in enumerate([1, 1, 1, 5, 1, 9])],
        "k string, i int, v long",
    )
    r = series_features(df, "k", "i", "v").collect()[0]
    assert (r["n"], r["sum_q"], r["sumsq_q"], r["var_num"]) == (6, 18, 110, 336)
    assert r["mean"] == 3.0 and r["variance"] == round(336 / 36, 6)
    assert r["crossing_points"] == 0
    assert r["longest_flat"] == 3


def test_series_features_crossings_and_runs(spark):
    from healthcare_api_spark.operators.temporal import series_features

    # oscillation around the median: 0,10,0,10,0 (median 0 ->
    # sign products are 0; shift by -5: -5,5,-5,5,-5 median -5)
    # use 1,9,1,9,1: sorted 1,1,1,9,9, lower median (rank 3) = 1;
    # every 9 touches (x-med)>0, every 1 gives 0 -> products 0.
    # Use values straddling strictly: 1,9,2,9,1 -> median 2:
    # steps (1,9): (-1)(7)<0 X; (9,2): 7*0=0; (2,9): 0*7=0; (9,1):
    # 7*(-1)<0 X -> 2 crossings
    df = spark.createDataFrame(
        [("b", i, v) for i, v in enumerate([1, 9, 2, 9, 1])],
        "k string, i int, v long",
    )
    r = series_features(df, "k", "i", "v").collect()[0]
    assert r["crossing_points"] == 2
    assert r["longest_flat"] == 1
    # constant series: variance 0, one long run, no crossings
    c = spark.createDataFrame(
        [("c", i, 7) for i in range(5)], "k string, i int, v long"
    )
    rc = series_features(c, "k", "i", "v").collect()[0]
    assert rc["var_num"] == 0 and rc["variance"] == 0.0
    assert rc["longest_flat"] == 5 and rc["crossing_points"] == 0


def test_quantized_moments_exact_at_x1000_magnitude(spark):
    """VERDICT r9 #3: the quantized Pearson moment sums accumulate in
    decimal(38,0) (DuckDB's HUGEINT domain), so magnitudes that put
    Σvq² three orders past int64 still hash-match the oracle — the
    ×100-volume ~87%-of-int64 knee is removed, not guarded."""
    import duckdb
    from datetime import datetime, timedelta

    from healthcare_api_spark.operators.temporal import (
        acf,
        series_correlation,
    )

    # values in [4.5e13, 1.35e14] (exact integers in double, < 2^53)
    # with variance of the same order as the magnitude, so the double
    # closed form stays meaningful; vq² ~1.8e28 and the n=240 sums
    # reach ~4e30 — int64 wraps at 9.2e18, three orders earlier;
    # decimal(38,0)/HUGEINT both hold the sums exactly
    base = datetime(2024, 1, 1)
    rows = []
    for s in ("a", "b", "c"):
        for i in range(240):
            v = 45_000_000_000_000 + (
                (i * 2654435761 + ord(s) * 104729) % 90_000_000_000_000
            )
            rows.append((s, base + timedelta(hours=i), float(v)))
    df = spark.createDataFrame(rows, "series string, bucket timestamp, v double")

    got_corr = sorted(
        (r["series_a"], r["series_b"], r["n"], round(r["corr"], 6))
        for r in series_correlation(df, "series", "bucket", "v", quantize=1).collect()
    )
    got_acf = sorted(
        (r["series"], r["lag"], r["n"], round(r["corr"], 6))
        for r in acf(
            df, "series", "bucket", "v", max_lag=3,
            interval_micros=3_600_000_000, quantize=1,
        ).collect()
    )

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE s AS SELECT * FROM (VALUES "
        + ", ".join(
            f"('{s}', TIMESTAMP '{t.isoformat(sep=' ')}', {v!r})"
            for s, t, v in rows
        )
        + ") AS t(series, bucket, v)"
    )
    want_corr = sorted(
        (a, b, int(n), round(float(c), 6))
        for a, b, n, c in con.execute(
            "WITH q AS (SELECT series, bucket,"
            "  CAST(round(v * 1) AS BIGINT) AS vq FROM s),"
            " j AS (SELECT a.series AS sa, b.series AS sb, a.vq AS x, b.vq AS y"
            "  FROM q a JOIN q b ON a.bucket = b.bucket AND a.series < b.series),"
            " m AS (SELECT sa, sb, count(*) AS n, sum(x) AS sx, sum(y) AS sy,"
            "  sum(x::HUGEINT * y) AS sxy, sum(x::HUGEINT * x) AS sxx,"
            "  sum(y::HUGEINT * y) AS syy FROM j GROUP BY 1,2)"
            " SELECT sa, sb, n,"
            "  (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)"
            "  / (sqrt(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)"
            "   * sqrt(n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)) FROM m"
        ).fetchall()
    )
    assert got_corr == want_corr
    want_acf = sorted(
        (s, int(l), int(n), round(float(c), 6))
        for s, l, n, c in con.execute(
            "WITH q AS (SELECT series, bucket,"
            "  CAST(round(v * 1) AS BIGINT) AS vq FROM s),"
            " j AS (SELECT a.series AS series, lag.lag AS lag, a.vq AS x, b.vq AS y"
            "  FROM q a CROSS JOIN (SELECT unnest(range(1,4)) AS lag) lag"
            "  JOIN q b ON b.series = a.series"
            "   AND b.bucket = a.bucket - to_hours(lag.lag::BIGINT)),"
            " m AS (SELECT series, lag, count(*) AS n, sum(x) AS sx, sum(y) AS sy,"
            "  sum(x::HUGEINT * y) AS sxy, sum(x::HUGEINT * x) AS sxx,"
            "  sum(y::HUGEINT * y) AS syy"
            "  FROM j GROUP BY 1,2)"
            " SELECT series, lag, n,"
            "  (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)"
            "  / (sqrt(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)"
            "   * sqrt(n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)) FROM m"
        ).fetchall()
    )
    assert got_acf == want_acf


def test_decomposition_strength_hand_computed(spark):
    """Pure-trend series -> trend_strength ~1 / seasonal ~0 shape;
    pure-seasonal series -> the reverse. Built from a synthetic
    decompose frame so the expected variance ratios are hand-checkable
    exactly."""
    from healthcare_api_spark.operators.temporal import (
        decomposition_strength,
    )

    # series A: v = trend exactly (resid 0, seasonal 0):
    #   Var(resid)=0 -> trend_strength = 1; Var(v - trend) = 0 ->
    #   seasonal_strength NULL (degenerate denominator, guarded)
    rows_a = [("a", float(i), float(i), 0.0, 0.0) for i in range(1, 9)]
    # series B: v = seasonal exactly (alternating ±1, trend 0)
    rows_b = [
        ("b", (-1.0) ** i, 0.0, (-1.0) ** i, 0.0) for i in range(1, 9)
    ]
    # series C: resid == detrended == deseasonalized (pure noise):
    #   both strengths max(0, 1-1) = 0
    rows_c = [
        ("c", float((i * 7) % 5), 0.0, 0.0, float((i * 7) % 5))
        for i in range(1, 9)
    ]
    df = spark.createDataFrame(
        rows_a + rows_b + rows_c,
        "series string, v double, trend double, seasonal double, resid double",
    )
    got = {
        r["series"]: (r["n"], r["trend_strength"], r["seasonal_strength"])
        for r in decomposition_strength(df, ("series",)).collect()
    }
    assert got["a"] == (8, 1.0, None)
    assert got["b"] == (8, None, 1.0)
    assert got["c"] == (8, 0.0, 0.0)
    # NULL-trend rows (MA edges) are excluded
    from pyspark.sql import functions as F

    df2 = df.withColumn(
        "trend", F.when(F.col("v") != 1.0, F.col("trend"))
    )
    got2 = {
        r["series"]: r["n"]
        for r in decomposition_strength(df2, ("series",)).collect()
    }
    assert got2["a"] == 7
