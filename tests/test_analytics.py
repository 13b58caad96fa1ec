"""Funnel analysis and cohort retention."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from healthcare_api_spark.operators.analytics import cohort_retention, funnel_counts


def _ev(spark, rows):
    return spark.createDataFrame(rows, ["user_id", "event_type", "ts"]).withColumn(
        "ts", F.to_timestamp("ts")
    )


def test_funnel_strict_ordering(spark):
    ev = _ev(spark, [
        (1, "signup", "2024-01-01 10:00:00"),
        (1, "click", "2024-01-01 11:00:00"),
        (1, "purchase", "2024-01-01 12:00:00"),   # full funnel
        (2, "signup", "2024-01-02 10:00:00"),
        (2, "click", "2024-01-02 11:00:00"),      # no purchase
        (3, "click", "2024-01-03 09:00:00"),
        (3, "signup", "2024-01-03 10:00:00"),     # click BEFORE signup: stage 2 not reached
        (3, "purchase", "2024-01-03 11:00:00"),   # purchase without click-after-signup
    ])
    out = {r["stage"]: r["users"] for r in funnel_counts(
        ev, "user_id", "event_type", "ts", ["signup", "click", "purchase"]).collect()}
    assert out == {"signup": 3, "click": 2, "purchase": 1}


def test_funnel_empty_stages_raises(spark):
    with pytest.raises(ValueError, match="non-empty"):
        funnel_counts(_ev(spark, [(1, "a", "2024-01-01 00:00:00")]),
                      "user_id", "event_type", "ts", [])


def test_cohort_retention_triangle(spark):
    ev = _ev(spark, [
        # cohort week of 2024-01-01: users 1, 2
        (1, "x", "2024-01-02 10:00:00"),
        (2, "x", "2024-01-03 10:00:00"),
        (1, "x", "2024-01-09 10:00:00"),   # user 1 returns in week +1
        (1, "x", "2024-01-10 10:00:00"),   # same week: counted once
        # cohort week of 2024-01-08: user 3
        (3, "x", "2024-01-08 10:00:00"),
    ])
    out = {(str(r["cohort"]), r["offset"]): r["active_users"]
           for r in cohort_retention(ev, "user_id", "ts", period="week").collect()}
    assert out[("2024-01-01 00:00:00", 0)] == 2
    assert out[("2024-01-01 00:00:00", 1)] == 1
    assert out[("2024-01-08 00:00:00", 0)] == 1
    assert ("2024-01-08 00:00:00", 1) not in out

    with pytest.raises(ValueError, match="unsupported period"):
        cohort_retention(ev, "user_id", "ts", period="month")


def test_funnel_counts_monotone_nonincreasing(spark):
    """Structural invariant: stage k's user count can never exceed stage
    k-1's (each entry requires a prior-stage entry)."""
    import random

    rng = random.Random(5)
    types = ["signup", "click", "purchase", "other"]
    rows = [
        (rng.randrange(30), rng.choice(types),
         f"2024-01-{rng.randrange(1, 28):02d} {rng.randrange(24):02d}:00:00")
        for _ in range(400)
    ]
    out = funnel_counts(
        _ev(spark, rows), "user_id", "event_type", "ts", ["signup", "click", "purchase"]
    ).collect()
    users = [r["users"] for r in sorted(out, key=lambda r: r["stage_idx"])]
    assert users == sorted(users, reverse=True)


def test_drift_psi_detects_shift(spark):
    from healthcare_api_spark.operators.analytics import drift_psi

    base = spark.range(5000).selectExpr("CAST(id % 100 AS DOUBLE) AS v")
    same = spark.range(5000).selectExpr("CAST((id + 7) % 100 AS DOUBLE) AS v")
    shifted = spark.range(5000).selectExpr("CAST(id % 100 + 40 AS DOUBLE) AS v")
    stable = drift_psi(base, same, "v", 0.0, 100.0, 20).collect()[0]
    drifted = drift_psi(base, shifted, "v", 0.0, 100.0, 20).collect()[0]
    assert stable["n_a"] == stable["n_b"] == 5000
    # identical uniform distributions → PSI ~ 0; 40-point shift pushes
    # 40% of mass into overflow → PSI far above the 0.25 action line
    assert stable["psi"] < 0.01
    assert drifted["psi"] > 0.25


def test_drift_psi_hand_computed_literal(spark):
    """u11-lesson retro (VERDICT r8 task #4): a literal PSI derived by
    hand. A = 3 values in bucket 0, B = 1 value in bucket 1, bins=2 →
    smoothed proportions p_a = (4/5, 1/5), p_b = (1/3, 2/3);
    PSI = (1/3 − 4/5)·ln(5/12) + (2/3 − 1/5)·ln(10/3)
        = (7/15)·ln(12/5) + (7/15)·ln(10/3) = (7/15)·ln 8 = (7/5)·ln 2."""
    import math

    from healthcare_api_spark.operators.analytics import drift_psi

    a = spark.createDataFrame([(0.5,), (0.5,), (0.5,)], ["v"])
    b = spark.createDataFrame([(1.5,)], ["v"])
    row = drift_psi(a, b, "v", 0.0, 2.0, 2).collect()[0]
    assert row["n_a"] == 3 and row["n_b"] == 1
    assert row["psi"] == round(7.0 / 5.0 * math.log(2.0), 6)


# ------------------------------------------- incremental agg maintenance --


def test_agg_state_merge_equals_full(spark):
    from pyspark.sql import functions as F

    from healthcare_api_spark.operators.relational import (
        agg_state,
        finalize_avg,
        merge_agg_state,
    )

    rows = [(k % 5, float(k), k) for k in range(100)]
    df = spark.createDataFrame(rows, ["k", "v", "i"])
    specs = {"v": ["sum", "count"], "i": "max"}
    a = agg_state(df.filter("i < 60"), ["k"], specs)
    b = agg_state(df.filter("i >= 60"), ["k"], specs)
    merged = merge_agg_state(a, b, ["k"], specs)
    full = agg_state(df, ["k"], specs)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))
    # avg finalization
    got = {r["k"]: r["v_avg"] for r in finalize_avg(merged, "v").collect()}
    want = {
        r["k"]: r["a"]
        for r in df.groupBy("k").agg(F.avg("v").alias("a")).collect()
    }
    assert got == want


def test_agg_state_min_max_merge(spark):
    from healthcare_api_spark.operators.relational import agg_state, merge_agg_state

    df = spark.createDataFrame([(1, 5), (1, -3), (2, 9)], ["k", "v"])
    specs = {"v": "min"}
    m = merge_agg_state(
        agg_state(df.filter("v > 0"), ["k"], specs),
        agg_state(df.filter("v <= 0"), ["k"], specs),
        ["k"],
        specs,
    )
    assert {r["k"]: r["v_min"] for r in m.collect()} == {1: -3, 2: 9}


def test_agg_state_rejects_non_mergeable(spark):
    import pytest as _pytest

    from healthcare_api_spark.operators.relational import agg_state

    df = spark.createDataFrame([(1, 2)], ["k", "v"])
    with _pytest.raises(ValueError):
        agg_state(df, ["k"], {"v": "avg"})


def test_equi_depth_histogram_balanced_bins(spark):
    from healthcare_api_spark.operators.relational import equi_depth_histogram

    df = spark.createDataFrame([(float(i),) for i in range(100)], ["v"])
    out = {r["bin"]: r["cnt"] for r in equi_depth_histogram(df, "v", bins=4).collect()}
    # uniform data → 4 bins of 25 each
    assert out == {0: 25, 1: 25, 2: 25, 3: 25}


def test_equi_depth_histogram_adapts_to_skew(spark):
    from healthcare_api_spark.operators.relational import equi_depth_histogram

    # 90% of mass at v=0; a fixed-range histogram would put 90% in bin 0
    rows = [(0.0,)] * 90 + [(float(i),) for i in range(1, 11)]
    out = {r["bin"]: r["cnt"] for r in
           equi_depth_histogram(spark.createDataFrame(rows, ["v"]), "v", bins=4).collect()}
    # all the zeros collapse into bin 0 (edges are also 0 → strict >)
    assert out[0] == 90 and sum(out.values()) == 100


def test_equi_depth_histogram_rejects_one_bin(spark):
    import pytest as _pytest

    from healthcare_api_spark.operators.relational import equi_depth_histogram

    df = spark.createDataFrame([(1.0,)], ["v"])
    with _pytest.raises(ValueError):
        equi_depth_histogram(df, "v", bins=1)


def _baskets(spark, rows):
    return spark.createDataFrame(rows, ["basket", "item"])


def test_co_occurrence_hand_example(spark):
    from healthcare_api_spark.operators.analytics import co_occurrence

    df = _baskets(spark, [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "b"), (3, "c"),
        (3, "c"),  # duplicate item in basket counted once
    ])
    out = {
        (r["item_a"], r["item_b"]): r["n_baskets"]
        for r in co_occurrence(df, "basket", "item", min_support=2).collect()
    }
    assert out == {("a", "b"): 3, ("a", "c"): 2, ("b", "c"): 2}


def test_co_occurrence_min_support_prune_is_lossless(spark):
    from healthcare_api_spark.operators.analytics import co_occurrence

    # rare items ("x" appears once) are pruned before the pair join but
    # could never reach min_support anyway — outputs must be identical
    rows = [
        (1, "a"), (1, "b"), (1, "x"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "b"), (3, "y"),
    ]
    df = _baskets(spark, rows)
    got = sorted(
        map(tuple, co_occurrence(df, "basket", "item", min_support=3).collect())
    )
    # brute-force reference without any prune
    brute = {}
    baskets = {}
    for o, i in rows:
        baskets.setdefault(o, set()).add(i)
    for items in baskets.values():
        s = sorted(items)
        for ai in range(len(s)):
            for bi in range(ai + 1, len(s)):
                brute[(s[ai], s[bi])] = brute.get((s[ai], s[bi]), 0) + 1
    want = sorted((a, b, n) for (a, b), n in brute.items() if n >= 3)
    assert got == want == [("a", "b", 3)]


def test_co_occurrence_max_basket_raise_and_drop(spark):
    from healthcare_api_spark.operators.analytics import co_occurrence

    big = [(99, f"i{k}") for k in range(50)]
    small = [(1, "a"), (1, "b"), (2, "a"), (2, "b")]
    df = _baskets(spark, small + big)
    with pytest.raises(RuntimeError, match="max_basket"):
        co_occurrence(df, "basket", "item", min_support=1, max_basket=10)
    # drop mode: the pathological basket is excluded, the rest intact
    out = {
        (r["item_a"], r["item_b"]): r["n_baskets"]
        for r in co_occurrence(
            df, "basket", "item", min_support=2, max_basket=10, on_exceed="drop"
        ).collect()
    }
    assert out == {("a", "b"): 2}


def test_co_occurrence_rejects_bad_args(spark):
    from healthcare_api_spark.operators.analytics import co_occurrence

    df = _baskets(spark, [(1, "a")])
    with pytest.raises(ValueError):
        co_occurrence(df, "basket", "item", min_support=0)
    with pytest.raises(ValueError):
        co_occurrence(df, "basket", "item", on_exceed="maybe")


def test_sessionize_gap_semantics(spark):
    """Strictly-greater-than-gap starts a new session; an exact-gap
    event stays; same-timestamp ties share a session; numbering is
    1-based per key in time order."""
    from pyspark.sql import functions as F

    from healthcare_api_spark.operators.analytics import (
        session_stats,
        sessionize,
    )

    rows = [
        # user 1: s1 = {10:00, 10:30 (exactly 30min -> same)},
        #         s2 = {11:00:01 (30min+1s after 10:30 -> new), 11:05}
        (1, "2024-01-01 10:00:00"),
        (1, "2024-01-01 10:30:00"),
        (1, "2024-01-01 11:00:01"),
        (1, "2024-01-01 11:05:00"),
        # user 2: tied timestamps -> one session
        (2, "2024-01-01 09:00:00"),
        (2, "2024-01-01 09:00:00"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"]).withColumn(
        "ts", F.to_timestamp("ts")
    )
    ev = {
        (r["user_id"], str(r["ts"])): r["session_idx"]
        for r in sessionize(df, "user_id", "ts", gap_minutes=30).collect()
    }
    assert ev[(1, "2024-01-01 10:00:00")] == 1
    assert ev[(1, "2024-01-01 10:30:00")] == 1
    assert ev[(1, "2024-01-01 11:00:01")] == 2
    assert ev[(1, "2024-01-01 11:05:00")] == 2
    assert ev[(2, "2024-01-01 09:00:00")] == 1
    st = {
        (r["user_id"], r["session_idx"]): r
        for r in session_stats(df, "user_id", "ts", gap_minutes=30).collect()
    }
    assert st[(1, 1)]["n_events"] == 2 and st[(1, 1)]["duration_sec"] == 1800
    assert st[(1, 2)]["n_events"] == 2
    assert st[(1, 2)]["session_start"] == "2024-01-01 11:00:01"
    assert st[(2, 1)]["n_events"] == 2 and st[(2, 1)]["duration_sec"] == 0
    import pytest

    with pytest.raises(ValueError):
        sessionize(df, "user_id", "ts", gap_minutes=0)


def test_session_flows_hand_computed(spark):
    """Two sessions -> transitions only WITHIN sessions; probabilities
    normalize per source."""
    from pyspark.sql import functions as F

    from healthcare_api_spark.operators.analytics import session_flows

    rows = [
        # session 1: a -> b -> a   (a->b, b->a)
        (1, "2024-01-01 10:00:00", "a"),
        (1, "2024-01-01 10:01:00", "b"),
        (1, "2024-01-01 10:02:00", "a"),
        # session 2 (gap > 30min): a -> c — no cross-session a->a edge
        (1, "2024-01-01 12:00:00", "a"),
        (1, "2024-01-01 12:01:00", "c"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"]).withColumn(
        "ts", F.to_timestamp("ts")
    )
    got = {
        (r["src"], r["dst"]): (r["n_transitions"], r["prob"])
        for r in session_flows(df, "user_id", "ts", "event_type").collect()
    }
    assert got == {
        ("a", "b"): (1, 0.5),
        ("a", "c"): (1, 0.5),
        ("b", "a"): (1, 1.0),
    }


def _seq_events(spark, rows):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    return df.withColumn("ts", F.to_timestamp("ts"))


def test_sequence_spans_hand_computed_chain(spark):
    from healthcare_api_spark.operators.analytics import sequence_spans

    ev = _seq_events(
        spark,
        [
            ("u1", "2024-01-01 10:00:00", "signup"),
            ("u1", "2024-01-01 10:30:00", "click"),
            ("u1", "2024-01-01 09:00:00", "click"),   # before signup: skipped
            ("u1", "2024-01-01 11:00:00", "purchase"),
            ("u2", "2024-01-01 10:00:00", "signup"),  # never completes
            ("u2", "2024-01-01 10:05:00", "purchase"),
        ],
    )
    got = sequence_spans(
        ev, "user_id", "ts", "event_type", ["signup", "click", "purchase"]
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert r["user_id"] == "u1"
    assert str(r["ts_2"]).startswith("2024-01-01 10:30")  # earliest AFTER start
    assert r["span_us"] == 3600 * 1_000_000


def test_sequence_spans_earliest_continuation_and_within(spark):
    from healthcare_api_spark.operators.analytics import sequence_spans

    ev = _seq_events(
        spark,
        [
            ("u1", "2024-01-01 10:00:00", "signup"),
            ("u1", "2024-01-01 10:10:00", "click"),
            ("u1", "2024-01-01 10:20:00", "click"),   # later click ignored
            ("u1", "2024-01-03 10:00:00", "purchase"),
        ],
    )
    spans = sequence_spans(
        ev, "user_id", "ts", "event_type", ["signup", "click", "purchase"]
    ).collect()
    assert str(spans[0]["ts_2"]).startswith("2024-01-01 10:10")
    bounded = sequence_spans(
        ev, "user_id", "ts", "event_type",
        ["signup", "click", "purchase"], within="1 days",
    ).collect()
    assert bounded == []  # the purchase lands two days out


def test_sequence_spans_distinct_starts_and_validation(spark):
    import pytest

    from healthcare_api_spark.operators.analytics import sequence_spans

    ev = _seq_events(
        spark,
        [
            ("u1", "2024-01-01 10:00:00", "signup"),
            ("u1", "2024-01-01 10:00:00", "signup"),  # duplicate start
            ("u1", "2024-01-01 12:00:00", "signup"),  # second start
            ("u1", "2024-01-01 12:30:00", "click"),
        ],
    )
    got = sequence_spans(
        ev, "user_id", "ts", "event_type", ["signup", "click"]
    ).collect()
    # duplicate (key, ts_1) collapses; both distinct starts chase the
    # same later click
    assert len(got) == 2
    assert all(str(r["ts_2"]).startswith("2024-01-01 12:30") for r in got)
    with pytest.raises(ValueError):
        sequence_spans(ev, "user_id", "ts", "event_type", ["signup"])


def test_touch_attribution_hand_computed(spark):
    """User 1: ad -> email -> purchase(10.50) => first=ad, last=email.
    User 2: purchase first (no touch) => '(none)'. User 3: click ->
    purchase -> click -> purchase: second purchase's touches ignore
    the intervening purchase row but see both clicks."""
    from datetime import datetime

    from healthcare_api_spark.operators.analytics import touch_attribution

    def t(m):
        return datetime(2024, 1, 1, 10, m)

    rows = [
        (1, t(0), "ad", 0.0), (1, t(1), "email", 0.0),
        (1, t(2), "purchase", 10.50),
        (2, t(0), "purchase", 5.0),
        (3, t(0), "click", 0.0), (3, t(1), "purchase", 1.0),
        (3, t(2), "click", 0.0), (3, t(3), "purchase", 2.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string, value double"
    )
    got = {
        r["touch_type"]: (
            r["first_touch"], r["last_touch"], r["last_touch_value_cents"]
        )
        for r in touch_attribution(
            df, "user_id", "ts", "event_type", "purchase", value_col="value"
        ).collect()
    }
    # first touches: user1 ad, user2 none, user3 click (both purchases)
    # last touches: user1 email, user2 none, user3 click (both)
    assert got["ad"] == (1, 0, 0)
    assert got["email"] == (0, 1, 1050)
    assert got["(none)"] == (1, 1, 500)
    assert got["click"] == (2, 2, 300)


def test_touch_lag_quantiles_hand_computed(spark):
    """Lags for 'click' conversions: [60s, 120s, 180s] micros ->
    p50 = 120e6 exactly, p90 interpolated between 120e6 and 180e6 at
    fraction 0.8 -> 168e6. No-touch conversions are excluded."""
    from datetime import datetime

    from healthcare_api_spark.operators.analytics import touch_lag_quantiles

    def t(m, s=0):
        return datetime(2024, 1, 1, 10, m, s)

    rows = [
        (1, t(0), "click"), (1, t(1), "purchase"),      # lag 60 s
        (2, t(0), "click"), (2, t(2), "purchase"),      # lag 120 s
        (3, t(0), "click"), (3, t(3), "purchase"),      # lag 180 s
        (4, t(0), "purchase"),                          # no touch
        (5, t(0), "ad"), (5, t(0, 30), "purchase"),     # ad lag 30 s
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, event_type string")
    got = {
        r["touch_type"]: (r["n"], r["lag_p50"], r["lag_p90"])
        for r in touch_lag_quantiles(
            df, "user_id", "ts", "event_type", "purchase"
        ).collect()
    }
    assert got["click"] == (3, 120_000_000.0, 168_000_000.0)
    assert got["ad"] == (1, 30_000_000.0, 30_000_000.0)
    assert "(none)" not in got and len(got) == 2


def test_multi_touch_attribution_hand_computed(spark):
    """User 1 path 0: ad (lag 2h -> k=2, num 2^60) + email (lag 1h ->
    k=1, num 2^61); D = 3*2^60 -> decay ad 333333, email 666667; linear
    500000 each. Path 1: single ad -> 1e6 both models. User 2:
    pathless purchase -> '(none)' 1e6."""
    from datetime import datetime

    from healthcare_api_spark.operators.analytics import (
        multi_touch_attribution,
    )

    def t(h):
        return datetime(2024, 1, 1, h)

    rows = [
        (1, t(0), "ad"), (1, t(1), "email"), (1, t(2), "purchase"),
        (1, t(3), "ad"), (1, t(4), "purchase"),
        (2, t(0), "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string"
    )
    got = {
        r["touch_type"]: (
            r["n_touches"], r["paths_touched"],
            r["linear_credit_ppm"], r["decay_credit_ppm"],
        )
        for r in multi_touch_attribution(
            df, "user_id", "ts", "event_type", "purchase",
            halflife="1 hour",
        ).collect()
    }
    assert got["ad"] == (2, 2, 1_500_000, 1_333_333)
    assert got["email"] == (1, 1, 500_000, 666_667)
    assert got["(none)"] == (0, 1, 1_000_000, 1_000_000)
    assert len(got) == 3


def test_multi_touch_same_timestamp_tie_rule(spark):
    """ROW-precedence tie rule (documented, ADVICE r10): a touch at the
    SAME microsecond as the conversion is on the path iff its type
    sorts before convert_type — 'aa' < 'purchase' counts with lag 0
    (full decay weight); 'zz' > 'purchase' does not."""
    from datetime import datetime

    from healthcare_api_spark.operators.analytics import (
        multi_touch_attribution,
    )

    t0 = datetime(2024, 1, 1, 10)
    df = spark.createDataFrame(
        [(1, t0, "aa"), (1, t0, "purchase"), (2, t0, "zz"),
         (2, t0, "purchase")],
        "user_id bigint, ts timestamp, event_type string",
    )
    got = {
        r["touch_type"]: (r["linear_credit_ppm"], r["decay_credit_ppm"])
        for r in multi_touch_attribution(
            df, "user_id", "ts", "event_type", "purchase"
        ).collect()
    }
    assert got["aa"] == (1_000_000, 1_000_000)
    assert "zz" not in got
    assert got["(none)"] == (1_000_000, 1_000_000)  # user 2's purchase


def test_multi_touch_trailing_touches_uncredited(spark):
    """Touches after the key's LAST conversion credit nothing; a
    nonpositive halflife raises."""
    from datetime import datetime

    import pytest

    from healthcare_api_spark.operators.analytics import (
        multi_touch_attribution,
    )

    def t(h):
        return datetime(2024, 1, 1, h)

    df = spark.createDataFrame(
        [(1, t(0), "ad"), (1, t(1), "purchase"), (1, t(2), "late_ad")],
        "user_id bigint, ts timestamp, event_type string",
    )
    got = {
        r["touch_type"]: r["linear_credit_ppm"]
        for r in multi_touch_attribution(
            df, "user_id", "ts", "event_type", "purchase"
        ).collect()
    }
    assert got == {"ad": 1_000_000}
    with pytest.raises(ValueError):
        multi_touch_attribution(
            df, "user_id", "ts", "event_type", "purchase", halflife="0 sec"
        )


def test_touch_report_equals_w15_join_w16(spark):
    """The single-pass composition must equal touch_attribution ⋈
    touch_lag_quantiles column-for-column (retires VERDICT r10
    'wrong' #4 — the duplicated corpus window pass)."""
    from datetime import datetime, timedelta

    from healthcare_api_spark.operators.analytics import (
        touch_attribution,
        touch_lag_quantiles,
        touch_report,
    )

    base = datetime(2024, 1, 1)
    rows = []
    for u in range(40):
        ts = base + timedelta(minutes=u)
        kinds = ["ad", "email", "click", "purchase", "ad", "purchase"]
        for i, k in enumerate(kinds[: 3 + u % 4]):
            rows.append((u, ts + timedelta(seconds=37 * i + u), k, 1.25 * i))
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string, value double"
    )
    args = (df, "user_id", "ts", "event_type", "purchase")
    rep = {
        r["touch_type"]: r.asDict()
        for r in touch_report(*args, value_col="value").collect()
    }
    w15 = {
        r["touch_type"]: r.asDict()
        for r in touch_attribution(*args, value_col="value").collect()
    }
    w16 = {
        r["touch_type"]: r.asDict()
        for r in touch_lag_quantiles(*args).collect()
    }
    assert set(rep) == set(w15)
    for tp, row in rep.items():
        for c in ("first_touch", "last_touch", "last_touch_value_cents"):
            assert row[c] == w15[tp][c], (tp, c)
        if tp in w16:
            assert row["lag_p50"] == w16[tp]["lag_p50"], tp
            assert row["lag_p90"] == w16[tp]["lag_p90"], tp
        else:
            assert row["lag_p50"] is None and row["lag_p90"] is None


def test_position_attribution_hand_computed(spark):
    """U-shaped 40/40/20: path ad,email,click,ad -> purchase (n=4):
    first 'ad' 400k, last 'ad' 400k, middles email+click 100k each
    (200k/2) -> ad 800k. Two-touch path: 50/50. One-touch: 100%.
    Pathless -> '(none)' 1e6."""
    from datetime import datetime

    from healthcare_api_spark.operators.analytics import position_attribution

    def t(m):
        return datetime(2024, 1, 1, 10, m)

    rows = [
        # user 1: 4-touch path
        (1, t(0), "ad"), (1, t(1), "email"), (1, t(2), "click"),
        (1, t(3), "ad"), (1, t(4), "purchase"),
        # user 2: 2-touch path (email, click)
        (2, t(0), "email"), (2, t(1), "click"), (2, t(2), "purchase"),
        # user 3: single touch
        (3, t(0), "click"), (3, t(1), "purchase"),
        # user 4: pathless
        (4, t(0), "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string"
    )
    got = {
        r["touch_type"]: (
            r["n_touches"], r["paths_touched"], r["position_credit_ppm"]
        )
        for r in position_attribution(
            df, "user_id", "ts", "event_type", "purchase"
        ).collect()
    }
    assert got["ad"] == (2, 1, 800_000)
    assert got["email"] == (2, 2, 600_000)   # 100k (middle) + 500k (first of 2)
    assert got["click"] == (3, 3, 1_600_000)  # 100k + 500k + 1e6
    assert got["(none)"] == (0, 1, 1_000_000)
    # per-path credit sums to ~1e6 each (4 paths incl. none)
    assert sum(v[2] for v in got.values()) == 4_000_000


def test_position_attribution_middle_rounding_per_type(spark):
    """Middle credit rounds ONCE per (path, type) — half_up(200000·m/
    (n−2)) — so same-type middles don't accumulate rounding error:
    path 2's three 'm' middles get exactly 200000 together, while
    path 3's three DIFFERENT-type middles each get half_up(200000/3)
    = 66667 (sum 200001, the documented 1-ppm half-up overshoot,
    mirrored in the oracle)."""
    from datetime import datetime

    from healthcare_api_spark.operators.analytics import position_attribution

    def t(m):
        return datetime(2024, 1, 1, 10, m)

    rows = [
        (1, t(0), "a"), (1, t(1), "m"), (1, t(2), "z"), (1, t(3), "purchase"),
        (2, t(0), "a"), (2, t(1), "m"), (2, t(2), "m"), (2, t(3), "m"),
        (2, t(4), "z"), (2, t(5), "purchase"),
        (3, t(0), "a"), (3, t(1), "m1"), (3, t(2), "m2"), (3, t(3), "m3"),
        (3, t(4), "z"), (3, t(5), "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string"
    )
    got = {
        r["touch_type"]: r["position_credit_ppm"]
        for r in position_attribution(
            df, "user_id", "ts", "event_type", "purchase"
        ).collect()
    }
    assert got["a"] == 1_200_000          # first of all three paths
    assert got["z"] == 1_200_000          # last of all three paths
    assert got["m"] == 200_000 + 200_000  # full middle + 3-of-a-kind exact
    assert got["m1"] == got["m2"] == got["m3"] == 66_667


def test_rfm_segments_hand_computed(spark):
    """Five purchasers with strictly increasing f and m and strictly
    DECREASING freshness land on the grid diagonal: thresholds at
    p20/40/60/80 of {1..5}-like metrics put exactly one user per
    score; non-purchasers and non-purchase events are excluded."""
    from datetime import datetime, timedelta

    from healthcare_api_spark.operators.analytics import rfm_segments

    base = datetime(2024, 1, 1)
    rows = []
    for u in range(1, 6):
        # user u: u purchases of 10*u each; last purchase u-1 days
        # before the corpus max ts (user 5 freshest? no — user 1 is
        # (5-1) days stale ... make user u's last purchase (5-u) days
        # before max, so higher u = fresher = higher r_score)
        for k in range(u):
            rows.append(
                (u, base + timedelta(days=30 - (5 - u), hours=-k),
                 "purchase", 10.0 * u)
            )
    rows.append((99, base + timedelta(days=30), "click", 0.0))  # corpus max
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string, value double"
    )
    got = {
        (r["r_score"], r["f_score"], r["m_score"]): (
            r["n_users"], r["total_cents"]
        )
        for r in rfm_segments(
            df, "user_id", "ts", "event_type", "purchase", "value"
        ).collect()
    }
    # user u: recency rank u (fresher = higher score), f = u, m = u·u·1000
    assert got == {
        (1, 1, 1): (1, 1000),
        (2, 2, 2): (1, 4000),
        (3, 3, 3): (1, 9000),
        (4, 4, 4): (1, 16000),
        (5, 5, 5): (1, 25000),
    }


def test_attribution_credit_conservation_random(spark):
    """Invariant over a seeded random event stream: every conversion
    distributes exactly 1,000,000 ppm per model, up to the documented
    per-(path,type) half-up rounding — so each model's global credit
    sum lies within ±(credited path×type rows)/2 ppm of 1e6 × paths,
    and '(none)' rows are exact. Pins w17 (linear + decay) and w18
    (position) against drift in the path machinery."""
    import random
    from datetime import datetime, timedelta

    from healthcare_api_spark.operators.analytics import (
        multi_touch_attribution,
        position_attribution,
    )

    rng = random.Random(11)
    base = datetime(2024, 1, 1)
    types = ["ad", "email", "click", "social", "purchase"]
    rows = [
        (rng.randrange(40),
         base + timedelta(minutes=rng.randrange(10_000)),
         rng.choice(types))
        for _ in range(1200)
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string"
    )
    w17 = multi_touch_attribution(
        df, "user_id", "ts", "event_type", "purchase"
    ).collect()
    w18 = position_attribution(
        df, "user_id", "ts", "event_type", "purchase"
    ).collect()
    paths17 = sum(r["paths_touched"] for r in w17 if r["touch_type"] == "(none)")
    # credited (path, type) rows bound the half-up deviation
    rows17 = sum(r["paths_touched"] for r in w17 if r["touch_type"] != "(none)")
    # total conversions = credited paths + pathless paths; recompute
    # credited paths exactly: every credited path has ≥1 type row but
    # paths_touched counts (path, type) pairs — use the conversions
    # count from the frame itself for the exact total
    n_conv = df.filter("event_type = 'purchase'").count()
    for col in ("linear_credit_ppm", "decay_credit_ppm"):
        total = sum(r[col] for r in w17)
        assert abs(total - 1_000_000 * n_conv) <= rows17, col
    total18 = sum(r["position_credit_ppm"] for r in w18)
    rows18 = sum(r["paths_touched"] for r in w18 if r["touch_type"] != "(none)")
    assert abs(total18 - 1_000_000 * n_conv) <= rows18
    # both models agree on the pathless count
    none18 = [r for r in w18 if r["touch_type"] == "(none)"]
    assert none18 and none18[0]["paths_touched"] == paths17


def test_hazard_table_hand_computed(spark):
    """u1 converts day 0, u2 day 2, u3 never (censored at the corpus
    max, day 4): at_risk 3/2/1, hazards 333333/500000/0; per-day
    exits leave the risk set AFTER their day (standard KM)."""
    from datetime import datetime, timedelta

    from healthcare_api_spark.operators.analytics import hazard_table

    d0 = datetime(2024, 1, 1)

    def d(n, h=0):
        return d0 + timedelta(days=n, hours=h)

    rows = [
        (1, d(0), "visit"), (1, d(0, 2), "purchase"),
        (2, d(0), "visit"), (2, d(2), "purchase"),
        (3, d(0), "visit"), (3, d(4), "visit"),   # corpus max, censored
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string"
    )
    got = {
        r["day"]: (
            r["at_risk"], r["events"], r["censored"], r["hazard_ppm"]
        )
        for r in hazard_table(
            df, "user_id", "ts", "event_type", "purchase"
        ).collect()
    }
    assert got == {
        0: (3, 1, 0, 333_333),
        2: (2, 1, 0, 500_000),
        4: (1, 0, 1, 0),
    }


def test_multi_touch_lookback_window(spark):
    """Attribution window: a touch older than `lookback` falls off the
    path — shrinking n for BOTH models — and a conversion whose whole
    path ages out credits '(none)'. Unbounded default unchanged."""
    from datetime import datetime

    import pytest

    from healthcare_api_spark.operators.analytics import (
        multi_touch_attribution,
    )

    def t(h):
        return datetime(2024, 1, 1, h)

    rows = [
        # u1: old ad (5h before) + fresh email (1h) -> purchase
        (1, t(0), "ad"), (1, t(4), "email"), (1, t(5), "purchase"),
        # u2: only an old touch (6h before) -> purchase ages out
        (2, t(0), "ad"), (2, t(6), "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string"
    )
    args = (df, "user_id", "ts", "event_type", "purchase")
    unbounded = {
        r["touch_type"]: r["linear_credit_ppm"]
        for r in multi_touch_attribution(*args).collect()
    }
    assert unbounded == {"ad": 1_500_000, "email": 500_000}
    capped = {
        r["touch_type"]: (r["n_touches"], r["linear_credit_ppm"])
        for r in multi_touch_attribution(
            *args, lookback="2 hours"
        ).collect()
    }
    # u1's ad aged out -> email takes the whole conversion; u2's path
    # emptied -> '(none)'
    assert capped == {"email": (1, 1_000_000), "(none)": (0, 1_000_000)}
    with pytest.raises(ValueError, match="positive"):
        multi_touch_attribution(*args, lookback="0 seconds")


def test_markov_attribution_hand_computed(spark):
    """w21 (r12): removal effects on a 3-user chain computed by hand.
    Matrix: (start)->ad x2, (start)->email x1; ad->(conv) 1,
    ad->(null) 1; email->(conv) 1. Full absorption from start is
    half_up((2*500000 + 1000000)/3) = 666667 ppm; removing either
    channel leaves half_up of the other's 1e6/3 = 333333, so both
    removal effects are 333334 -> 500001 of p_full, exactly 500000
    of the normalized credit each."""
    from datetime import datetime

    from healthcare_api_spark.operators.analytics import markov_attribution

    def t(h):
        return datetime(2024, 1, 1, h)

    rows = [
        (1, t(0), "ad"), (1, t(1), "purchase"),
        (2, t(0), "email"), (2, t(1), "purchase"),
        (3, t(0), "ad"),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string"
    )
    got = {
        r["touch_type"]: (
            r["p_full_ppm"], r["p_drop_ppm"],
            r["removal_effect_ppm"], r["credit_ppm"],
        )
        for r in markov_attribution(
            df, "user_id", "ts", "event_type", "purchase"
        ).collect()
    }
    assert got == {
        "ad": (666_667, 333_333, 500_001, 500_000),
        "email": (666_667, 333_333, 500_001, 500_000),
    }


def test_markov_attribution_mid_path_and_guard(spark):
    """A two-hop chain (ad -> email -> purchase): removing email must
    cost MORE than removing ad only if email is the bottleneck; here
    every path converts through email, so removing it zeroes
    conversion (removal effect 1e6), while removing ad leaves the
    email-only path intact. iters guard raises."""
    from datetime import datetime

    import pytest as _pytest

    from healthcare_api_spark.operators.analytics import markov_attribution

    def t(h):
        return datetime(2024, 1, 1, h)

    rows = [
        (1, t(0), "ad"), (1, t(1), "email"), (1, t(2), "purchase"),
        (2, t(0), "email"), (2, t(1), "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string"
    )
    got = {
        r["touch_type"]: (r["p_drop_ppm"], r["removal_effect_ppm"])
        for r in markov_attribution(
            df, "user_id", "ts", "event_type", "purchase"
        ).collect()
    }
    # full: both users convert -> p_full = 1e6 exactly
    assert got["email"] == (0, 1_000_000)
    # removing ad: (start)->ad mass is lost, email-only path survives:
    # p = half_up(1e6/2) = 500000 -> effect 500000
    assert got["ad"] == (500_000, 500_000)
    with _pytest.raises(ValueError, match="iters"):
        markov_attribution(
            df, "user_id", "ts", "event_type", "purchase", iters=0
        )


def test_multi_touch_value_hand_computed(spark):
    """w22 (r12): each conversion's OWN cents split across its path —
    per-(path,type) half-up shares, '(none)' keeps full cents."""
    from datetime import datetime

    from healthcare_api_spark.operators.analytics import multi_touch_value

    def t(h, m=0):
        return datetime(2024, 1, 1, h, m)

    rows = [
        # u1: ad (2 half-lives) + email (1) -> $3.00 purchase
        (1, t(8), "ad", 0.0), (1, t(9), "email", 0.0),
        (1, t(10), "purchase", 3.0),
        # u2: pathless $1.23 purchase -> (none)
        (2, t(9), "purchase", 1.23),
        # u3: single ad 30min before a 1-cent purchase (k=0, full)
        (3, t(8), "ad", 0.0), (3, t(8, 30), "purchase", 0.01),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string, value double"
    )
    got = {
        r["touch_type"]: tuple(r)[1:]
        for r in multi_touch_value(
            df, "user_id", "ts", "event_type", "purchase", "value",
            halflife="1 hour",
        ).collect()
    }
    # u1 decay: ad 2^60 / (3·2^60) of 300 = 100; email 2/3 of 300 = 200
    assert got == {
        "ad": (2, 2, 151, 101),
        "email": (1, 1, 150, 200),
        "(none)": (0, 1, 123, 123),
    }


def test_markov_credit_driver_cap_boundary(spark):
    """r13 (VERDICT r12 #7): matrices at or under
    ``max_driver_matrix_rows`` take the exact-integer driver fixed
    point; one row over falls back to the distributed rounds — and both
    paths produce IDENTICAL rows (the bit-for-bit twin contract)."""
    from healthcare_api_spark.operators.analytics import (
        markov_credit_from_transitions,
    )

    rows = [("(start)", "a", 3), ("a", "(conv)", 2), ("a", "(null)", 1),
            ("(start)", "b", 1), ("b", "a", 1)]
    tr = spark.createDataFrame(rows, "src string, dst string, n bigint")

    def got(cap):
        return sorted(
            tuple(r)
            for r in markov_credit_from_transitions(
                tr, iters=8, max_driver_matrix_rows=cap
            ).collect()
        )

    driver = got(len(rows))          # at the cap -> driver path
    distributed = got(len(rows) - 1)  # one over -> distributed rounds
    assert driver == distributed
    assert len(driver) == 2  # channels a and b
