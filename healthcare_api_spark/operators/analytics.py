"""Behavioral-analytics operators over event streams (SURVEY.md §2.5
window family, applied): funnel analysis and cohort retention — the two
queries every product-analytics engine ships first.

Both are pure aggregations keyed by the user: at 100 TB they shuffle
once per stage on ``user_col`` with map-side partial aggregation, and
the final outputs are tiny (stages × 1 or cohorts × offsets rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_minutes: int = 30,
) -> DataFrame:
    """Batch sessionization (gaps-and-islands): assign every event a
    per-key ``session_idx``, where a NEW session starts when the gap
    to the previous event strictly exceeds ``gap_minutes`` — the
    batch twin of the streaming session window (st2), and the op
    behind every DAU/engagement metric.

    The gap test runs on EXACT epoch microseconds (integer compare —
    no float, no truncation), so the flags and the running-sum session
    numbering are engine-portable. Same-timestamp ties are safe by
    construction: tied events have gap 0 (same session), and the
    running sum uses the default RANGE frame, so every tied row sees
    the same cumulative break count regardless of physical order.

    One shuffle on ``key_col`` (both windows share the partitioning);
    per-key session numbering never needs a global ordering. A
    pathological mega-key is the standard per-key skew story — split
    by time range and stitch on the boundary sessions.
    """
    if gap_minutes < 1:
        raise ValueError("gap_minutes must be >= 1")
    from pyspark.sql import Window

    gap_us = gap_minutes * 60 * 1_000_000
    # windows partition on the ORIGINAL key attribute (not an alias):
    # downstream per-(key, session_idx) aggregations then satisfy
    # their distribution from this same exchange — one shuffle total
    # (plan-pinned by tests/test_plans.py)
    w = Window.partitionBy(F.col(key_col)).orderBy("_us")
    pts = df.withColumn(
        # NTZ-safe: cast through TIMESTAMP (sessions run UTC, so the
        # wall-clock epoch equals DuckDB's epoch_us of the naive value)
        "_us",
        F.unix_micros(F.col(ts_col).cast("timestamp")),
    )
    brk = F.when(
        F.lag("_us").over(w).isNull()
        | ((F.col("_us") - F.lag("_us").over(w)) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        pts.withColumn("_brk", brk)
        .withColumn("session_idx", F.sum("_brk").over(w).cast("int"))
        .drop("_us", "_brk")
    )


def session_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session rollup of :func:`sessionize`: (key, session_idx,
    session_start, session_end, n_events, duration_sec) — start/end
    formatted to seconds for display, duration computed on exact
    epoch-microsecond bounds with integer floor division."""
    sess = sessionize(df, key_col, ts_col, gap_minutes)
    return (
        sess.groupBy(F.col(key_col), "session_idx")
        .agg(
            F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format(F.max(ts_col), "yyyy-MM-dd HH:mm:ss").alias(
                "session_end"
            ),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.expr(
                f"(max(unix_micros(cast({ts_col} as timestamp)))"
                f" - min(unix_micros(cast({ts_col} as timestamp))))"
                " div 1000000"
            ).cast("bigint").alias("duration_sec"),
        )
    )


def session_flows(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    gap_minutes: int = 30,
) -> DataFrame:
    """First-order transition matrix over sessionized event streams
    (the Markov-flow / Sankey primitive): within each
    :func:`sessionize` session, count consecutive ``state_col``
    transitions, then aggregate globally to (src, dst, n_transitions,
    prob) with ``prob`` = n / Σ_dst n per source, 6 dp.

    Tie discipline: consecutive order inside a session is (epoch
    micros, state) — a total order whenever tied timestamps carry
    distinct states, which makes the transition multiset deterministic
    (same-state ties are interchangeable, so any residual ambiguity
    cannot change counts either).

    Scale shape: the lag runs in the SAME per-key window partitioning
    the sessionizer used (one shuffle on the key), and the global
    matrix is a map-side-combined count over at most |states|² rows.
    """
    from pyspark.sql import Window

    sess = sessionize(df, key_col, ts_col, gap_minutes)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(F.col(key_col), F.col("session_idx")).orderBy(
        us, F.col(state_col)
    )
    steps = sess.select(
        F.lag(F.col(state_col)).over(w).alias("src"),
        F.col(state_col).alias("dst"),
    ).filter(F.col("src").isNotNull())
    counts = steps.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_transitions")
    )
    tot = Window.partitionBy("src")
    return counts.select(
        "src",
        "dst",
        "n_transitions",
        F.round(
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(tot),
            6,
        ).alias("prob"),
    )


def funnel_counts(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    stages: list[str],
) -> DataFrame:
    """Ordered funnel: how many users reached each stage, where stage k
    counts only if it happened strictly AFTER the user's stage-(k-1)
    entry (min-timestamp semantics, the standard product-analytics
    definition). Output: (stage_idx, stage, users), one row per stage.

    Implementation: chained per-stage aggregations — stage k's entry is
    ``min(ts) over stage-k events joined to stage-(k-1) entries with
    ts > prev_entry``. Each pass is a filtered scan + equi-join on the
    user + hash-agg: memory stays bounded regardless of per-user event
    counts (no collect_list — a power user with 10M events would blow
    up any per-user array). After the first shuffle all stages hash on
    ``user_col``, so AQE reuses the partitioning.
    """
    if not stages:
        raise ValueError("stages must be non-empty")
    entries: list[DataFrame] = []
    prev: DataFrame | None = None
    for i, stage in enumerate(stages):
        stage_events = events.filter(F.col(type_col) == stage).select(
            F.col(user_col), F.col(ts_col).alias("_ts")
        )
        if prev is not None:
            stage_events = stage_events.join(prev, user_col).filter(
                F.col("_ts") > F.col("_entry")
            ).select(user_col, "_ts")
        entry = stage_events.groupBy(user_col).agg(F.min("_ts").alias("_entry"))
        # persisted: stage k's entries feed BOTH stage k+1's filter and
        # stage k's own count branch — without the cache the union of
        # counts would recompute the whole chain once per stage (O(k²)
        # scans of the events table)
        entry = entry.persist()
        entries.append(entry)
        prev = entry
    counts = None
    for i, (stage, entry) in enumerate(zip(stages, entries)):
        c = entry.agg(F.count(F.lit(1)).cast("bigint").alias("users")).select(
            F.lit(i).alias("stage_idx"), F.lit(stage).alias("stage"), "users"
        )
        counts = c if counts is None else counts.unionByName(c)
    return counts


def cohort_retention(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    period: str = "week",
    max_offset: int = 8,
) -> DataFrame:
    """Cohort retention triangle: users grouped by their first-activity
    period; for each (cohort, offset) the number of distinct cohort
    users active ``offset`` periods later. Output:
    (cohort, offset, active_users), offsets 0..max_offset.

    Two shuffles: per-user first-activity (agg on user), then the
    (cohort, offset) distinct-user count. Period arithmetic uses
    date_trunc + floor(datediff/len) so cohorts align to calendar
    boundaries.
    """
    days = {"day": 1, "week": 7}.get(period)
    if days is None:
        raise ValueError(f"unsupported period {period!r}; use 'day' or 'week'")
    first = events.groupBy(user_col).agg(
        F.date_trunc(period, F.min(ts_col)).alias("_cohort")
    )
    acts = events.select(
        F.col(user_col), F.date_trunc(period, F.col(ts_col)).alias("_p")
    ).distinct()
    joined = acts.join(first, user_col)
    offset = (F.datediff(F.col("_p"), F.col("_cohort")) / days).cast("int")
    return (
        joined.withColumn("offset", offset)
        .filter((F.col("offset") >= 0) & (F.col("offset") <= max_offset))
        .groupBy(F.col("_cohort").alias("cohort"), "offset")
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


def drift_psi(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    bins: int,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column — the standard distribution-drift gate (PSI < 0.1 stable,
    0.1–0.25 moderate, > 0.25 action). Fixed-range buckets with
    under/overflow, +1 Laplace smoothing so empty buckets contribute a
    finite term (and the math stays engine-exact for the oracle).

    Output: one row — (psi, n_a, n_b). Cost is two O(bins)-output
    histogram aggregates (map-side combined) and an O(bins) join: the
    snapshots never co-shuffle.
    """
    from healthcare_api_spark.operators.relational import histogram

    ha = histogram(df_a, value_col, lo, hi, bins).withColumnRenamed("cnt", "ca")
    hb = histogram(df_b, value_col, lo, hi, bins).withColumnRenamed("cnt", "cb")
    j = ha.join(hb, "bucket", "full_outer").select(
        F.coalesce(F.col("ca"), F.lit(0)).alias("ca"),
        F.coalesce(F.col("cb"), F.lit(0)).alias("cb"),
    )
    # smoothed proportions: (c + 1) / (n + observed_buckets); totals via
    # window-free second aggregate over the tiny bucket frame
    totals = j.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb"),
        F.count(F.lit(1)).alias("nbuckets"),
    )
    t = j.crossJoin(F.broadcast(totals))
    pa = (F.col("ca") + 1).cast("double") / (F.col("na") + F.col("nbuckets"))
    pb = (F.col("cb") + 1).cast("double") / (F.col("nb") + F.col("nbuckets"))
    term = (pb - pa) * F.log(pb / pa)
    return t.agg(
        F.round(F.sum(term), 6).alias("psi"),
        F.max("na").cast("bigint").alias("n_a"),
        F.max("nb").cast("bigint").alias("n_b"),
    )


def co_occurrence(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket: int | None = None,
    on_exceed: str = "raise",
) -> DataFrame:
    """Market-basket pairwise co-occurrence (the pairwise-support core
    of FP-growth): item pairs appearing together in ≥ ``min_support``
    baskets. Output: (item_a, item_b, n_baskets) with item_a < item_b.

    Scale guards — the per-basket pair self-join costs Σ|basket|², and
    AQE cannot split a single join key's OUTPUT, so one pathological
    basket (10⁵ items → 10¹⁰ pairs in one join group) sinks the stage.
    Two defenses, applied BEFORE the pair join:

    1. **Min-support item prune (lossless, always on).** A pair with
       support ≥ s needs both items in ≥ s baskets individually, so
       items below ``min_support`` distinct baskets are dropped up
       front — the classic a-priori/FP-growth prune. On long-tailed
       corpora this removes most of the Σ|basket|² mass without
       changing one output row.
    2. **``max_basket`` cap (opt-in).** After the prune, baskets still
       larger than the cap are handled per ``on_exceed``: ``"raise"``
       (default — surface the pathology), or ``"drop"`` (exclude those
       baskets entirely; documented semantics change, mirrored in the
       oracle with a HAVING-count filter).

    Plan: distinct → two bounded aggregates (map-side combined) → one
    equi-join keyed by basket id → pair count. Never a global cross
    product.
    """
    if min_support < 1:
        raise ValueError("min_support must be ≥ 1")
    if on_exceed not in ("raise", "drop"):
        raise ValueError("on_exceed must be 'raise' or 'drop'")
    from pyspark.sql import Window

    bi = df.select(
        F.col(basket_col).alias("o"), F.col(item_col).alias("i")
    ).distinct()
    # Guards as WINDOW counts, not agg+semi-join round trips: each guard
    # is one shuffle (on i, then on o) instead of an aggregate plus a
    # join back, and the final o-partitioning feeds the pair self-join
    # (both sides are the same subplan → the exchange is reused).
    if min_support > 1:
        # lossless a-priori prune: item must reach min_support on its own
        ni = F.count(F.lit(1)).over(Window.partitionBy("i"))
        bi = bi.withColumn("_ni", ni).filter(
            F.col("_ni") >= min_support
        ).drop("_ni")
    if max_basket is not None:
        sz = F.count(F.lit(1)).over(Window.partitionBy("o"))
        sized = bi.withColumn("_sz", sz)
        if on_exceed == "raise":
            worst = sized.agg(F.max("_sz").alias("m")).head()["m"]
            if worst is not None and worst > max_basket:
                raise RuntimeError(
                    f"co_occurrence: basket of size {worst} exceeds "
                    f"max_basket={max_basket}; the pair join would emit "
                    f"~{worst * (worst - 1) // 2} pairs in ONE join group "
                    f"(AQE cannot split a single key's output). Raise the "
                    f"cap, use on_exceed='drop', or raise min_support."
                )
            bi = sized.drop("_sz")
        else:
            bi = sized.filter(F.col("_sz") <= max_basket).drop("_sz")
    # pin the pruned basket-item set: it feeds BOTH sides of the pair
    # self-join (and the guard count when max_basket raises) — without
    # it each side re-runs the distinct + window prunes (measured: no
    # ReusedExchange under AQE, 2 full scans). Two narrow columns, so
    # the cache is item-pair-key-sized, the same shape the join
    # shuffles anyway.
    bi = bi.localCheckpoint(eager=True)
    a = bi.select("o", F.col("i").alias("item_a"))
    b = bi.select("o", F.col("i").alias("item_b"))
    pairs = a.join(b, "o").filter(F.col("item_a") < F.col("item_b"))
    return (
        pairs.groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_baskets"))
        .filter(F.col("n_baskets") >= min_support)
    )


def sequence_spans(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    pattern: list[str],
    within: str | None = None,
) -> DataFrame:
    """Event-sequence (CEP) matching — the MATCH_RECOGNIZE /
    Flink-CEP primitive: for every occurrence of ``pattern[0]``, chase
    the EARLIEST following occurrence of each subsequent stage for the
    same key (skip-till-next-match semantics, ties at equal
    timestamps are harmless because only the timestamp is carried),
    optionally bounded by ``within`` (total span, first→last stage).

    The insight that keeps this declarative: each stage is ONE
    forward as-of join (temporal.asof_join) — CEP over k stages is
    k−1 as-of joins chained, each a single per-key window pass, never
    a per-row scan loop. Matches are keyed by DISTINCT
    (key, stage-1 ts); later stages are functions of that start, so
    overlapping matches that share a start collapse to one span (the
    deterministic contract an oracle can restate as k−1 min()
    chains).

    Output: (key, ts_1 … ts_k, span_us), completed matches only.

    Convention note: continuations are INCLUSIVE (ts ≥ previous
    stage's ts — the ASOF convention), so a pattern that REPEATS an
    event type can match the same instant twice; use strictly
    increasing timestamps per (key, type) upstream, or distinct
    stage types, when that matters.
    """
    from healthcare_api_spark.operators.temporal import (
        _parse_duration_secs,
        asof_join,
    )

    if len(pattern) < 2:
        raise ValueError("pattern needs at least 2 stages")
    cur = (
        events.filter(F.col(type_col) == pattern[0])
        .select(F.col(key_col).alias("_k"), F.col(ts_col).alias("ts_1"))
        .distinct()
    )
    for i, stage in enumerate(pattern[1:], start=2):
        nxt = events.filter(F.col(type_col) == stage).select(
            F.col(key_col).alias("_k"), F.col(ts_col).alias("_sts")
        )
        cur = asof_join(
            cur,
            nxt,
            "_k",
            f"ts_{i - 1}",
            "_sts",
            ["_sts"],
            direction="forward",
        ).withColumnRenamed("_sts", f"ts_{i}")
        cur = cur.filter(F.col(f"ts_{i}").isNotNull())
    n = len(pattern)
    # exact int64 micros (unix_timestamp floors to seconds, and a
    # floored difference disagrees with a fractional one at the
    # boundary — the hash-portability rule)
    # .cast("timestamp"): unix_micros rejects TIMESTAMP_NTZ, and the
    # repo's parquet loads are NTZ — identity under the UTC session tz
    span = F.unix_micros(
        F.col(f"ts_{n}").cast("timestamp")
    ) - F.unix_micros(F.col("ts_1").cast("timestamp"))
    out = cur.select(
        F.col("_k").alias(key_col),
        *[f"ts_{i}" for i in range(1, n + 1)],
        span.cast("bigint").alias("span_us"),
    )
    if within is not None:
        out = out.filter(
            F.col("span_us") <= _parse_duration_secs(within) * 1_000_000
        )
    return out


def touch_attribution(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    convert_type: str,
    value_col: str | None = None,
) -> DataFrame:
    """First-touch / last-touch conversion attribution (r10): for
    every ``convert_type`` event, credit (a) the EARLIEST and (b) the
    MOST RECENT strictly-preceding non-conversion event of the same
    key, then aggregate per touch type — the marketing-attribution
    primitive beside w5's funnel (which counts a fixed path) and w14's
    CEP (which matches one): attribution asks "which entry point gets
    the credit", per conversion, over ALL entry types at once.

    Declarative shape: ONE window pass per key ordered by (ts, type)
    over the frame [unbounded preceding, current−1) — first touch is
    ``min(struct(ts, type))``, last touch ``max(struct(ts, type))``
    over the same frame (conversion rows excluded from candidacy by a
    WHEN, not a filter, so the frame itself needs no second pass) —
    then one hash aggregate. A conversion with no preceding touch
    (the key's first event) lands in touch_type = '(none)'.

    Exactness: timestamps compare as exact micros; ties at equal ts
    break by type string inside the struct ordering; counts and
    cents sums are BIGINT — hash-portable, no float anywhere.

    Tie rule (explicit, ADVICE r10): "preceding" is ROW-precedence in
    the (ts, type) order, not strict time-precedence — a touch at the
    SAME microsecond as the conversion is credited iff its type string
    sorts before ``convert_type``. Deterministic, mirrored verbatim in
    the DuckDB oracle, and the convention every operator in this
    family (w15/w16/w17) shares; callers who need strictly-earlier
    semantics should pre-bucket timestamps or post-filter on lag > 0.

    Output: (touch_type, first_touch, last_touch,
    last_touch_value_cents) — one row per credited type, full outer
    across the two roles.
    """
    from pyspark.sql import Window

    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    cents = (
        F.round(F.col(value_col).cast("double") * 100).cast("bigint")
        if value_col is not None
        else F.lit(0).cast("bigint")
    )
    ev = events.select(
        F.col(key_col).alias("_k"),
        us.alias("_us"),
        F.col(type_col).alias("_tp"),
        cents.alias("_cents"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_us").asc(), F.col("_tp").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col("_tp") != F.lit(convert_type), F.struct("_us", "_tp")
    )
    conv = ev.select(
        "_k", "_us", "_tp", "_cents",
        F.min(touch).over(w).alias("_ft"),
        F.max(touch).over(w).alias("_lt"),
    ).filter(F.col("_tp") == F.lit(convert_type))
    none = F.lit("(none)")
    first = conv.groupBy(
        F.coalesce(F.col("_ft._tp"), none).alias("touch_type")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("first_touch"))
    last = conv.groupBy(
        F.coalesce(F.col("_lt._tp"), none).alias("touch_type")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("last_touch"),
        F.sum("_cents").cast("bigint").alias("last_touch_value_cents"),
    )
    return (
        first.join(last, "touch_type", "full_outer")
        .select(
            "touch_type",
            F.coalesce("first_touch", F.lit(0)).cast("bigint").alias(
                "first_touch"
            ),
            F.coalesce("last_touch", F.lit(0)).cast("bigint").alias(
                "last_touch"
            ),
            F.coalesce("last_touch_value_cents", F.lit(0))
            .cast("bigint").alias("last_touch_value_cents"),
        )
    )


def touch_lag_quantiles(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    convert_type: str,
    quantiles: tuple[float, ...] = (0.5, 0.9),
) -> DataFrame:
    """Conversion-lag distribution per last-touch type (r10): for
    every conversion that HAS a preceding touch, lag = conversion ts −
    last-touch ts in exact micros, then interpolated quantiles per
    touch type — w15 says WHO gets credit, this says HOW LONG the
    credited channel takes to convert (the attribution-window tuning
    read).

    Same single window pass — and same (ts, type) ROW-precedence tie
    rule — as ``touch_attribution``; quantiles use
    the exact ``percentile`` aggregate over int64 micros — the
    x10/w11 interpolation contract (both engines evaluate the same
    (n−1)·q fraction over the same sorted integers), rounded 4 dp.
    Output: (touch_type, n, lag_p<q·100> …) sorted-free, keyed.
    """
    from pyspark.sql import Window

    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = events.select(
        F.col(key_col).alias("_k"),
        us.alias("_us"),
        F.col(type_col).alias("_tp"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_us").asc(), F.col("_tp").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col("_tp") != F.lit(convert_type), F.struct("_us", "_tp")
    )
    conv = (
        ev.select("_k", "_us", "_tp", F.max(touch).over(w).alias("_lt"))
        .filter(
            (F.col("_tp") == F.lit(convert_type))
            & F.col("_lt").isNotNull()
        )
        .select(
            F.col("_lt._tp").alias("touch_type"),
            (F.col("_us") - F.col("_lt._us")).alias("_lag"),
        )
    )
    qcols = [
        F.round(
            F.expr(f"percentile(_lag, {q!r})"), 4
        ).alias(f"lag_p{int(round(q * 100))}")
        for q in quantiles
    ]
    return conv.groupBy("touch_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"), *qcols
    )


def multi_touch_attribution(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    convert_type: str,
    halflife: str = "1 hour",
    lookback: str | None = None,
) -> DataFrame:
    """Multi-touch conversion attribution (r11, VERDICT r10 #5):
    every ``convert_type`` event distributes ONE conversion's credit
    (1,000,000 ppm) across ALL touches on its path — the
    non-conversion events after the key's previous conversion and
    before this one — under two models at once:

    - **linear**: each of the path's n touches gets 1/n (the half-up
      ppm device, per path);
    - **time-decay**: touch i gets weight 2^(−kᵢ) where kᵢ =
      ⌊lagᵢ / halflife⌋ integer half-lives to the conversion —
      normalized per path by exact integer arithmetic: the weight
      NUMERATORS are 2^(62−min(kᵢ,62)) as BIGINT, sums and the final
      ppm division live in decimal(38,0) (DuckDB mirrors in HUGEINT),
      so both engines compute identical integers with no float or
      transcendental anywhere (the u16 pow lesson: exp/ln are not
      correctly rounded cross-engine; integer halvings are exact).

    A conversion whose path has NO touches credits '(none)' with the
    full 1,000,000. Tie rule: ROW-precedence in (ts, type) order,
    exactly ``touch_attribution``'s — a same-microsecond touch whose
    type sorts before ``convert_type`` is on the path with lag 0.

    ``lookback`` (r11, optional): the standard attribution-window cap
    — a touch more than ``lookback`` before its conversion falls OFF
    the path (shrinking n for the linear model and the decay
    denominator), and a conversion whose entire path ages out credits
    '(none)'. Exact integer micros comparison; None = unbounded (the
    driver-gate semantics, unchanged).

    Declarative shape — ONE corpus pass: a single window sort per key
    computes each row's path id (count of conversions strictly
    preceding) and next-conversion timestamp, then ONE hash aggregate
    reduces the corpus to (key, path, type) cardinality; everything
    after (path totals, per-model ppm, the '(none)' anti-join) runs
    on that small frame. No self-join of the events table, no
    explode, no second window.

    Output: (touch_type, n_touches, paths_touched, linear_credit_ppm,
    decay_credit_ppm) — all BIGINT, hash-portable.
    """
    from pyspark.sql import Window

    from healthcare_api_spark.operators.temporal import _parse_duration_secs

    h_us = _parse_duration_secs(halflife) * 1_000_000
    if h_us <= 0:
        raise ValueError("halflife must be positive")
    lb_us = (
        _parse_duration_secs(lookback) * 1_000_000
        if lookback is not None
        else None
    )
    if lb_us is not None and lb_us <= 0:
        raise ValueError("lookback must be positive")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = events.select(
        F.col(key_col).alias("_k"),
        us.alias("_us"),
        F.col(type_col).alias("_tp"),
    )
    is_conv = F.col("_tp") == F.lit(convert_type)
    w_prev = (
        Window.partitionBy("_k")
        .orderBy(F.col("_us").asc(), F.col("_tp").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_next = (
        Window.partitionBy("_k")
        .orderBy(F.col("_us").asc(), F.col("_tp").asc())
        .rowsBetween(1, Window.unboundedFollowing)
    )
    x = ev.select(
        "_k", "_us", "_tp",
        F.count(F.when(is_conv, 1)).over(w_prev).cast("bigint").alias("_path"),
        F.min(F.when(is_conv, F.col("_us"))).over(w_next).alias("_ncus"),
    )
    # one aggregate keeps BOTH roles: conversion rows (tp ==
    # convert_type, exactly one per path) and credited touches
    # (non-conversion rows that HAVE a following conversion); trailing
    # touches with no conversion to credit drop here
    num = F.expr(
        "shiftleft(CAST(1 AS BIGINT),"
        f" CAST(62 - least((_ncus - _us) DIV {h_us}, 62) AS INT))"
    )
    credited_touch = F.col("_ncus").isNotNull()
    if lb_us is not None:
        # attribution window: the touch must land within `lookback`
        # of the conversion it would credit
        credited_touch = credited_touch & (
            (F.col("_ncus") - F.col("_us")) <= F.lit(lb_us)
        )
    g = (
        x.filter(is_conv | credited_touch)
        .groupBy("_k", "_path", "_tp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("_cnt"),
            F.sum(
                F.when(~is_conv, num).cast("decimal(19,0)")
            ).alias("_num"),
        )
        # g is consumed by FOUR downstream branches (touch credits,
        # path totals, the join, the '(none)' anti-join); without the
        # checkpoint Catalyst replans the corpus window pass once per
        # branch (4 scans, no exchange reuse — pushed-filter drift
        # defeats ReusedExchange). Checkpointing the (key, path, type)
        # frame — tiny next to the corpus — pins ONE scan + ONE window
        # sort + ONE wide aggregate total (plan-pinned by tests).
        .localCheckpoint(eager=True)
    )
    tch = g.filter(F.col("_tp") != F.lit(convert_type))
    convs = g.filter(F.col("_tp") == F.lit(convert_type)).select("_k", "_path")
    tot = tch.groupBy("_k", "_path").agg(
        F.sum("_cnt").cast("bigint").alias("_n"),
        F.sum("_num").cast("decimal(38,0)").alias("_d"),
    )
    ppm = F.lit(1_000_000).cast("decimal(38,0)")
    cred = tch.join(tot, ["_k", "_path"]).select(
        F.col("_tp").alias("touch_type"),
        "_cnt",
        # per-path linear share is identical for every touch on the
        # path, so the type's contribution is cnt · half_up(1e6/n)
        (
            F.col("_cnt")
            * F.expr("(2 * 1000000 + _n) DIV (2 * _n)")
        ).cast("bigint").alias("_lin"),
        # per-(path, type) half-up of 1e6 · Σ_type num / Σ_path num
        (
            (F.lit(2).cast("decimal(38,0)") * ppm
             * F.col("_num").cast("decimal(38,0)")
             + F.col("_d"))
        ).alias("_dnum"),
        F.col("_d").alias("_dden"),
    ).select(
        "touch_type", "_cnt", "_lin",
        F.expr("CAST(_dnum DIV (2 * _dden) AS BIGINT)").alias("_dec"),
    )
    none = (
        convs.join(tot, ["_k", "_path"], "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
        .filter(F.col("_c") > 0)
        .select(
            F.lit("(none)").alias("touch_type"),
            F.lit(0).cast("bigint").alias("n_touches"),
            F.col("_c").alias("paths_touched"),
            (F.col("_c") * 1_000_000).cast("bigint").alias(
                "linear_credit_ppm"
            ),
            (F.col("_c") * 1_000_000).cast("bigint").alias(
                "decay_credit_ppm"
            ),
        )
    )
    return (
        cred.groupBy("touch_type")
        .agg(
            F.sum("_cnt").cast("bigint").alias("n_touches"),
            F.count(F.lit(1)).cast("bigint").alias("paths_touched"),
            F.sum("_lin").cast("bigint").alias("linear_credit_ppm"),
            F.sum("_dec").cast("bigint").alias("decay_credit_ppm"),
        )
        .unionByName(none)
    )


def multi_touch_value(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    convert_type: str,
    value_col: str,
    halflife: str = "1 hour",
) -> DataFrame:
    """Value-weighted (revenue) multi-touch attribution (r12): each
    conversion distributes its OWN monetary value — not a unit ppm —
    across its path under the same linear and time-decay models as
    :func:`multi_touch_attribution`; the per-channel totals are what a
    marketing stack actually reports ("email drove $X").

    Exactness: money rides the w15 cents device (round(value·100) as
    BIGINT); each (path, type) share rounds ONCE, half-up, in exact
    integer arithmetic — linear = half_up(C·cnt / n), decay =
    half_up(C·num_type / D) with the w17 power-of-two numerators in
    decimal(38,0) (oracle: HUGEINT) — and channel totals are sums of
    those exact integers, so both engines agree bit-for-bit. A
    pathless conversion keeps its full cents under '(none)'.

    Same ONE-pass shape as w17: one corpus window sort (path ids +
    next-conversion ts), one corpus hash aggregate to (key, path,
    type) rows — the conversion row's cents ride the same aggregate —
    then path-cardinality joins. Same (ts, type) ROW-precedence tie
    rule, documented at :func:`multi_touch_attribution`.

    Output: (touch_type, n_touches, paths_touched, linear_value_cents,
    decay_value_cents) — all BIGINT.
    """
    from pyspark.sql import Window

    from healthcare_api_spark.operators.temporal import _parse_duration_secs

    h_us = _parse_duration_secs(halflife) * 1_000_000
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    cents = F.round(F.col(value_col).cast("double") * 100).cast("bigint")
    ev = events.select(
        F.col(key_col).alias("_k"),
        us.alias("_us"),
        F.col(type_col).alias("_tp"),
        cents.alias("_cents"),
    )
    is_conv = F.col("_tp") == F.lit(convert_type)
    w_prev = (
        Window.partitionBy("_k")
        .orderBy(F.col("_us").asc(), F.col("_tp").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_next = (
        Window.partitionBy("_k")
        .orderBy(F.col("_us").asc(), F.col("_tp").asc())
        .rowsBetween(1, Window.unboundedFollowing)
    )
    x = ev.select(
        "_k", "_us", "_tp", "_cents",
        F.count(F.when(is_conv, 1)).over(w_prev).cast("bigint").alias("_path"),
        F.min(F.when(is_conv, F.col("_us"))).over(w_next).alias("_ncus"),
    )
    num = F.expr(
        "shiftleft(CAST(1 AS BIGINT),"
        f" CAST(62 - least((_ncus - _us) DIV {h_us}, 62) AS INT))"
    )
    g = (
        x.filter(is_conv | F.col("_ncus").isNotNull())
        .groupBy("_k", "_path", "_tp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("_cnt"),
            F.sum(
                F.when(~is_conv, num).cast("decimal(19,0)")
            ).alias("_num"),
            # the conversion row's cents ride the SAME aggregate (one
            # conversion per closed path by construction)
            F.sum(F.when(is_conv, F.col("_cents"))).cast("bigint").alias(
                "_ccents"
            ),
        )
        .localCheckpoint(eager=True)
    )
    tch = g.filter(F.col("_tp") != F.lit(convert_type)).drop("_ccents")
    convs = g.filter(F.col("_tp") == F.lit(convert_type)).select(
        "_k", "_path", "_ccents"
    )
    tot = tch.groupBy("_k", "_path").agg(
        F.sum("_cnt").cast("bigint").alias("_n"),
        F.sum("_num").cast("decimal(38,0)").alias("_d"),
    )
    cred = tch.join(tot, ["_k", "_path"]).join(
        convs, ["_k", "_path"]
    ).select(
        F.col("_tp").alias("touch_type"),
        "_cnt",
        # linear: half_up(C·cnt / n) once per (path, type)
        F.expr(
            "CAST((2 * CAST(_ccents AS DECIMAL(38,0))"
            " * CAST(_cnt AS DECIMAL(38,0)) + _n)"
            " DIV (2 * CAST(_n AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("_lin"),
        # decay: half_up(C·num_type / D) in decimal(38,0)
        F.expr(
            "CAST((2 * CAST(_ccents AS DECIMAL(38,0))"
            " * CAST(_num AS DECIMAL(38,0)) + _d)"
            " DIV (2 * _d) AS BIGINT)"
        ).alias("_dec"),
    )
    none = (
        convs.join(tot, ["_k", "_path"], "left_anti")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("_c"),
            F.sum("_ccents").cast("bigint").alias("_cc"),
        )
        .filter(F.col("_c") > 0)
        .select(
            F.lit("(none)").alias("touch_type"),
            F.lit(0).cast("bigint").alias("n_touches"),
            F.col("_c").alias("paths_touched"),
            F.col("_cc").alias("linear_value_cents"),
            F.col("_cc").alias("decay_value_cents"),
        )
    )
    return (
        cred.groupBy("touch_type")
        .agg(
            F.sum("_cnt").cast("bigint").alias("n_touches"),
            F.count(F.lit(1)).cast("bigint").alias("paths_touched"),
            F.sum("_lin").cast("bigint").alias("linear_value_cents"),
            F.sum("_dec").cast("bigint").alias("decay_value_cents"),
        )
        .unionByName(none)
    )


def touch_report(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    convert_type: str,
    value_col: str | None = None,
    quantiles: tuple[float, ...] = (0.5, 0.9),
) -> DataFrame:
    """Single-pass composition of ``touch_attribution`` +
    ``touch_lag_quantiles`` (r11 — retires VERDICT r10 "wrong" #4:
    the two operators each ran the identical per-key window pass, so
    a pipeline wanting both scanned the corpus twice). This computes
    the shared window frame ONCE; the last-touch counts, cents sum,
    AND lag quantiles come out of one hash aggregate, with only the
    (small) first-touch aggregate joined on top — the corpus-side
    shuffle is shared across both branches via Spark's exchange reuse.

    Output = w15's columns + w16's lag columns, full-outer on
    touch_type ('(none)' rows carry NULL lag quantiles — no preceding
    touch means no lag distribution). Values are pinned equal to the
    two single-purpose operators by test.
    """
    from pyspark.sql import Window

    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    cents = (
        F.round(F.col(value_col).cast("double") * 100).cast("bigint")
        if value_col is not None
        else F.lit(0).cast("bigint")
    )
    ev = events.select(
        F.col(key_col).alias("_k"),
        us.alias("_us"),
        F.col(type_col).alias("_tp"),
        cents.alias("_cents"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_us").asc(), F.col("_tp").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col("_tp") != F.lit(convert_type), F.struct("_us", "_tp")
    )
    conv = ev.select(
        "_k", "_us", "_tp", "_cents",
        F.min(touch).over(w).alias("_ft"),
        F.max(touch).over(w).alias("_lt"),
    ).filter(F.col("_tp") == F.lit(convert_type))
    none = F.lit("(none)")
    qcols = [
        F.round(
            F.expr(f"percentile(_lag, {q!r})"), 4
        ).alias(f"lag_p{int(round(q * 100))}")
        for q in quantiles
    ]
    last = (
        conv.select(
            F.coalesce(F.col("_lt._tp"), none).alias("touch_type"),
            "_cents",
            (F.col("_us") - F.col("_lt._us")).alias("_lag"),
        )
        .groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("last_touch"),
            F.sum("_cents").cast("bigint").alias("last_touch_value_cents"),
            *qcols,
        )
    )
    first = conv.groupBy(
        F.coalesce(F.col("_ft._tp"), none).alias("touch_type")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("first_touch"))
    return first.join(last, "touch_type", "full_outer").select(
        "touch_type",
        F.coalesce("first_touch", F.lit(0)).cast("bigint").alias(
            "first_touch"
        ),
        F.coalesce("last_touch", F.lit(0)).cast("bigint").alias(
            "last_touch"
        ),
        F.coalesce("last_touch_value_cents", F.lit(0)).cast("bigint").alias(
            "last_touch_value_cents"
        ),
        *[f"lag_p{int(round(q * 100))}" for q in quantiles],
    )


def position_attribution(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    convert_type: str,
) -> DataFrame:
    """Position-based (U-shaped) conversion attribution (r11): per
    conversion path, 40% of the credit to the FIRST touch, 40% to the
    LAST, and 20% split evenly among the middles — the third standard
    multi-touch model beside ``multi_touch_attribution``'s linear and
    time-decay. Degenerate paths follow the industry convention:
    one touch takes 100%, two touches split 50/50.

    Exact-integer ppm arithmetic: the middle share uses the u11
    half-up device per (path, type) in decimal(38,0); the 40/40/20
    legs are exact constants. First/last OWNERSHIP is struct-valued —
    the path's min/max (ts, type) struct over touches — so ownership
    is unique even under timestamp ties (the type is part of the
    ordering) and both engines agree bit-for-bit.

    Same single-pass shape as ``multi_touch_attribution``: ONE corpus
    window sort (path ids + next-conversion ts), ONE corpus hash
    aggregate to (key, path, type) rows carrying count + min/max touch
    structs, checkpointed; path totals, ownership flags and the
    '(none)' anti-join all run at path×type cardinality. Same
    (ts, type) ROW-precedence tie rule as w15/w17, documented there.

    Output: (touch_type, n_touches, paths_touched,
    position_credit_ppm) — all BIGINT.
    """
    from pyspark.sql import Window

    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = events.select(
        F.col(key_col).alias("_k"),
        us.alias("_us"),
        F.col(type_col).alias("_tp"),
    )
    is_conv = F.col("_tp") == F.lit(convert_type)
    w_prev = (
        Window.partitionBy("_k")
        .orderBy(F.col("_us").asc(), F.col("_tp").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_next = (
        Window.partitionBy("_k")
        .orderBy(F.col("_us").asc(), F.col("_tp").asc())
        .rowsBetween(1, Window.unboundedFollowing)
    )
    x = ev.select(
        "_k", "_us", "_tp",
        F.count(F.when(is_conv, 1)).over(w_prev).cast("bigint").alias("_path"),
        F.min(F.when(is_conv, F.col("_us"))).over(w_next).alias("_ncus"),
    )
    touch = F.when(~is_conv, F.struct("_us", "_tp"))
    g = (
        x.filter(is_conv | F.col("_ncus").isNotNull())
        .groupBy("_k", "_path", "_tp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("_cnt"),
            F.min(touch).alias("_mn"),
            F.max(touch).alias("_mx"),
        )
        # same four-consumer fan-out as multi_touch_attribution: the
        # checkpoint pins ONE corpus scan + window + aggregate total
        .localCheckpoint(eager=True)
    )
    tch = g.filter(F.col("_tp") != F.lit(convert_type))
    convs = g.filter(F.col("_tp") == F.lit(convert_type)).select("_k", "_path")
    tot = tch.groupBy("_k", "_path").agg(
        F.sum("_cnt").cast("bigint").alias("_n"),
        F.min("_mn").alias("_fst"),
        F.max("_mx").alias("_lst"),
    )
    of = (F.col("_mn") == F.col("_fst")).cast("bigint")
    ol = (F.col("_mx") == F.col("_lst")).cast("bigint")
    # half-up integer ppm for the middle share (the u11 DIV device in
    # decimal(38,0)); n == 1 means this (sole) type row IS the path's
    # only touch — it owns first and last by construction, full credit
    ppm = F.expr(
        "CAST(CASE"
        " WHEN _n = 1 THEN 1000000"
        " WHEN _n = 2 THEN (_of + _ol) * 500000"
        " ELSE 400000 * (_of + _ol) + (CASE WHEN _cnt - _of - _ol > 0"
        "  THEN CAST((2 * CAST(_cnt - _of - _ol AS DECIMAL(38,0))"
        "   * 200000 + CAST(_n - 2 AS DECIMAL(38,0)))"
        "   DIV (2 * CAST(_n - 2 AS DECIMAL(38,0))) AS BIGINT)"
        "  ELSE 0 END)"
        " END AS BIGINT)"
    )
    cred = tch.join(tot, ["_k", "_path"]).select(
        F.col("_tp").alias("touch_type"),
        "_cnt",
        "_n",
        of.alias("_of"),
        ol.alias("_ol"),
    ).select("touch_type", "_cnt", ppm.alias("_ppm"))
    none = (
        convs.join(tot, ["_k", "_path"], "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
        .filter(F.col("_c") > 0)
        .select(
            F.lit("(none)").alias("touch_type"),
            F.lit(0).cast("bigint").alias("n_touches"),
            F.col("_c").alias("paths_touched"),
            (F.col("_c") * 1_000_000).cast("bigint").alias(
                "position_credit_ppm"
            ),
        )
    )
    return (
        cred.groupBy("touch_type")
        .agg(
            F.sum("_cnt").cast("bigint").alias("n_touches"),
            F.count(F.lit(1)).cast("bigint").alias("paths_touched"),
            F.sum("_ppm").cast("bigint").alias("position_credit_ppm"),
        )
        .unionByName(none)
    )


def markov_attribution(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    convert_type: str,
    iters: int = 8,
    scale: int = 1_000_000,
) -> DataFrame:
    """Data-driven (Markov removal-effect) conversion attribution
    (r12, VERDICT r11 #4) — completes the standard model set
    {first/last, linear, time-decay, position, data-driven}. Build the
    first-order Markov chain over per-key journeys: states are
    '(start)', every touch type, and the absorbing '(conv)' /
    '(null)'; a conversion closes a path (the w17 path semantics), a
    key's trailing touch with no further events transitions to
    '(null)'. A channel's value is its REMOVAL EFFECT (Anderl et al.
    2014): how much the start→conversion absorption probability drops
    when every transition INTO that channel is redirected to '(null)'.
    Credit shares are the removal effects normalized to 1,000,000 ppm.

    Exactness device (the HITS max-norm lesson, graph.py): absorption
    probabilities come from ``iters`` rounds of VALUE ITERATION in
    exact scaled integers —

        p_{k+1}(s) = half_up( Σ_d n(s,d)·p_k(d) / Σ_d n(s,d) )

    with p('(conv)') ≡ scale, p('(null)') ≡ 0, p_0 ≡ 0 elsewhere, and
    the half-up as the t30 (2·num + tot) DIV (2·tot) division in
    decimal(38,0) (oracle: HUGEINT). p_k('(start)') is then the exact
    probability of converting within k steps — a DEFINED semantic both
    engines compute bit-identically (no float, no linear solver).
    Removed-channel scenarios zero n(s,d→c) in the numerator but keep
    the original denominator — exactly "redirect to '(null)'".

    Scale shape: ONE corpus window pass (lag + lead share one
    (key | ts, type) sort) reduced by ONE hash aggregate to the
    |states|² transition matrix; everything after — the scenario
    cross-join (|channels|+1 scenarios) and the fixed value-iteration
    rounds — runs at |states|²·|scenarios| cardinality, checkpointed
    per round (the pagerank lineage device). Same (ts, type)
    ROW-precedence tie rule as w15/w17; same-key same-instant
    same-type ties are interchangeable so counts are deterministic.

    Output: (touch_type, p_full_ppm, p_drop_ppm, removal_effect_ppm,
    credit_ppm) — one row per channel, all BIGINT at ppm scale.
    """
    from pyspark.sql import Window

    if iters < 1:
        raise ValueError("iters must be >= 1")
    s = int(scale)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = events.select(
        F.col(key_col).alias("_k"),
        us.alias("_us"),
        F.col(type_col).alias("_tp"),
    )
    w = Window.partitionBy("_k").orderBy(
        F.col("_us").asc(), F.col("_tp").asc()
    )
    # a conversion is always the LAST row of its path, so "previous row
    # is a conversion (or absent)" ⇔ "this row starts a path" — no path
    # ids needed; lag and lead share one window sort
    x = ev.select(
        "_tp",
        F.lag("_tp").over(w).alias("_ptp"),
        F.lead("_tp").over(w).alias("_ntp"),
    )
    is_conv = F.col("_tp") == F.lit(convert_type)
    base = x.select(
        F.when(
            F.col("_ptp").isNull() | (F.col("_ptp") == F.lit(convert_type)),
            F.lit("(start)"),
        ).otherwise(F.col("_ptp")).alias("src"),
        F.when(is_conv, F.lit("(conv)")).otherwise(F.col("_tp")).alias("dst"),
    )
    extra = x.filter(F.col("_ntp").isNull() & ~is_conv).select(
        F.col("_tp").alias("src"), F.lit("(null)").alias("dst")
    )
    tr = (
        base.unionByName(extra)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    return markov_credit_from_transitions(tr, iters=iters, scale=scale)


_MARKOV_OUT_SCHEMA = (
    "touch_type string, p_full_ppm bigint, p_drop_ppm bigint,"
    " removal_effect_ppm bigint, credit_ppm bigint"
)


def _markov_credit_driver(spark, rows, iters: int, scale: int) -> DataFrame:
    """Exact driver-side twin of the distributed value iteration in
    :func:`markov_credit_from_transitions` — unbounded Python integers
    reproduce the decimal(38,0) half-up arithmetic bit for bit. The
    input is the collected (src, dst, n) matrix (bounded by
    construction: a touch-type vocabulary squared)."""
    edges: dict[str, list[tuple[str, int]]] = {}
    denom: dict[str, int] = {}
    for r in rows:
        src, dst, n = r["src"], r["dst"], int(r["n"])
        edges.setdefault(src, []).append((dst, n))
        denom[src] = denom.get(src, 0) + n
    channels = sorted(src for src in edges if src != "(start)")
    scens = channels + ["(full)"]
    # p[(scen, state)] with the same init/specials as the SQL:
    # p('(conv)') ≡ scale, p('(null)') ≡ 0, p_0 ≡ 0 elsewhere
    p: dict[tuple[str, str], int] = {}
    for _ in range(iters):
        new: dict[tuple[str, str], int] = {}
        for scen in scens:
            for src, dsts in edges.items():
                num = 0
                for dst, n in dsts:
                    ne = 0 if dst == scen else n
                    if dst == "(conv)":
                        pd = scale
                    elif dst == "(null)":
                        pd = 0
                    else:
                        pd = p.get((scen, dst), 0)
                    num += ne * pd
                tot = denom[src]
                new[(scen, src)] = (2 * num + tot) // (2 * tot)
        p = new
    out = []
    pf = p.get(("(full)", "(start)"))
    if pf is not None and channels:
        res = []
        for ch in channels:
            pc = p.get((ch, "(start)"))
            if pc is None:
                continue  # mirrors the inner start-row filter
            re_ = max(pf - pc, 0)
            res.append((ch, pc, re_))
        tot_re = sum(re_ for _, _, re_ in res)
        for ch, pc, re_ in res:
            removal = (
                (2 * re_ * 1_000_000 + pf) // (2 * pf) if pf > 0 else 0
            )
            credit = (
                (2 * re_ * 1_000_000 + tot_re) // (2 * tot_re)
                if tot_re > 0
                else 0
            )
            out.append((ch, pf, pc, removal, credit))
    return spark.createDataFrame(out, _MARKOV_OUT_SCHEMA)


def markov_credit_from_transitions(
    tr: DataFrame,
    iters: int = 8,
    scale: int = 1_000_000,
    max_driver_matrix_rows: int = 4096,
) -> DataFrame:
    """The removal-effect credit computation of
    :func:`markov_attribution` over an ALREADY-BUILT transition matrix
    (src, dst, n) with '(start)'/'(conv)'/'(null)' boundary states —
    split out (r12) so the streaming maintainer
    (streaming/markov.py), which accumulates the same matrix
    incrementally, shares the value iteration VERBATIM.

    r12 optimization (guide §1.1 first-principles): the value
    iteration's input is corpus-INDEPENDENT — ≤(|types|+2)² rows, a
    touch-type vocabulary squared, reduced from the corpus by the one
    window pass + hash aggregate upstream. Running the fixed point as
    8 distributed rounds (join + agg + localCheckpoint each) cost
    10+ scheduler round-trips on constant-size data, and each round's
    broadcast already collected the matrix to the driver anyway. When
    the matrix is ≤``max_driver_matrix_rows`` it is now collected ONCE
    (the bounded-by-construction collect class: BPE merge batches,
    touched buckets) and iterated in exact Python integers — the same
    half-up ``(2·num + tot) DIV (2·tot)`` arithmetic, bit-identical
    results (pinned by the unchanged w21/st17 oracles and the
    hand-computed pytest). An adversarially large vocabulary falls
    back to the distributed rounds unchanged.

    Cap sizing (r13, VERDICT r12 #7): the driver loop costs
    iters × (|channels|+1) × rows single-threaded Python ops. At the
    old 65,536-row cap a ~250-type vocabulary cost ~10⁸ ops — slower
    than the distributed rounds it replaces. 4,096 rows (a ≤64-channel
    vocabulary squared) bounds the loop at ~2·10⁶ ops (< the ~10
    scheduler round-trips it saves) while still covering every real
    touch-type vocabulary; the boundary is pinned by
    tests/test_analytics.py::test_markov_credit_driver_cap_boundary.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    s = int(scale)
    tr = (
        tr
        # the matrix is ≤(|types|+1)² rows — the corpus reduces HERE;
        # every consumer below re-reads this tiny frame, never the scan
        .localCheckpoint(eager=True)
    )
    head = tr.take(max_driver_matrix_rows + 1)
    if len(head) <= max_driver_matrix_rows:
        return _markov_credit_driver(
            tr.sparkSession, head, iters=iters, scale=s
        )
    channels = tr.filter(F.col("src") != F.lit("(start)")).select(
        F.col("src").alias("scen")
    ).distinct()
    scen = channels.unionByName(
        channels.sparkSession.createDataFrame(
            [("(full)",)], "scen string"
        )
    )
    ts_ = (
        tr.crossJoin(F.broadcast(scen))
        .select(
            "scen", "src", "dst", "n",
            F.when(F.col("dst") == F.col("scen"), F.lit(0))
            .otherwise(F.col("n")).cast("bigint").alias("ne"),
        )
        .localCheckpoint(eager=True)
    )
    d38 = "decimal(38,0)"
    step_num = (
        "CAST(ne AS DECIMAL(20,0)) * CAST(CASE"
        f" WHEN dst = '(conv)' THEN {s}"
        " WHEN dst = '(null)' THEN 0"
        " ELSE coalesce(_p, 0) END AS DECIMAL(8,0))"
    )
    p = None
    for _ in range(iters):
        if p is None:
            j = ts_.withColumn("_p", F.lit(None).cast("bigint"))
        else:
            j = ts_.join(
                p.select(
                    F.col("scen").alias("_ps"),
                    F.col("state").alias("_pt"),
                    F.col("p").alias("_p"),
                ),
                (F.col("scen") == F.col("_ps"))
                & (F.col("dst") == F.col("_pt")),
                "left",
            )
        p = (
            j.groupBy("scen", F.col("src").alias("state"))
            .agg(
                F.sum(F.expr(step_num)).cast(d38).alias("_num"),
                F.sum("n").cast(d38).alias("_tot"),
            )
            .select(
                "scen", "state",
                F.expr(
                    "CAST((2 * _num + _tot) DIV (2 * _tot) AS BIGINT)"
                ).alias("p"),
            )
            .localCheckpoint(eager=True)
        )
    start = p.filter(F.col("state") == F.lit("(start)"))
    pf = start.filter(F.col("scen") == F.lit("(full)")).select(
        F.col("p").alias("_pf")
    )
    pc = start.filter(F.col("scen") != F.lit("(full)")).select(
        F.col("scen").alias("touch_type"), F.col("p").alias("_pc")
    )
    re = pc.crossJoin(F.broadcast(pf)).select(
        "touch_type", "_pf", "_pc",
        # removal cannot raise conversion in exact math; per-round
        # half-up noise could dip a few ppm negative — clamp, same rule
        # both engines
        F.greatest(F.col("_pf") - F.col("_pc"), F.lit(0)).cast(
            "bigint"
        ).alias("_re"),
    )
    tot = re.agg(F.sum("_re").cast("bigint").alias("_t"))
    return re.crossJoin(F.broadcast(tot)).select(
        "touch_type",
        F.col("_pf").alias("p_full_ppm"),
        F.col("_pc").alias("p_drop_ppm"),
        F.expr(
            "CAST(CASE WHEN _pf > 0 THEN (2 * CAST(_re AS DECIMAL(38,0))"
            " * 1000000 + _pf) DIV (2 * CAST(_pf AS DECIMAL(38,0)))"
            " ELSE 0 END AS BIGINT)"
        ).alias("removal_effect_ppm"),
        F.expr(
            "CAST(CASE WHEN _t > 0 THEN (2 * CAST(_re AS DECIMAL(38,0))"
            " * 1000000 + _t) DIV (2 * CAST(_t AS DECIMAL(38,0)))"
            " ELSE 0 END AS BIGINT)"
        ).alias("credit_ppm"),
    )


def markov_attribution_sql(
    events_sql: str,
    key_col: str,
    ts_col: str,
    type_col: str,
    convert_type: str,
    iters: int = 8,
    scale: int = 1_000_000,
) -> str:
    """DuckDB oracle twin of :func:`markov_attribution` — the same
    transition build and exact-integer value-iteration rounds unrolled
    as MATERIALIZED CTEs (see graph.pagerank_sql for the
    materialization rationale). ``//`` on non-negative HUGEINTs floors
    exactly like Spark's decimal DIV; keep in lockstep."""
    s = int(scale)
    cv = convert_type.replace("'", "''")
    parts = [
        f"WITH ev AS MATERIALIZED (SELECT {key_col} AS k,"
        f" epoch_us(CAST({ts_col} AS TIMESTAMP)) AS us,"
        f" {type_col} AS tp FROM ({events_sql})),",
        " w AS MATERIALIZED (SELECT tp,"
        "  lag(tp) OVER (PARTITION BY k ORDER BY us, tp) AS ptp,"
        "  lead(tp) OVER (PARTITION BY k ORDER BY us, tp) AS ntp"
        "  FROM ev),",
        " tr AS MATERIALIZED (SELECT src, dst,"
        "  CAST(count(*) AS BIGINT) AS n FROM ("
        f"  SELECT CASE WHEN ptp IS NULL OR ptp = '{cv}'"
        "    THEN '(start)' ELSE ptp END AS src,"
        f"   CASE WHEN tp = '{cv}' THEN '(conv)' ELSE tp END AS dst"
        "   FROM w"
        "  UNION ALL"
        f"  SELECT tp, '(null)' FROM w WHERE ntp IS NULL AND tp <> '{cv}'"
        " ) GROUP BY 1, 2),",
        " scen AS MATERIALIZED (SELECT DISTINCT src AS scen FROM tr"
        "  WHERE src <> '(start)'"
        "  UNION ALL SELECT '(full)'),",
        " ts_ AS MATERIALIZED (SELECT scen.scen, tr.src, tr.dst, tr.n,"
        "  CASE WHEN tr.dst = scen.scen THEN 0 ELSE tr.n END AS ne"
        "  FROM tr, scen),",
    ]
    prev = None
    for i in range(1, iters + 1):
        pd_ = (
            f"CASE WHEN t.dst = '(conv)' THEN {s}"
            " WHEN t.dst = '(null)' THEN 0"
            " ELSE coalesce(p.p, 0) END"
        )
        if prev is None:
            src = "FROM ts_ t"
            pd_ = (
                f"CASE WHEN t.dst = '(conv)' THEN {s} ELSE 0 END"
            )
        else:
            src = (
                f"FROM ts_ t LEFT JOIN {prev} p"
                " ON p.scen = t.scen AND p.state = t.dst"
            )
        parts.append(
            f" p{i} AS MATERIALIZED (SELECT t.scen, t.src AS state,"
            f"  CAST((2 * sum(t.ne * ({pd_})) + sum(t.n))"
            f"   // (2 * sum(t.n)) AS BIGINT) AS p"
            f"  {src} GROUP BY 1, 2),"
        )
        prev = f"p{i}"
    parts.append(
        f" pf AS (SELECT p FROM {prev}"
        "  WHERE scen = '(full)' AND state = '(start)'),"
    )
    parts.append(
        f" re AS (SELECT scen AS touch_type, pf.p AS pfull,"
        f"  {prev}.p AS pdrop, greatest(pf.p - {prev}.p, 0) AS re"
        f"  FROM {prev}, pf"
        "  WHERE scen <> '(full)' AND state = '(start)'),"
    )
    parts.append(" tt AS (SELECT sum(re) AS t FROM re)")
    body = "".join(parts)
    return (
        f"{body} SELECT touch_type,"
        " CAST(pfull AS BIGINT) AS p_full_ppm,"
        " CAST(pdrop AS BIGINT) AS p_drop_ppm,"
        " CAST(CASE WHEN pfull > 0 THEN"
        "  (2 * re * 1000000 + pfull) // (2 * pfull)"
        "  ELSE 0 END AS BIGINT) AS removal_effect_ppm,"
        " CAST(CASE WHEN tt.t > 0 THEN"
        "  (2 * re * 1000000 + tt.t) // (2 * tt.t)"
        "  ELSE 0 END AS BIGINT) AS credit_ppm"
        " FROM re, tt"
    )


def rfm_segments(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    convert_type: str,
    value_col: str,
) -> DataFrame:
    """RFM (recency / frequency / monetary) segmentation (r11) — the
    classic customer-value grid every marketing stack derives before
    any model sees the data. Per purchasing user: recency = whole days
    between their LAST ``convert_type`` event and the corpus's max
    event timestamp (exact integer micros DIV 86400e6), frequency =
    purchase count, monetary = exact cents sum. Each dimension scores
    1-5 against the POPULATION's quintile thresholds; output is the
    segment grid (r_score, f_score, m_score) with user counts and
    total cents — ≤125 rows.

    Scale discipline: scoring uses percentile THRESHOLDS (p20/40/60/80
    from one tiny aggregate, broadcast back as literals) compared
    against each user's metrics — NEVER a global ntile window, which
    would funnel every user through one task. Score = 1 + #thresholds
    strictly below the metric (recency inverted: fresher = higher), so
    boundary ties are deterministic in both engines; the thresholds
    themselves ride the x10/w11 ``percentile`` == ``quantile_cont``
    interpolation contract over exact integers.

    Shape: one corpus filter+groupBy(user) (map-side combined), one
    1-row threshold aggregate joined back as a broadcast literal
    frame, one ≤125-group hash aggregate. No window over users, no
    sort, no UDF. The exact ``percentile`` threshold aggregate is
    |purchasers|-bound on its merge task (exact percentiles buffer
    values — the x10/w11 family's documented cost); swap in
    ``percentile_approx`` for billion-user populations at the price
    of the cross-engine hash contract.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    cents = F.round(F.col(value_col).cast("double") * 100).cast("bigint")
    purchases = events.filter(
        F.col(type_col) == F.lit(convert_type)
    ).select(
        F.col(user_col).alias("_u"), us.alias("_us"), cents.alias("_cents")
    )
    per_user = purchases.groupBy("_u").agg(
        F.max("_us").alias("_last"),
        F.count(F.lit(1)).cast("bigint").alias("f"),
        F.sum("_cents").cast("bigint").alias("m"),
    )
    # corpus max ts (any event type — "now" for the dataset) and the
    # quintile thresholds: two tiny aggregates, crossJoined back as
    # single-row broadcast frames (literal-like; no user-keyed join)
    now = events.select(
        F.max(us).alias("_now")
    )
    base = per_user.crossJoin(F.broadcast(now)).select(
        "_u", "f", "m",
        F.expr("(_now - _last) DIV 86400000000").cast("bigint").alias("r"),
    )
    th = base.agg(
        *[
            F.expr(f"percentile(r, {q!r})").alias(f"_rq{i}")
            for i, q in enumerate((0.2, 0.4, 0.6, 0.8), 1)
        ],
        *[
            F.expr(f"percentile(f, {q!r})").alias(f"_fq{i}")
            for i, q in enumerate((0.2, 0.4, 0.6, 0.8), 1)
        ],
        *[
            F.expr(f"percentile(m, {q!r})").alias(f"_mq{i}")
            for i, q in enumerate((0.2, 0.4, 0.6, 0.8), 1)
        ],
    )
    scored = base.crossJoin(F.broadcast(th)).select(
        # recency: LOWER is better — score 5 at the freshest quintile
        (
            F.lit(5)
            - sum(
                (F.col("r") > F.col(f"_rq{i}")).cast("int")
                for i in range(1, 5)
            )
        ).cast("int").alias("r_score"),
        (
            F.lit(1)
            + sum(
                (F.col("f") > F.col(f"_fq{i}")).cast("int")
                for i in range(1, 5)
            )
        ).cast("int").alias("f_score"),
        (
            F.lit(1)
            + sum(
                (F.col("m") > F.col(f"_mq{i}")).cast("int")
                for i in range(1, 5)
            )
        ).cast("int").alias("m_score"),
        "m",
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("m").cast("bigint").alias("total_cents"),
    )


def hazard_table(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    event_type: str,
) -> DataFrame:
    """Discrete-time survival / churn table (r11) — the Kaplan-Meier
    ingredient grid every retention analysis starts from. Per user,
    duration = whole days from their FIRST event to their first
    ``event_type`` occurrence; users who never convert are RIGHT-
    CENSORED at the corpus's max timestamp. Per day t the table
    reports the risk set and the exact discrete hazard:

        at_risk(t)  = users with min(event_day, censor_day) ≥ t
        events(t)   = users whose event lands ON day t
        censored(t) = users censored ON day t
        hazard_ppm  = half_up(1e6 · events / at_risk)

    Survival itself is a cumulative PRODUCT (not portable across
    engines in floats); the table carries exact integers so any
    consumer can fold S(t) = Π(1 − h) in whatever precision it wants —
    the same emit-ingredients discipline as the sketch gates.

    Scale shape: one corpus groupBy(user) with map-side combine (min
    ts, min event ts), one single-row corpus-max broadcast, one
    day-bucket aggregate (≤ date-range rows), and the cumulative
    at-risk window runs over THAT tiny frame — never over users.
    Exact integer days via micros DIV 86400e6; no float anywhere but
    nothing — even hazard is an integer ppm.
    """
    from pyspark.sql import Window

    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    per_user = events.select(
        F.col(user_col).alias("_u"),
        us.alias("_us"),
        F.col(type_col).alias("_tp"),
    ).groupBy("_u").agg(
        F.min("_us").alias("_t0"),
        F.min(
            F.when(F.col("_tp") == F.lit(event_type), F.col("_us"))
        ).alias("_te"),
    )
    cmax = events.select(F.max(us).alias("_cmax"))
    base = per_user.crossJoin(F.broadcast(cmax)).select(
        "_u",
        F.when(
            F.col("_te").isNotNull(),
            F.expr("(_te - _t0) DIV 86400000000"),
        ).cast("bigint").alias("_d"),
        F.expr("(_cmax - _t0) DIV 86400000000").cast("bigint").alias("_c"),
    )
    days = base.select(
        F.coalesce("_d", "_c").alias("day"),
        F.col("_d").isNotNull().cast("int").alias("_is_event"),
    ).groupBy("day").agg(
        F.sum("_is_event").cast("bigint").alias("events"),
        F.sum(1 - F.col("_is_event")).cast("bigint").alias("censored"),
    )
    # cumulative exits BEFORE day t over the tiny day frame; at_risk =
    # N − exits_before. N rides a 1-row broadcast (not a driver
    # count() — the whole table stays ONE lazy plan). The global-order
    # window is safe HERE because the day frame is ≤ date-range rows.
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ntot = base.agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    return days.crossJoin(F.broadcast(ntot)).select(
        "day",
        (
            F.col("_n")
            - F.coalesce(
                F.sum(F.col("events") + F.col("censored")).over(w),
                F.lit(0),
            )
        ).cast("bigint").alias("at_risk"),
        "events",
        "censored",
    ).select(
        "day", "at_risk", "events", "censored",
        # decimal(38,0) headroom: 2·events·1e6 overflows BIGINT past
        # ~4.6e12 events/day and would yield NULL under non-ANSI
        # sessions (the _TOPK_MASS_PPM_EXPR lesson; DuckDB's HUGEINT
        # oracle already has the headroom)
        F.expr(
            "CAST((2 * CAST(events AS DECIMAL(38,0)) * 1000000"
            " + at_risk) DIV (2 * CAST(at_risk AS DECIMAL(38,0)))"
            " AS BIGINT)"
        ).alias("hazard_ppm"),
    )
