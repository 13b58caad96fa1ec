"""Corpus-curation operators for training-data pipelines (SURVEY.md §2.10
extensions): repetition filtering, benchmark decontamination, deterministic
stratified sampling / mixture planning, and sequence packing.

These are the operations that sit between "raw deduplicated documents" and
"training batches" in an LLM data pipeline. Design rules, in order:

* deterministic — every operator is reproducible bit-for-bit and (where
  SQL-expressible) verified against a DuckDB oracle;
* narrow first — sampling is a pure filter (zero shuffle); the shuffles
  that remain (n-gram frequency, packing window) are keyed so map-side
  partial aggregation does the heavy lifting at 100 TB;
* no UDFs — everything is Column expressions inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from healthcare_api_spark.functions.text import token_count, word_shingles

# ------------------------------------------------------------- repetition --


def repetition_features(
    df: DataFrame, id_col: str, text_col: str, ngram_n: int = 2
) -> DataFrame:
    """Gopher-style intra-document repetition signals.

    Per document: total word n-grams, distinct n-grams, the duplicate
    fraction ``1 - distinct/total`` and the share of the single most
    frequent n-gram. High values on either fraction are the classic
    boilerplate/spam signature used by quality filters (Rae et al. 2021
    §A1.1 "repetition removal" — public Gopher paper).

    Shape at scale: shingling is narrow; the two aggregations are keyed by
    (doc, ngram) then (doc), both hash-aggregates with map-side combine, so
    the shuffle carries one row per *distinct* per-doc n-gram, not one per
    token. Zero joins, no window.
    """
    sh = df.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), ngram_n)).alias("s")
    )
    per = sh.groupBy(id_col, "s").agg(F.count(F.lit(1)).alias("c"))
    agg = per.groupBy(id_col).agg(
        F.sum("c").alias("n_ngrams"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_c"),
    )
    total = F.col("n_ngrams").cast("double")
    return agg.select(
        F.col(id_col),
        F.col("n_ngrams").cast("bigint").alias("n_ngrams"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        F.round(F.lit(1.0) - F.col("n_distinct") / total, 6).alias("dup_ngram_frac"),
        F.round(F.col("top_c") / total, 6).alias("top_ngram_frac"),
    )


# -------------------------------------------------------- decontamination --


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Flag training documents that overlap a benchmark/eval set by at
    least one word ``shingle_n``-gram (test-set decontamination).

    Output: (id, n_shared, contaminated) for EVERY input doc — n_shared is
    the number of *distinct* document shingles that appear anywhere in the
    benchmark set.

    Shape at scale: per-doc shingle dedup is narrow (``array_distinct``
    before the explode — no distinct shuffle); the benchmark side is
    reduced to a distinct shingle set once. ``broadcast_bench`` defaults
    True because a benchmark suite is a small fixed artifact (MBs) against
    TBs of training docs — a map-side hash probe with zero shuffle of the
    big side. Pass False for an unusually large benchmark corpus and let
    AQE pick the strategy.
    """
    doc_sh = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_shingles(F.col(text_col), shingle_n))).alias("s"),
    )
    bench_sh = bench.select(
        F.explode(word_shingles(F.col(text_col), shingle_n)).alias("s")
    ).distinct()
    if broadcast_bench:
        bench_sh = F.broadcast(bench_sh)
    hits = doc_sh.join(bench_sh, "s").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shared")
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_shared"), F.lit(0)).cast("bigint").alias("n_shared"),
            (F.coalesce(F.col("n_shared"), F.lit(0)) > 0).cast("int").alias("contaminated"),
        )
    )


def quality_gate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    min_stopword_ratio: float = 0.01,
    max_dup_ngram_frac: float = 0.6,
) -> DataFrame:
    """Composite Gopher-style document gate: every rule evaluated, failed
    rule names collected into a ``reasons`` array (stable order), and a
    ``passes`` flag — the auditable form a curation pipeline wants (drop
    decisions must be explainable, not just a boolean).

    Rules: token-count bounds, minimum stopword ratio (gibberish /
    non-linguistic content), maximum duplicate-n-gram fraction
    (boilerplate/spam). Output: (id, n_tokens, reasons, passes).

    Shape at scale: the length/stopword features are narrow; the
    repetition feature joins one aggregated row per doc (two
    map-side-combined shuffles from ``repetition_features``) — one more
    equi-join on the id, nothing O(corpus²).
    """
    from healthcare_api_spark.operators.textops import quality_features

    f = quality_features(F.col(text_col))
    base = df.select(
        F.col(id_col),
        f["n_tokens"].cast("bigint").alias("n_tokens"),
        f["stopword_ratio"].alias("_stop"),
    )
    rep = repetition_features(df, id_col, text_col, ngram_n=2).select(
        id_col, "dup_ngram_frac"
    )
    joined = base.join(rep, id_col)
    rules = [
        ("too-short", F.col("n_tokens") < min_tokens),
        ("too-long", F.col("n_tokens") > max_tokens),
        ("low-stopword", F.col("_stop") < min_stopword_ratio),
        ("repetitive", F.col("dup_ngram_frac") > max_dup_ngram_frac),
    ]
    reasons = F.concat(
        *[
            F.when(cond, F.array(F.lit(name))).otherwise(F.array().cast("array<string>"))
            for name, cond in rules
        ]
    )
    return joined.select(
        F.col(id_col),
        F.col("n_tokens"),
        reasons.alias("reasons"),
        (F.size(reasons) == 0).cast("int").alias("passes"),
    )


# --------------------------------------------------------- PII redaction --

# (name, pattern, replacement) applied IN ORDER. Patterns are restricted
# to the regex subset Java and RE2 evaluate identically (no lookaround,
# no backreferences, unambiguous greedy runs) so redaction is
# engine-portable and oracle-verifiable.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://\S+", "<URL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,3} \d{3} \d{3,4}", "<PHONE>"),
]


def redact_pii(
    df: DataFrame,
    id_col: str,
    text_col: str,
    patterns: list[tuple[str, str, str]] | None = None,
) -> DataFrame:
    """Scrub emails / URLs / IPv4s / phone numbers to typed placeholder
    tokens. Output: (id, clean_text, n_redacted) — n_redacted counts
    matches per pattern against the ORIGINAL text (order-independent),
    while replacements apply sequentially in registry order.

    Shape at scale: a chain of ``regexp_replace`` / ``regexp_extract_all``
    Column expressions — narrow, whole-stage codegen, zero shuffle.
    """
    pats = PII_PATTERNS if patterns is None else patterns
    clean = F.col(text_col)
    n = F.lit(0)
    for _, pat, repl in pats:
        n = n + F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
        clean = F.regexp_replace(clean, pat, repl)
    return df.select(
        F.col(id_col),
        clean.alias("clean_text"),
        n.cast("bigint").alias("n_redacted"),
    )


# ------------------------------------------------- URL canonicalization --


def canonicalize_urls(df: DataFrame, id_col: str, url_col: str) -> DataFrame:
    """Web-corpus URL normalization: lowercase scheme+host, drop the
    fragment, strip tracking (utm_*) query params, clean up leftover
    ``?``/``&`` separators, drop default ports and trailing slashes.
    Canonical URLs are what dedup keys on — without this, the same page
    survives as a dozen tracking-param variants. Output: (id, url,
    canonical_url). Pure narrow regexp chain (portable subset), and the
    rule order is part of the contract.
    """
    # scheme+host (up to first /?#) lowered; the rest untouched
    head = F.regexp_extract(F.col(url_col), r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    u = F.concat(
        F.lower(head), F.col(url_col).substr(F.length(head) + 1, F.lit(1 << 30))
    )
    u = F.regexp_replace(u, r"#.*$", "")  # fragment
    u = F.regexp_replace(u, r"([?&])utm_[^&]*", "$1")  # tracking params
    u = F.regexp_replace(u, r"\?&+", "?")  # '?&' → '?'
    u = F.regexp_replace(u, r"&&+", "&")  # collapse '&&'
    u = F.regexp_replace(u, r"[?&]+$", "")  # trailing separators
    u = F.regexp_replace(u, r"(://[^/?#:]+):80/", "$1/")  # default ports
    u = F.regexp_replace(u, r"(://[^/?#:]+):443/", "$1/")
    u = F.regexp_replace(u, r"/+$", "")  # trailing slash(es)
    return df.select(F.col(id_col), F.col(url_col).alias("url"), u.alias("canonical_url"))


def domain_stats(
    df: DataFrame, id_col: str, url_col: str, text_col: str
) -> DataFrame:
    """Per-domain corpus health: the aggregation a web-pipeline's
    domain blocklist/allowlist decisions read. For each registrable
    host (lowercased, leading ``www.`` stripped): document count,
    distinct-content count (md5 of the raw text), the exact-duplicate
    rate, and mean document length. High dup_rate → mirror/SEO spam;
    tiny avg_chars → link farms.

    Shape at scale: one narrow projection (host regexp + content md5)
    then ONE aggregate keyed by domain using count-distinct on the
    hash — map-side combine keeps the shuffle at
    O(domains × partitions) partial rows. No joins."""
    # lower BEFORE extracting so 'WWW.' strips too (hosts are
    # case-insensitive; the extraction never touches the path)
    host = F.regexp_extract(F.lower(F.col(url_col)), r"://(?:www\.)?([^/?#:]+)", 1)
    return (
        df.select(
            host.alias("domain"),
            F.md5(F.col(text_col)).alias("_h"),
            F.length(F.col(text_col)).alias("_len"),
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("_h").alias("n_distinct"),
            F.round(
                1.0 - F.countDistinct("_h") / F.count(F.lit(1)), 6
            ).alias("dup_rate"),
            F.round(F.avg("_len"), 4).alias("avg_chars"),
        )
    )


# ------------------------------------------------ boilerplate line removal --


def remove_boilerplate_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_docs: int = 2,
    line_sep: str = "\n",
) -> DataFrame:
    """CCNet/RefinedWeb-style boilerplate removal: drop every line whose
    document frequency across the corpus is ≥ ``min_docs`` (nav bars,
    cookie banners, license headers), preserving the order of surviving
    lines. Output: (id, clean_text, n_lines, n_removed) for EVERY input
    doc — a doc whose lines are all boilerplate keeps an empty string.

    Shape at scale: posexplode (narrow) → per-line doc-frequency
    aggregate (shuffle keyed by line text, map-side combine collapses
    within-partition repeats — boilerplate by definition compresses
    hardest) → anti join against the frequent-line set (small by
    construction; AQE broadcasts it) → one groupBy to reassemble docs.
    """
    lines = df.select(
        F.col(id_col), F.posexplode(F.split(F.col(text_col), line_sep)).alias("pos", "line")
    )
    boiler = (
        lines.select(id_col, "line")
        .distinct()
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("docfreq"))
        .filter(F.col("docfreq") >= min_docs)
        .select("line")
    )
    kept = lines.join(boiler, "line", "left_anti")
    clean = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))), lambda s: s["line"]
            ),
            line_sep,
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    base = df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), line_sep)).alias("n_lines"),
    )
    return base.join(clean, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        F.col("n_lines").cast("bigint").alias("n_lines"),
        (F.col("n_lines") - F.coalesce(F.col("n_kept"), F.lit(0)))
        .cast("bigint")
        .alias("n_removed"),
    )


# ---------------------------------------------- sampling / mixture design --


def sample_threshold(rate: float) -> str:
    """Hex-string threshold for deterministic md5 sampling.

    A row is kept when the first 8 hex chars of its salted md5 compare
    lexicographically below this threshold — a pure string comparison that
    every engine evaluates identically (no hex→int conversion needed).
    rate≥1 returns 'g', which sorts above every hex string (keep all).
    """
    if rate >= 1.0:
        return "g"
    if rate <= 0.0:
        return "0" * 8
    return format(int(rate * 0x1_0000_0000), "08x")


def sample_hash(id_col: str, salt: str) -> F.Column:
    """First 8 hex chars of md5('<salt>:<id>') — the sampling key."""
    return F.substring(
        F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))), 1, 8
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "strat",
) -> DataFrame:
    """Deterministic per-stratum subsampling (the 'data mixing' primitive).

    Keeps each row iff md5-hash('<salt>:<id>')[:8] < threshold(rate of its
    stratum). Unlike ``df.sample``, this is reproducible across engines,
    cluster sizes, and partitionings — the keep/drop decision depends only
    on (salt, id), so re-runs and incremental appends sample consistently.

    Shape at scale: a pure narrow filter — zero shuffle, no join; the CASE
    chain over strata is whole-stage-codegen'd. Changing ``salt`` draws an
    independent sample (for held-out splits, use disjoint salts).
    """
    h = sample_hash(id_col, salt)
    thr = F.lit(sample_threshold(default_rate))
    for stratum in sorted(rates):
        thr = F.when(
            F.col(strata_col) == stratum, F.lit(sample_threshold(rates[stratum]))
        ).otherwise(thr)
    return df.filter(h < thr)


def exact_k_sample(
    df: DataFrame, id_col: str, strata_col: str, k: int, salt: str = "strat-k"
) -> DataFrame:
    """Exactly-k-per-stratum sample (the fixed-budget complement of
    rate-based ``stratified_sample``): rank rows inside each stratum by
    their salted hash and keep the k smallest — a deterministic,
    engine-portable reservoir. A stratum smaller than k contributes all
    its rows. One shuffle (the per-stratum window)."""
    w = Window.partitionBy(strata_col).orderBy(
        sample_hash(id_col, salt), F.col(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def interleave_sources(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    source_order: list[str],
    salt: str = "serve",
) -> DataFrame:
    """Deterministic round-robin serving order across sources — the
    data-loader-side complement of mixture sampling: rather than drawing
    a mixed corpus, assign every row a global ``serve_order`` such that
    reading in that order alternates sources a,b,c,a,b,c,… (training
    batches see every source at its interleave cadence instead of long
    single-source runs, which destabilize training).

    ``serve_order = (rank_within_source − 1) · n_sources + source_idx``
    — collision-free by construction, stable under re-partitioning and
    appends-with-new-salt. Within each source the order is the salted
    md5 shuffle (same determinism contract as ``stratified_sample``).
    Rows whose stratum is not in ``source_order`` are dropped (explicit
    curriculum). One shuffle (the per-source window); writing the
    corpus sorted by ``serve_order`` makes the training scan sequential.
    """
    if not source_order:
        raise ValueError("source_order must be non-empty")
    n = len(source_order)
    idx = F.create_map(
        *[x for i, s in enumerate(source_order) for x in (F.lit(s), F.lit(i))]
    )[F.col(strata_col)]
    w = Window.partitionBy(strata_col).orderBy(
        sample_hash(id_col, salt), F.col(id_col)
    )
    return (
        df.filter(F.col(strata_col).isin(source_order))
        .withColumn("_rk", F.row_number().over(w))
        .withColumn(
            "serve_order",
            ((F.col("_rk") - 1).cast("bigint") * n + idx).cast("bigint"),
        )
        .drop("_rk")
    )


def assign_splits(
    df: DataFrame, id_col: str, splits: dict[str, float], salt: str = "split"
) -> DataFrame:
    """Deterministic train/val/test assignment: the salted id hash falls
    into cumulative-proportion buckets (declared order). Every row gets
    exactly one ``split`` label; re-runs, appends, and re-partitionings
    never move a row between splits — the property that keeps eval sets
    uncontaminated as the corpus grows. Pure narrow expression."""
    if not splits:
        raise ValueError("splits must be non-empty")
    h = sample_hash(id_col, salt)
    names = list(splits)
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += splits[name]
        cond = h < F.lit(sample_threshold(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    return df.withColumn("split", last if expr is None else expr.otherwise(last))


def plan_temperature_mixture(
    df: DataFrame, strata_col: str, alpha: float, total: int
) -> dict[str, float]:
    """Temperature-based mixture rates: target share of stratum i ∝
    count_i^alpha — the standard multilingual rebalancing rule
    (alpha=1 keeps natural proportions, alpha→0 approaches uniform;
    alpha≈0.3 is the usual multilingual-LM compromise). Only the
    per-stratum counts reach the driver; feed the result to
    ``stratified_sample``."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    counts = {r[0]: r[1] for r in df.groupBy(strata_col).count().collect()}
    weights = {s: c**alpha for s, c in counts.items() if c > 0}
    z = sum(weights.values())
    return {
        s: min(1.0, (w / z) * total / counts[s]) for s, w in weights.items()
    }


def plan_mixture(
    df: DataFrame, strata_col: str, target_props: dict[str, float], total: int
) -> dict[str, float]:
    """Compute per-stratum sampling rates that hit a target mixture.

    target_props are relative weights (normalized internally); ``total`` is
    the desired output row count. Rates are capped at 1.0 (a stratum
    smaller than its target contributes everything it has — upsampling is
    a separate concern). Only the per-stratum counts (a handful of rows)
    reach the driver.
    """
    counts = {r[0]: r[1] for r in df.groupBy(strata_col).count().collect()}
    z = sum(target_props.values())
    return {
        s: min(1.0, (w / z) * total / counts[s])
        for s, w in target_props.items()
        if s in counts and counts[s] > 0
    }


# --------------------------------------------------------------- packing --


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget: int,
    part_col: str | None = None,
    global_offsets: bool = False,
) -> DataFrame:
    """Concat-and-chunk sequence packing: concatenate documents in id
    order (within ``part_col`` when given) and slice the token stream into
    fixed ``budget``-token training sequences. Documents may straddle a
    boundary — the output maps each doc to its token offset and the range
    of sequence ids it lands in (GPT-style packing, not whole-doc binning).

    Output: (id[, part], n_tokens, start_tok, first_seq, last_seq).

    Shape at scale: one window (= one shuffle) partitioned by ``part_col``;
    the cumulative sum is a running aggregate inside each partition. With
    no part_col everything lands in a single reducer — fine for a demo,
    wrong at 100 TB: partition by (source, date) or a bucketed key so each
    window partition holds one reducer's worth of documents.

    ``global_offsets=True`` implements the two-pass global-cumsum trick:
    a tiny per-partition totals aggregate (one row per ``part_col``
    value) becomes exclusive-prefix base offsets via a single small
    window, broadcast back onto the per-partition cumsums — offsets are
    then contiguous across the whole corpus (partition order = part_col
    order) while the heavy window still runs one reducer per partition.
    """
    if global_offsets and not part_col:
        raise ValueError("global_offsets requires part_col")
    cols = [F.col(id_col)] + ([F.col(part_col)] if part_col else [])
    counted = df.select(*cols, token_count(F.col(text_col)).alias("n_tokens"))
    w = (
        Window.partitionBy(part_col if part_col else F.lit(0))
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    if global_offsets:
        totals = counted.groupBy(part_col).agg(F.sum("n_tokens").alias("_tot"))
        wp = (
            Window.orderBy(part_col)
            .rowsBetween(Window.unboundedPreceding, -1)  # exclusive prefix
        )
        base = totals.select(
            F.col(part_col), F.coalesce(F.sum("_tot").over(wp), F.lit(0)).alias("_base")
        )
        counted = counted.join(F.broadcast(base), part_col)
        cum = cum + F.col("_base")
    start = (cum - F.col("n_tokens")).alias("start_tok")
    return counted.select(
        *cols,
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        start.cast("bigint").alias("start_tok"),
        F.floor((cum - F.col("n_tokens")) / budget).cast("bigint").alias("first_seq"),
        F.floor((cum - 1) / budget).cast("bigint").alias("last_seq"),
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    rate: float,
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling: keep probability proportional to
    ``weight_col`` (quality-weighted data selection — the DCLM-style
    'sample good documents more' primitive), scaled so the max-weight
    row keeps with probability ``min(1, rate)``.

    Keep iff uniform(salt, id) < rate · w / max(w), where uniform is the
    first 8 md5 hex chars as an integer — reproducible across engines,
    cluster sizes, partitionings, and appends (same id+salt → same
    draw), like ``stratified_sample``. The max aggregate is
    order-independent (exact for any weight type), so the decision is
    bit-stable; one scalar broadcast joins it back, the filter itself is
    narrow.
    """
    hx = F.conv(sample_hash(id_col, salt), 16, 10).cast("double")
    wmax = df.agg(F.max(F.col(weight_col)).cast("double").alias("_wmax"))
    p = F.least(F.lit(1.0), F.lit(rate) * F.col(weight_col) / F.col("_wmax"))
    return (
        df.crossJoin(F.broadcast(wmax))
        .filter(hx < p * F.lit(4294967296.0))
        .drop("_wmax")
    )


def plan_token_mixture(
    df: DataFrame,
    strata_col: str,
    text_col: str,
    target_props: dict[str, float],
    total_tokens: int,
) -> dict[str, float]:
    """Token-budget mixture planning: real LM data mixes are specified
    in TOKENS, not documents — a stratum of long documents needs fewer
    docs for the same share. Computes per-stratum doc-sampling rates so
    the EXPECTED token counts hit ``target_props`` of ``total_tokens``
    (rates capped at 1.0; a stratum smaller than its token target
    contributes everything). Feed the result to ``stratified_sample``.

    Only the per-stratum token totals (a handful of rows) reach the
    driver — one map-side-combined aggregate over token_count."""
    from healthcare_api_spark.functions.text import token_count

    counts = {
        r[0]: r[1]
        for r in df.groupBy(strata_col)
        .agg(F.sum(token_count(F.col(text_col))).alias("toks"))
        .collect()
    }
    z = sum(target_props.values())
    return {
        s: min(1.0, (w / z) * total_tokens / counts[s])
        for s, w in target_props.items()
        if s in counts and counts[s] > 0
    }


def domain_quota(
    df: DataFrame,
    id_col: str,
    url_col: str,
    max_per_domain: int,
    rank_col: str | None = None,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Per-domain document quota (the Common-Crawl curation practice:
    cap any single host's contribution so mirror farms can't dominate
    the mix). Deterministic selection: docs rank within their
    registrable host by (``rank_col`` DESC, id ASC) — highest-quality
    first — or by id alone when no rank column is given; ranks beyond
    ``max_per_domain`` are flagged dropped.

    Output: (id, domain, domain_rank, kept, *passthrough) — all
    selection evidence kept so the cut is auditable, ints/strings plus
    the caller's own rank values; ``passthrough`` columns ride the
    window unchanged (windows preserve columns — passing them through
    costs nothing and saves the caller a lineage-replaying join-back).

    Shape at scale: ONE window keyed by domain. A mega-domain makes
    that window's partition large; for truly pathological hosts run
    the two-phase variant (pre-filter with an approximate per-domain
    rank threshold from a sampled aggregate, then window only the
    survivors) — the exact window over everything is the correct
    baseline and what the oracle checks.
    """
    if max_per_domain < 1:
        raise ValueError("max_per_domain must be ≥ 1")
    from pyspark.sql import Window

    host = F.regexp_extract(
        F.lower(F.col(url_col)), r"://(?:www\.)?([^/?#:]+)", 1
    )
    order = (
        [F.col(rank_col).desc(), F.col(id_col).asc()]
        if rank_col
        else [F.col(id_col).asc()]
    )
    w = Window.partitionBy("domain").orderBy(*order)
    ranked = df.withColumn("domain", host).withColumn(
        "domain_rank", F.row_number().over(w)
    )
    return ranked.select(
        F.col(id_col),
        "domain",
        F.col("domain_rank").cast("int").alias("domain_rank"),
        (F.col("domain_rank") <= max_per_domain).cast("int").alias("kept"),
        *passthrough,
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    k_low: int = 100,
    k_high: int = 100,
) -> DataFrame:
    """Order-statistic winsorization (outlier clipping for numeric
    cleanup before stats/training): values below the ``k_low``-th
    smallest are raised to it, values above the ``k_high``-th largest
    are lowered to it, and every row carries its clip flag so the cut
    is auditable. Count-based cuts (not percent-based) are deliberate:
    each cut is a per-partition-heap TakeOrdered of k rows followed by
    a 1-row aggregate — no global sort, no second pass to count n (a
    percent-based cut needs n first; compute it and pass ceil(p·n)).

    Exactness: the cuts are ACTUAL data values (order statistics, not
    interpolated quantiles), so on integer-quantized inputs every
    output is exact integer math — engine-portable without the
    interpolation ulp risk that makes interpolated-cut winsorizing
    unverifiable. The two cut values come back to the driver (bounded
    1-value fetches) and are folded into the clamp as literals — no
    join in the output plan, and a crossed-cut request (k_low + k_high
    > non-null rows) raises instead of producing values above cut_high.
    """
    if k_low < 1 or k_high < 1:
        raise ValueError("k_low and k_high must be >= 1")
    v = F.col(value_col)
    # NULL values are excluded from the cut heaps (Spark sorts nulls
    # first ASC, other engines last — without the filter the low cut
    # would be engine-dependent); null rows pass through with null
    # flags and a null winsorized value
    nn = df.select(v.alias("_v")).filter(F.col("_v").isNotNull())
    # The cuts are fetched to the driver (two bounded TakeOrdered jobs,
    # ONE value each — never data-proportional) so a degenerate request
    # can be rejected: when k_low + k_high exceeds the non-null count
    # the order-statistic cuts can CROSS (cut_low > cut_high), and
    # greatest(least(v, hi), lo) would then silently raise every value
    # to cut_low — outputs ABOVE cut_high. That is never what the
    # caller meant, so it raises instead of clamping garbage.
    cut_low = (
        nn.orderBy(F.col("_v").asc())
        .limit(k_low)
        .agg(F.max("_v").alias("_cut_low"))
        .first()[0]
    )
    cut_high = (
        nn.orderBy(F.col("_v").desc())
        .limit(k_high)
        .agg(F.min("_v").alias("_cut_high"))
        .first()[0]
    )
    if cut_low is not None and cut_high is not None and cut_low > cut_high:
        raise ValueError(
            f"winsorize: cuts crossed (cut_low={cut_low!r} > "
            f"cut_high={cut_high!r}) — k_low={k_low} + k_high={k_high} "
            "exceeds the non-null row count; lower k_low/k_high"
        )
    lo_lit = F.lit(cut_low)
    hi_lit = F.lit(cut_high)
    return df.select(
        "*",
        (v < lo_lit).cast("int").alias("clipped_low"),
        (v > hi_lit).cast("int").alias("clipped_high"),
        # least/greatest skip nulls in Spark (and DuckDB), which would
        # silently clamp a NULL to a cut — keep nulls null explicitly
        F.when(
            v.isNull(), F.lit(None)
        ).otherwise(
            F.greatest(F.least(v, hi_lit), lo_lit)
        ).alias(f"{value_col}_winsorized"),
    )


def winsorize_pct(
    df: DataFrame,
    value_col: str,
    p_low: float = 0.01,
    p_high: float = 0.01,
) -> DataFrame:
    """Percent-based winsorization (r8 — the two-pass variant the
    count-based ``winsorize`` docstring points at): clip the lowest
    ``p_low`` and highest ``p_high`` fractions of the NON-NULL values.
    Pass 1 is one count aggregate (n non-null); the cut depths are
    then ``max(1, ceil(p · n))`` and the rest delegates to the
    order-statistic ``winsorize`` — so the cuts remain ACTUAL data
    values (engine-portable exact math on quantized inputs, no
    interpolation ulp), and the crossed-cut guard still applies when
    p_low + p_high rounds past the row count.
    """
    import math

    if not (0.0 < p_low < 1.0) or not (0.0 < p_high < 1.0):
        raise ValueError("p_low and p_high must be in (0, 1)")
    n = df.filter(F.col(value_col).isNotNull()).count()
    if n == 0:
        raise ValueError(f"winsorize_pct: no non-null {value_col} rows")
    return winsorize(
        df,
        value_col,
        k_low=max(1, math.ceil(p_low * n)),
        k_high=max(1, math.ceil(p_high * n)),
    )



# ------------------------------------------------------ importance (DSIR) --


def importance_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_pred,
    num_buckets: int = 256,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling" — public paper):
    score every document by how much more likely its hashed-unigram
    features are under the TARGET distribution (rows matching
    ``target_pred``, e.g. curated/high-quality docs) than under the raw
    corpus. The selection signal a pretraining pipeline uses to skew a
    web crawl toward a quality reference without training a model.

    Features are hashed unigrams: bucket = md5(token) % num_buckets
    (the cms md5 convention — engine-portable). Both distributions are
    Laplace-smoothed, and each bucket's log-ratio is computed as the ln
    of ONE exact rational::

        w_b = ln( ((t_b + 1) * (R + B)) / ((r_b + 1) * (T + B)) )

    — numerator and denominator are exact int64 products, the division
    is one correctly-rounded double op, and ln of a bit-identical
    double is bit-identical in any libm (the t17 logprob precedent).
    Per-doc score = Σ_b tf_doc(b) · w_b, rounded 6 dp.

    Shape at scale: the bucket tables are ≤ num_buckets rows (broadcast
    back), the doc-side aggregate is one map-side-combined groupBy on
    (id, bucket), and the corpus is scanned once. Output:
    (id, n_tokens, is_target, log_weight).
    """
    from healthcare_api_spark.functions.text import tokens

    if num_buckets < 1:
        raise ValueError("num_buckets must be >= 1")
    toks = df.select(
        F.col(id_col),
        target_pred.cast("int").alias("_tgt"),
        F.explode(tokens(F.col(text_col))).alias("_tok"),
    ).withColumn(
        "_b",
        (
            F.conv(F.substring(F.md5(F.col("_tok")), 1, 8), 16, 10).cast(
                "bigint"
            )
            % num_buckets
        ),
    )
    doc_tf = toks.groupBy(id_col, "_tgt", "_b").agg(
        F.count(F.lit(1)).alias("_tf")
    )
    bucket = doc_tf.groupBy("_b").agg(
        F.sum("_tf").alias("_r"),
        F.sum(F.col("_tf") * F.col("_tgt")).alias("_t"),
    )
    totals = bucket.agg(
        F.sum("_r").cast("bigint").alias("_rtot"),
        F.sum("_t").cast("bigint").alias("_ttot"),
    )
    w = (
        bucket.crossJoin(F.broadcast(totals))
        .select(
            "_b",
            F.log(
                (
                    (F.col("_t") + 1)
                    * (F.col("_rtot") + num_buckets)
                ).cast("double")
                / (
                    (F.col("_r") + 1)
                    * (F.col("_ttot") + num_buckets)
                ).cast("double")
            ).alias("_w"),
        )
    )
    return (
        doc_tf.join(F.broadcast(w), "_b")
        .groupBy(id_col)
        .agg(
            F.sum("_tf").cast("bigint").alias("n_tokens"),
            F.max("_tgt").cast("int").alias("is_target"),
            F.round(F.sum(F.col("_tf") * F.col("_w")), 6).alias(
                "log_weight"
            ),
        )
    )


def leakage_safe_splits(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    pair_src: str,
    pair_dst: str,
    splits: dict[str, float],
    salt: str = "split",
    iters: int = 8,
    on_nonconverged: str = "warn",
) -> DataFrame:
    """Near-dup-aware train/val/test assignment — the leakage-safe
    split: rows are bucketed by a salted hash of their NEAR-DUP
    CLUSTER's canonical id, not their own, so two near-duplicate
    documents can never straddle train and eval (the standard
    contamination failure a plain ``assign_splits`` on doc ids allows:
    the model trains on one copy and is scored on the other).

    ``pairs`` is any near-dup pair frame (MinHash/LSH candidates,
    SimHash, embedding pairs …); clusters come from
    :func:`graph.connected_components` (alternating-star, O(log² n)
    rounds), rows with no pair form singleton clusters under their own
    id. Assignment inherits every ``assign_splits`` property —
    deterministic under re-runs, appends and repartitioning — PLUS
    cluster atomicity.

    Output: EVERY input column + ``cluster_id`` + ``split`` — the
    passthrough shape (the u9 lesson: an operator returning only
    (id, result) forces callers into lineage-replaying join-backs).
    One CC run over the pair set + one left join; the splits hash is
    a narrow expression.
    """
    from healthcare_api_spark.operators.graph import connected_components

    cc = connected_components(
        pairs, pair_src, pair_dst, iters=iters, on_nonconverged=on_nonconverged
    ).withColumnRenamed("node", id_col)
    comp = (
        df.join(cc, id_col, "left")
        .withColumn(
            "cluster_id",
            F.coalesce(F.col("component"), F.col(id_col)),
        )
        .drop("component")
    )
    return assign_splits(comp, "cluster_id", splits, salt=salt)


def blocklist_screen(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: tuple[str, ...],
    hard_terms: tuple[str, ...] = (),
    max_ratio_ppm: int = 20_000,
) -> DataFrame:
    """Denylist safety screen — the blocklist pass every public-corpus
    build runs (the LDNOOBW-style wordlist filter): count token hits
    against a broadcast term list, flag a document when hits exceed
    ``max_ratio_ppm`` parts-per-million of its tokens OR any
    ``hard_terms`` member appears at all (the zero-tolerance tier).

    Narrow shape: ONE token explode + a map-side-combined (id) (
    aggregate with the term sets as literal IN-lists — no join, no
    second scan; at 100 TB this rides the same pass as the other
    row-level charters. All counts exact int64; ``hit_ppm`` is the
    integer-DIV rounded rational (the t30 rule). Output: (id,
    n_tokens, n_hits, n_hard_hits, hit_ppm, flagged).
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    if max_ratio_ppm < 0:
        raise ValueError("max_ratio_ppm must be >= 0")
    from healthcare_api_spark.functions.text import tokens

    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_w")
    ).filter(F.col("_w") != "")
    hit = F.when(F.col("_w").isin(list(terms)), 1).otherwise(0)
    hard = (
        F.when(F.col("_w").isin(list(hard_terms)), 1).otherwise(0)
        if hard_terms
        else F.lit(0)
    )
    agg = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum(hit).cast("bigint").alias("n_hits"),
        F.sum(hard).cast("bigint").alias("n_hard_hits"),
    )
    ppm = F.expr("(2 * n_hits * 1000000 + n_tokens) DIV (2 * n_tokens)")
    return agg.select(
        F.col(id_col),
        "n_tokens",
        "n_hits",
        "n_hard_hits",
        ppm.cast("bigint").alias("hit_ppm"),
        (
            (ppm > F.lit(int(max_ratio_ppm))) | (F.col("n_hard_hits") > 0)
        ).cast("int").alias("flagged"),
    )


def temperature_mixture_rates(
    df: DataFrame,
    strata_col: str,
    total: int,
    alpha_quarters: int = 3,
) -> dict[str, float]:
    """Temperature-scaled mixture weights (the multilingual-sampling
    rule of mBERT/XLM-R: stratum weight ∝ n^α, α < 1 upsamples the
    tail) turned into deterministic per-stratum sampling rates for
    ``stratified_sample``.

    Portability is why α is quantized to quarters: cross-engine
    ``pow`` is NOT correctly rounded (JVM Math.pow vs libm disagree
    by ulps and a rate boundary flip changes the sample), but IEEE
    ``sqrt`` IS — so n^(1/4)=√√n, n^(1/2)=√n, n^(3/4)=√√(n³) are
    bit-identical everywhere (n³ stays exact while n < 2⁵³ᐟ³ ≈ 208k —
    validated). z folds the weights LEFT-TO-RIGHT over strata sorted
    by name (float + is order-sensitive; the oracle replays the same
    fold with list_reduce over list(w ORDER BY stratum)), and each
    rate is min(1, ((w/z)·total)/n) in plan_mixture's exact op order.

    Only the per-stratum counts reach the driver. Returns
    {stratum: rate}.
    """
    import math
    from functools import reduce

    if alpha_quarters not in (1, 2, 3, 4):
        raise ValueError("alpha_quarters must be 1, 2, 3, or 4 (α = q/4)")
    counts = {
        r[0]: int(r[1])
        for r in df.groupBy(strata_col).count().collect()
        if r[0] is not None and r[1] > 0
    }
    if not counts:
        raise ValueError("no non-empty strata")

    def w(n: int) -> float:
        if alpha_quarters == 4:
            return float(n)
        if alpha_quarters == 2:
            return math.sqrt(float(n))
        if alpha_quarters == 1:
            return math.sqrt(math.sqrt(float(n)))
        cubed = n * n * n
        if cubed >= 2**53:
            raise ValueError(
                f"stratum count {n} too large for exact n³ (α=3/4)"
            )
        return math.sqrt(math.sqrt(float(cubed)))

    names = sorted(counts)
    z = reduce(lambda acc, s: acc + w(counts[s]), names, 0.0)
    return {
        s: min(1.0, (w(counts[s]) / z) * total / counts[s]) for s in names
    }
