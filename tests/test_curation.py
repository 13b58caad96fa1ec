"""Corpus-curation operators: repetition features, decontamination,
deterministic stratified sampling, sequence packing."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from healthcare_api_spark.operators import curation


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ------------------------------------------------------------- repetition --


def test_repetition_features_counts(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "x"), (3, None)], ["doc_id", "text"]
    )
    rows = {
        r["doc_id"]: r
        for r in curation.repetition_features(df, "doc_id", "text", ngram_n=2).collect()
    }
    # "a b a b a" bigrams: [a b, b a, a b, b a] -> 4 total, 2 distinct
    assert rows[1]["n_ngrams"] == 4 and rows[1]["n_distinct"] == 2
    assert rows[1]["dup_ngram_frac"] == 0.5 and rows[1]["top_ngram_frac"] == 0.5
    # single token falls back to whole-text shingle
    assert rows[2]["n_ngrams"] == 1 and rows[2]["dup_ngram_frac"] == 0.0
    # null text behaves like empty text (one '' shingle), row is kept
    assert rows[3]["n_ngrams"] == 1 and rows[3]["top_ngram_frac"] == 1.0


def test_repetition_boilerplate_signature(spark):
    df = spark.createDataFrame(
        [(1, "spam spam spam spam spam spam"), (2, "one two three four five six")],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r
        for r in curation.repetition_features(df, "doc_id", "text").collect()
    }
    assert rows[1]["dup_ngram_frac"] > 0.7 > rows[2]["dup_ngram_frac"]


# -------------------------------------------------------- decontamination --


def test_decontaminate_flags_overlap(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over things"),
            (2, "totally different words appear here now"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(100, "a quick brown fox story")], ["doc_id", "text"])
    rows = {
        r["doc_id"]: r
        for r in curation.decontaminate(docs, bench, "doc_id", "text", shingle_n=3).collect()
    }
    assert rows[1]["contaminated"] == 1 and rows[1]["n_shared"] == 1  # "quick brown fox"
    assert rows[2]["contaminated"] == 0 and rows[2]["n_shared"] == 0


def test_decontaminate_counts_distinct_shingles_once(spark):
    # doc repeats shared trigrams; n_shared counts each distinct one once
    docs = spark.createDataFrame([(1, "a b c a b c a b c")], ["doc_id", "text"])
    bench = spark.createDataFrame([(9, "a b c a b")], ["doc_id", "text"])
    [r] = curation.decontaminate(docs, bench, "doc_id", "text").collect()
    # both sides' distinct trigram set is {a b c, b c a, c a b}
    assert r["n_shared"] == 3


def test_quality_gate_reasons(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog is that happy thing today"),  # clean
            (2, "tiny"),  # too short (and no stopwords)
            (3, "spam spam spam spam spam spam spam spam"),  # repetitive, no stopwords
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in curation.quality_gate(df, "doc_id", "text").collect()}
    assert rows[1]["passes"] == 1 and rows[1]["reasons"] == []
    assert rows[2]["passes"] == 0 and "too-short" in rows[2]["reasons"]
    assert rows[3]["passes"] == 0
    assert set(rows[3]["reasons"]) == {"low-stopword", "repetitive"}
    # reasons keep the stable rule order
    assert rows[3]["reasons"] == ["low-stopword", "repetitive"]


# ------------------------------------------------------------- redaction --


def test_redact_pii_all_categories(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "see https://ex.com/a?b=1 and http://y.io"),
            (3, "host 192.168.0.1 dial +44 201 5550"),
            (4, "nothing sensitive here"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in curation.redact_pii(df, "doc_id", "text").collect()}
    assert rows[1]["clean_text"] == "mail <EMAIL> now" and rows[1]["n_redacted"] == 1
    assert rows[2]["clean_text"] == "see <URL> and <URL>" and rows[2]["n_redacted"] == 2
    assert rows[3]["clean_text"] == "host <IP> dial <PHONE>" and rows[3]["n_redacted"] == 2
    assert rows[4]["clean_text"] == "nothing sensitive here" and rows[4]["n_redacted"] == 0


def test_redact_pii_is_narrow(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    assert "Exchange" not in _plan(curation.redact_pii(df, "doc_id", "text"))


# ----------------------------------------------------- boilerplate removal --


def test_remove_boilerplate_lines(spark):
    df = spark.createDataFrame(
        [
            (1, "cookie banner\nunique content one\nfooter"),
            (2, "cookie banner\nunique content two\nfooter"),
            (3, "totally original document"),
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r
        for r in curation.remove_boilerplate_lines(df, "doc_id", "text", min_docs=2).collect()
    }
    assert rows[1]["clean_text"] == "unique content one"
    assert rows[1]["n_lines"] == 3 and rows[1]["n_removed"] == 2
    assert rows[2]["clean_text"] == "unique content two"
    assert rows[3]["clean_text"] == "totally original document" and rows[3]["n_removed"] == 0


def test_remove_boilerplate_keeps_fully_boiler_docs(spark):
    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, "same")], ["doc_id", "text"]
    )
    rows = curation.remove_boilerplate_lines(df, "doc_id", "text").collect()
    assert len(rows) == 3
    assert all(r["clean_text"] == "" and r["n_removed"] == 1 for r in rows)


def test_remove_boilerplate_within_doc_repeat_not_boiler(spark):
    # a line repeated inside ONE doc is not corpus boilerplate
    df = spark.createDataFrame([(1, "dup\ndup\nother"), (2, "x")], ["doc_id", "text"])
    rows = {
        r["doc_id"]: r
        for r in curation.remove_boilerplate_lines(df, "doc_id", "text", min_docs=2).collect()
    }
    assert rows[1]["clean_text"] == "dup\ndup\nother" and rows[1]["n_removed"] == 0


# ---------------------------------------------------------------- sampling --


def test_sample_threshold_boundaries():
    assert curation.sample_threshold(1.0) == "g"  # sorts above any hex
    assert curation.sample_threshold(0.0) == "00000000"
    assert curation.sample_threshold(0.5) == "80000000"


def test_stratified_sample_matches_python_md5(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(400)], ["doc_id", "lang"]
    )
    rates = {"en": 0.5, "de": 0.1}
    got = {
        r["doc_id"]
        for r in curation.stratified_sample(df, "doc_id", "lang", rates, salt="s1").collect()
    }
    expect = set()
    for i in range(400):
        h = hashlib.md5(f"s1:{i}".encode()).hexdigest()[:8]
        if h < curation.sample_threshold(rates["en" if i % 2 == 0 else "de"]):
            expect.add(i)
    assert got == expect
    # deterministic: second run identical
    again = {
        r["doc_id"]
        for r in curation.stratified_sample(df, "doc_id", "lang", rates, salt="s1").collect()
    }
    assert again == got


def test_stratified_sample_rate_extremes_and_default(spark):
    df = spark.createDataFrame([(i, "xx") for i in range(50)], ["doc_id", "lang"])
    assert curation.stratified_sample(df, "doc_id", "lang", {"xx": 1.0}).count() == 50
    assert curation.stratified_sample(df, "doc_id", "lang", {"xx": 0.0}).count() == 0
    # stratum not in rates -> default_rate
    assert curation.stratified_sample(df, "doc_id", "lang", {"yy": 1.0}).count() == 0
    assert (
        curation.stratified_sample(df, "doc_id", "lang", {}, default_rate=1.0).count() == 50
    )


def test_stratified_sample_is_narrow(spark):
    df = spark.createDataFrame([(1, "en")], ["doc_id", "lang"])
    plan = _plan(curation.stratified_sample(df, "doc_id", "lang", {"en": 0.5}))
    assert "Exchange" not in plan


def test_plan_mixture_rates(spark):
    df = spark.createDataFrame(
        [(i, "en") for i in range(80)] + [(i + 100, "de") for i in range(20)],
        ["doc_id", "lang"],
    )
    rates = curation.plan_mixture(df, "lang", {"en": 1.0, "de": 1.0}, total=40)
    assert rates["en"] == 20 / 80
    assert rates["de"] == 1.0  # capped: 20 wanted, 20 available


def test_exact_k_sample(spark):
    df = spark.createDataFrame(
        [(i, "en" if i < 80 else "de") for i in range(90)], ["doc_id", "lang"]
    )
    out = curation.exact_k_sample(df, "doc_id", "lang", k=5)
    by_lang = {r[0]: r[1] for r in out.groupBy("lang").count().collect()}
    assert by_lang == {"en": 5, "de": 5}
    # deterministic: identical draw on rerun and under repartitioning
    again = curation.exact_k_sample(df.repartition(13), "doc_id", "lang", k=5)
    assert {r["doc_id"] for r in out.collect()} == {r["doc_id"] for r in again.collect()}
    # stratum smaller than k contributes everything
    tiny = curation.exact_k_sample(df.filter("lang = 'de'"), "doc_id", "lang", k=100)
    assert tiny.count() == 10


def test_assign_splits_deterministic_partition(spark):
    import hashlib

    df = spark.createDataFrame([(i,) for i in range(300)], ["doc_id"])
    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = {r["doc_id"]: r["split"] for r in curation.assign_splits(df, "doc_id", splits).collect()}
    # every row labeled; roughly proportional
    counts = {s: sum(1 for v in out.values() if v == s) for s in splits}
    assert sum(counts.values()) == 300 and counts["train"] > 200
    # matches the reference Python computation exactly
    for i in (0, 17, 123, 299):
        h = hashlib.md5(f"split:{i}".encode()).hexdigest()[:8]
        if h < curation.sample_threshold(0.8):
            expect = "train"
        elif h < curation.sample_threshold(0.9):
            expect = "val"
        else:
            expect = "test"
        assert out[i] == expect

    import pytest

    with pytest.raises(ValueError, match="non-empty"):
        curation.assign_splits(df, "doc_id", {})


# ----------------------------------------------------------------- packing --


def test_pack_sequences_chunking(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "d e"), (3, "f g h i")], ["doc_id", "text"]
    )
    rows = {
        r["doc_id"]: r
        for r in curation.pack_sequences(df, "doc_id", "text", budget=4).collect()
    }
    assert (rows[1]["start_tok"], rows[1]["first_seq"], rows[1]["last_seq"]) == (0, 0, 0)
    # doc 2 straddles the seq-0/seq-1 boundary (tokens 3..4)
    assert (rows[2]["start_tok"], rows[2]["first_seq"], rows[2]["last_seq"]) == (3, 0, 1)
    assert (rows[3]["start_tok"], rows[3]["first_seq"], rows[3]["last_seq"]) == (5, 1, 2)


def test_pack_sequences_partitioned_restarts_offsets(spark):
    df = spark.createDataFrame(
        [(1, "a b", "s1"), (2, "c d", "s1"), (3, "e f", "s2")],
        ["doc_id", "text", "source"],
    )
    rows = {
        r["doc_id"]: r
        for r in curation.pack_sequences(
            df, "doc_id", "text", budget=10, part_col="source"
        ).collect()
    }
    assert rows[3]["start_tok"] == 0  # s2 stream starts fresh
    assert rows[2]["start_tok"] == 2


def test_pack_sequences_single_shuffle(spark):
    df = spark.createDataFrame([(1, "a", "s")], ["doc_id", "text", "source"])
    plan = _plan(curation.pack_sequences(df, "doc_id", "text", 8, part_col="source"))
    assert plan.count("Exchange hashpartitioning") == 1


# --------------------------------------------------------------- URLs --


def test_canonicalize_urls_rules(spark):
    cases = [
        # path is untouched when a query follows (only URL-final slashes drop)
        (1, "HTTPS://Example.COM/Path/?utm_source=x&q=1#frag",
            "https://example.com/Path/?q=1"),
        (2, "http://host.org:80/a/b/", "http://host.org/a/b"),
        (3, "https://host.org:443/x?utm_a=1&utm_b=2", "https://host.org/x"),
        (4, "https://h.io/p?a=1&utm_x=2&b=3", "https://h.io/p?a=1&b=3"),
        (5, "https://h.io/p/", "https://h.io/p"),
        (6, "https://h.io", "https://h.io"),
    ]
    df = spark.createDataFrame([(i, u) for i, u, _ in cases], ["doc_id", "url"])
    out = {r["doc_id"]: r["canonical_url"]
           for r in curation.canonicalize_urls(df, "doc_id", "url").collect()}
    for i, _, want in cases:
        assert out[i] == want, (i, out[i], want)


def test_canonicalize_urls_is_narrow(spark):
    df = spark.createDataFrame([(1, "https://x.io/a")], ["doc_id", "url"])
    assert "Exchange" not in _plan(curation.canonicalize_urls(df, "doc_id", "url"))


def test_pack_sequences_global_offsets_contiguous(spark):
    import pytest

    df = spark.createDataFrame(
        [(1, "a b", "s1"), (2, "c d e", "s1"), (3, "f g", "s2"), (4, "h", "s2")],
        ["doc_id", "text", "source"],
    )
    out = sorted(
        curation.pack_sequences(
            df, "doc_id", "text", budget=4, part_col="source", global_offsets=True
        ).collect(),
        key=lambda r: r["start_tok"],
    )
    # one contiguous token stream across sources (s1 then s2)
    assert [(r["doc_id"], r["start_tok"]) for r in out] == [(1, 0), (2, 2), (3, 5), (4, 7)]
    # doc 2 straddles the 4-token boundary under GLOBAL offsets
    assert (out[1]["first_seq"], out[1]["last_seq"]) == (0, 1)
    with pytest.raises(ValueError, match="requires part_col"):
        curation.pack_sequences(df, "doc_id", "text", 4, global_offsets=True)


def test_plan_temperature_mixture(spark):
    import pytest

    df = spark.createDataFrame(
        [(i, "en") for i in range(900)] + [(i + 1000, "de") for i in range(100)],
        ["doc_id", "lang"],
    )
    # alpha=1: natural proportions (90/10 of the total)
    nat = curation.plan_temperature_mixture(df, "lang", alpha=1.0, total=100)
    assert abs(nat["en"] * 900 - 90) < 1e-9 and abs(nat["de"] * 100 - 10) < 1e-9
    # alpha=0: uniform target (50/50), capped at availability
    uni = curation.plan_temperature_mixture(df, "lang", alpha=0.0, total=100)
    assert abs(uni["en"] * 900 - 50) < 1e-9 and abs(uni["de"] * 100 - 50) < 1e-9
    # alpha=0.3 sits between: de gets MORE than natural, less than uniform
    mid = curation.plan_temperature_mixture(df, "lang", alpha=0.3, total=100)
    assert 10 < mid["de"] * 100 < 50
    with pytest.raises(ValueError, match="alpha"):
        curation.plan_temperature_mixture(df, "lang", alpha=2.0, total=10)


def test_weighted_sample_deterministic_and_monotone(spark):
    from healthcare_api_spark.operators import curation

    df = spark.createDataFrame(
        [(i, (i % 10) + 1) for i in range(2000)], ["id", "w"]
    )
    kept1 = {r["id"] for r in curation.weighted_sample(df, "id", "w", 0.5).collect()}
    # partitioning-invariant: same draw regardless of physical layout
    kept2 = {
        r["id"]
        for r in curation.weighted_sample(df.repartition(13), "id", "w", 0.5).collect()
    }
    assert kept1 == kept2
    # monotone in weight: keep rate grows with w (w=10 keeps ~0.5, w=1 ~0.05)
    by_w = {w: 0 for w in range(1, 11)}
    for i in kept1:
        by_w[(i % 10) + 1] += 1
    assert by_w[10] > by_w[1] * 3
    assert 0.3 < by_w[10] / 200 < 0.7 and by_w[1] / 200 < 0.15
    # rate >= 1 with max weight keeps every max-weight row
    all_max = curation.weighted_sample(
        df.filter("w = 10"), "id", "w", 1.0
    ).count()
    assert all_max == 200


# ------------------------------------------------------------ interleave --


def test_interleave_round_robin_order(spark):
    from healthcare_api_spark.operators.curation import interleave_sources

    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = interleave_sources(df, "doc_id", "source", ["a", "b"]).collect()
    by_order = sorted(out, key=lambda r: r["serve_order"])
    # equal-sized sources → strict alternation a,b,a,b,...
    assert [r["source"] for r in by_order] == ["a", "b"] * 10
    # serve_order is collision-free
    assert len({r["serve_order"] for r in out}) == len(out)


def test_interleave_drops_unlisted_and_is_stable(spark):
    from healthcare_api_spark.operators.curation import interleave_sources

    rows = [(i, f"s{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out1 = interleave_sources(df, "doc_id", "source", ["s0", "s2"])
    assert out1.filter("source = 's1'").count() == 0
    # repartitioning does not move anything
    out2 = interleave_sources(df.repartition(7), "doc_id", "source", ["s0", "s2"])
    assert sorted(map(tuple, out1.collect())) == sorted(map(tuple, out2.collect()))


def test_interleave_empty_order_raises(spark):
    from healthcare_api_spark.operators.curation import interleave_sources

    df = spark.createDataFrame([(1, "a")], ["doc_id", "source"])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        interleave_sources(df, "doc_id", "source", [])


def test_domain_stats_counts_and_dup_rate(spark):
    from healthcare_api_spark.operators.curation import domain_stats

    rows = [
        (1, "https://WWW.A.com/x", "same"),
        (2, "https://a.com/y", "same"),       # exact dup content, same domain
        (3, "http://a.com:80/z", "other"),
        (4, "https://b.org/", "solo"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url", "text"])
    out = {r["domain"]: r for r in domain_stats(df, "doc_id", "url", "text").collect()}
    assert out["a.com"]["n_docs"] == 3 and out["a.com"]["n_distinct"] == 2
    assert abs(out["a.com"]["dup_rate"] - (1 - 2 / 3)) < 1e-6
    assert out["b.org"]["n_docs"] == 1 and out["b.org"]["dup_rate"] == 0.0


def test_plan_token_mixture_hits_token_budget(spark):
    from healthcare_api_spark.operators.curation import plan_token_mixture

    rows = [(i, "long", "tok " * 100) for i in range(10)]        # 1000 tokens
    rows += [(100 + i, "short", "tok " * 10) for i in range(10)]  # 100 tokens
    df = spark.createDataFrame(rows, ["doc_id", "src", "text"])
    rates = plan_token_mixture(df, "src", "text", {"long": 1.0, "short": 1.0}, 200)
    # equal token shares of 100 each: long needs rate 0.1, short rate 1.0 (capped)
    assert abs(rates["long"] - 0.1) < 1e-9
    assert rates["short"] == 1.0


def test_domain_quota_caps_and_ranks(spark):
    """u4 machinery: per-host cap, quality-desc rank with id tie-break,
    default id ordering, validation (r7)."""
    from healthcare_api_spark.operators.curation import domain_quota

    rows = [
        (1, "https://a.com/x", 0.9),
        (2, "https://WWW.A.com/y", 0.9),   # same host as 1 (www+case)
        (3, "https://a.com/z", 0.5),
        (4, "https://b.com/only", 0.1),
    ]
    df = spark.createDataFrame(rows, ["id", "url", "q"])
    out = {
        r["id"]: r
        for r in domain_quota(df, "id", "url", 2, rank_col="q").collect()
    }
    assert out[1]["domain"] == out[2]["domain"] == out[3]["domain"] == "a.com"
    # tie on q=0.9 → id asc: 1 then 2; 3 ranks third and is cut
    assert (out[1]["domain_rank"], out[2]["domain_rank"], out[3]["domain_rank"]) == (1, 2, 3)
    assert (out[1]["kept"], out[2]["kept"], out[3]["kept"]) == (1, 1, 0)
    assert out[4]["kept"] == 1
    # default ordering: id asc
    out2 = {r["id"]: r for r in domain_quota(df, "id", "url", 1).collect()}
    assert out2[1]["kept"] == 1 and out2[2]["kept"] == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        domain_quota(df, "id", "url", 0)


def test_winsorize_order_statistic_cuts(spark):
    """k=2 cuts: values below the 2nd-smallest rise to it, above the
    2nd-largest fall to it; flags audit the clip; ties at the cut are
    invariant to which tied rows the heap keeps."""
    from healthcare_api_spark.operators.curation import winsorize

    vals = [1, 5, 5, 7, 9, 100, 100, 1000]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], ["id", "v"]
    )
    rows = {r["id"]: r for r in winsorize(df, "v", k_low=2, k_high=2).collect()}
    # cut_low = max of {1, 5} = 5; cut_high = min of {1000, 100} = 100
    for i, v in enumerate(vals):
        r = rows[i]
        assert r["v_winsorized"] == max(min(v, 100), 5), (i, v)
        assert r["clipped_low"] == (1 if v < 5 else 0)
        assert r["clipped_high"] == (1 if v > 100 else 0)
    import pytest

    with pytest.raises(ValueError):
        winsorize(df, "v", k_low=0)


def test_winsorize_null_values_pass_through(spark):
    # nulls must not poison the cut heaps (Spark sorts nulls first
    # ASC) and must pass through with null flags
    from healthcare_api_spark.operators.curation import winsorize

    df = spark.createDataFrame(
        [(0, None), (1, 1), (2, 5), (3, 9), (4, 1000)],
        "id long, v long",
    )
    rows = {r["id"]: r for r in winsorize(df, "v", k_low=1, k_high=1).collect()}
    assert rows[0]["v_winsorized"] is None and rows[0]["clipped_low"] is None
    # cut_low = 1 (not null), cut_high = 1000
    assert rows[1]["clipped_low"] == 0 and rows[1]["v_winsorized"] == 1
    assert rows[3]["v_winsorized"] == 9


def test_winsorize_pct_two_pass(spark):
    """Percent cuts resolve to max(1, ceil(p·n)) order statistics over
    the NON-NULL count (r8 u7); invalid fractions raise."""
    import pytest
    from healthcare_api_spark.operators.curation import winsorize_pct

    vals = list(range(1, 101))  # 1..100, n=100
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)] + [(999, None)],
        "id long, v long",
    )
    # p=0.05 → k=5: cut_low = 5th smallest = 5, cut_high = 5th largest = 96
    rows = {
        r["id"]: r
        for r in winsorize_pct(df, "v", p_low=0.05, p_high=0.05).collect()
    }
    assert rows[0]["v_winsorized"] == 5 and rows[0]["clipped_low"] == 1
    assert rows[99]["v_winsorized"] == 96 and rows[99]["clipped_high"] == 1
    assert rows[49]["v_winsorized"] == 50
    assert rows[999]["v_winsorized"] is None
    # tiny p still clips at least the extremes (k floors at 1)
    r2 = {
        r["id"]: r
        for r in winsorize_pct(df, "v", p_low=0.001, p_high=0.001).collect()
    }
    assert r2[0]["v_winsorized"] == 1 and r2[99]["v_winsorized"] == 100
    for bad in (0.0, 1.0, -0.1):
        with pytest.raises(ValueError):
            winsorize_pct(df, "v", p_low=bad)
    with pytest.raises(ValueError, match="no non-null"):
        winsorize_pct(
            spark.createDataFrame([(1, None)], "id long, v long"), "v"
        )


def test_winsorize_crossed_cuts_raise(spark):
    """k_low + k_high > non-null rows can cross the cuts (cut_low >
    cut_high); the old clamp silently raised every value to cut_low —
    now it raises (ADVICE r7). Equal cuts (exactly meeting in the
    middle) remain legal."""
    import pytest
    from healthcare_api_spark.operators.curation import winsorize

    df = spark.createDataFrame([(0, 1), (1, 9)], ["id", "v"])
    with pytest.raises(ValueError, match="crossed"):
        winsorize(df, "v", k_low=2, k_high=2).collect()
    # 3 rows, k=2/2: cut_low = 5, cut_high = 5 — equal, not crossed
    df3 = spark.createDataFrame([(0, 1), (1, 5), (2, 9)], ["id", "v"])
    rows = {r["id"]: r for r in winsorize(df3, "v", k_low=2, k_high=2).collect()}
    assert [rows[i]["v_winsorized"] for i in range(3)] == [5, 5, 5]


def test_importance_weights_orders_by_target_likeness(spark):
    """Docs made of target-only tokens must outscore docs of
    non-target tokens; a doc mixing both lands between."""
    from pyspark.sql import functions as F

    from healthcare_api_spark.operators.curation import importance_weights

    rows = (
        [(i, "alpha beta gamma", 1) for i in range(5)]
        + [(10 + i, "delta epsilon zeta", 0) for i in range(5)]
        + [(20, "alpha beta gamma", 0), (21, "delta epsilon zeta", 1),
           (22, "alpha delta", 0)]
    )
    df = spark.createDataFrame(rows, ["id", "text", "tgt"])
    out = {
        r["id"]: r
        for r in importance_weights(
            df, "id", "text", F.col("tgt") == 1, num_buckets=64
        ).collect()
    }
    assert out[0]["is_target"] == 1 and out[10]["is_target"] == 0
    # target-token doc > mixed doc > raw-token doc
    assert out[20]["log_weight"] > out[22]["log_weight"] > out[10]["log_weight"]
    assert out[0]["n_tokens"] == 3


def test_importance_weights_python_reference(spark):
    """Exact parity with a NumPy-free python reference on a tiny
    corpus (hashed buckets, Laplace smoothing, one-rational ln)."""
    import hashlib
    import math
    from collections import Counter, defaultdict

    from pyspark.sql import functions as F

    from healthcare_api_spark.operators.curation import importance_weights

    rows = [(0, "a b a", 1), (1, "b c", 0), (2, "a c c", 0)]
    B = 8

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % B

    dtf = {i: Counter(bucket(t) for t in txt.split()) for i, txt, _ in rows}
    r = defaultdict(int)
    t = defaultdict(int)
    for i, _, tgt in rows:
        for b, c in dtf[i].items():
            r[b] += c
            if tgt:
                t[b] += c
    R, T = sum(r.values()), sum(t.values())
    want = {
        i: round(
            sum(
                c * math.log(((t[b] + 1) * (R + B)) / ((r[b] + 1) * (T + B)))
                for b, c in dtf[i].items()
            ),
            6,
        )
        for i, _, _ in rows
    }
    df = spark.createDataFrame(rows, ["id", "text", "tgt"])
    got = {
        rr["id"]: rr["log_weight"]
        for rr in importance_weights(
            df, "id", "text", F.col("tgt") == 1, num_buckets=B
        ).collect()
    }
    assert got == want

    import pytest

    with pytest.raises(ValueError):
        importance_weights(df, "id", "text", F.col("tgt") == 1, num_buckets=0)


def test_leakage_safe_splits_cluster_atomic(spark):
    # chain 1-2-3 plus pair (10, 11); 20 is a singleton
    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 11, 20)], ["doc_id"]
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
    )
    got = {
        r["doc_id"]: (r["cluster_id"], r["split"])
        for r in curation.leakage_safe_splits(
            docs, "doc_id", pairs, "id_a", "id_b",
            {"train": 0.5, "val": 0.25, "test": 0.25},
        ).collect()
    }
    assert got[1][0] == got[2][0] == got[3][0] == 1
    assert got[10][0] == got[11][0] == 10
    assert got[20][0] == 20
    # atomicity: same cluster -> same split
    assert got[1][1] == got[2][1] == got[3][1]
    assert got[10][1] == got[11][1]


def test_leakage_safe_splits_match_python_md5(spark):
    from healthcare_api_spark.operators.curation import sample_threshold

    docs = spark.createDataFrame([(i,) for i in range(40)], ["doc_id"])
    pairs = spark.createDataFrame(
        [(i, i + 20) for i in range(20)], ["id_a", "id_b"]
    )
    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    t_train = sample_threshold(0.8)
    t_val = sample_threshold(0.9)

    def want_split(cid: int) -> str:
        h = hashlib.md5(f"split:{cid}".encode()).hexdigest()[:8]
        if h < t_train:
            return "train"
        if h < t_val:
            return "val"
        return "test"

    for r in curation.leakage_safe_splits(
        docs, "doc_id", pairs, "id_a", "id_b", splits
    ).collect():
        assert r["cluster_id"] == r["doc_id"] % 20
        assert r["split"] == want_split(r["cluster_id"])


def test_blocklist_screen_thresholds_and_hard_terms(spark):
    docs = spark.createDataFrame(
        [
            (1, "clean text " * 50),                      # 0 hits
            (2, "bad " + "ok " * 9),                      # 1/10 = 100000 ppm
            (3, "nuke " + "fine " * 999),                 # hard term
            (4, "bad " + "w " * 99_999),                  # 1/100000 = 10 ppm
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_hits"], r["n_hard_hits"], r["hit_ppm"], r["flagged"])
        for r in curation.blocklist_screen(
            docs, "doc_id", "text", terms=("bad",), hard_terms=("nuke",),
            max_ratio_ppm=20_000,
        ).collect()
    }
    assert got[1] == (0, 0, 0, 0)
    assert got[2] == (1, 0, 100000, 1)      # soft threshold trips
    assert got[3][1] == 1 and got[3][3] == 1  # any hard hit flags
    assert got[4] == (1, 0, 10, 0)          # below ppm, unflagged
    import pytest

    with pytest.raises(ValueError):
        curation.blocklist_screen(docs, "doc_id", "text", terms=())


def test_temperature_mixture_hand_computed_and_upsampling(spark):
    import math

    from healthcare_api_spark.operators.curation import (
        temperature_mixture_rates,
    )

    # 1600 'big' vs 100 'small' docs: α=3/4 weights 1600^.75=251.98...,
    # 100^.75=31.62... — the small stratum's SHARE rises from 100/1700
    # ≈ 5.9% to ~11.1%, so its rate beats proportional sampling
    rows = [(i, "big") for i in range(1600)] + [
        (10_000 + i, "small") for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    rates = temperature_mixture_rates(df, "lang", total=170, alpha_quarters=3)
    wb = math.sqrt(math.sqrt(float(1600 ** 3)))
    ws = math.sqrt(math.sqrt(float(100 ** 3)))
    z = 0.0 + wb + ws
    assert rates["big"] == min(1.0, (wb / z) * 170 / 1600)
    assert rates["small"] == min(1.0, (ws / z) * 170 / 100)
    # temperature upsamples the tail: small's rate > the uniform rate
    assert rates["small"] > 170 / 1700 and rates["big"] < 170 / 1600 * 1.0 + 1e-9
    # α=1 (no temperature) gives proportional rates: both equal
    flat = temperature_mixture_rates(df, "lang", total=170, alpha_quarters=4)
    assert abs(flat["big"] - 0.1) < 1e-12 and abs(flat["small"] - 0.1) < 1e-12


def test_temperature_mixture_validation(spark):
    import pytest

    from healthcare_api_spark.operators.curation import (
        temperature_mixture_rates,
    )

    df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    with pytest.raises(ValueError):
        temperature_mixture_rates(df, "lang", total=10, alpha_quarters=5)
    with pytest.raises(ValueError, match="no non-empty"):
        temperature_mixture_rates(
            df.filter("doc_id > 1"), "lang", total=10
        )
    # the rate caps at 1.0 when a stratum is smaller than its target
    rates = temperature_mixture_rates(df, "lang", total=10)
    assert rates == {"en": 1.0}
