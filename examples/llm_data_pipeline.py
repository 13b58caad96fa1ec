"""Training-data preparation pipeline on the engine's LLM operators.

The north-star use case (BASELINE.json): take a raw document corpus +
embeddings and produce a cleaned, deduplicated, quality-filtered corpus
with stats — every stage a distributed operator from this package:

  1. language-ID + quality scoring (textops)
  2. quality + repetition + Gopher charter rules + bigram-LM
     perplexity TIER gates (CCNet head-middle-tail) + per-domain
     quota capping + DSIR importance annotation
  3. PII redaction (curation; narrow regexp chain)
  4. benchmark decontamination (curation; broadcast n-gram overlap)
  5. exact dedup (normalized-content fingerprints)
  6. near-dup clustering (minhash bands → connected components),
     keep cluster representatives
  7. embedding near-dup sweep within LSH buckets (similarity)
  8. mixture sampling to target language proportions (deterministic
     md5-threshold; reproducible across engines/cluster sizes)
  9. BPE tokenizer training on the cleaned corpus + token
     accounting + sequence packing (concat-and-chunk)
 10. LEAKAGE-SAFE splits (near-dup clusters atomically assigned via
     the cluster canonical's hash) + round-robin source interleave,
     written partitioned by language/split in serve order; 9d reports
     the corpus's mean cross-document 3-gram novelty

Run: python examples/llm_data_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from healthcare_api_spark import get_spark
from healthcare_api_spark.operators import curation, dedup, similarity, textops
from healthcare_api_spark.tables import load_table



import time as _time

_LAST_TICK = [None]


def _tick(label: str) -> None:
    """Coarse per-phase wall time (SPARK_PIPE_STAGE_TIMES=1): phases
    end at an action (count/collect/checkpoint/write), so the elapsed
    time since the previous tick is that phase's cost — the dominant-
    stage report the SCALE.md volume run records."""
    now = _time.perf_counter()
    if os.environ.get("SPARK_PIPE_STAGE_TIMES") and _LAST_TICK[0] is not None:
        print(f"[stage-time] {label}: {now - _LAST_TICK[0]:.1f}s", flush=True)
    _LAST_TICK[0] = now

def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = tempfile.mkdtemp(prefix="llm_corpus_")
    spark = get_spark("llm-pipeline")

    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()
    _tick("1 load")

    # 1+2 FUSED (r10 — the ×25 SCALE.md lesson: this phase was 61% of
    # pipeline wall because the WIDE docs row, text included, was
    # shuffled through six sequential doc_id joins). Every signal here
    # is a per-doc function of text alone with corpus-INDEPENDENT
    # thresholds, so each operator runs over the SLIM (doc_id, text)
    # projection, only the ≤4-column signal frames join each other,
    # and the wide docs row crosses ONE join at the end. The filters
    # are conjunctive, so the surviving set is IDENTICAL to the old
    # sequential form; perplexity tiers — whose percentile cuts ARE
    # corpus-dependent — stay sequential below, as do quota and DSIR.
    slim = docs.select("doc_id", "text")
    # language + quality (narrow CASE/regex projections)
    lang = textops.lang_id(slim, "doc_id", "text")
    qual = textops.quality_score(slim, "doc_id", "text")
    # repetition signal (per-doc n-gram aggregate)
    rep = curation.repetition_features(slim, "doc_id", "text", ngram_n=2)
    # Gopher charter rules (Rae et al. 2021 table A1; map-only)
    goph = textops.gopher_quality(
        slim, "doc_id", "text",
        min_words=10, max_words=100_000, min_mean_len=2.0,
        max_mean_len=10.0, min_alpha_ratio=0.5, min_stop_hits=0,
    )
    # LDNOOBW-style blocklist screen (soft ppm + hard zero-tolerance)
    screen = curation.blocklist_screen(
        slim, "doc_id", "text",
        terms=("badword", "spamtoken"), hard_terms=("hardstop",),
        max_ratio_ppm=20_000,
    )
    # hashing-trick classifier (annotation, not a gate — placeholder
    # weights; a trained table drops in at the same schema)
    clf_w = textops.hashed_feature_weights(spark, dim=256, scale=1_000_000)
    clf = textops.hashed_classifier_score(
        slim, "doc_id", "text", clf_w, dim=256, scale=1_000_000
    )
    first_gate = (
        qual.select("doc_id", "score")
        .join(rep.select("doc_id", "dup_ngram_frac"), "doc_id")
        .filter((F.col("score") >= 0.5) & (F.col("dup_ngram_frac") < 0.9))
    )
    n_gated = first_gate.count()
    signals = (
        first_gate.select("doc_id", "score")
        .join(lang, "doc_id")
        .join(goph.filter(F.col("keep") == 1).select("doc_id"), "doc_id")
        .join(
            screen.filter(F.col("flagged") == 0).select("doc_id"), "doc_id"
        )
        .join(
            clf.select("doc_id", F.col("logit").alias("clf_logit")),
            "doc_id",
        )
    )
    gated = docs.join(signals, "doc_id")

    # 2b. perplexity tiers: drop the 'tail' tier under the corpus's
    # own interpolated bigram LM (the CCNet head/middle/tail filter —
    # exact-percentile cuts, fully deterministic, r7)
    tiers = textops.perplexity_buckets(
        gated, "doc_id", "text", fractions=(0.4, 0.8)
    )
    gated = gated.join(
        tiers.filter(F.col("tier") != "tail").select("doc_id"), "doc_id"
    )
    # pin after each gating phase: every downstream stage (and its
    # count) otherwise REPLAYS the whole annotate→gate lineage — the
    # example ran ~20 min at sf0.001 from exactly that O(stages²)
    # recompute before these barriers
    gated = gated.localCheckpoint(eager=True)
    _tick("2 annotate+quality gates")

    # 2c. per-domain quota (r8 wiring): cap any single host's
    # contribution BEFORE the expensive dedup/mixture stages so mirror
    # farms can't dominate the mix — best quality first, full audit
    # trail kept. (The synthetic corpus has no URL column; derive a
    # stand-in host from the source field, which is what it models.)
    with_url = gated.withColumn(
        "url",
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/d/"),
            F.col("doc_id").cast("string"),
        ),
    )
    quota = curation.domain_quota(
        with_url, "doc_id", "url", max_per_domain=max(20, n_gated // 4),
        rank_col="clf_logit",
    )
    gated = gated.join(
        quota.filter(F.col("kept") == 1).select("doc_id"), "doc_id"
    ).localCheckpoint(eager=True)

    # 2d. DSIR importance annotation (r8 wiring): hashed-unigram
    # log-likelihood ratio of the English subset vs the raw corpus —
    # the model-free signal for skewing the crawl toward a quality
    # reference; kept as a column so the mixture stage could weight by
    # it, and reported per language at the end
    dsir = curation.importance_weights(
        gated, "doc_id", "text", F.col("pred_lang") == "en",
        num_buckets=256,
    )
    gated = gated.join(
        dsir.select("doc_id", "log_weight"), "doc_id"
    ).localCheckpoint(eager=True)
    _tick("2cd domain quota + DSIR")

    # 3. PII redaction: downstream stages consume the scrubbed text
    redacted = curation.redact_pii(gated, "doc_id", "text")
    gated = (
        gated.join(redacted.select("doc_id", "clean_text"), "doc_id")
        .drop("text")
        .withColumnRenamed("clean_text", "text")
    ).localCheckpoint(eager=True)

    # 3b. corpus-wide sentence dedup: sentences seen earlier (by
    # (doc_id, position)) are removed everywhere else — the
    # MassiveText/CCNet boilerplate pass; docs left empty drop out
    sent = dedup.sentence_dedup(gated, "doc_id", "text")
    gated = (
        gated.drop("text")
        .join(
            sent.filter(F.col("n_kept") > 0).select(
                "doc_id", F.col("text_deduped").alias("text")
            ),
            "doc_id",
        )
    ).localCheckpoint(eager=True)

    # 3c. paragraph-level passage removal (r8): fixed 25-token chunks
    # deduplicated corpus-wide, first occurrence kept — catches the
    # repeated license blocks / mirrored passages that line-level
    # dedup (3b) misses when surrounding text differs; docs left empty
    # drop out
    para = dedup.paragraph_dedup(gated, "doc_id", "text", chunk_tokens=25)
    gated = (
        gated.drop("text")
        .join(
            para.filter(F.col("n_kept") > 0).select(
                "doc_id", F.col("text_dedup").alias("text")
            ),
            "doc_id",
        )
    ).localCheckpoint(eager=True)

    # 4. decontamination vs a benchmark slice (stand-in for an eval suite)
    bench = docs.filter(F.col("doc_id") % 101 == 0)
    contam = curation.decontaminate(gated, bench, "doc_id", "text", shingle_n=5)
    gated = gated.join(
        contam.filter(F.col("contaminated") == 0).select("doc_id"), "doc_id"
    ).localCheckpoint(eager=True)
    n_decontam = gated.count()
    _tick("3+4 redact, sent/para dedup, decontam")

    # 5. exact dedup on normalized content (persisted: feeds candidate
    # generation, clustering, and the final corpus join)
    exact = dedup.exact_dedup_by_content(gated, "doc_id", "text")
    exact_survivors = exact.filter(F.col("doc_id") == F.col("canonical_id")).persist()

    # 5b. Bloom screen vs the PREVIOUS release (r8): a 4096-bit filter
    # over the prior corpus's content hashes — the probe side never
    # joins (or even reads) the old corpus, it broadcasts a ~2 KB
    # sketch; the price is a known false-positive rate (docs wrongly
    # treated as already-shipped), measured here against exact truth
    from healthcare_api_spark.operators import sketches as _sk

    prior = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.md5(F.col("text")).alias("h")
    )
    bloom = _sk.bloom_build(prior, "h", m_bits=4096, k_hashes=4)
    screened = _sk.bloom_probe(
        bloom,
        gated.select(F.md5(F.col("text")).alias("h")).distinct(),
        "h", m_bits=4096, k_hashes=4,
    )
    n_screened = screened.filter(F.col("contained") == 1).count()
    _tick("5 exact dedup + bloom screen")

    # 6. near-dup clusters: minhash band candidates → components
    # (alternating large-star/small-star, r8 — O(log² n) rounds where
    # plain propagation costs the component diameter) → keep the
    # cluster minimum as representative; docs in no pair are their own
    # singleton cluster
    from healthcare_api_spark.operators import graph

    pairs = dedup.lsh_candidate_pairs(
        exact_survivors, "doc_id", "text", num_hashes=8, rows_per_band=2
    )
    cc = graph.connected_components(pairs, "id_a", "id_b", iters=6)
    reps = (
        exact_survivors.select("doc_id")
        .join(cc, exact_survivors["doc_id"] == cc["node"], "left")
        .filter(F.col("node").isNull() | (F.col("node") == F.col("component")))
        .select("doc_id")
    )
    # persisted: four downstream actions (count, token stats, the
    # partitioned write, the per-language report) would otherwise re-run
    # the whole annotate→gate→dedup→cluster lineage each
    corpus = exact_survivors.join(reps, "doc_id").persist()
    n_corpus = corpus.count()
    _tick("6 neardup cluster (LSH+CC)")

    # 7. embedding near-dup audit (separate modality, LSH-bucketed)
    emb = load_table(spark, sf_dir, "embeddings")
    bucketed = similarity.hyperplane_buckets(emb, "embedding", dim=64, n_planes=8)
    emb_pairs = dedup.embedding_neardup_pairs(
        bucketed, "vec_id", "embedding", "bucket", threshold=0.95
    )
    n_emb_dups = emb_pairs.count()
    _tick("7 embedding neardup")

    # 7b. embedding-space balance audit (r8): one exact-arithmetic
    # k-means statistics round against fixed probe centroids — the
    # cluster occupancy report (how concentrated is the corpus in
    # embedding space) at k·dim driver cost
    probe_cents = [
        [1.0 if d == (c * 7) % 64 else 0.0 for d in range(64)]
        for c in range(8)
    ]
    km = similarity.kmeans_update_stats(emb, "embedding", probe_cents)
    cluster_sizes = {
        r["cluster"]: r["n_members"]
        for r in km.filter(F.col("dim") == 0).collect()
    }

    # 8. mixture sampling: temperature-scaled (n^(3/4)) language
    # rebalancing — the mBERT/XLM-R tail-upsampling rule, with rates
    # computed FROM the corpus counts (u16) instead of hand-set props
    # (deterministic — rerunning with the same salt reproduces the draw)
    rates = curation.temperature_mixture_rates(
        corpus, "pred_lang", total=max(1, n_corpus // 2), alpha_quarters=3
    )
    corpus = curation.stratified_sample(
        corpus, "doc_id", "pred_lang", rates, salt="mix-v1"
    ).persist()
    n_mixed = corpus.count()
    _tick("8 mixture sample")

    # 9. token accounting + sequence packing on the survivors. Doc
    # lengths are WINSORIZED first (r8 wiring): order-statistic cuts
    # clip the length outliers so the mean-tokens-per-doc stat the
    # mixture planner consumes isn't dragged by a handful of giants —
    # clip flags kept for the report.
    tokens = textops.token_counts(corpus, "doc_id", "text")
    wins = curation.winsorize(
        tokens, "n_tokens",
        k_low=max(1, n_mixed // 20), k_high=max(1, n_mixed // 20),
    )
    n_clipped = wins.agg(
        (F.sum("clipped_low") + F.sum("clipped_high")).alias("c")
    ).collect()[0]["c"]
    stats = wins.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        F.sum("n_subwords").alias("subwords"),
        F.round(F.avg("n_tokens_winsorized"), 2).alias("mean_tokens_wins"),
    ).collect()[0]
    packed = curation.pack_sequences(
        corpus, "doc_id", "text", budget=512, part_col="pred_lang"
    )
    n_seqs = packed.agg((F.max("last_seq") + 1).alias("m")).collect()[0]["m"]
    # …or overlapping token windows instead of packing (the RAG shape)
    n_chunks = textops.chunk_tokens(
        corpus, "doc_id", "text", chunk_size=64, overlap=16
    ).count()
    _tick("9 tokens+winsorize+pack+chunks")

    # 9a. train a BPE tokenizer ON the cleaned corpus (r7; r8 batched):
    # one corpus token-frequency pass, then vocabulary-sized merge
    # rounds learning up to 3 symbol-disjoint merges per round
    # (exactly equal to sequential) — the tokenizer artifact ships
    # WITH the dataset it was trained on
    bpe_merges = textops.bpe_train(corpus, "text", n_merges=6, batch_merges=3)

    # 9a'. bill the corpus in TRAINED-vocabulary tokens (r8): encode
    # the distinct-word table once through the learned merges and join
    # lengths back per doc — the token count sequence packing and
    # budget planning actually consume
    billed = textops.bpe_encode(corpus, "doc_id", "text", bpe_merges)
    bpe_tokens = billed.agg(F.sum("n_tokens").alias("t")).collect()[0]["t"]
    _tick("9a BPE train+encode")

    # 9b. vocabulary heavy hitters off a count-min sketch (fixed-size
    # summary — the corpus-stats report a 100 TB run can afford)
    from healthcare_api_spark.functions.text import tokens as _tok_expr
    from healthcare_api_spark.operators import sketches

    tf = (
        corpus.select(F.explode(_tok_expr(F.col("text"))).alias("tok"))
        .groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    )
    hh = sketches.cms_lookup(
        sketches.cms_build(tf, "tok", weight_col="c"),
        tf.select("tok"), "tok", depth=4, width=1024,
    ).orderBy(F.col("est").desc(), "tok").limit(5)
    top_vocab = [(r["tok"], r["est"]) for r in hh.collect()]
    _tick("9b CMS heavy hitters")

    # 9c. cross-language vocabulary overlap from KMV sketches alone
    # (r7): per-language distinct-token sketches, then pairwise
    # union/intersection/Jaccard WITHOUT rescanning the corpus — the
    # mixture-diversity report at sketch cost
    vocab_sk = sketches.kmv_build(
        corpus.select("pred_lang", F.explode(_tok_expr(F.col("text"))).alias("tok")),
        ["pred_lang"], "tok", k=64,
    )
    vocab_overlap = [
        (r["group_a"], r["group_b"], r["jaccard"])
        for r in sketches.kmv_set_ops(vocab_sk, "pred_lang", k=64).collect()
    ]

    # 9d. cross-document n-gram novelty (r8): what fraction of each
    # kept doc's 3-grams is unique to it? a low corpus-wide mean says
    # the dedup stages left templated text behind — the memorization
    # screen as a release-quality metric
    novelty = textops.ngram_novelty(corpus, "doc_id", "text", n=3)
    mean_novelty = novelty.agg(
        F.round(F.avg("novelty"), 4).alias("m")
    ).collect()[0]["m"]
    _tick("9cd KMV overlap + novelty")

    # 10. LEAKAGE-SAFE train/val/test assignment (r8) + round-robin
    # source interleave: the split hash is keyed on the stage-6
    # near-dup CLUSTER canonical, not the doc id — so if a near-copy
    # of a kept doc is ever re-admitted by a later append, it lands in
    # the SAME split as its cluster instead of contaminating eval;
    # interleaving alternates languages so training batches never see
    # long single-source runs
    corpus = curation.leakage_safe_splits(
        corpus, "doc_id", pairs, "id_a", "id_b",
        {"train": 0.9, "val": 0.05, "test": 0.05}, salt="splits-v1",
        iters=6,
    )
    order = sorted(langs_ for (langs_,) in corpus.select("pred_lang").distinct().collect())
    corpus = curation.interleave_sources(corpus, "doc_id", "pred_lang", order)
    corpus.select(
        "doc_id", "text", "pred_lang", "score", "split", "serve_order"
    ).sortWithinPartitions("serve_order").write.mode("overwrite").partitionBy(
        "pred_lang", "split"
    ).parquet(out_dir)
    _tick("10 splits+interleave+write")

    langs = {r["pred_lang"]: r["cnt"] for r in corpus.groupBy("pred_lang").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    dsir_by_lang = {
        r["pred_lang"]: r["w"]
        for r in corpus.groupBy("pred_lang")
        .agg(F.round(F.avg("log_weight"), 3).alias("w"))
        .collect()
    }
    print(f"input docs:            {n0}")
    print(f"after quality gates:   {n_gated}")
    print(f"after decontamination: {n_decontam}")
    print(f"after exact+near dedup:{n_corpus}")
    print(f"embedding near-dups:   {n_emb_dups}")
    print(f"bloom already-shipped: {n_screened} (incl. measured FPs)")
    print(f"after mixture sample:  {n_mixed}")
    print(f"corpus tokens:         {stats['tokens']} ({stats['subwords']} subwords)")
    print(f"BPE-billed tokens:     {bpe_tokens} (trained vocab)")
    print(f"embedding clusters:    {cluster_sizes}")
    print(f"winsorized lengths:    mean {stats['mean_tokens_wins']} ({n_clipped} clipped)")
    print(f"packed sequences/lang: max {n_seqs} @512 tokens")
    print(f"RAG chunks (64/16):    {n_chunks}")
    splits_out = {
        r["split"]: r["cnt"]
        for r in corpus.groupBy("split").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    print(f"mean 3-gram novelty:   {mean_novelty}")
    print(f"leakage-safe splits:   {splits_out}")
    print(f"by language:           {langs}")
    print(f"DSIR weight by lang:   {dsir_by_lang}")
    print(f"top vocab (CMS est):   {top_vocab}")
    print(f"vocab overlap (KMV):   {vocab_overlap}")
    print(f"BPE merges:            {[(x, y) for _, x, y, _ in bpe_merges]}")
    print(f"written to:            {out_dir}")


if __name__ == "__main__":
    main()
