"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ..., "queries_cold": {...},
"cold_total_sec": ..., "steady_totals": [...], "runs": 4}.

Execution is forced with the noop sink (full computation, no driver
collect) so timings measure the engine, not result transfer.

Methodology (round 3: median-of-3 steady passes). Measured host variance
on identical code within round 2 was 9.85→14.7 s — larger than any real
round-over-round delta — so a single pass is noise. Each query now runs
FOUR times:

- pass 1 (``queries_cold``/``cold_total_sec``): pays the one-time JVM
  costs — Janino compilation of whole-stage-codegen fragments and
  HotSpot JIT (~7.6 s across the 18 queries at sf0.1, a constant
  independent of data volume). Comparable to round 1's single-pass
  numbers.
- passes 2-4: steady state. ``queries`` reports the per-query MEDIAN of
  the three; ``value`` is the sum of those medians — the per-query
  engine throughput that scales with SF and the number a 1000-executor
  cluster amortizing compile over hours of work would see.
  ``steady_totals`` keeps each pass's raw total so the spread (host
  noise) is visible next to the median.

Round 8 (VERDICT r7 #1): the frozen r3 comparable-18 set additionally
runs as its OWN ISOLATED first loop — fresh JVM state, before any of
the other 38 headline queries have compiled or cached anything — and
that subtotal is emitted as ``comparable_subtotal_isolated_sec`` (with
a per-query-min floor beside it). Rationale: in r7 the interleaved
subtotal "regressed" 10.85 → 12.74 s purely because the sweep grew to
56 queries sharing one JVM (codegen-cache and GC pressure from
neighbors); isolated re-measures showed 9.96–11.0 s. The isolated field
is the longitudinal code-performance signal; the interleaved
``comparable_subtotal_sec`` stays for continuity and as a measure of
sweep crosstalk. ``queries_cold`` for the 18 comes from the isolated
loop's first pass (the only true cold).

Round 10 (VERDICT r9 #1): the HEAVY-GATE classes — real streaming
runs (st5–st12), video decode (m18/m19), layout-building probes
(v12/v13/v17), train-then-encode BPE (t27), and t30 (a r9 phantom-
spike victim) — run in their OWN per-query isolated loop: each query
takes a GC barrier, then its cold + 3 steady passes back-to-back,
BEFORE the interleaved sweep. Their ledger numbers (median and min)
come from that loop and they are EXCLUDED from the interleaved sweep.
Rationale: the 118-query single-JVM interleaved sweep let one slow
host window land on 2 of 3 steady passes and record 4–30× phantom
spikes (r9 ledger: v17 31.5 s vs 0.94 s re-measured isolated, st10
22.0 vs 5.2, m18 27.7 vs 3.0, t30 5.5 vs 1.2). ``queries_min`` is
emitted for EVERY query beside the median so a reader can always
separate "host was slow" from a real regression.

Round 11 (VERDICT r10 #1/#3): the output JSON's KEY ORDER is part of
the protocol — the driver persists only the last ~2,000 characters of
this line, so the big maps (queries_cold, queries, queries_min)
serialize FIRST and the adjudication tail LAST: steady_totals, the
interleaved comparable subtotals, per-heavy-gate ``heavy_gates``
[median, min, cold] triples (for the index-backed probes v12/v13/v17,
cold ≈ index BUILD and median/min ≈ the probe users repeat — the
build/probe split), the isolated-18 per-query medians AND mins, and
the isolated subtotals as the final keys. A reader holding only the
stored tail can apply the rule below without re-running anything.

ADJUDICATION RULE (VERDICT r9 #7, for future rounds): a per-query
median that moves >2× round-over-round WITH NO CODE CHANGE to that
query is a measurement-protocol fault — re-measure it isolated (fresh
session, GC barrier, 3+ passes, take the min and median) before
believing it. It is NOT a regression to "fix": re-optimizing healthy
code against host-window noise churns plans that already passed
review. Only a move that reproduces isolated, or follows a code/plan
change to that query, is a real regression.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from healthcare_api_spark import get_spark

# The r3 18-query set, frozen: its steady-median subtotal is emitted as
# ``comparable_subtotal_sec`` every round so round-over-round totals stay
# directly comparable as the headline set grows (VERDICT r4 task #5).
R3_COMPARABLE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "j1_broadcast_join",
    "j3_explode_join",
    "w1_latest_per_key",
    "s8_upsert_lastwin",
    "st1_tumbling_window",
    "d1_dedup_exact",
    "d2_dedup_minhash",
    "d4_ngram_jaccard",
    "v1_ann_topk",
    "t2_quality_score",
    "t4_fingerprints",
    "x1_asof_join",
    "x3_hierarchical_rollup",
    "a6_grouping_sets",
]

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "j1_broadcast_join",
    "j3_explode_join",
    "w1_latest_per_key",
    "s8_upsert_lastwin",
    "st1_tumbling_window",
    "d1_dedup_exact",
    "d2_dedup_minhash",
    "d4_ngram_jaccard",
    "v1_ann_topk",
    "t2_quality_score",
    "t4_fingerprints",
    "x1_asof_join",
    "x3_hierarchical_rollup",
    "a6_grouping_sets",
    # round 4: the three heaviest r3 additions tracked round-over-round
    "d11_fuzzy_join",
    "v5_knn_join",
    "t14_bpe_pairs",
    # round 4 additions: global-sort blocking, bigram-LM joins, CMS
    "d12_sorted_neighborhood",
    "t17_bigram_logprob",
    "k3_cms_heavy_hitters",
    "d13_passjoin",
    "a14_co_occurrence",
    # round 4 late wave: corpus-wide sentence dedup, triangle counting,
    # positional-index phrase search, pixel perceptual hashing,
    # sketch rollup
    "d17_sentence_dedup",
    "g2_triangle_count",
    "t18_phrase_search",
    "m12_image_ahash",
    "k6_sketch_rollup",
    # round 6: the two new frozen-artifact graduates — integer PQ ADC
    # (scan reads only codes-width data) and the 38-step LTTB pipeline
    "v7_pq_topk",
    "x7_lttb_downsample",
    # round 7 (VERDICT r6 #7): the multimodal/ANN surface was thin on
    # longitudinal perf coverage — image near-dup grouping + Hamming
    # pairs + hash retrieval, the IVF probe, and SemDeDup (the suite's
    # heaviest query, k frozen at 8 for oracle portability)
    "m13_image_neardup",
    "m14_image_hamming_pairs",
    "m15_image_hash_retrieval",
    "v3_ivf_topk",
    "d14_semdedup",
    # round 7 additions: Gopher repetition filter, hybrid BM25⊕ANN
    # RRF retrieval, label-propagation communities
    "t22_repetition_filter",
    "v9_hybrid_rrf",
    "g4_label_propagation",
    "t23_bpe_train",
    "t24_perplexity_buckets",
    "st5_streaming_neardup",
    "x13_matrix_profile",
    # round 7 second wave: windowed audio features, prefix-dim rerank,
    # KMV set algebra, streaming KMV fold
    "m16_audio_vad_windows",
    "v10_prefix_rerank",
    "k7_kmv_set_ops",
    "st6_streaming_kmv",
    "x14_sax_symbols",
    "w12_sessionize",
    "w13_session_flows",
    "u6_winsorize",
    "v11_ann_recall",
    "d18_prefix_jaccard",
    "x15_sax_motifs",
    # round 8: the partition-pruned probes (scan-pruning is the
    # longitudinal claim — watch them stay near the probed-fraction
    # floor)
    "v12_ivf_pruned",
    "v13_lsh_pruned",
    # round 8: streaming session flows — a third real streaming run in
    # the headline (state churn on the bucketed versioned store)
    "st7_streaming_session_flows",
    # round 8 third wave: alternating-star CC (8 edge-rewrite rounds),
    # corpus-wide paragraph dedup (two text shuffles), the broadcast
    # Bloom probe, SAX word-similarity pairs, and a fourth real
    # streaming run (Bloom fold on the versioned store)
    "g5_connected_components",
    "d19_paragraph_dedup",
    "k9_bloom_filter",
    "x16_sax_similarity",
    "st8_streaming_bloom",
    "t25_substring_search",
    # round 8 fourth wave: streaming CMS fold (fifth real streaming
    # run), the MRR/AP ranking eval, and the Gopher rule filter (one
    # map-only projection — the row-level charter pass)
    "st9_streaming_cms",
    "v14_rank_metrics",
    "t26_gopher_rules",
    "u8_importance_weights",
    # round 8 fifth wave: train-then-encode BPE accounting (16
    # vocabulary-sized rounds, encode half driver-round-trip-free) and
    # the exact-integer k-means sufficient-statistics round
    "t27_bpe_encode",
    "v15_kmeans_stats",
    "t28_multi_substring",
    "t29_char_entropy",
    "d20_cdc_chunks",
    "v16_ivfpq_topk",
    # round 8 seventh wave: the hashing-trick classifier (one corpus
    # scan + ≤256-row broadcast), streaming HLL fold (sixth real
    # streaming run — completes the mergeable-sketch matrix), and
    # filtered vector search (PartitionFilters × PushedFilters)
    "t30_hashed_classifier",
    "st10_streaming_hll",
    "v17_filtered_ann",
    "u9_curation_pipeline",
    # round 8 eighth wave: Adamic-Adar wedge join, the bounded-frame
    # MMR greedy, corpus-wide n-gram novelty (two gram shuffles), and
    # the cluster-atomic split composition (CC + hash buckets)
    "g6_adamic_adar",
    "v18_mmr_topk",
    "t31_ngram_novelty",
    "u10_leakage_safe_splits",
    "x17_holt_linear",
    "m17_image_patches",
    "d21_containment",
    "t32_readability",
    "s14_soft_delete",
    "st11_streaming_ewma",
    "v19_binary_ann",
    "u11_dedup_eval",
    "x18_acf",
    "v20_rag_pipeline",
    "g7_personalized_pagerank",
    "u12_lsh_eval",
    "m18_keyframes",
    "g8_modularity",
    "t33_rake_keywords",
    "u13_entity_resolution",
    "t34_blocklist_screen",
    # round 9: the md5-uuid map-only pass, the composed
    # curate→split→pack→serve data-loader gate, exact-integer HITS,
    # and seasonal Holt-Winters
    "f7b_uuid3",
    "u14_dataloader_pipeline",
    "g9_hits",
    "x19_holt_winters",
    # round 9 second session: multi-source BFS, lossless L2 range
    # join, banded-DTW wavefront
    "g10_bfs_hops",
    "v21_l2_range_join",
    "x21_dtw_band",
    "g11_stress_centrality",
    "u15_kcenter_coreset",
    "x22_binseg_changepoints",
    "x23_forecast_mase",
    "s15_time_travel",
    "g12_sssp_weighted",
    "m19_patch_vote_neardup",
    "w14_sequence_match",
    "st12_streaming_cep",
    "u16_temperature_mixture",
    "x24_series_features",
    # round 10: vocabulary-concentration report (token-frequency
    # shuffle + per-stratum rank windows) and single-window-pass
    # attribution
    "t35_vocab_gini",
    "w15_touch_attribution",
    "x25_strength_features",
    "w16_touch_lag",
    # round 11: multi-touch attribution (one checkpointed corpus
    # window pass + (user, path, type)-cardinality credit arithmetic)
    # and the quantity-class FHIR search (pure pushdown predicates)
    "w17_multi_touch",
    "fs13_quantity_search",
    "w18_position_attribution",
    "fs14_composite_search",
    "w19_rfm_segments",
    "st13_streaming_attribution",
    "st14_streaming_multitouch",
    "w20_hazard_curve",
    # round 12: Markov removal-effect attribution (one corpus window
    # pass + matrix-sized value iteration), the lookback branch, uri +
    # subsumption search (pushdown predicates + literal IN closure),
    # and the two watermarked streaming lifecycles
    "w21_markov_attribution",
    "w17b_multi_touch_lookback",
    "fs15_uri_and_subsumption",
    "st15_streaming_multitouch_wm",
    "st16_streaming_flows_wm",
    "st17_streaming_markov",
    "v22_ivf_batch_probe",
    "w22_multi_touch_value",
    "st18_streaming_attribution_wm",
]

# r10: per-query isolated loop membership (VERDICT r9 #1) — the
# classes whose inherent cost (streaming micro-batch IO, video codec
# batches, index-build + probe, vocabulary rounds) makes them the
# first victims of a churned shared-JVM window. st1 stays in the
# comparable-18; everything else streaming lives here.
HEAVY_ISOLATED = [
    "st5_streaming_neardup",
    "st6_streaming_kmv",
    "st7_streaming_session_flows",
    "st8_streaming_bloom",
    "st9_streaming_cms",
    "st10_streaming_hll",
    "st11_streaming_ewma",
    "st12_streaming_cep",
    "st13_streaming_attribution",
    "st14_streaming_multitouch",
    "st15_streaming_multitouch_wm",
    "st16_streaming_flows_wm",
    "st17_streaming_markov",
    "st18_streaming_attribution_wm",
    "m18_keyframes",
    "m19_patch_vote_neardup",
    "v12_ivf_pruned",
    "v13_lsh_pruned",
    "v17_filtered_ann",
    "v22_ivf_batch_probe",
    "t27_bpe_encode",
    "t30_hashed_classifier",
]

N_STEADY = 3


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("bench")
    qs = entrymod.queries()

    # warm the JVM + file cache once with the cheapest query
    force(qs["q6_forecast_revenue"](spark, sf_dir))

    def gc_barrier() -> None:
        # GC barrier between passes: the iterative queries (BPE rounds,
        # LPA, SemDeDup, streaming state) pin localCheckpoint RDD
        # blocks until their Python refs die AND the JVM GCs; collect
        # both sides so block-manager occupancy stays flat.
        import gc as _gc

        _gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(1.0)

    # --- isolated comparable-18 loop (r8): the longitudinal signal ---
    iso_cold: dict[str, float] = {}
    iso_steady: list[dict[str, float]] = [{} for _ in range(N_STEADY)]
    for pass_timings in [iso_cold, *iso_steady]:
        for name in R3_COMPARABLE:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            force(qs[name](spark, sf_dir))
            pass_timings[name] = round(time.perf_counter() - t0, 3)
        gc_barrier()
    iso_medians = {
        name: round(statistics.median(p[name] for p in iso_steady), 3)
        for name in R3_COMPARABLE
    }

    # --- per-query isolated heavy-gate loop (r10, VERDICT r9 #1) ---
    # each heavy query: GC barrier, then cold + N_STEADY passes
    # back-to-back — a slow host window can poison at most ONE query,
    # never the whole class
    heavy_cold: dict[str, float] = {}
    heavy_runs: dict[str, list[float]] = {}
    for name in HEAVY_ISOLATED:
        gc_barrier()
        runs = []
        for _ in range(1 + N_STEADY):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            force(qs[name](spark, sf_dir))
            runs.append(round(time.perf_counter() - t0, 3))
        heavy_cold[name] = runs[0]
        heavy_runs[name] = runs[1:]

    # --- interleaved sweep (cold + 3 steady; heavy gates excluded —
    # their ledger numbers come from the isolated loop above) ---
    sweep_names = [n for n in HEADLINE if n not in set(HEAVY_ISOLATED)]
    cold: dict[str, float] = {}
    steady: list[dict[str, float]] = [{} for _ in range(N_STEADY)]
    for pass_timings in [cold, *steady]:
        for qi, name in enumerate(sweep_names):
            spark.catalog.clearCache()  # no cross-pass result reuse
            t0 = time.perf_counter()
            force(qs[name](spark, sf_dir))
            pass_timings[name] = round(time.perf_counter() - t0, 3)
            # r8: the pass-level barrier wasn't enough once the sweep
            # grew past ~60 queries — WITHIN one pass the iterative /
            # streaming queries accumulate localCheckpoint blocks and
            # shuffle files faster than the JVM collects them, and the
            # queries that follow pay (measured: d18 4.0 s steady vs
            # 38 s late in a churned cold pass). Collect every 12
            # queries; ~5 s of barrier per pass buys back far more.
            if (qi + 1) % 12 == 0:
                gc_barrier()
        gc_barrier()

    # the 18's only TRUE cold numbers come from the isolated loop (in
    # the sweep they run pre-warmed by it); heavy gates' cold/steady
    # come only from their own loop
    cold.update(iso_cold)
    cold.update(heavy_cold)

    medians = {
        name: round(statistics.median(p[name] for p in steady), 3)
        for name in sweep_names
    }
    mins = {
        name: round(min(p[name] for p in steady), 3)
        for name in sweep_names
    }
    for name, runs in heavy_runs.items():
        medians[name] = round(statistics.median(runs), 3)
        mins[name] = round(min(runs), 3)
    medians = {n: medians[n] for n in HEADLINE}
    mins = {n: mins[n] for n in HEADLINE}
    iso_mins = {
        name: round(min(p[name] for p in iso_steady), 3)
        for name in R3_COMPARABLE
    }
    # KEY ORDER IS LOAD-BEARING (r11, VERDICT r10 #1): the driver's
    # ledger persists only the LAST ~2,000 characters of this line, so
    # everything the ADJUDICATION RULE needs — the heavy-gate
    # median+min pairs, the isolated-18 per-query medians AND mins, and
    # the isolated subtotals — is serialized at the TAIL, after the
    # large maps. json.dumps preserves dict insertion order; the
    # truncation-sacrificial big maps (queries_cold, queries,
    # queries_min) go first. In r10 queries_min sat before
    # queries_cold, so the surviving tail showed inflated medians with
    # no floors (isolated-18 recorded 18.68 s vs 12.4 s real).
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": round(sum(medians.values()), 3),
                "unit": "sec",
                "sf": sf,
                "runs": 1 + N_STEADY,
                "comparable_set": "r3_18_query",
                # queries measured in their own per-query isolated
                # loop (GC barrier + 4 back-to-back passes), excluded
                # from the interleaved sweep
                "heavy_isolated_set": HEAVY_ISOLATED,
                "queries_cold": cold,
                "cold_total_sec": round(sum(cold.values()), 3),
                "queries": medians,
                # r10: per-query min over the steady passes, for EVERY
                # query — the noise-robust floor a reader compares
                # against before calling anything a regression (see
                # the ADJUDICATION RULE in the module docstring)
                "queries_min": mins,
                # ---- adjudication tail starts here: compact,
                # truncation-proof, most-critical last ----
                "steady_totals": [round(sum(p.values()), 3) for p in steady],
                "comparable_subtotal_sec": round(
                    sum(medians[n] for n in R3_COMPARABLE), 3
                ),
                # noise-floor companion (r7): the same frozen set summed
                # over per-query MINIMA across the steady passes. Host
                # variance on this VM swings medians ±15% on identical
                # code (measured within single sessions in r2, r6, r7);
                # the min is the standard noise-robust floor and lets a
                # reader separate "host was slow" from a real regression.
                "comparable_subtotal_min_sec": round(
                    sum(
                        min(p[n] for p in steady) for n in R3_COMPARABLE
                    ),
                    3,
                ),
                # per-heavy-gate [median, min, cold] triples — the r10
                # driver row recorded st12 at 24.57 s with no visible
                # floor (quiet re-measure: 6.8); these make the rule
                # applicable from the stored record alone. The third
                # element is the query's OWN cold pass: for the
                # index-backed probes (v12/v13/v17) cold ≈ index BUILD
                # and median/min ≈ the probe users repeat (VERDICT r10
                # #3's build/probe split).
                "heavy_gates": {
                    n: [medians[n], mins[n], heavy_cold[n]]
                    for n in HEAVY_ISOLATED
                },
                "queries_comparable_isolated": iso_medians,
                "queries_comparable_isolated_min": iso_mins,
                # r8: the isolated-loop numbers — compare THESE round
                # over round; the interleaved subtotal above measures
                # sweep crosstalk on top of code perf
                "comparable_subtotal_isolated_sec": round(
                    sum(iso_medians.values()), 3
                ),
                "comparable_subtotal_isolated_min_sec": round(
                    sum(iso_mins.values()), 3
                ),
                # r13 (VERDICT r12 #1): the adjudication tail above had
                # outgrown the driver's ~2,000-character retention
                # window — r11's stored tail failed to parse and r12's
                # was front-truncated mid-``heavy_gates``, costing a
                # round of automated prev comparisons. This FINAL key
                # is a compact duplicate of everything the ADJUDICATION
                # RULE needs — heavy-gate [median, min, cold] triples,
                # isolated-18 [median, min] pairs, steady totals and
                # the four subtotals — with query names shortened to
                # their first token (unique within each set) and 2-dp
                # rounding, sized well under the window so the stored
                # tail always ends with a complete, readable record.
                # Additions-only: every pre-existing key keeps its
                # position and precision.
                "adjudication_tail": {
                    "note": "keys = query-name first token; 2dp",
                    "steady_totals": [
                        round(sum(p.values()), 2) for p in steady
                    ],
                    "sub": [
                        round(sum(medians[n] for n in R3_COMPARABLE), 2),
                        round(
                            sum(
                                min(p[n] for p in steady)
                                for n in R3_COMPARABLE
                            ),
                            2,
                        ),
                        round(sum(iso_medians.values()), 2),
                        round(sum(iso_mins.values()), 2),
                    ],
                    "hg": {
                        n.split("_", 1)[0]: [
                            round(medians[n], 2),
                            round(mins[n], 2),
                            round(heavy_cold[n], 2),
                        ]
                        for n in HEAVY_ISOLATED
                    },
                    "i18": {
                        n.split("_", 1)[0]: [
                            round(iso_medians[n], 2),
                            round(iso_mins[n], 2),
                        ]
                        for n in R3_COMPARABLE
                    },
                },
            }
        )
    )


if __name__ == "__main__":
    main()
