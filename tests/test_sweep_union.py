"""Mechanical guard for the driver-evidence union property.

The driver's correctness sweep hashes only the FIRST 50 ``queries()``
entries each round (observed: CORRECTNESS_r01/r02/r03 are exactly that
prefix). The repo's evidence contract is that every hash-verifiable
query (one with an ``oracle_sql()`` twin) carries a driver-issued green
hash in the UNION of all sweeps. Until round 3 that property lived only
in NOTES.md discipline, and fs1–fs5 slipped through three rounds
(VERDICT r3, "Next round" #5) — this test makes the slippage a red bar
BEFORE the driver runs: it fails when some hash query has never been
hash-green in a recorded sweep AND is not inside the upcoming 50-entry
prefix.

Caveat it cannot catch mechanically: a query whose SEMANTICS/oracle
changed after its last green sweep still "looks" covered. Place such
queries back at the head of the prefix when touching them (r4 does
this for d4 and t8).
"""

from __future__ import annotations

import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SWEEP_PREFIX = 50


def _load_entry():
    import sys

    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entrymod

    return entrymod


def test_every_hash_query_reaches_a_driver_sweep():
    entrymod = _load_entry()
    order = list(entrymod.queries().keys())
    oracles = set(entrymod.oracle_sql().keys())
    hash_queries = [q for q in order if q in oracles]

    swept_green: set[str] = set()
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rows = json.loads(path.read_text())
        for name, rec in rows.items():
            if rec.get("hash_match") is True:
                swept_green.add(name)

    upcoming = set(order[:SWEEP_PREFIX])
    missing = [q for q in hash_queries if q not in swept_green and q not in upcoming]
    assert not missing, (
        f"{len(missing)} hash-verifiable queries would still lack a "
        f"driver-issued hash after the next {SWEEP_PREFIX}-entry sweep: "
        f"{missing} — move them to the head of queries()"
    )


def test_oracle_keys_are_a_subset_of_queries():
    entrymod = _load_entry()
    qs = set(entrymod.queries().keys())
    orphans = set(entrymod.oracle_sql().keys()) - qs
    assert not orphans, f"oracle_sql entries without a queries() twin: {orphans}"


def test_r5_queued_oracles_match_at_sf0001():
    """Queries added after the r4 sweep prefix filled carry their hash
    oracle in _R5_ORACLE_QUEUE (merged into oracle_sql() at r5 start).
    Verify them against DuckDB NOW so the queue never rots."""
    import duckdb

    entrymod = _load_entry()
    queue = getattr(entrymod, "_R5_ORACLE_QUEUE", {})
    if not queue:
        return
    from healthcare_api_spark import get_spark
    from healthcare_api_spark.tables import TABLE_NAMES

    sf = "/root/testdata/sf0.001"
    spark = get_spark("r5-queue-check")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    toks = f"string_split({norm}, ' ')"
    for name, sql in queue.items():
        sdf = entrymod.queries()[name](spark, sf).toPandas()
        odf = con.execute(sql.replace("{TOKS}", toks).replace("{NORM}", norm)).df()
        assert sorted(sdf.columns) == sorted(odf.columns), name
        cols = sorted(sdf.columns)

        def canon(frame):
            import math

            out = []
            for tup in frame[cols].itertuples(index=False):
                row = []
                for v in tup:
                    if v is None or (isinstance(v, float) and math.isnan(v)):
                        row.append("\x00")
                    elif isinstance(v, float):
                        row.append(f"{v:.9g}")
                    else:
                        row.append(str(v))
                out.append(tuple(row))
            return sorted(out)

        got, want = canon(sdf), canon(odf)
        assert got == want, f"{name}: spark != oracle"


def test_r6_graduated_oracles_match_at_sf0001():
    """Queries that gained their FIRST hash oracle in r6 (v7 frozen-int
    PQ, x7 unrolled LTTB, v2 LSH, v3 IVF, v4 PCA, d14 SemDeDup) have no
    driver hash yet — verify them against DuckDB now, exactly like the
    r5 queue test, so regressions surface before the sweep."""
    import math

    import duckdb

    entrymod = _load_entry()
    from healthcare_api_spark import get_spark
    from healthcare_api_spark.tables import TABLE_NAMES

    sf = "/root/testdata/sf0.001"
    spark = get_spark("r6-graduation-check")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    qs, osql = entrymod.queries(), entrymod.oracle_sql()

    def canon(frame):
        cols = sorted(frame.columns)
        out = []
        for tup in frame[cols].itertuples(index=False):
            row = []
            for v in tup:
                if v is None or (isinstance(v, float) and math.isnan(v)):
                    row.append("\x00")
                elif isinstance(v, float):
                    row.append(f"{v:.9g}")
                else:
                    row.append(str(v))
            out.append(tuple(row))
        return sorted(out)

    for name in (
        "v7_pq_topk", "x7_lttb_downsample", "v2_ann_lsh",
        "v3_ivf_topk", "v4_pca_project", "d14_semdedup",
        "m13_image_neardup", "m14_image_hamming_pairs",
    ):
        sdf = qs[name](spark, sf).toPandas()
        odf = con.execute(osql[name]).df()
        assert sorted(sdf.columns) == sorted(odf.columns), name
        assert canon(sdf) == canon(odf), f"{name}: spark != oracle"


def test_r8_changed_oracles_match_at_sf0001():
    """Queries new or changed in r8 (v12 partition-pruned probe, the
    d14 per-tier scaled-k centroid artifact, t23 batched merges,
    st5/st6 bucketed versioned state, u6 eager-literal cuts, v9
    overflow-guarded RRF, v11 min(k,|exact|) denominator) have no r8
    driver hash yet — verify them against DuckDB now, exactly like the
    r5/r6/r7 queue tests. (The r7 edition retired once
    CORRECTNESS_r07 recorded every entry green — the NOTES.md
    precedent.)"""
    import math

    import duckdb

    entrymod = _load_entry()
    from healthcare_api_spark import get_spark
    from healthcare_api_spark.tables import TABLE_NAMES

    sf = "/root/testdata/sf0.001"
    spark = get_spark("r8-changed-check")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    qs, osql = entrymod.queries(), entrymod.oracle_sql()

    def canon(frame):
        cols = sorted(frame.columns)
        out = []
        for tup in frame[cols].itertuples(index=False):
            row = []
            for v in tup:
                if v is None or (isinstance(v, float) and math.isnan(v)):
                    row.append("\x00")
                elif isinstance(v, float):
                    row.append(f"{v:.9g}")
                else:
                    row.append(str(v))
            out.append(tuple(row))
        return sorted(out)

    for name in (
        "v12_ivf_pruned", "v13_lsh_pruned", "d14_semdedup",
        "t23_bpe_train", "st5_streaming_neardup", "st6_streaming_kmv",
        "u6_winsorize", "u7_winsorize_pct", "v9_hybrid_rrf",
        "v11_ann_recall", "st7_streaming_session_flows",
        "k8_hll_distinct", "g5_connected_components",
        "d19_paragraph_dedup", "k9_bloom_filter", "x16_sax_similarity",
        "st8_streaming_bloom", "t25_substring_search",
        "st9_streaming_cms", "v14_rank_metrics", "t26_gopher_rules",
        "u8_importance_weights", "t27_bpe_encode", "v15_kmeans_stats",
        "t28_multi_substring", "t29_char_entropy", "d20_cdc_chunks",
        "v16_ivfpq_topk", "t30_hashed_classifier",
        "st10_streaming_hll", "v17_filtered_ann", "u9_curation_pipeline",
        "g6_adamic_adar", "v18_mmr_topk", "t31_ngram_novelty",
        "u10_leakage_safe_splits", "x17_holt_linear",
        "m17_image_patches", "d21_containment", "t32_readability",
        "s14_soft_delete", "st11_streaming_ewma", "v19_binary_ann",
        "u11_dedup_eval", "x18_acf", "v20_rag_pipeline",
    ):
        sdf = qs[name](spark, sf).toPandas()
        odf = con.execute(osql[name]).df()
        assert sorted(sdf.columns) == sorted(odf.columns), name
        assert canon(sdf) == canon(odf), f"{name}: spark != oracle"



_R9_NEW_QUERIES = [
    "f7b_uuid3",
    "u14_dataloader_pipeline",
    "g9_hits",
    "x19_holt_winters",
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
]
# NOTE: st12's oracle is w14's VERBATIM — its live-verify here runs the
# real 2-micro-batch streaming gate, the strongest per-pytest check in
# the list.


def test_r9_new_oracles_match_at_sf0001():
    """Queries NEW in r9 have no driver hash yet — verify them against
    DuckDB now, exactly like the r5/r6/r8 editions. The list grows as
    round 9 adds queries; all of them sit in the 50-entry sweep head."""
    import math

    import duckdb

    entrymod = _load_entry()
    from healthcare_api_spark import get_spark
    from healthcare_api_spark.tables import TABLE_NAMES

    sf = "/root/testdata/sf0.001"
    spark = get_spark("r9-new-check")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    qs, osql = entrymod.queries(), entrymod.oracle_sql()

    def canon(frame):
        cols = sorted(frame.columns)
        out = []
        for tup in frame[cols].itertuples(index=False):
            row = []
            for v in tup:
                if v is None or (isinstance(v, float) and math.isnan(v)):
                    row.append("\x00")
                elif isinstance(v, float):
                    row.append(f"{v:.9g}")
                else:
                    row.append(str(v))
            out.append(tuple(row))
        return sorted(out)

    for name in _R9_NEW_QUERIES:
        sdf = qs[name](spark, sf).toPandas()
        odf = con.execute(osql[name]).df()
        assert sorted(sdf.columns) == sorted(odf.columns), name
        assert canon(sdf) == canon(odf), f"{name}: spark != oracle"


def test_r9_queued_oracles_match_at_sf0001():
    """Queries added after the r8 sweep prefix filled carry their hash
    oracle in _R9_ORACLE_QUEUE (to merge into oracle_sql() at r9
    start). Verify them against DuckDB NOW so the queue never rots —
    the r5-queue precedent."""
    import math

    import duckdb

    entrymod = _load_entry()
    queue = getattr(entrymod, "_R9_ORACLE_QUEUE", {})
    if not queue:
        return
    from healthcare_api_spark import get_spark
    from healthcare_api_spark.tables import TABLE_NAMES

    sf = "/root/testdata/sf0.001"
    spark = get_spark("r9-queue-check")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    def canon(frame):
        cols = sorted(frame.columns)
        out = []
        for tup in frame[cols].itertuples(index=False):
            row = []
            for v in tup:
                if v is None or (isinstance(v, float) and math.isnan(v)):
                    row.append("\x00")
                elif isinstance(v, float):
                    row.append(f"{v:.9g}")
                else:
                    row.append(str(v))
            out.append(tuple(row))
        return sorted(out)

    for name, sql in queue.items():
        sdf = entrymod.queries()[name](spark, sf).toPandas()
        odf = con.execute(sql).df()
        assert sorted(sdf.columns) == sorted(odf.columns), name
        assert canon(sdf) == canon(odf), f"{name}: spark != oracle"
