"""Differential test: the Spark transforms vs an independent
row-at-a-time implementation of the same observable semantics
(the reference's execution model) on randomized resources.

The DuckDB oracle can't express nested FHIR transforms; this closes that
gap: both implementations consume identical NDJSON and their outputs are
compared as canonicalized JSON (null-stripped, key-sorted).
"""

from __future__ import annotations

import json
import random

import pytest

from healthcare_api_spark.operators import transforms
from healthcare_api_spark.schemas import SCHEMAS
from healthcare_api_spark.sources.ndjson import read_ndjson


# --- independent row-model implementations (semantics, not reference code) ---

def row_document_reference(r: dict) -> dict | None:
    r = json.loads(json.dumps(r))
    r.pop("version", None)
    for c in r.get("content") or []:
        if c.get("profile") is not None:
            c["format"] = c.pop("profile")[0]["valueCoding"]
    subj = (r.get("subject") or {}).get("reference")
    if subj and "Specimen" in subj:
        return None
    return r


def row_group(r: dict) -> dict:
    r = json.loads(json.dumps(r))
    r.pop("membership", None)
    r["actual"] = True
    r["type"] = "person"
    return r


def row_specimen(r: dict) -> dict:
    r = json.loads(json.dumps(r))
    for p in r.get("processing") or []:
        if p.get("method") is not None:
            p["procedure"] = p.pop("method")
    if r.get("collection") is not None:
        r["collection"].pop("procedure", None)
    return r


def row_research_subject(r: dict) -> dict:
    r = json.loads(json.dumps(r))
    r["individual"] = r.pop("subject", None)
    r["status"] = "on-study"
    return r


# ------------------------------- random resource generators -----------------

def _maybe(rng, v, p=0.3):
    return None if rng.random() < p else v


def gen_document_reference(rng: random.Random, i: int) -> dict:
    subj_type = rng.choice(["Patient", "Group", "Specimen", "Patient"])
    content = _maybe(
        rng,
        [
            {
                "attachment": _maybe(
                    rng,
                    {
                        "url": _maybe(rng, f"https://h/p/f{i}.{rng.choice(['maf','vcf','xyz',''])}"),
                        "title": _maybe(rng, f"t{i}.pdf"),
                        "size": rng.choice([None, 10, 5_000_000_000]),
                    },
                    0.2,
                ),
                "profile": _maybe(
                    rng,
                    [{"valueCoding": {"system": f"s{i}", "code": f"c{i % 5}"}}],
                    0.4,
                ),
            }
        ],
        0.2,
    )
    return {
        "resourceType": "DocumentReference",
        "id": f"d{i}",
        "version": rng.choice([None, "1", "9"]),
        "subject": _maybe(rng, {"reference": f"{subj_type}/x{i % 7}"}, 0.15),
        "content": content,
    }


def gen_group(rng: random.Random, i: int) -> dict:
    return {
        "resourceType": "Group",
        "id": f"g{i}",
        "membership": rng.choice([None, "definitional", "enumerated"]),
        "type": rng.choice(["specimen", "person", None]),
        "member": _maybe(
            rng,
            [{"entity": {"reference": f"Specimen/s{j}"}} for j in range(rng.randint(0, 3))],
        ),
    }


def gen_specimen(rng: random.Random, i: int) -> dict:
    return {
        "resourceType": "Specimen",
        "id": f"s{i}",
        "subject": {"reference": f"Patient/p{i % 5}"},
        "processing": _maybe(
            rng,
            [
                {"method": _maybe(rng, {"coding": [{"system": "s", "code": f"m{j}",
                                                     "display": None}]}, 0.4)}
                for j in range(rng.randint(1, 2))
            ],
        ),
        "collection": _maybe(
            rng,
            {
                "procedure": _maybe(rng, {"reference": f"Procedure/pr{i}"}),
                "collectedDateTime": _maybe(rng, "2024-01-01"),
            },
        ),
    }


def gen_research_subject(rng: random.Random, i: int) -> dict:
    return {
        "resourceType": "ResearchSubject",
        "id": f"r{i}",
        "subject": {"reference": f"Patient/p{i}"},
        "status": rng.choice(["active", "candidate", None]),
    }


# ---------------------------------- canonical compare ------------------------

def strip_nulls(x):
    if isinstance(x, dict):
        out = {}
        for k, v in x.items():
            if v is None:
                continue
            sv = strip_nulls(v)  # once per value — recursing in both the
            if sv != {}:         # filter and the value would be O(2^depth)
                out[k] = sv
        return out
    if isinstance(x, list):
        return [strip_nulls(v) for v in x]
    return x


def canon(rows: list[dict]) -> list[str]:
    return sorted(json.dumps(strip_nulls(r), sort_keys=True) for r in rows)


CASES = [
    ("DocumentReference", gen_document_reference, row_document_reference),
    ("Group", gen_group, row_group),
    ("Specimen", gen_specimen, row_specimen),
    ("ResearchSubject", gen_research_subject, row_research_subject),
]


@pytest.mark.parametrize("rtype,gen,row_fn", CASES, ids=[c[0] for c in CASES])
def test_spark_matches_row_model(spark, write_ndjson_file, rtype, gen, row_fn):
    rng = random.Random(42)
    rows = [gen(rng, i) for i in range(120)]
    path = write_ndjson_file([strip_nulls(r) for r in rows], f"{rtype}.ndjson")

    expected = [out for r in rows if (out := row_fn(strip_nulls(r))) is not None]

    df = read_ndjson(spark, path, SCHEMAS[rtype])
    out_df = transforms.dispatch_transformation(df, rtype)
    got = [json.loads(r) for r in out_df.toJSON().collect()]

    assert canon(got) == canon(expected)


# ---------------------------------------------------------------- r7 ops --
# Differential checks of the r7 operators against independent Python
# reference implementations on randomized inputs (the same philosophy
# as the transform row-model above: semantics the SQL oracle pins only
# on the fixed corpus get re-verified here on adversarial shapes).


def _bpe_reference(texts: list[str], n_merges: int):
    """Textbook BPE trainer (Sennrich 2016) — independent row-at-a-time
    implementation: dict word-freqs, pair counts, left-to-right
    non-overlapping merge application."""
    import re
    from collections import Counter

    wf = Counter()
    for t in texts:
        for w in re.sub(r"\s+", " ", t.lower()).strip().split(" "):
            wf[w] += 1
    seqs = {w: list(w) for w in wf}
    merges = []
    for r in range(n_merges):
        pc = Counter()
        for w, syms in seqs.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wf[w]
        if not pc:
            return merges
        (x, y), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r + 1, x, y, cnt))
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                    out.append(x + y)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    return merges


def test_bpe_train_matches_reference_on_random_corpora(spark):
    rng = random.Random(1234)
    alphabet = "abcd"
    for trial in range(3):
        texts = [
            " ".join(
                "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
                for _ in range(rng.randint(1, 12))
            )
            for _ in range(15)
        ]
        df = spark.createDataFrame(
            list(enumerate(texts)), ["doc_id", "text"]
        )
        from healthcare_api_spark.operators import textops

        got = textops.bpe_train(df, "text", n_merges=4)
        want = _bpe_reference(texts, 4)
        assert got == want, f"trial {trial}: {got} != {want}"


def test_rrf_fuse_matches_fraction_arithmetic(spark):
    """rrf_num/rrf_den must equal the exact Fraction sum of
    1/(c+rank) and the ordering must follow it."""
    from fractions import Fraction

    from healthcare_api_spark.operators import similarity

    rng = random.Random(77)
    lists = []
    for _ in range(3):
        ids = rng.sample(range(1, 30), rng.randint(3, 8))
        lists.append([(i, r + 1) for r, i in enumerate(ids)])
    dfs = [spark.createDataFrame(lst, ["id", "rank"]) for lst in lists]
    out = similarity.rrf_fuse(dfs, "id", c=60, k=50).collect()
    want = {}
    for lst in lists:
        for i, r in lst:
            want[i] = want.get(i, Fraction(0)) + Fraction(1, 60 + r)
    for row in out:
        assert Fraction(row["rrf_num"], row["rrf_den"]) == want[row["id"]]
    got_order = [r["id"] for r in out]
    want_order = sorted(want, key=lambda i: (-want[i], i))
    assert got_order == want_order


def test_repetition_signals_matches_reference(spark):
    from collections import Counter

    from healthcare_api_spark.operators import textops

    rng = random.Random(9)
    texts = [
        " ".join(rng.choice(["a", "b", "c", "ab"]) for _ in range(rng.randint(5, 25)))
        for _ in range(10)
    ]
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    rows = {
        r["doc_id"]: r
        for r in textops.repetition_signals(df, "doc_id", "text").collect()
    }
    for i, t in enumerate(texts):
        toks = t.split(" ")
        tc = Counter(toks)
        top_tok, top_cnt = min(tc.items(), key=lambda kv: (-kv[1], kv[0]))
        bigs = Counter(" ".join(p) for p in zip(toks, toks[1:])) if len(toks) > 1 else Counter({t: 1})
        top_big, top_big_cnt = min(bigs.items(), key=lambda kv: (-kv[1], kv[0]))
        if len(toks) >= 5:
            fives = Counter(
                " ".join(toks[j : j + 5]) for j in range(len(toks) - 4)
            )
        else:
            fives = Counter({t: 1})
        dup5 = sum(c for c in fives.values() if c > 1)
        r = rows[i]
        assert r["n_tokens"] == len(toks) and r["n_distinct"] == len(tc)
        assert (r["top_token"], r["top_token_cnt"]) == (top_tok, top_cnt)
        assert (r["top_bigram"], r["top_bigram_cnt"]) == (top_big, top_big_cnt)
        assert r["dup_ngram_occ"] == dup5


def test_matrix_profile_matches_reference(spark):
    """x13 vs a brute-force Python reference on random integer series:
    same distances (6 dp), same argmin tie-breaks."""
    import math

    from healthcare_api_spark.operators.temporal import matrix_profile

    rng = random.Random(31)
    w, L = 4, 8
    rows = []
    series = {}
    for s in ("a", "b"):
        vals = [rng.randint(-5, 15) for _ in range(rng.randint(14, 22))]
        # plant a constant stretch to hit the conventions
        vals[5:9] = [7, 7, 7, 7]
        series[s] = vals
        rows += [(s, i + 1, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["series", "i", "v"])
    got = {
        (r["series"], r["i"]): (r["nn_idx"], r["dist"])
        for r in matrix_profile(df, "series", "i", "v", w=w, max_lag=L).collect()
    }

    def dist(a, b):
        S1, S2 = sum(a), sum(b)
        Q1, Q2 = sum(x * x for x in a), sum(x * x for x in b)
        D = sum(x * y for x, y in zip(a, b))
        da, db = w * Q1 - S1 * S1, w * Q2 - S2 * S2
        if da == 0 and db == 0:
            return 0.0
        if da == 0 or db == 0:
            return math.sqrt(2.0 * w)
        corr = (w * D - S1 * S2) / math.sqrt(float(da) * float(db))
        return math.sqrt(max(2.0 * w * (1.0 - corr), 0.0))

    for s, vals in series.items():
        n = len(vals) - w + 1
        for i in range(1, n + 1):
            wa = vals[i - 1 : i - 1 + w]
            best = None
            for j in range(1, n + 1):
                if not (w <= abs(i - j) <= L):
                    continue
                d = dist(wa, vals[j - 1 : j - 1 + w])
                if best is None or (d, j) < best:
                    best = (d, j)
            if best is None:
                assert (s, i) not in got
            else:
                nn, dd = got[(s, i)]
                assert nn == best[1], (s, i, got[(s, i)], best)
                assert abs(dd - best[0]) < 1e-6, (s, i, dd, best[0])


def test_kmv_set_ops_matches_reference(spark):
    """k7 vs an independent hashlib/set-math reference on random group
    memberships: both the exact (union < k) and the estimated branch,
    with the estimator recomputed from first principles."""
    import hashlib
    import math

    from healthcare_api_spark.operators.sketches import kmv_build, kmv_set_ops

    rng = random.Random(77)
    k = 8
    groups = {
        "small1": rng.sample(range(1000), 3),          # below-k pair
        "small2": rng.sample(range(1000), 4),
        "big1": rng.sample(range(100000), 400),        # estimated pair
        "big2": rng.sample(range(100000), 500),
    }
    rows = [(g, u) for g, us in groups.items() for u in us]
    df = spark.createDataFrame(rows, ["g", "u"])
    got = {
        (r["group_a"], r["group_b"]): r
        for r in kmv_set_ops(kmv_build(df, ["g"], "u", k=k), "g", k=k).collect()
    }

    def h8(u):
        return hashlib.md5(str(u).encode()).hexdigest()[:8]

    sk = {g: sorted({h8(u) for u in us})[:k] for g, us in groups.items()}
    names = sorted(groups)
    assert set(got) == {(a, b) for a in names for b in names if a < b}
    for (a, b), r in got.items():
        u = sorted(set(sk[a]) | set(sk[b]))[:k]
        n_union = len(u)
        inter = set(sk[a]) & set(sk[b])
        n_inter = sum(1 for h in u if h in inter)
        assert r["n_union"] == n_union and r["n_inter_topk"] == n_inter
        if n_union < k:
            assert r["est_union"] == n_union
            assert r["est_intersection"] == n_inter
            assert abs(r["jaccard"] - n_inter / n_union) < 5e-7
        else:
            hk01 = int(u[-1], 16) / 2**32
            est_u_raw = (k - 1) / hk01
            # Spark round() is half-up for positives, Python's is
            # banker's — compare via floor(x + 0.5)
            assert r["est_union"] == math.floor(est_u_raw + 0.5)
            assert r["est_intersection"] == math.floor(
                n_inter * est_u_raw / k + 0.5
            )
            assert abs(r["jaccard"] - n_inter / k) < 5e-7


def test_audio_windowed_features_matches_reference(spark):
    """m16's operator vs a plain-Python reference on random PCM16
    payloads (random lengths, channel counts and window sizes) — every
    output is exact integer math, so equality is bitwise."""
    import io
    import struct
    import wave

    from healthcare_api_spark.operators.multimodal import (
        audio_windowed_features,
    )

    rng = random.Random(55)
    win = 7
    payloads, expect = [], {}
    for rid in range(8):
        ch = rng.choice([1, 1, 2, 3])
        n = rng.randint(1, 40)
        samples = [
            [rng.randint(-32768, 32767) for _ in range(ch)] for _ in range(n)
        ]
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(ch)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(
                b"".join(struct.pack(f"<{ch}h", *fr) for fr in samples)
            )
        payloads.append((rid, bytearray(buf.getvalue())))
        first = [fr[0] for fr in samples]
        wins = [first[o : o + win] for o in range(0, n, win)]
        expect[rid] = [
            (
                idx,
                len(wv),
                sum(v * v for v in wv),
                sum(
                    1
                    for x, y in zip(wv, wv[1:])
                    if (x >= 0) != (y >= 0)
                ),
                max(abs(v) for v in wv),
            )
            for idx, wv in enumerate(wins)
        ]
    df = spark.createDataFrame(payloads, "id long, data binary")
    rows = audio_windowed_features(df, "id", "data", window_samples=win).collect()
    got = {}
    for r in rows:
        got.setdefault(r["id"], []).append(
            (r["window_idx"], r["n"], r["energy"], r["zero_crossings"], r["peak"])
        )
    for rid in expect:
        assert sorted(got[rid]) == expect[rid], rid


def test_sax_symbols_matches_reference(spark):
    """x14 vs a plain-Python SAX reference on random integer series —
    same frame means, same letters (the z math is the same IEEE ops)."""
    import math

    from healthcare_api_spark.operators.temporal import (
        sax_breakpoints,
        sax_symbols,
    )

    rng = random.Random(13)
    frame, alphabet = 3, 5
    bps = sax_breakpoints(alphabet)
    series = {
        s: [rng.randint(-50, 50) for _ in range(rng.randint(4, 23))]
        for s in ("a", "b", "c")
    }
    series["const"] = [9] * 7  # sigma = 0 convention
    rows = [(s, i, v) for s, vs in series.items() for i, v in enumerate(vs)]
    df = spark.createDataFrame(rows, ["g", "o", "v"])
    got = {
        (r["g"], r["frame_idx"]): (r["m"], r["paa"], r["symbol"])
        for r in sax_symbols(df, "g", "o", "v", frame=frame, alphabet=alphabet).collect()
    }
    for s, vs in series.items():
        n = len(vs)
        mu = sum(vs) / n
        sd = math.sqrt(max(sum(v * v for v in vs) / n - mu * mu, 0.0))
        for fi in range((n + frame - 1) // frame):
            fv = vs[fi * frame : (fi + 1) * frame]
            paa = sum(fv) / len(fv)
            z = 0.0 if sd == 0.0 else (paa - mu) / sd
            sym = chr(ord("a") + sum(1 for b in bps if z > b))
            m, gp, gs = got[(s, fi)]
            assert m == len(fv) and gs == sym, (s, fi, z, gs, sym)
            assert abs(gp - paa) < 1e-6


def test_session_flows_matches_reference(spark):
    """w12/w13 vs a plain-Python sessionizer on random event streams
    (forced timestamp ties with distinct states, gaps straddling the
    threshold both ways)."""
    from collections import Counter

    from pyspark.sql import functions as F

    from healthcare_api_spark.operators.analytics import (
        session_flows,
        session_stats,
    )

    rng = random.Random(21)
    gap_min = 10
    gap_us = gap_min * 60 * 1_000_000
    base = 1_700_000_000_000_000
    events = []
    for user in range(4):
        t = base
        for _ in range(rng.randint(5, 30)):
            step = rng.choice([1, 30, 599, 600, 601, 1800]) * 1_000_000
            t += step
            st = rng.choice("xyz")
            events.append((user, t, st))
            if rng.random() < 0.3:  # tie with a DISTINCT state
                other = rng.choice([c for c in "xyz" if c != st])
                events.append((user, t, other))
    df = spark.createDataFrame(events, ["user_id", "us", "event_type"]).select(
        "user_id",
        F.timestamp_micros(F.col("us")).alias("ts"),
        "event_type",
    )

    # reference sessionizer: per user, order by (us, state); break on
    # strict > gap vs the previous event in that order
    sessions = {}
    trans = Counter()
    for user in {e[0] for e in events}:
        evs = sorted(
            [(t, s) for (u, t, s) in events if u == user],
            key=lambda e: (e[0], e[1]),
        )
        sid, prev_t = 0, None
        per = []
        for t, s in evs:
            if prev_t is None or t - prev_t > gap_us:
                sid += 1
            per.append((sid, t, s))
            prev_t = t
        sessions[user] = per
        for (s1, t1, a), (s2, t2, b) in zip(per, per[1:]):
            if s1 == s2:
                trans[(a, b)] += 1

    got_stats = {
        (r["user_id"], r["session_idx"]): (r["n_events"], r["duration_sec"])
        for r in session_stats(df, "user_id", "ts", gap_minutes=gap_min).collect()
    }
    for user, per in sessions.items():
        by_sid = {}
        for sid, t, s in per:
            by_sid.setdefault(sid, []).append(t)
        for sid, ts_list in by_sid.items():
            assert got_stats[(user, sid)] == (
                len(ts_list),
                (max(ts_list) - min(ts_list)) // 1_000_000,
            ), (user, sid)

    got_trans = {
        (r["src"], r["dst"]): r["n_transitions"]
        for r in session_flows(
            df, "user_id", "ts", "event_type", gap_minutes=gap_min
        ).collect()
    }
    assert got_trans == dict(trans)


def _bpe_encode_reference(texts: list[str], merges):
    """Apply a merge table to each doc with the same left-to-right
    non-overlapping scan — per-doc (n_words, n_tokens)."""
    import re

    out = {}
    for i, t in enumerate(texts):
        words = re.sub(r"\s+", " ", t.lower()).strip().split(" ")
        n_tokens = 0
        for w in words:
            syms = list(w)
            for _, x, y, *rest in merges:
                nxt, j = [], 0
                while j < len(syms):
                    if j + 1 < len(syms) and syms[j] == x and syms[j + 1] == y:
                        nxt.append(x + y)
                        j += 2
                    else:
                        nxt.append(syms[j])
                        j += 1
                syms = nxt
            n_tokens += len(syms)
        out[i] = (len(words), n_tokens)
    return out


def test_bpe_encode_matches_reference_on_random_corpora(spark):
    """Train-then-encode parity with the independent python scan —
    including rules that consume earlier rules' outputs (rank order)."""
    rng = random.Random(99)
    alphabet = "abc"
    for trial in range(2):
        texts = [
            " ".join(
                "".join(rng.choice(alphabet) for _ in range(rng.randint(2, 6)))
                for _ in range(rng.randint(1, 10))
            )
            for _ in range(12)
        ]
        df = spark.createDataFrame(
            list(enumerate(texts)), ["doc_id", "text"]
        )
        from healthcare_api_spark.operators import textops

        merges = textops.bpe_train(df, "text", n_merges=4)
        got = {
            r["doc_id"]: (r["n_words"], r["n_tokens"])
            for r in textops.bpe_encode(
                df, "doc_id", "text", merges
            ).collect()
        }
        want = _bpe_encode_reference(texts, merges)
        assert got == want, f"trial {trial}"


def test_bpe_encode_rank_order_and_validation(spark):
    """A rank-2 rule consuming a rank-1 product must apply after it:
    merges [(1,'a','b'),(2,'ab','c')] on 'abc' → 1 token."""
    import pytest

    from healthcare_api_spark.operators import textops

    df = spark.createDataFrame([(0, "abc abc xyz")], ["doc_id", "text"])
    out = textops.bpe_encode(
        df, "doc_id", "text", [(1, "a", "b"), (2, "ab", "c")]
    ).collect()[0]
    # 'abc' → ['ab','c'] → ['abc'] (1 tok, twice); 'xyz' stays 3 syms
    assert out["n_words"] == 3 and out["n_tokens"] == 5

    with pytest.raises(ValueError):
        textops.bpe_encode(df, "doc_id", "text", [])
    with pytest.raises(ValueError):
        textops.bpe_encode(
            df, "doc_id", "text", [(1, "a", "b")], vocab_partitions=0
        )
