"""Text-analysis operators for training-data pipelines (SURVEY.md §2.10).

All pure Column expressions — language-ID and quality scoring at 100 TB
must stay inside whole-stage codegen; regex counting over a string column
is a narrow map with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from healthcare_api_spark.functions.text import fingerprint, normalize_text, token_count

# Tiny per-language stopword marker lists for the n-gram/stopword
# heuristic language identifier. Deliberately deterministic and simple —
# the operator contract is "reproducible heuristic", not NLP accuracy.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "nicht", "ist"],
    "en": ["the", "and", "of", "to", "is", "that"],
    "es": ["el", "la", "los", "que", "de", "es"],
    "fr": ["le", "la", "les", "et", "est", "que"],
    "zh": ["de", "shi", "le", "bu", "wo", "zai"],
}


def _marker_count(c: Column, words: list[str]) -> Column:
    """Number of marker-word occurrences (word-boundary regex count).
    Null text counts like empty text (0) for deterministic outputs."""
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.coalesce(F.lower(c), F.lit("")), F.lit(pat), F.lit(0)))


def _argmax_lang(df: DataFrame, id_col: str, scores: dict[str, Column]) -> DataFrame:
    """Shared argmax-with-alphabetical-tie-break over per-language score
    expressions → (id, pred_lang, pred_score)."""
    best = F.greatest(*scores.values())
    pred = None
    for lang in sorted(scores):
        cond = scores[lang] == best
        pred = F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
    return df.select(
        F.col(id_col), pred.alias("pred_lang"), best.cast("bigint").alias("pred_score")
    )


def lang_scores(c: Column) -> dict[str, Column]:
    return {lang: _marker_count(c, words) for lang, words in LANG_MARKERS.items()}


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Predict language = argmax marker count, alphabetical tie-break.

    Implemented as a greatest()-driven CASE chain — no UDF, no shuffle.
    Output: (id, pred_lang, pred_score).
    """
    return _argmax_lang(df, id_col, lang_scores(F.col(text_col)))


# Character-trigram profiles for LATIN-SCRIPT languages (top distinctive
# trigrams, spaces significant). The char-ngram flavor of the heuristic:
# robust to unknown words, catches morphology ('sch', 'ión') not just
# stopwords. Non-Latin scripts are detected by Unicode range instead —
# pinyin trigrams would false-positive on English letter statistics.
CHAR_TRIGRAM_PROFILES: dict[str, list[str]] = {
    "de": ["der", "ein", "sch", "ich", "nde", "die", "und", "cht"],
    "en": ["the", "ing", "and", "ion", "ent", "her", "tha", "nth"],
    "es": ["que", "ión", "los", "ado", "con", "ent", "cia", "sta"],
    "fr": ["les", "ent", "ion", "des", "eur", "que", "ait", "une"],
}


def lang_id_chargram(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Character-trigram language-ID; argmax, alphabetical tie-break.

    Latin-script languages score by NON-OVERLAPPING matches of the
    profile-trigram alternation (a deterministic heuristic count, not an
    exact per-trigram occurrence sum); Chinese scores by Han-codepoint
    count (script detection — the reliable signal for CJK). Same narrow
    no-UDF shape as ``lang_id``; use whichever signal fits the corpus.
    """
    norm = F.coalesce(normalize_text(F.col(text_col)), F.lit(""))
    scores: dict[str, Column] = {
        lang: F.size(
            F.regexp_extract_all(norm, F.lit("(" + "|".join(tris) + ")"), F.lit(0))
        )
        for lang, tris in CHAR_TRIGRAM_PROFILES.items()
    }
    scores["zh"] = F.size(F.regexp_extract_all(norm, F.lit(r"[一-鿿]"), F.lit(0)))
    return _argmax_lang(df, id_col, scores)


def quality_features(c: Column) -> dict[str, Column]:
    """Deterministic quality features over normalized text."""
    norm = normalize_text(c)
    n_chars = F.length(norm).cast("double")
    n_tokens = token_count(c).cast("double")
    punct = F.size(F.regexp_extract_all(norm, F.lit(r"[^\w\s]"), F.lit(0))).cast("double")
    stop = _marker_count(c, LANG_MARKERS["en"]).cast("double")
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": n_chars / F.greatest(n_tokens, F.lit(1.0)),
        "punct_ratio": punct / F.greatest(n_chars, F.lit(1.0)),
        "stopword_ratio": stop / F.greatest(n_tokens, F.lit(1.0)),
    }


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Composite quality score in [0, ~1]: rewards stopword presence and
    mid-length tokens, penalizes punctuation soup. Deterministic formula —
    oracle-reproducible. Output: (id, n_tokens, score)."""
    f = quality_features(F.col(text_col))
    score = (
        F.least(f["n_tokens"] / 100.0, F.lit(1.0)) * 0.4
        + F.least(f["stopword_ratio"] * 5.0, F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(f["punct_ratio"] * 10.0, F.lit(1.0))) * 0.2
    )
    return df.select(
        F.col(id_col),
        f["n_tokens"].cast("bigint").alias("n_tokens"),
        F.round(score, 6).alias("score"),
    )


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace token count + a BPE-ish subword estimate
    (word-chunk regex: runs of ≤4 chars), both JVM-side."""
    bpe_ish = F.size(
        F.regexp_extract_all(
            normalize_text(F.col(text_col)), F.lit(r"\w{1,4}|[^\w\s]"), F.lit(0)
        )
    )
    return df.select(
        F.col(id_col),
        token_count(F.col(text_col)).cast("bigint").alias("n_tokens"),
        bpe_ish.cast("bigint").alias("n_subwords"),
    )


def fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Normalized-content fingerprint per document (md5)."""
    return df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))


def build_inverted_index(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Token → document posting table (tok, id), one row per DISTINCT
    (doc, token) — the pre-built index for repeated multi-token search
    at scale. Write it partitioned/bucketed by ``tok`` so term lookups
    partition-prune; per-doc dedup happens narrowly (array_distinct
    before the explode), never as a distinct shuffle."""
    from healthcare_api_spark.functions.text import tokens

    return df.select(
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"),
        F.col(id_col),
    )


def search_all_tokens(index: DataFrame, id_col: str, terms: list[str]) -> DataFrame:
    """AND-of-terms lookup against an inverted index: docs containing
    EVERY term. One filtered scan (``tok IN terms`` — partition-pruned
    on a tok-partitioned index) + one count aggregate; no self-joins
    however many terms."""
    if not terms:
        raise ValueError("terms must be non-empty")
    lowered = [t.lower() for t in terms]
    return (
        index.filter(F.col("tok").isin(lowered))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") == len(set(lowered)))
        .select(id_col)
    )


def compression_ratio(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Compression-ratio quality signal: len(zlib(text)) / len(text)
    (RedPajama-style filter — highly repetitive/boilerplate text
    compresses far below normal prose; random noise doesn't compress at
    all). Deterministic (zlib level fixed) but not SQL-expressible —
    rows-only check, pinned by tests instead. Arrow-batched mapInPandas,
    stdlib zlib per batch. Output: (id, n_bytes, ratio)."""
    import zlib
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [StructField("id", LongType()), StructField("n_bytes", LongType()),
         StructField("ratio", DoubleType())]
    )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, t in zip(pdf[id_col], pdf[text_col]):
                b = (t or "").encode("utf-8")
                if not b:
                    rows.append(dict(id=rid, n_bytes=0, ratio=None))
                    continue
                rows.append(dict(
                    id=rid, n_bytes=len(b),
                    ratio=round(len(zlib.compress(b, 6)) / len(b), 6),
                ))
            yield pd.DataFrame(rows, columns=["id", "n_bytes", "ratio"])

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(_extract, schema)


def top_tokens(df: DataFrame, text_col: str, k: int = 20) -> DataFrame:
    """Corpus heavy hitters: the k most frequent tokens, deterministic
    (count desc, token asc tie-break). Output: (tok, cnt).

    Shape at scale: explode → one hash-aggregate keyed by token with
    map-side combine (the heavy hitters, by definition, collapse hardest
    in the combine), then TakeOrderedAndProject for the top-k — per-
    partition heaps, no global sort."""
    from healthcare_api_spark.functions.text import tokens

    toks = df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
    return (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("tok").asc())
        .limit(k)
    )


def unigram_logprob(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Perplexity-style quality signal WITHOUT an external model: score
    each document by the average negative log-probability of its tokens
    under the corpus's own unigram distribution (CCNet uses a wiki-trained
    LM for the same purpose; the self-corpus unigram is the model-free
    variant). Low scores = common language; high scores = gibberish /
    rare-token soup. Output: (id, n_tokens, avg_neg_logprob).

    Shape at scale: (doc, token) tf aggregate → token-total aggregate
    (both map-side combined) → equi-join tf⋈vocab on the token → one
    per-doc sum. The corpus-total N is a one-row broadcast.
    """
    from healthcare_api_spark.functions.text import tokens

    tf = (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    vocab = tf.groupBy("tok").agg(F.sum("tf").alias("ctot"))
    n_total = vocab.agg(F.sum("ctot").alias("n"))
    scored = tf.join(vocab, "tok").crossJoin(F.broadcast(n_total))
    per_doc = scored.groupBy(id_col).agg(
        F.sum("tf").cast("bigint").alias("n_tokens"),
        F.sum(-F.col("tf") * F.log(F.col("ctot") / F.col("n"))).alias("_nll"),
    )
    return per_doc.select(
        F.col(id_col),
        "n_tokens",
        F.round(F.col("_nll") / F.col("n_tokens"), 6).alias("avg_neg_logprob"),
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lam: float = 0.7,
) -> DataFrame:
    """Interpolated-bigram LM scoring (the CCNet/Gopher perplexity-filter
    shape, one model order up from ``unigram_logprob``): score each doc
    by the average negative log-probability of its token transitions
    under the corpus's own bigram model, backed off to the unigram:

        P(cur|prev) = lam · c(prev,cur)/c(prev·) + (1−lam) · c(cur)/N

    where c(prev·) is the history count (Σ_cur c(prev,cur), so the
    bigram MLE is properly normalized) and N the corpus token total.
    Repetitive/templated text scores low, token-soup scores high —
    and unlike the unigram, scrambled word order is penalized.
    Output: (id, n_bigrams, avg_neg_logprob); docs with < 2 tokens
    have no transitions and drop out.

    Shape at scale: per-doc bigram pairs come from ONE narrow
    ``transform`` over the token array (zero shuffle to form pairs —
    no positional self-join); then a (doc,prev,cur) tf aggregate, a
    (prev,cur) corpus aggregate, its (prev) rollup, the unigram
    aggregate, and equi-joins back — every aggregate map-side combined,
    N a one-row broadcast. Identical join topology to tfidf/unigram,
    one key wider."""
    from healthcare_api_spark.functions.text import tokens

    toked = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
    # pairs[(i)] = (prev=_toks[i], cur=_toks[i+1]) — built array-side so
    # forming transitions never shuffles; the CASE guards size<2 (Spark's
    # sequence() would count DOWN for start>stop)
    pairs = F.expr(
        "CASE WHEN size(_toks) >= 2 THEN"
        " transform(slice(_toks, 2, size(_toks) - 1),"
        "   (t, i) -> struct(_toks[i] AS prev, t AS cur))"
        " ELSE CAST(array() AS array<struct<prev:string,cur:string>>) END"
    )
    # NOTE (r7): deliberately NO persist/checkpoint here, although the
    # plan shows 5 Scan+Generate chains (tf2/c2/uni each feed two
    # consumers). Measured at sf0.1: caching tf2 (corpus-sized) costs
    # more than its recompute (1.96 → 2.60 s), and even model-sized
    # c2/uni caches regress to 2.95 s — the InMemoryRelation barrier
    # loses AQE's runtime broadcast of the scored-pair table, which is
    # worth more than the duplicate tokenize. Recompute wins when the
    # duplicated chain is cheap codegen and caching changes join
    # strategy.
    tf2 = (
        toked.select(F.col(id_col), F.explode(pairs).alias("_p"))
        .select(id_col, F.col("_p.prev").alias("prev"), F.col("_p.cur").alias("cur"))
        .groupBy(id_col, "prev", "cur")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    c2 = tf2.groupBy("prev", "cur").agg(F.sum("tf").alias("c2"))
    c1 = c2.groupBy("prev").agg(F.sum("c2").alias("c1"))
    uni = (
        df.select(F.explode(tokens(F.col(text_col))).alias("cur"))
        .groupBy("cur")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    n_total = uni.agg(F.sum("cu").alias("n"))
    p = F.lit(lam) * F.col("c2") / F.col("c1") + F.lit(1.0 - lam) * F.col(
        "cu"
    ) / F.col("n")
    # score each DISTINCT bigram once (|vocab²∩corpus| rows), then one
    # equi-join back to the per-doc tf — the heavy frame (tf2) passes
    # through a single join instead of three (AQE broadcasts the scored
    # pair table when it is small)
    scored_pairs = (
        c2.join(c1, "prev")
        .join(uni, "cur")
        .crossJoin(F.broadcast(n_total))
        .select("prev", "cur", p.alias("_p"))
    )
    scored = tf2.join(scored_pairs, ["prev", "cur"]).withColumn("_lp", F.log("_p"))
    per_doc = scored.groupBy(id_col).agg(
        F.sum("tf").cast("bigint").alias("n_bigrams"),
        F.sum(-F.col("tf") * F.col("_lp")).alias("_nll"),
    )
    return per_doc.select(
        F.col(id_col),
        "n_bigrams",
        F.round(F.col("_nll") / F.col("n_bigrams"), 6).alias("avg_neg_logprob"),
    )


def tfidf_top_terms(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Per-document top-k terms by tf·idf (idf = ln(N/df), the classic
    unsmoothed form). Output: (id, rk, tok, tfidf) with deterministic
    tie-break (tfidf desc, tok asc).

    Shape at scale: term frequencies are one (doc, token)-keyed
    aggregate; document frequencies reduce that to one row per token
    (both map-side combined); N is a scalar broadcast; the final top-k
    is a per-doc window. No cartesian anything — the join back to tf
    rows is an equi-join on the token."""
    from healthcare_api_spark.functions.text import tokens

    tf = (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count(F.lit(1)).alias("n"))
    scored = (
        # shuffle_hash: corpus-sized term-df side — never broadcast
        # (the ×100-sweep driver-OOM lesson; both sides tok-partitioned)
        tf.join(dfreq.hint("shuffle_hash"), "tok")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", F.col("tf") * F.log(F.col("n") / F.col("df")))
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("tok").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(id_col, "rk", "tok", F.round("tfidf", 6).alias("tfidf"))
    )


def chunk_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """RAG/training-window chunking: split each document into
    whitespace-token windows of ``chunk_size`` tokens advancing by
    ``chunk_size − overlap`` (so consecutive chunks share ``overlap``
    tokens), re-joined with single spaces. Output one row per chunk:
    (id, chunk_idx, n_chunk_tokens, chunk_text).

    Entirely JVM-side Column expressions — split, a tiny
    ``sequence``+``explode`` (rows = chunks, proportional to document
    length over stride, never a per-token explosion), ``slice`` +
    ``array_join``. Zero shuffle, codegen end to end: the shape that
    chunks 100 TB of text at scan speed. Documents with no tokens
    produce no rows.
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    from healthcare_api_spark.functions.text import tokens as _tokens

    stride = chunk_size - overlap
    toks = _tokens(F.col(text_col))  # normalized: lowercase, 1-space
    n = F.size(toks)
    tokenized = df.select(
        F.col(id_col), toks.alias("_toks"), n.alias("_n")
    ).filter((F.col("_n") > 0) & (F.element_at(F.col("_toks"), 1) != ""))
    chunks = tokenized.select(
        F.col(id_col),
        F.col("_toks"),
        F.col("_n"),
        F.explode(
            F.sequence(F.lit(0), F.floor((F.col("_n") - 1) / stride).cast("int"))
        ).alias("chunk_idx"),
    )
    sliced = F.slice(
        F.col("_toks"), F.col("chunk_idx") * stride + 1, chunk_size
    )
    return chunks.select(
        F.col(id_col),
        F.col("chunk_idx"),
        F.size(sliced).alias("n_chunk_tokens"),
        F.array_join(sliced, " ").alias("chunk_text"),
    )


def bpe_pair_counts(
    df: DataFrame, text_col: str, k: int = 20, max_word_len: int = 30
) -> DataFrame:
    """One BPE training iteration's pair statistics: frequency of each
    adjacent character pair across the corpus, weighted by word
    frequency (Sennrich et al. 2016 — the merge step picks the max).
    Output: top-``k`` (pair, cnt) with deterministic tie-break.

    Shape at scale: words aggregate first (one shuffle keyed on the
    word — the vocabulary, VASTLY smaller than the token stream thanks
    to map-side combine), then pairs explode off the vocabulary only
    (≤ word_len rows per DISTINCT word) and aggregate per pair. The
    final top-k is a TakeOrdered, O(k) to the driver. Words longer than
    ``max_word_len`` chars are truncated — bounds the explode and
    matches the fixed-grid SQL oracle.
    """
    from healthcare_api_spark.functions.text import tokens

    words = (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .withColumn("w", F.substring(F.col("w"), 1, max_word_len))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.length("w") >= 2)
    )
    pairs = words.select(
        F.col("freq"),
        F.explode(F.sequence(F.lit(1), F.length("w") - 1)).alias("i"),
        F.col("w"),
    ).select(F.expr("substring(w, i, 2)").alias("pair"), "freq")
    counts = pairs.groupBy("pair").agg(F.sum("freq").alias("cnt"))
    return (
        counts.orderBy(F.col("cnt").desc(), F.col("pair").asc())
        .limit(k)
        .select("pair", F.col("cnt").cast("bigint").alias("cnt"))
    )


def bm25_score_col(
    df: DataFrame,
    corpus: DataFrame,
    text_col: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    out_col: str = "_score",
) -> DataFrame:
    """Attach the BM25 relevance of each row for ``terms`` (Robertson/
    Sparck Jones, the default ranking function of every search engine):

        Σ_t ln(1 + (N − df_t + 0.5)/(df_t + 0.5))
            · tf_t·(k1+1) / (tf_t + k1·(1 − b + b·dl/avgdl))

    Document-frequency/N/avgdl stats come from ``corpus`` (the FULL
    table — relevance is corpus-relative even when the scored frame is
    already filtered); tf and dl come from the row itself.

    Shape at scale: ONE corpus aggregate producing a single stats row
    (map-side combined: a count, an avg, and one sum per term),
    broadcast back via crossJoin; scoring is a narrow array expression
    per row. Cost is O(terms) per row — no joins, no explode. The
    token array is materialized into its own projection and tf is
    ``size − size(array_remove)`` — both regular codegen expressions —
    because the obvious ``size(filter(arr, x -> x = t))`` is a
    higher-order function, which Spark evaluates as CodegenFallback
    (interpreted, re-tokenizing inside the lambda per term per row —
    the SCALE.md r8 HOF lesson; measured 1.9× on this function)."""
    from healthcare_api_spark.functions.text import tokens

    if not terms:
        raise ValueError("terms must be non-empty")
    lowered = [t.lower() for t in terms]
    cstats = corpus.select(tokens(F.col(text_col)).alias("_ctoks"))
    stats = cstats.agg(
        F.count(F.lit(1)).alias("_n"),
        F.avg(F.size(F.col("_ctoks"))).alias("_avgdl"),
        *[
            F.sum(F.array_contains(F.col("_ctoks"), t).cast("int")).alias(f"_df_{i}")
            for i, t in enumerate(lowered)
        ],
    )
    rtoks = F.col("_rtoks")
    dl = F.size(rtoks).cast("double")
    score = F.lit(0.0)
    for i, t in enumerate(lowered):
        tf = (F.size(rtoks) - F.size(F.array_remove(rtoks, t))).cast("double")
        dfreq = F.col(f"_df_{i}").cast("double")
        idf = F.log(
            F.lit(1.0) + (F.col("_n") - dfreq + 0.5) / (dfreq + 0.5)
        )
        score = score + idf * tf * (k1 + 1) / (
            tf + k1 * (1 - b + b * dl / F.col("_avgdl"))
        )
    drop = ["_n", "_avgdl", "_rtoks"] + [f"_df_{i}" for i in range(len(lowered))]
    return (
        df.withColumn("_rtoks", tokens(F.col(text_col)))
        .crossJoin(F.broadcast(stats))
        .withColumn(out_col, score)
        .drop(*drop)
    )


def positional_index(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Positional inverted index: (tok, id, positions array<int>, tf) —
    the structure phrase and proximity queries need (a plain posting
    list can only AND terms; positions let the engine check adjacency
    without rescanning text). Narrow explode + ONE shuffle on
    (tok, id); write partitioned/bucketed by ``tok`` so term lookups
    partition-prune. Positions are 0-based token offsets in the
    normalized token stream."""
    from healthcare_api_spark.functions.text import tokens

    return (
        df.select(F.col(id_col), F.posexplode(tokens(F.col(text_col))))
        .groupBy("col", id_col)
        .agg(
            F.sort_array(F.collect_list(F.col("pos").cast("int"))).alias("positions"),
            F.count(F.lit(1)).cast("bigint").alias("tf"),
        )
        .withColumnRenamed("col", "tok")
    )


def phrase_counts(index: DataFrame, id_col: str, phrase: list[str]) -> DataFrame:
    """Exact-phrase occurrence count per document from a positional
    index: fetch each phrase term's posting list (a partition-pruned
    point lookup on a tok-partitioned index), then fold left-to-right —
    the carried positions are the offsets where the prefix of the
    phrase ENDS; each step is `(carried + 1) ∩ next term's positions`,
    a pure array intersect inside a doc-id equi-join of two posting
    lists. n-term phrase = n−1 posting-list joins, never a text rescan.

    Output: (id, phrase_count ≥ 1) — docs where the full phrase occurs.
    """
    if len(phrase) < 2:
        raise ValueError("phrase must have ≥ 2 terms")
    terms = [t.lower() for t in phrase]
    cur = (
        index.filter(F.col("tok") == terms[0])
        .select(F.col(id_col), F.col("positions").alias("_carry"))
    )
    for i, term in enumerate(terms[1:], start=1):
        nxt = index.filter(F.col("tok") == term).select(
            F.col(id_col), F.col("positions").alias(f"_p{i}")
        )
        cur = (
            cur.join(nxt, id_col)
            .select(
                F.col(id_col),
                F.array_intersect(
                    F.transform(F.col("_carry"), lambda p: p + 1),
                    F.col(f"_p{i}"),
                ).alias("_carry"),
            )
            .filter(F.size("_carry") > 0)
        )
    return cur.select(
        F.col(id_col), F.size("_carry").cast("bigint").alias("phrase_count")
    )


def proximity_min_span(index: DataFrame, id_col: str, terms: list[str]) -> DataFrame:
    """Unordered-proximity scoring from a positional index: for docs
    containing ALL ``terms``, the length (in tokens, inclusive) of the
    smallest window covering at least one occurrence of each — the
    classic IR proximity feature (smaller = tighter = more relevant).

    Plan: n posting-list point lookups joined on doc id (tiny,
    partition-pruned on a tok-partitioned index), then the min-window
    sweep runs NARROWLY per doc over the merged position lists — an
    explode of the candidate anchor positions with a per-anchor
    array-min probe per term, all JVM expressions. For k terms with
    positions P₁…P_k: span(anchor a ∈ P₁…) is not minimal in general —
    the exact sweep instead evaluates every occurrence position p of
    any term as the window START: the window must reach, for each term
    t, the smallest position ≥ p in P_t; the span is max over terms of
    that "next occurrence" minus p + 1. Min over all starts is the
    exact smallest covering window (every optimal window starts at
    some term occurrence).

    Output: (id, min_span, n_terms). Docs missing any term are absent.
    """
    if len(terms) < 2:
        raise ValueError("terms must have ≥ 2 entries")
    lowered = [t.lower() for t in terms]
    if len(set(lowered)) != len(lowered):
        raise ValueError("terms must be distinct")
    base = index.filter(F.col("tok") == lowered[0]).select(
        F.col(id_col), F.col("positions").alias("_p0")
    )
    joined = base
    for i, term in enumerate(lowered[1:], start=1):
        nxt = index.filter(F.col("tok") == term).select(
            F.col(id_col), F.col("positions").alias(f"_p{i}")
        )
        joined = joined.join(nxt, id_col)
    # candidate window starts: every occurrence of every term. Explode
    # anchors to rows so the per-term "next occurrence ≥ start" probe is
    # a SINGLE-level lambda over a column (nested HOF lambdas mis-bind
    # the outer variable — observed, not hypothetical), then fold back
    # with a min per doc. Fan-out = Σ tf(term, doc) — bounded by the
    # posting lists already fetched, not by corpus size.
    all_pos = F.flatten(F.array([F.col(f"_p{i}") for i in range(len(lowered))]))
    anchors = joined.select(
        F.col(id_col),
        *[F.col(f"_p{i}") for i in range(len(lowered))],
        F.explode(all_pos).alias("_start"),
    )
    start = F.col("_start")
    # smallest position ≥ start per term; a NULL (no such occurrence)
    # must invalidate the whole window — greatest() SKIPS nulls, so
    # guard explicitly instead of relying on null propagation
    nxts = [
        F.array_min(F.filter(F.col(f"_p{i}"), lambda p: p >= start))
        for i in range(len(lowered))
    ]
    valid = nxts[0].isNotNull()
    for n in nxts[1:]:
        valid = valid & n.isNotNull()
    reach = F.greatest(*nxts) if len(nxts) > 1 else nxts[0]
    spans = anchors.select(
        id_col, F.when(valid, reach - start + 1).alias("_span")
    )
    return spans.groupBy(id_col).agg(
        F.min("_span").cast("int").alias("min_span"),
        F.lit(len(lowered)).cast("int").alias("n_terms"),
    )


def quality_logistic(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: dict[str, float],
    bias: float = 0.0,
) -> DataFrame:
    """Linear quality classifier (the fasttext-style scorer every
    curation pipeline ends up with): logit = b + Σ wᵢ·featureᵢ over the
    deterministic :func:`quality_features`, prob = σ(logit). Weights
    come from offline training; scoring is a pure narrow expression —
    zero shuffles, pushdown-friendly, identical math in any engine.

    Output: (id, logit, prob, keep) with keep = prob ≥ 0.5.
    """
    feats = quality_features(F.col(text_col))
    unknown = set(weights) - set(feats)
    if unknown:
        raise ValueError(f"unknown feature(s): {sorted(unknown)}")
    logit: Column = F.lit(float(bias))
    for name, w in sorted(weights.items()):
        logit = logit + F.lit(float(w)) * feats[name]
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
    return df.select(
        F.col(id_col),
        F.round(logit, 6).alias("logit"),
        F.round(prob, 6).alias("prob"),
        (prob >= 0.5).cast("int").alias("keep"),
    )


def zipf_fit(df: DataFrame, id_col: str, text_col: str, top_n: int = 200) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: least-squares slope of
    ln(freq) vs ln(rank) across the ``top_n`` most frequent tokens —
    natural text sits near slope −1; heavily duplicated or synthetic
    corpora drift off it, making the slope a one-number corpus-health
    signal (alongside u2's per-domain stats).

    Plan: one map-side-combined token count, then
    ``orderBy(...).limit(top_n)`` → ``TakeOrderedAndProject`` (per-
    partition top-n heaps, NO unpartitioned window over the full
    vocabulary), and only the resulting ≤ top_n rows pass through a
    single-partition ``row_number`` to assign ranks before the
    closed-form regression sums. The only global step therefore
    touches top_n rows, not the corpus — at 100 TB the vocabulary is
    billions of tokens, and ranking it through one WindowExec task
    (the pre-r6 implementation) would be the job's bottleneck.
    Ties rank deterministically (count desc, token asc). Output
    one row: (vocab_size, total_tokens, top_n, zipf_slope, intercept).
    """
    from pyspark.sql import Window

    from healthcare_api_spark.functions.text import tokens

    if top_n < 3:
        raise ValueError("top_n must be ≥ 3")
    # persist: the token-frequency table feeds BOTH the totals branch
    # and the top-n branch — without it each branch re-tokenizes the
    # whole corpus (two Scan+Generate+HashAggregate chains; VERDICT r6
    # #5). Cached post-aggregation, so the footprint is vocab-sized,
    # not corpus-sized, and the corpus is tokenized exactly once.
    tf = (
        df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist()
    )
    totals = tf.agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
        F.sum("cnt").cast("bigint").alias("total_tokens"),
    )
    # TakeOrderedAndProject: per-partition heaps, merged on the driver
    # side of the exchange — the full vocab is never globally sorted.
    topn = tf.orderBy(F.col("cnt").desc(), F.col("tok").asc()).limit(top_n)
    # Rank only the surviving ≤ top_n rows; the unpartitioned window is
    # bounded by construction (top_n, default 200).
    w = Window.orderBy(F.col("cnt").desc(), F.col("tok").asc())
    top = topn.withColumn("rk", F.row_number().over(w))
    xy = top.select(
        F.log(F.col("rk").cast("double")).alias("x"),
        F.log(F.col("cnt").cast("double")).alias("y"),
    )
    sums = xy.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    fitted = sums.select(
        F.round(slope, 6).alias("zipf_slope"),
        F.round(intercept, 6).alias("intercept"),
        F.col("n").cast("int").alias("top_n"),
    )
    return totals.crossJoin(fitted)


def repetition_signals(
    df: DataFrame, id_col: str, text_col: str, dup_n: int = 5
) -> DataFrame:
    """Gopher-style word-level repetition signals per document (Rae et
    al. 2021, §A1.1, adapted to single-line corpora: the line/paragraph
    duplicate fractions collapse onto word n-gram statistics here).

    Sibling of :func:`curation.repetition_features`, by design: that
    one emits the two classic FRACTIONS for a single n (cheap gate
    inputs); this one emits the multi-granularity INTEGER evidence —
    the identity of the top token/bigram (deterministic argmax), the
    duplicate-``dup_n``-gram occurrence mass, and an integer-arithmetic
    flag — the hash-exact, auditable variant.

    Output, ALL integers / strings (bit-exact across engines — no float
    fraction can flip a rounding boundary):

      ``n_tokens``       whitespace tokens after normalization
      ``n_distinct``     distinct tokens
      ``top_token``      most frequent token (ties → lexicographically
                         smallest), ``top_token_cnt`` its count
      ``top_bigram``     most frequent word bigram (same tie-break),
                         ``top_bigram_cnt`` its count
      ``dup_ngram_occ``  number of ``dup_n``-gram occurrences whose
                         gram appears more than once in the document —
                         the Gopher "duplicate n-gram" mass as a raw
                         occurrence count
      ``repetitive``     1 when the top bigram repeats AND covers
                         ≥ 10% of token positions, OR duplicated
                         ``dup_n``-grams cover ≥ 50% of gram positions
                         (integer-arithmetic thresholds: ``cnt·10 ≥ n``
                         style, no division)

    Scale shape: three explode→groupBy chains, each a map-side-combined
    hash aggregate keyed by (doc, gram) then (doc) — the argmax uses
    ``min(struct(-cnt, gram))`` so there is NO per-doc window and both
    aggregate levels partial-combine. The three per-doc aggregates join
    on the id (equi-join, AQE-planned). Candidate volume is linear in
    corpus tokens; nothing is quadratic in document count or length.

    Reference scope: the reference's quality filtering delegates to its
    hosted search service; repetition filtering is part of this repo's
    §2.10 LLM-curation surface (SURVEY.md), not a reference port.
    """
    from healthcare_api_spark.functions.text import tokens, word_shingles

    c = F.col(text_col)

    def _top_agg(gram_col: Column, out_prefix: str, extra: bool) -> DataFrame:
        per = (
            df.select(F.col(id_col), F.explode(gram_col).alias("g"))
            .groupBy(id_col, "g")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        aggs = [
            F.min(
                F.struct((-F.col("cnt")).alias("nc"), F.col("g").alias("t"))
            ).alias("m")
        ]
        if extra:
            aggs += [
                F.sum("cnt").cast("bigint").alias("n_tokens"),
                F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
            ]
        else:
            aggs += [
                F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(F.lit(0)))
                .cast("bigint")
                .alias(f"_{out_prefix}_dup")
            ]
        out = per.groupBy(id_col).agg(*aggs)
        sel = [
            F.col(id_col),
            F.col("m.t").alias(f"{out_prefix}"),
            (-F.col("m.nc")).cast("bigint").alias(f"{out_prefix}_cnt"),
        ]
        if extra:
            sel += [F.col("n_tokens"), F.col("n_distinct")]
        else:
            sel += [F.col(f"_{out_prefix}_dup")]
        return out.select(*sel)

    tok_agg = _top_agg(tokens(c), "top_token", extra=True)
    bi_agg = _top_agg(word_shingles(c, 2), "top_bigram", extra=False).drop(
        "_top_bigram_dup"
    )
    ng_agg = (
        df.select(F.col(id_col), F.explode(word_shingles(c, dup_n)).alias("g"))
        .groupBy(id_col, "g")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy(id_col)
        .agg(
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("dup_ngram_occ"),
            F.sum("cnt").cast("bigint").alias("_n_grams"),
        )
    )
    joined = tok_agg.join(bi_agg, id_col).join(ng_agg, id_col)
    rep = (
        ((F.col("top_bigram_cnt") * 10 >= F.col("n_tokens")) & (F.col("top_bigram_cnt") > 1))
        | (F.col("dup_ngram_occ") * 2 >= F.col("_n_grams"))
    ).cast("int")
    return joined.select(
        F.col(id_col),
        "n_tokens",
        "n_distinct",
        "top_token",
        "top_token_cnt",
        "top_bigram",
        "top_bigram_cnt",
        "dup_ngram_occ",
        rep.alias("repetitive"),
    )


def _explode_word_syms(wf: DataFrame, passthrough: tuple[str, ...]) -> DataFrame:
    """Explode a (word, *passthrough, syms) frame to one row per symbol
    position with its right neighbor — the shared input of BPE pair
    counting and merge application (train and encode both start here)."""
    from pyspark.sql import Window

    ex = wf.select(
        "word",
        *passthrough,
        F.explode(
            F.expr(
                "transform(sequence(1, size(syms)), i -> "
                "struct(i AS i, element_at(syms, i) AS s))"
            )
        ).alias("e"),
    ).select(
        "word", *passthrough, F.col("e.i").alias("i"), F.col("e.s").alias("s")
    )
    w = Window.partitionBy("word").orderBy("i")
    return ex.withColumn("nxt", F.lead("s").over(w))


def _apply_merge_match(
    ex: DataFrame, match, passthrough: tuple[str, ...]
) -> DataFrame:
    """Textbook left-to-right non-overlapping merge application over an
    exploded symbol frame: match-run islands (gaps-and-islands on the
    cumulative match count), even-offset-within-island selection, a lag
    to drop consumed positions, then rebuild the symbol array in
    position order. All window expressions partitioned by word — no
    UDFs, no per-row Python. ``match`` may OR several pairwise
    symbol-disjoint rules (disjoint rules cannot share a match-run)."""
    from pyspark.sql import Window

    w = Window.partitionBy("word").orderBy("i")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    stepped = ex.withColumn("m", match.cast("int")).withColumn(
        "rn", F.sum("m").over(run)
    )
    stepped = stepped.withColumn(
        "grp", F.when(F.col("m") == 1, F.col("i") - F.col("rn"))
    )
    gw = Window.partitionBy("word", "grp")
    stepped = stepped.withColumn(
        "take",
        (F.col("m") == 1)
        & ((F.col("rn") - F.min("rn").over(gw)) % 2 == 0),
    )
    stepped = stepped.withColumn(
        "consumed", F.coalesce(F.lag("take").over(w), F.lit(False))
    )
    return (
        stepped.withColumn(
            "ns",
            F.when(F.col("take"), F.concat(F.col("s"), F.col("nxt")))
            .when(F.col("consumed"), F.lit(None))
            .otherwise(F.col("s")),
        )
        .filter(F.col("ns").isNotNull())
        .groupBy("word", *passthrough)
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(i, ns))), p -> p.ns)"
            ).alias("syms")
        )
    )


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int = 8,
    vocab_partitions: int | None = None,
    batch_merges: int = 1,
) -> "list[tuple[int, str, str, int]]":
    """Byte-pair-encoding tokenizer TRAINING (Sennrich et al. 2016)
    over the corpus, distributed: learn ``n_merges`` merge rules, most
    frequent adjacent symbol pair first, ties broken by (left asc,
    right asc).

    Follows the standard scaling shape: the corpus is touched ONCE (a
    token-frequency aggregate); every merge round then operates on the
    distinct-WORD table (vocabulary-sized, ≪ corpus — the trick that
    makes BPE training tractable on any corpus). Merge application is
    the textbook left-to-right non-overlapping scan, expressed as
    windows per word: match flag (lead), match-run islands (cumulative
    count gaps-and-islands), even-offset-within-island selection, and
    a lag to drop consumed positions — no UDFs, no per-row Python.

    Each round collects exactly ONE row to the driver (the argmax
    pair) — that row IS the training decision, the same bounded
    driver-side step as pagerank's node count. The word table is
    localCheckpoint'ed per round (it is vocabulary-sized).

    ``vocab_partitions`` coalesces the word table between rounds —
    size it to the MEASURED vocabulary (a 30-word synthetic vocab
    doesn't want 32 window partitions; a billion-token corpus's
    multi-million-word vocab does). None keeps the parent partitioning
    (measured: 6.1 → 5.0 s at sf0.1 with 1 partition on this corpus's
    fixed vocab; identical merges, pinned by test).

    ``batch_merges`` (r8, VERDICT r7 #5) learns up to that many merges
    per Spark round: candidates are taken in global (cnt desc, left,
    right) order and accepted while PAIRWISE SYMBOL-DISJOINT from every
    already-accepted pair in the batch — stopping at the FIRST
    conflicting candidate (a prefix, never a skip). That prefix rule
    makes batched training EXACTLY equal to sequential training, not
    an approximation: applying symbol-disjoint merges leaves each
    other's pair counts invariant (no occurrence of a disjoint pair is
    consumed or created), every pair a merge does affect can only
    DECREASE, and any newly created pair (q, xy) is bounded by the
    pre-batch count of (q, x) — a candidate at-or-after the stop point
    in (cnt, lex) order, so it can never outrank an accepted pair at
    its round (tie-break included: the concatenated name sorts after).
    Disjoint rules also cannot share a match-run (consecutive matches
    imply y₁ = x₂), so the one-pass application below is untouched —
    the match flag just ORs over the batch. Driver round-trips drop
    from n_merges to ~n_merges/m; real tokenizer training (30k merges)
    needs this or it serializes 30k Spark jobs. batched == sequential
    is pinned by a differential test on random corpora.

    Returns the learned merge table as a list of
    ``(rank, left, right, pair_freq)`` — all ints/strings, exact.
    Raises if the corpus runs out of pairs before ``n_merges``.
    """
    from pyspark.sql import Window

    from healthcare_api_spark.functions.text import tokens

    if n_merges < 1:
        raise ValueError("n_merges must be ≥ 1")
    if batch_merges < 1:
        raise ValueError("batch_merges must be ≥ 1")
    wf = (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .select(
            "word",
            "freq",
            F.expr(
                "transform(sequence(1, length(word)), i -> substr(word, i, 1))"
            ).alias("syms"),
        )
    )
    if vocab_partitions is not None:
        if vocab_partitions < 1:
            raise ValueError("vocab_partitions must be ≥ 1")
        wf = wf.coalesce(vocab_partitions)
    wf = wf.localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    while len(merges) < n_merges:
        ex = _explode_word_syms(wf, ("freq",))
        want = min(batch_merges, n_merges - len(merges))
        top = (
            ex.filter(F.col("nxt").isNotNull())
            .groupBy(F.col("s").alias("x"), F.col("nxt").alias("y"))
            .agg(F.sum("freq").cast("bigint").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("x").asc(), F.col("y").asc())
            .limit(want)
            .collect()
        )
        if not top:
            raise ValueError(
                f"corpus exhausted after {len(merges)} merges; lower n_merges"
            )
        # accept the longest PREFIX of pairwise symbol-disjoint
        # candidates — stop at the first conflict, never skip past it
        # (the prefix rule is what makes batched == sequential exact)
        accepted: list[tuple[str, str, int]] = []
        used: set[str] = set()
        for row in top:
            x, y = row["x"], row["y"]
            if x in used or y in used:
                break
            accepted.append((x, y, int(row["cnt"])))
            used.update((x, y))
        for x, y, cnt in accepted:
            merges.append((len(merges) + 1, x, y, cnt))
        # textbook left-to-right non-overlapping merge application —
        # unchanged under batching: disjoint rules cannot share a
        # match-run, so one OR'd flag per position suffices
        m = F.lit(False)
        for x, y, _ in accepted:
            m = m | ((F.col("s") == F.lit(x)) & (F.col("nxt") == F.lit(y)))
        rebuilt = _apply_merge_match(ex, m, ("freq",))
        if vocab_partitions is not None:
            rebuilt = rebuilt.coalesce(vocab_partitions)
        wf = rebuilt.localCheckpoint(eager=True)
    return merges


def bpe_train_sql(n_merges: int = 8, toks_sql: str = "{TOKS}") -> str:
    """DuckDB oracle twin of :func:`bpe_train` — the same fixed merge
    rounds unrolled as chained MATERIALIZED CTEs (the kcore /
    label_propagation / x7-LTTB pattern): per round a pair-count
    aggregate, a deterministic argmax, and the identical windowed
    left-to-right merge application. Final SELECT unions the N argmax
    rows into the merge table (rank, x, y, cnt)."""
    parts = [
        f"WITH w0 AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT)"
        f" AS freq, list_transform(generate_series(1, length(word)),"
        f" i -> substr(word, i, 1)) AS syms FROM"
        f" (SELECT unnest({toks_sql}) AS word FROM documents) GROUP BY word),",
    ]
    for r in range(n_merges):
        parts.append(
            f" e{r} AS MATERIALIZED (SELECT word, freq, i, syms[i] AS s,"
            f"  syms[i + 1] AS nxt FROM w{r}, LATERAL"
            f"  (SELECT unnest(generate_series(1, len(syms))) AS i)),"
            f" a{r} AS MATERIALIZED (SELECT x, y, cnt FROM"
            f"  (SELECT s AS x, nxt AS y, CAST(sum(freq) AS BIGINT) AS cnt"
            f"   FROM e{r} WHERE nxt IS NOT NULL GROUP BY 1, 2)"
            f"  ORDER BY cnt DESC, x ASC, y ASC LIMIT 1),"
            f" s{r} AS MATERIALIZED (SELECT e.word, e.freq, e.i, e.s, e.nxt,"
            f"  CASE WHEN e.s = a.x AND e.nxt = a.y THEN 1 ELSE 0 END AS m"
            f"  FROM e{r} e, a{r} a),"
            f" t{r} AS MATERIALIZED (SELECT *,"
            f"  sum(m) OVER (PARTITION BY word ORDER BY i"
            f"   ROWS UNBOUNDED PRECEDING) AS rn FROM s{r}),"
            f" u{r} AS MATERIALIZED (SELECT *,"
            f"  CASE WHEN m = 1 THEN i - rn END AS grp FROM t{r}),"
            f" v{r} AS MATERIALIZED (SELECT *,"
            f"  (m = 1 AND (rn - min(rn) OVER (PARTITION BY word, grp)) % 2 = 0)"
            f"   AS take FROM u{r}),"
            f" x{r} AS MATERIALIZED (SELECT *, coalesce(lag(take) OVER"
            f"  (PARTITION BY word ORDER BY i), false) AS consumed FROM v{r}),"
            f" w{r + 1} AS MATERIALIZED (SELECT word, freq,"
            f"  list(ns ORDER BY i) AS syms FROM"
            f"  (SELECT word, freq, i, CASE WHEN take THEN s || nxt"
            f"    WHEN consumed THEN NULL ELSE s END AS ns FROM x{r})"
            f"  WHERE ns IS NOT NULL GROUP BY word, freq),"
        )
    body = "".join(parts).rstrip(",")
    sel = " UNION ALL ".join(
        f"SELECT {r + 1} AS merge_rank, x, y, cnt FROM a{r}"
        for r in range(n_merges)
    )
    return f"{body} {sel}"


def perplexity_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    fractions: "tuple[float, float]" = (1.0 / 3.0, 2.0 / 3.0),
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score
    every document with the corpus bigram LM (:func:`bigram_logprob`),
    cut the corpus at the exact ``fractions`` percentiles of the score,
    and label each doc ``head`` (lowest perplexity — cleanest),
    ``middle``, or ``tail`` — the standard quality-tiering step before
    sampling a training mix.

    Bit-portability: buckets are computed over the LM score AFTER its
    6-dp round (the hash-stable t17 surface), the cuts are one exact
    ``percentile`` interpolation on those identical doubles (the a13
    equi-depth precedent), and the bucket index is a strict ``v > edge``
    count — every engine sees the same doubles, so the same labels.

    Shape at scale: the LM pass (corpus-linear), ONE single-row
    percentile aggregate broadcast back via crossJoin, then a narrow
    label expression — no window, no extra shuffle beyond the LM's own.
    """
    f1, f2 = fractions
    if not (0.0 < f1 < f2 < 1.0):
        raise ValueError("fractions must satisfy 0 < f1 < f2 < 1")
    lp = bigram_logprob(df, id_col, text_col)
    edges = lp.agg(
        F.expr(
            f"percentile(avg_neg_logprob, array({f1!r}D, {f2!r}D))"
        ).alias("_edges")
    )
    v = F.col("avg_neg_logprob")
    bucket = F.size(F.filter(F.col("_edges"), lambda e: v > e)).cast("int")
    label = (
        F.when(bucket == 0, F.lit("head"))
        .when(bucket == 1, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        lp.crossJoin(F.broadcast(edges))
        .select(
            F.col(id_col),
            "n_bigrams",
            "avg_neg_logprob",
            bucket.alias("bucket"),
            label.alias("tier"),
        )
    )


def char_trigram_index(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Character-trigram inverted index: one (id, gram) row per DISTINCT
    3-char substring of each document — the classic substring-search
    index (Google Code Search, PostgreSQL pg_trgm). Built once at
    ingest; every substring query then joins its handful of needle
    grams instead of scanning text.

    Pure codegen (sequence + substring + array_distinct + explode) —
    no shuffle at build time beyond the write; the exploded index is
    ≤ |chars| rows before distinct and is the thing you'd bucket by
    gram on disk at 100 TB.
    """
    # positions exploded first, the gram substring as a plain codegen
    # expression (an interpreted substr-in-lambda per position was the
    # d20 lesson); per-doc gram dedup becomes a distinct() — an
    # (id, gram) shuffle the one-time index build pays instead of
    # interpreted CPU on every row, and the 100 TB build writes the
    # index gram-bucketed right after this anyway
    return (
        df.select(
            F.col(id_col),
            F.posexplode(
                F.expr(
                    f"sequence(1, greatest(length({text_col}) - 2, 1))"
                )
            ).alias("_p", "_i"),
            F.col(text_col).alias("_txt"),
        )
        .filter(F.col("_i") <= F.length("_txt") - 2)
        .select(F.col(id_col), F.expr("substring(_txt, _i, 3)").alias("gram"))
        .distinct()
    )


def substring_search(
    df: DataFrame,
    id_col: str,
    text_col: str,
    needle: str,
    index: DataFrame | None = None,
) -> DataFrame:
    """Exact substring search accelerated by the trigram index: a doc
    can contain ``needle`` only if it contains EVERY trigram of the
    needle, so candidates = index rows matching the needle's gram set,
    grouped to ids that hit all of them — a multiplicatively shrinking
    prefilter — then ONE exact ``contains`` verify over the candidates
    (never the corpus). The decontamination / code-search primitive:
    "which documents contain this exact string" at corpus scale.

    The needle-gram list is a literal IN-filter (pushed to the index
    scan; at 100 TB a gram-bucketed index makes it partition pruning);
    the verify join is a semi-join on ids. Needles shorter than 3
    chars have no trigrams — the operator falls back to the full-scan
    ``contains`` filter and says so in the plan (documented, the
    pg_trgm behavior).

    Output: the matching rows of ``df`` (exact, no false positives —
    the verify step closes the trigram filter's gap).
    """
    if not needle:
        raise ValueError("needle must be non-empty")
    if len(needle) < 3:
        return df.filter(F.instr(F.col(text_col), needle) > 0)
    grams = sorted({needle[i : i + 3] for i in range(len(needle) - 2)})
    idx = index if index is not None else char_trigram_index(df, id_col, text_col)
    hits = (
        idx.filter(F.col("gram").isin(grams))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("_ng"))
        .filter(F.col("_ng") == len(grams))
        .select(id_col)
    )
    return df.join(hits, id_col, "left_semi").filter(
        F.instr(F.col(text_col), needle) > 0
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_ratio: float = 0.8,
    min_stop_hits: int = 2,
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, table A1 —
    the MassiveWeb repetition-free filter set; thresholds are the
    published defaults, every one a keyword knob): word-count bounds,
    mean-word-length band, symbol-to-word ratio ('#' and '...'),
    bullet-started and ellipsis-ended line ratios, alphabetic-word
    ratio, and required-stopword hits. The row-level charter filter a
    CommonCrawl-scale curation pipeline runs before any model-based
    scoring.

    Every feature is an exact integer count over the RAW text (words =
    whitespace runs; '#'/'...' occurrences by non-overlapping replace
    — both engines scan left-to-right; lines = newline split, blank
    lines dropped), and every ratio is ONE correctly-rounded division
    of two int64s at 6 dp, so rule comparisons run on bit-identical
    doubles in any engine — no floats accumulate. One narrow
    projection, no shuffle, no UDFs: at 100 TB this is a map-only pass
    whose cost is the scan itself.

    Output: (id, n_words, mean_word_len, symbol_ratio, bullet_ratio,
    ellipsis_ratio, alpha_ratio, n_stop_hits, keep).
    """
    if min_stop_hits > len(stopwords):
        raise ValueError("min_stop_hits exceeds the stopword list")
    t = F.col(text_col)
    words = F.expr(
        f"filter(split({text_col}, '\\\\s+'), w -> w <> '')"
    )
    lines = F.expr(
        f"filter(split({text_col}, '\\n'), l -> trim(l) <> '')"
    )
    d = df.select(
        F.col(id_col),
        F.size(words).cast("bigint").alias("_nw"),
        F.expr(
            f"aggregate(filter(split({text_col}, '\\\\s+'), w -> w <> ''),"
            " 0L, (acc, w) -> acc + length(w))"
        ).alias("_wlen"),
        F.size(
            F.expr(
                f"filter(filter(split({text_col}, '\\\\s+'), w -> w <> ''),"
                " w -> w rlike '[A-Za-z]')"
            )
        ).cast("bigint").alias("_nalpha"),
        F.size(lines).cast("bigint").alias("_nl"),
        F.size(
            F.expr(
                f"filter(filter(split({text_col}, '\\n'), l -> trim(l) <> ''),"
                " l -> startswith(ltrim(l), '-') or startswith(ltrim(l), '*')"
                " or startswith(ltrim(l), '•'))"
            )
        ).cast("bigint").alias("_nbullet"),
        F.size(
            F.expr(
                f"filter(filter(split({text_col}, '\\n'), l -> trim(l) <> ''),"
                " l -> endswith(rtrim(l), '...'))"
            )
        ).cast("bigint").alias("_nell"),
        (F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))).cast(
            "bigint"
        ).alias("_nhash"),
        F.expr(
            f"CAST((length({text_col}) -"
            f" length(replace({text_col}, '...', ''))) DIV 3 AS BIGINT)"
        ).alias("_ndots"),
        sum(
            [
                F.array_contains(
                    F.expr(
                        f"transform(filter(split({text_col}, '\\\\s+'),"
                        " w -> w <> ''), w -> lower(w))"
                    ),
                    F.lit(sw),
                ).cast("int")
                for sw in stopwords
            ],
            F.lit(0),
        ).alias("_nstop"),
    )
    nw = F.greatest(F.col("_nw"), F.lit(1)).cast("double")
    nl = F.greatest(F.col("_nl"), F.lit(1)).cast("double")
    feats = d.select(
        F.col(id_col),
        F.col("_nw").alias("n_words"),
        F.round(F.col("_wlen").cast("double") / nw, 6).alias("mean_word_len"),
        F.round(
            (F.col("_nhash") + F.col("_ndots")).cast("double") / nw, 6
        ).alias("symbol_ratio"),
        F.round(F.col("_nbullet").cast("double") / nl, 6).alias("bullet_ratio"),
        F.round(F.col("_nell").cast("double") / nl, 6).alias("ellipsis_ratio"),
        F.round(F.col("_nalpha").cast("double") / nw, 6).alias("alpha_ratio"),
        F.col("_nstop").alias("n_stop_hits"),
    )
    keep = (
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(min_mean_len, max_mean_len)
        & (F.col("symbol_ratio") < max_symbol_ratio)
        & (F.col("bullet_ratio") < max_bullet_ratio)
        & (F.col("ellipsis_ratio") < max_ellipsis_ratio)
        & (F.col("alpha_ratio") >= min_alpha_ratio)
        & (F.col("n_stop_hits") >= min_stop_hits)
    )
    return feats.withColumn("keep", keep.cast("int"))


def bpe_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: "list[tuple]",
    vocab_partitions: int | None = None,
) -> DataFrame:
    """Apply a learned BPE merge table (:func:`bpe_train` output) to
    the corpus — the ENCODE half of the tokenizer: per document, how
    many tokens the trained vocabulary produces. The per-doc token
    count is what a training pipeline actually bills by (sequence
    packing, mixture planning, context budgeting all consume it).

    Scaling shape mirrors training: merges are applied rank-by-rank to
    the DISTINCT-word table (vocabulary-sized, ≪ corpus — each word is
    encoded exactly once no matter how often it occurs), then one
    broadcast-join maps per-doc word frequencies onto encoded lengths.
    Unlike training there are NO driver round-trips: the rules are
    literals, so the whole encode is one lazy plan per round. Each
    round is the same windowed left-to-right non-overlapping
    application as training (`_apply_merge_match`), applied strictly
    in rank order — a later rule may consume symbols an earlier rule
    created, so rounds cannot be fused across non-disjoint rules.

    Output: (id, n_words, n_tokens, tokens_per_word 6dp).
    """
    from healthcare_api_spark.functions.text import tokens

    if not merges:
        raise ValueError("merges must be non-empty (use bpe_train)")
    doc_tf = (
        df.select(
            F.col(id_col), F.explode(tokens(F.col(text_col))).alias("word")
        )
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    wf = doc_tf.select("word").distinct().select(
        "word",
        F.expr(
            "transform(sequence(1, length(word)), i -> substr(word, i, 1))"
        ).alias("syms"),
    )
    if vocab_partitions is not None:
        if vocab_partitions < 1:
            raise ValueError("vocab_partitions must be ≥ 1")
        wf = wf.coalesce(vocab_partitions)
    for rule in sorted(merges, key=lambda r: r[0]):
        x, y = str(rule[1]), str(rule[2])
        ex = _explode_word_syms(wf, ())
        match = (F.col("s") == F.lit(x)) & (F.col("nxt") == F.lit(y))
        wf = _apply_merge_match(ex, match, ())
        if vocab_partitions is not None:
            wf = wf.coalesce(vocab_partitions)
        # eager, deliberately: lazy per-rule checkpoints (fusing all 8
        # rule rounds into the final action) measured +15% at sf0.1 —
        # the same flat-to-negative result the k-center fusion found on
        # the BPE merge loop (r12 opt; evidence in OPTIMIZATION_r12.md)
        wf = wf.localCheckpoint(eager=True)
    enc = wf.select("word", F.size("syms").cast("bigint").alias("_len"))
    return (
        doc_tf.join(F.broadcast(enc), "word")
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("bigint").alias("n_words"),
            F.sum(F.col("tf") * F.col("_len")).cast("bigint").alias(
                "n_tokens"
            ),
            F.round(
                F.sum(F.col("tf") * F.col("_len")).cast("double")
                / F.sum("tf").cast("double"),
                6,
            ).alias("tokens_per_word"),
        )
    )


def bpe_encode_sql(n_merges: int = 8, toks_sql: str = "{TOKS}") -> str:
    """DuckDB oracle twin of training-then-encoding: reuses
    :func:`bpe_train_sql`'s unrolled merge rounds — whose final CTE
    ``w{n}`` IS the fully-encoded word table — and joins it back onto
    per-document word frequencies. Token counts are exact integers;
    tokens_per_word is one 6-dp division."""
    body = bpe_train_sql(n_merges, toks_sql)
    # keep the CTE chain, swap the UNION-ALL merge-table SELECT for
    # the per-doc encode join
    cte_end = body.rindex(" SELECT 1 AS merge_rank")
    ctes = body[:cte_end]
    return (
        f"{ctes},"
        f" dtf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf"
        f"  FROM (SELECT doc_id, unnest({toks_sql}) AS word"
        f"   FROM documents) GROUP BY 1, 2)"
        f" SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_words,"
        f"  CAST(sum(tf * len(syms)) AS BIGINT) AS n_tokens,"
        f"  round(CAST(sum(tf * len(syms)) AS DOUBLE) /"
        f"   CAST(sum(tf) AS DOUBLE), 6) AS tokens_per_word"
        f" FROM dtf JOIN w{n_merges} USING (word) GROUP BY doc_id"
    )


def substring_search_multi(
    df: DataFrame,
    id_col: str,
    text_col: str,
    needles: "list[str]",
    index: DataFrame | None = None,
) -> DataFrame:
    """Exact MULTI-needle substring search over one shared trigram
    index — the real decontamination shape: a benchmark suite is
    hundreds of needles, and scanning the corpus (or rebuilding the
    index) per needle is the N× cost this amortizes away. The corpus
    is touched exactly twice regardless of needle count: once to build
    (or reuse) the gram index, once for the final verify join.

    Mechanics: the needle→gram map is a LITERAL frame (≤ Σ|needle|
    rows) broadcast against the index; a candidate (needle, doc) must
    hit EVERY gram of its needle (count equality — the same
    multiplicative prefilter as :func:`substring_search`); one
    ``contains`` verify over candidate pairs closes the gap. Needles
    under 3 chars have no trigrams and are verified by a direct scan
    (flagged in the plan, the pg_trgm fallback).

    Output: (needle, id) — one row per needle × matching doc.
    """
    if not needles:
        raise ValueError("needles must be non-empty")
    if any(not n for n in needles):
        raise ValueError("needles must all be non-empty")
    spark = df.sparkSession
    long_needles = sorted({n for n in needles if len(n) >= 3})
    short_needles = sorted({n for n in needles if len(n) < 3})
    out = None
    if long_needles:
        gram_rows = [
            (n, g)
            for n in long_needles
            for g in sorted({n[i : i + 3] for i in range(len(n) - 2)})
        ]
        grams = spark.createDataFrame(gram_rows, ["needle", "gram"])
        n_grams = grams.groupBy("needle").agg(
            F.count(F.lit(1)).alias("_need")
        )
        idx = (
            index
            if index is not None
            else char_trigram_index(df, id_col, text_col)
        )
        hits = (
            # r12: restrict the index to the needle-gram set with a
            # LITERAL isin BEFORE the join — a broadcast join cannot
            # push below the index build's distinct(), so the full
            # corpus gram index was shuffled; the literal predicate
            # pushes through the Aggregate down to the position
            # explode (inline build) or the parquet scan (external
            # index), and the (id, gram) exchange shrinks to matching
            # grams only (guide §2.3: filter before the exchange)
            idx.filter(
                F.col("gram").isin(sorted({g for _, g in gram_rows}))
            )
            .join(F.broadcast(grams), "gram")
            .groupBy("needle", id_col)
            .agg(F.count(F.lit(1)).alias("_got"))
            .join(F.broadcast(n_grams), "needle")
            .filter(F.col("_got") == F.col("_need"))
            .select("needle", id_col)
        )
        verified = (
            hits.join(df.select(id_col, text_col), id_col)
            .filter(F.instr(F.col(text_col), F.col("needle")) > 0)
            .select("needle", id_col)
        )
        out = verified
    for n in short_needles:
        part = df.filter(F.instr(F.col(text_col), n) > 0).select(
            F.lit(n).alias("needle"), F.col(id_col)
        )
        out = part if out is None else out.unionByName(part)
    return out


def char_entropy(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document character-distribution Shannon entropy (bits) — the
    cheap screen for machine-generated noise a curation pipeline runs
    beside length/punctuation rules: base64/hex blobs and key dumps sit
    near the uniform ceiling, natural language near ~4.2 bits, repeated
    filler near 0. Computed as

        H = log2(n) − (Σ c·log2(c)) / n

    over exact integer character counts c (Σc = n), so every log2 runs
    on a bit-identical integer in any engine and the only float
    accumulation is the ≤|alphabet| per-doc term sum (the t17
    precedent), rounded 6 dp. One narrow explode + one (id, char)
    map-side-combined aggregate; nothing corpus-wide.

    Output: (id, n_chars, n_distinct_chars, entropy_bits).
    """
    # positions exploded FIRST, substr as a plain (codegen) column
    # expression — a substr inside an array-lambda evaluates
    # interpreted per character (the d20 lesson)
    chars = df.select(
        F.col(id_col),
        F.posexplode(
            F.expr(f"sequence(1, greatest(length({text_col}), 1))")
        ).alias("_p", "_i"),
        F.col(text_col).alias("_txt"),
    ).filter(F.col("_i") <= F.length("_txt")).select(
        F.col(id_col), F.expr("substring(_txt, _i, 1)").alias("_c")
    )
    counts = chars.groupBy(id_col, "_c").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n")
    )
    ln2 = F.log(F.lit(2.0))
    return (
        counts.groupBy(id_col)
        .agg(
            F.sum("_n").cast("bigint").alias("n_chars"),
            F.count(F.lit(1)).cast("int").alias("n_distinct_chars"),
            F.sum(F.col("_n").cast("double") * F.log(F.col("_n").cast("double"))).alias("_s"),
        )
        .select(
            F.col(id_col),
            "n_chars",
            "n_distinct_chars",
            F.round(
                (
                    F.log(F.col("n_chars").cast("double"))
                    - F.col("_s") / F.col("n_chars").cast("double")
                )
                / ln2,
                6,
            ).alias("entropy_bits"),
        )
    )


def hashed_feature_weights(
    spark, dim: int = 256, scale: int = 1_000_000
) -> DataFrame:
    """Deterministic pseudo-trained weight table for the hashing-trick
    classifier: (bucket, w_scaled) with w_scaled = md5int(bucket) mod
    (2·scale+1) − scale, an integer uniform on [−scale, scale]. Real
    deployments replace this with offline-trained weights written to
    the same (bucket, w_scaled) schema — the scoring plumbing is
    identical either way, and deriving the stand-in from md5 keeps the
    whole artifact reproducible inside any engine (the k8/u8 md5
    convention), which is what lets a hash oracle verify the scorer
    end-to-end rather than trusting a shipped binary blob."""
    if dim < 1:
        raise ValueError("dim must be >= 1")
    if scale < 1:
        raise ValueError("scale must be >= 1")
    return spark.range(dim).select(
        F.col("id").cast("int").alias("bucket"),
        (
            F.conv(
                F.substring(F.md5(F.col("id").cast("string")), 1, 15), 16, 10
            ).cast("bigint")
            % (2 * scale + 1)
            - scale
        ).alias("w_scaled"),
    )


def hashed_classifier_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: DataFrame,
    dim: int = 256,
    scale: int = 1_000_000,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Hashing-trick linear text classifier (Weinberger et al. 2009
    "Feature Hashing for Large Scale Multitask Learning"; the fastText
    architecture of Joulin et al. 2016 — both public papers): the
    quality/topic/toxicity scorer curation pipelines run over every
    crawled document once a vocabulary no longer fits anywhere. Unlike
    :func:`quality_logistic` (a handful of handcrafted surface
    features), features here are the TOKENS themselves, hashed into a
    fixed ``dim``-bucket space with a sign hash to unbias collisions
    (Weinberger §3): token t contributes sign(t)·w[h(t)].

    ``weights`` is a (bucket int, w_scaled bigint) table of
    integer-quantized weights (w = w_scaled / scale) — ≤ ``dim`` rows,
    broadcast. Float discipline (the cents-quantization pattern, used
    from the start per the r7 lesson): the per-doc accumulation
    ``score_num = Σ_b stf_b · w_scaled_b`` is EXACT int64 arithmetic
    (|stf| ≤ doc tokens, |w_scaled| ≤ scale — products stay far under
    2^63 for any real document), the mean-pooled logit is ONE
    correctly-rounded double division of exact integers
    (score_num / (n_tokens·scale), the fastText mean-of-token-vectors
    shape), and ``keep`` is decided on the INTEGER sign (σ(x) ≥ ½ ⟺
    x ≥ 0), so the admission bit can never flip on an ulp. A trained
    bias folds into a reserved always-on bucket.

    Shape at scale: one token explode, one map-side-combined
    (id, bucket) aggregate, one broadcast join against the ≤ dim-row
    weight table, one (id) aggregate — the corpus is scanned once and
    nothing corpus-sized shuffles except the (id, bucket) pairs.
    ``passthrough`` names columns functionally dependent on the id
    (source, lang, …) carried through the aggregates, so a pipeline
    keeps ONE linear lineage instead of joining the scores back onto
    the input (a join-back replays the whole upstream lineage — the
    u9 composition measured 32 corpus scans before this knob).
    Output: (id, *passthrough, n_tokens, logit, prob, keep).
    """
    from healthcare_api_spark.functions.text import tokens

    if dim < 1:
        raise ValueError("dim must be >= 1")
    if scale < 1:
        raise ValueError("scale must be >= 1")
    toks = df.select(
        F.col(id_col),
        *[F.col(c) for c in passthrough],
        F.explode(tokens(F.col(text_col))).alias("_tok"),
    )
    hashed = toks.select(
        id_col,
        *passthrough,
        (
            F.conv(F.substring(F.md5(F.col("_tok")), 1, 8), 16, 10).cast(
                "bigint"
            )
            % dim
        )
        .cast("int")
        .alias("bucket"),
        (
            F.lit(1)
            - F.lit(2)
            * (
                F.conv(F.substring(F.md5(F.col("_tok")), 9, 1), 16, 10).cast(
                    "bigint"
                )
                % 2
            ).cast("int")
        ).alias("_sgn"),
    )
    per_bucket = hashed.groupBy(id_col, *passthrough, "bucket").agg(
        F.sum("_sgn").cast("bigint").alias("_stf"),
        F.count(F.lit(1)).cast("bigint").alias("_tf"),
    )
    scored = (
        per_bucket.join(F.broadcast(weights), "bucket")
        .groupBy(id_col, *passthrough)
        .agg(
            F.sum("_tf").cast("bigint").alias("n_tokens"),
            F.sum(F.col("_stf") * F.col("w_scaled"))
            .cast("bigint")
            .alias("_num"),
        )
    )
    # The reported logit is rounded to 6 dp in EXACT integer
    # arithmetic (half away from zero on the true rational
    # num·10^6 / (n_tokens·scale)), NOT with round() on the double:
    # the rational lands on exact decimal ties (e.g. −65227.5 ppm)
    # where engines' double-round tie rules disagree. ppm/1e6 is then
    # the same double everywhere.
    den = F.col("n_tokens") * F.lit(int(scale))
    # integer DIV keeps every intermediate exact (2·|N|+D reaches
    # ~1e17 on a 100k-token doc — past double's 2^53, so no floor())
    ppm = F.expr(
        f"CASE WHEN _num >= 0 THEN"
        f" (2 * _num * 1000000 + n_tokens * {int(scale)})"
        f"  DIV (2 * n_tokens * {int(scale)})"
        f" ELSE -((2 * -_num * 1000000 + n_tokens * {int(scale)})"
        f"  DIV (2 * n_tokens * {int(scale)})) END"
    )
    # prob keeps the pre-rounding exact-division double (one
    # correctly-rounded op); σ of it is never an exact decimal tie
    # (exp of a nonzero rational is irrational), so 6-dp round is safe
    logit_exact = F.col("_num").cast("double") / den.cast("double")
    return scored.select(
        F.col(id_col),
        *passthrough,
        "n_tokens",
        (ppm.cast("double") / F.lit(1_000_000.0)).alias("logit"),
        F.round(
            F.lit(1.0) / (F.lit(1.0) + F.exp(-logit_exact)), 6
        ).alias("prob"),
        (F.col("_num") >= 0).cast("int").alias("keep"),
    )


def ngram_novelty(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Cross-document n-gram novelty per document — the memorization /
    template screen: what fraction of a document's distinct word
    n-grams appears in NO other document? Boilerplate, mirrored pages
    and templated spam sit near 0; genuinely fresh text near 1. (The
    complement of this ratio is the "n-gram overlap with the rest of
    the corpus" statistic used in memorization studies and C4-style
    template analyses.)

    Shape: distinct (doc, gram) pairs → one gram-keyed map-side-combined
    aggregate for document frequency → join back → one doc-keyed
    aggregate. Work is linear in corpus token volume; grams shuffle as
    strings once each way (at 100 TB, md5 the gram for a 16-byte key —
    the paragraph_dedup precedent).

    Output: (id, n_grams, novel_grams, novelty) — counts exact int64;
    ``novelty`` is the rational novel/n_grams rounded to 6 dp IN EXACT
    INTEGER ARITHMETIC (half away from zero via DIV — the t30 rule:
    small-denominator rationals land on decimal ties where engines'
    double rounding disagrees) then divided by 1e6, one
    correctly-rounded op in both engines.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    from healthcare_api_spark.functions.text import word_shingles

    grams = (
        df.select(F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("g"))
        .filter(F.col("g") != "")
        .distinct()
    )
    dfreq = grams.groupBy("g").agg(F.count(F.lit(1)).cast("bigint").alias("gdf"))
    per = (
        # shuffle_hash: corpus-sized gram-df side — never broadcast
        # (the ×100-sweep driver-OOM lesson; both sides g-partitioned)
        grams.join(dfreq.hint("shuffle_hash"), "g")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(F.when(F.col("gdf") == 1, F.lit(1)).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("novel_grams"),
        )
    )
    micros = F.expr(
        "(2 * novel_grams * 1000000 + n_grams) DIV (2 * n_grams)"
    )
    return per.select(
        F.col(id_col),
        "n_grams",
        "novel_grams",
        (micros.cast("double") / F.lit(1_000_000.0)).alias("novelty"),
    )


def readability(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Flesch Reading Ease + Flesch-Kincaid grade level per document —
    the classic readability gate (Flesch 1948 / Kincaid 1975), a
    standard feature column in quality-classifier stacks beside the
    Gopher charter rules.

    Deterministic proxy features, all EXACT integer counts from narrow
    regexp_count expressions (no shuffle, map-only):

      ``n_words``      whitespace tokens of the normalized text
      ``n_sentences``  runs of sentence punctuation ``[.!?]+``
                       (min 1 — fragment convention)
      ``n_syllables``  vowel-group runs ``[aeiouy]+`` across the text
                       (the standard cheap syllable proxy; min 1)

    Both scores are rationals over the common denominator
    s·w with integer-constant numerators:

      FRE  = (206835·s·w − 1015·w² − 84600·sy·s) / (s·w)   [milli]
      FKGL = (390·w² + 11800·sy·s − 15590·s·w) / (s·w)     [milli]

    and are rounded to 3 dp IN EXACT INTEGER ARITHMETIC (half away
    from zero via DIV — the t30 decimal-tie rule; these
    small-denominator rationals DO land on decimal ties) then divided
    by 1e3: one correctly-rounded op in both engines.
    """
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    w = F.greatest(F.size(F.split(norm, " ")), F.lit(1)).cast("bigint")
    s = F.greatest(
        F.regexp_count(norm, F.lit(r"[.!?]+")), F.lit(1)
    ).cast("bigint")
    sy = F.greatest(
        F.regexp_count(norm, F.lit(r"[aeiouy]+")), F.lit(1)
    ).cast("bigint")
    base = df.select(
        F.col(id_col),
        w.alias("n_words"),
        s.alias("n_sentences"),
        sy.alias("n_syllables"),
    )
    milli = (
        "CASE WHEN {n} >= 0 THEN (2 * ({n}) + {d}) DIV (2 * ({d}))"
        " ELSE -((2 * -({n}) + {d}) DIV (2 * ({d}))) END"
    )
    fre_n = (
        "206835 * n_sentences * n_words - 1015 * n_words * n_words"
        " - 84600 * n_syllables * n_sentences"
    )
    fk_n = (
        "390 * n_words * n_words + 11800 * n_syllables * n_sentences"
        " - 15590 * n_sentences * n_words"
    )
    den = "n_sentences * n_words"
    return base.select(
        F.col(id_col),
        "n_words",
        "n_sentences",
        "n_syllables",
        (
            F.expr(milli.format(n=fre_n, d=den)).cast("double")
            / F.lit(1000.0)
        ).alias("fre"),
        (
            F.expr(milli.format(n=fk_n, d=den)).cast("double")
            / F.lit(1000.0)
        ).alias("fkgl"),
    )


RAKE_STOPWORDS: tuple[str, ...] = (
    "the", "and", "of", "to", "is", "that", "a", "an", "in", "on",
    "for", "with", "as", "by", "at", "be", "are", "was", "it",
    "this", "or", "from", "have", "not",
)


def rake_keywords(
    df: DataFrame,
    id_col: str,
    text_col: str,
    stopwords: tuple[str, ...] = RAKE_STOPWORDS,
    top_k: int = 3,
    max_phrase_len: int = 4,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010) — the classic
    unsupervised per-document keyword algorithm: candidate phrases are
    maximal stopword-free token runs, each word scores
    deg(w)/freq(w) over the document's phrases (degree = Σ length of
    the phrases its occurrences sit in — co-occurrence rewards
    multi-word terms), and a phrase scores the sum of its words.
    Output: the ``top_k`` phrases per document.

    Engine-portability: deg/freq are exact integers; each word score
    is the rational deg/freq rounded to 6-dp micros IN INTEGER
    ARITHMETIC (the t30 DIV rule — deg/freq is exactly the
    small-denominator shape that ties), the phrase score is an exact
    int64 SUM of word micros, and ranking breaks ties by phrase text.
    (Documented variant: per-word rounding before the sum — scores
    differ from float RAKE by < 1e-6·len, ordering preserved except
    at genuine near-ties, where determinism is the point.)

    Shape: every aggregate/window is keyed by the doc id (positions →
    islands → phrase lengths → word stats → phrase scores → top-k) —
    one doc-keyed shuffle reused end to end, no corpus-wide state.
    ``max_phrase_len`` drops longer runs (stopword-free spam would
    otherwise make one "phrase" of a whole document — a skew and
    relevance guard, standard in RAKE deployments).
    """
    if top_k < 1 or max_phrase_len < 1:
        raise ValueError("top_k and max_phrase_len must be >= 1")
    if not stopwords:
        raise ValueError("stopwords must be non-empty")
    from pyspark.sql import Window

    from healthcare_api_spark.functions.text import tokens

    toks = df.select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("_i", "_w"),
    ).filter(F.col("_w") != "")
    stop = F.col("_w").isin(list(stopwords))
    wd = Window.partitionBy(id_col).orderBy("_i")
    ph = (
        toks.withColumn("_brk", F.when(stop, 1).otherwise(0))
        .withColumn("_pid", F.sum("_brk").over(wd))
        .filter(~stop)
    )
    plen = ph.groupBy(id_col, "_pid").agg(
        F.count(F.lit(1)).cast("bigint").alias("_plen"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_i", "_w"))),
                lambda s: s["_w"],
            ),
            " ",
        ).alias("phrase"),
    ).filter(F.col("_plen") <= max_phrase_len)
    occ = ph.join(plen.select(id_col, "_pid", "_plen"), [id_col, "_pid"])
    wstat = occ.groupBy(id_col, "_w").agg(
        F.count(F.lit(1)).cast("bigint").alias("_freq"),
        F.sum("_plen").cast("bigint").alias("_deg"),
    )
    wscore = wstat.withColumn(
        "_wmic",
        F.expr("(2 * _deg * 1000000 + _freq) DIV (2 * _freq)"),
    )
    pscore = (
        occ.join(wscore.select(id_col, "_w", "_wmic"), [id_col, "_w"])
        .groupBy(id_col, "_pid")
        .agg(F.sum("_wmic").cast("bigint").alias("_smic"))
        .join(plen, [id_col, "_pid"])
    )
    wr = Window.partitionBy(id_col).orderBy(
        F.col("_smic").desc(), F.col("phrase").asc(), F.col("_pid").asc()
    )
    return (
        pscore.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= top_k)
        .select(
            F.col(id_col),
            F.col("rank").cast("int").alias("rank"),
            "phrase",
            F.col("_plen").cast("int").alias("n_words"),
            (F.col("_smic").cast("double") / F.lit(1e6)).alias("score"),
        )
    )


# Half-up ppm of _topk/n_tokens in decimal(38,0), like the gini
# numerator: 2·topk·1e6 overflows int64 once a stratum passes ~4.6e12
# tokens, and under non-ANSI sessions that wrap is a silent NULL while
# the DuckDB oracle's HUGEINT keeps going (ADVICE r10, medium). Named
# so tests can pin the expression at past-int64 magnitudes directly.
_TOPK_MASS_PPM_EXPR = (
    "CAST((2 * CAST(_topk AS DECIMAL(38,0)) * 1000000"
    " + CAST(n_tokens AS DECIMAL(38,0)))"
    " DIV (2 * CAST(n_tokens AS DECIMAL(38,0))) AS BIGINT)"
)


def vocab_concentration(
    df: DataFrame,
    strata_col: str,
    text_col: str,
    top_k: int = 10,
    rank_mode: str = "auto",
    range_vocab_threshold: int = 32_000_000,
) -> DataFrame:
    """Per-stratum vocabulary-concentration report (r10): token count,
    distinct vocabulary, hapax count (Heaps'-law raw material), the
    top term, top-k frequency mass, and the GINI coefficient of the
    term-frequency distribution — the log-free Zipf-skew statistic.
    A near-uniform vocabulary (templated/boilerplate text the dedup
    stages should have caught) shows low gini + low top-k mass; a
    natural-language stratum sits near gini ≈ 0.8-0.95. This is the
    corpus-release health check next to t31's novelty and u2's domain
    stats.

    Exactness: Gini over counts sorted by (count, term) is
        G = (Σᵢ (2i − 1)·cᵢ − V·Σc) / (V·Σc),    i = 1..V ascending,
    computed ENTIRELY in integers — the numerator accumulates in
    decimal(38,0) (i·c products overflow int64 at corpus scale; the
    x9/x18 headroom treatment), and the ppm outputs use the u11
    half-up integer-division device — so every output column is
    BIGINT/string, hash-portable with NO float boundary anywhere.
    (A log-log Zipf OLS slope was rejected by design: ln is not
    correctly rounded cross-engine — the u16 pow lesson.)

    Scale shape: one token-frequency aggregate (the t10 shuffle), the
    rank/index step, one hash aggregate; nothing touches the corpus
    twice. The rank step has TWO modes with hash-identical output
    (parity-tested):

    - ``rank_mode="window"``: per-stratum row_number windows
      — one task sorts each stratum's FULL vocabulary. Fine while
      vocab-per-stratum fits a task (Heaps' law keeps vocab ≪ corpus),
      but with a handful of strata at 100 TB that task is the skew
      point;
    - ``rank_mode="range"``: the d12 ``global_row_rank`` decomposition
      (range repartition → per-partition counts → offset + parallel
      local windows) over (stratum, ±count, term), converted to
      per-stratum indexes by subtracting each stratum's minimum global
      rank — every partition sorts a range slice, no stratum-sized
      task anywhere. Two extra range shuffles; choose it when strata
      are few and vocabularies huge.
    - ``rank_mode="auto"`` (default, r11 — VERDICT r10 #4): checkpoint
      the (vocab-sized, ≪ corpus) term-frequency frame, measure its
      LARGEST per-stratum vocabulary, and pick "range" iff that
      exceeds ``range_vocab_threshold`` rows. MEASURED (r11 hapax
      legs, SCALE.md): few-strata alone does NOT justify range — at
      20M vocab rows over 5 strata (4M/stratum) the window mode's
      single-task sorts still beat range's two extra full-vocab range
      shuffles 14.1 s vs 37.9 s; the range mode only pays off when a
      single stratum's vocabulary is too big for one task's sort
      (memory + the single-task wall). The default threshold 32M rows
      ≈ a 20-30 s single-task external sort — past it the constant
      ~2.7× range overhead is cheaper than the skew.
    """
    from pyspark.sql import Window

    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    if rank_mode not in ("auto", "window", "range"):
        raise ValueError("rank_mode must be 'auto', 'window' or 'range'")
    tf = (
        df.select(
            F.col(strata_col).alias("stratum"),
            F.explode(
                F.split(normalize_text(F.col(text_col)), " ")
            ).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .groupBy("stratum", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    if rank_mode == "auto":
        # materialize tf once (both modes consume it; the probe then
        # reads the checkpoint, not the corpus) and measure the
        # largest per-stratum vocabulary — the quantity that actually
        # decides the mode (see docstring: strata count alone was
        # measured and rejected)
        tf = tf.localCheckpoint(eager=True)
        mx = (
            tf.groupBy("stratum")
            .agg(F.count(F.lit(1)).alias("v"))
            .agg(F.max("v").alias("m"))
            .collect()[0]["m"]
        )
        rank_mode = (
            "range" if (mx or 0) > range_vocab_threshold else "window"
        )
    if rank_mode == "window":
        w_asc = Window.partitionBy("stratum").orderBy(
            F.col("c").asc(), F.col("tok").asc()
        )
        w_desc = Window.partitionBy("stratum").orderBy(
            F.col("c").desc(), F.col("tok").asc()
        )
        ranked = tf.select(
            "stratum", "tok", "c",
            F.row_number().over(w_asc).cast("long").alias("i"),
            F.row_number().over(w_desc).cast("long").alias("r"),
        )
    else:
        from healthcare_api_spark.operators.dedup import global_row_rank

        # (stratum, c, tok) and (stratum, −c, tok) are total orders
        # (tok unique per stratum); per-stratum index = global rank −
        # stratum's min rank + 1. The mins frame is |strata| rows and
        # broadcasts.
        both = global_row_rank(
            tf.withColumn("_nc", -F.col("c")), ["stratum", "c", "tok"],
            out_col="_ga",
        )
        both = global_row_rank(
            both, ["stratum", "_nc", "tok"], out_col="_gd"
        )
        mins = both.groupBy("stratum").agg(
            F.min("_ga").alias("_ma"), F.min("_gd").alias("_md")
        )
        ranked = both.join(F.broadcast(mins), "stratum").select(
            "stratum", "tok", "c",
            (F.col("_ga") - F.col("_ma") + 1).cast("long").alias("i"),
            (F.col("_gd") - F.col("_md") + 1).cast("long").alias("r"),
        )
    d38 = "decimal(38,0)"
    agg = ranked.groupBy("stratum").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_vocab"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("bigint").alias("n_hapax"),
        F.max(F.when(F.col("r") == 1, F.col("tok"))).alias("top_term"),
        F.max(F.when(F.col("r") == 1, F.col("c")))
        .cast("bigint").alias("top_count"),
        F.sum(F.when(F.col("r") <= top_k, F.col("c")).otherwise(0))
        .cast("bigint").alias("_topk"),
        F.sum(
            (2 * F.col("i") - 1).cast(d38) * F.col("c").cast(d38)
        ).alias("_s"),
    )
    den = F.col("n_vocab").cast(d38) * F.col("n_tokens").cast(d38)
    num = F.col("_s") - den
    return agg.select(
        F.col("stratum").alias(strata_col),
        "n_tokens", "n_vocab", "n_hapax", "top_term", "top_count",
        F.expr(_TOPK_MASS_PPM_EXPR).alias("topk_mass_ppm"),
        (2 * num * F.lit(1_000_000).cast(d38) + den).alias("_gnum"),
        den.alias("_gden"),
    ).select(
        strata_col, "n_tokens", "n_vocab", "n_hapax", "top_term",
        "top_count", "topk_mass_ppm",
        F.expr("CAST(_gnum DIV (2 * _gden) AS BIGINT)").alias("gini_ppm"),
    )
