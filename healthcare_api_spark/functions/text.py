"""Text primitives shared by the dedup / text-analysis operators
(SURVEY.md §2.10).

Everything is a JVM-side Column expression. Hashing uses ``md5`` (not
``xxhash64``) deliberately: md5 hex strings are reproducible across
engines, which lets every dedup operator be verified against an external
SQL oracle bit-for-bit. Lexicographic min over md5 hex is a valid minhash
permutation (uniform over the 128-bit space); seeding with a prefix gives
independent permutations.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_text(c: Column) -> Column:
    """Lowercase + collapse runs of whitespace + trim."""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokens(c: Column) -> Column:
    """Whitespace tokenization of normalized text → array<string>."""
    return F.split(normalize_text(c), " ")


def token_count(c: Column) -> Column:
    return F.size(tokens(c))


def word_shingles(c: Column, n: int = 3) -> Column:
    """Word n-gram shingles → array<string> (may contain duplicates).

    Implemented as ONE lookahead regex over the normalized text —
    overlapping n-word windows extracted by ``(?=(...))`` — which stays
    fully inside whole-stage codegen (~4x faster than the equivalent
    sequence/transform lambda, which is interpreted per element).
    Documents with fewer than n tokens yield one shingle: the whole
    normalized text. Narrow (no explode, no shuffle).
    """
    s = normalize_text(c)
    # lookahead captures the n-token window; the consumed `\S+ ?` advances
    # the engine one whole token per match (a bare lookahead would be
    # zero-width and also match at every character inside tokens). The
    # optional trailing space matters only for n=1, where the last token
    # has none.
    pattern = r"(?=((?:\S+ ){" + str(n - 1) + r"}\S+))\S+ ?"
    full = F.regexp_extract_all(s, F.lit(pattern), 1)
    # fallback parity with the token-array formulation: null text behaves
    # like empty text (one '' shingle)
    return F.when(F.size(full) > 0, full).otherwise(F.array(F.coalesce(s, F.lit(""))))


def char_ngrams(c: Column, n: int = 5) -> Column:
    """Character n-grams of normalized text → array<string>."""
    s = normalize_text(c)
    idx = F.sequence(F.lit(1), F.greatest(F.length(s) - n + 1, F.lit(1)))
    return F.transform(idx, lambda i: s.substr(i, F.lit(n)))


def seeded_hash(c: Column, seed: int) -> Column:
    """One member of a family of independent hash permutations."""
    return F.md5(F.concat(F.lit(f"s{seed}:"), c))


def fingerprint(c: Column) -> Column:
    """Document fingerprint: md5 of normalized text (SURVEY.md §2.10)."""
    return F.md5(normalize_text(c))


# accent-folding map (kept FROM/TO aligned; both engines' `translate`
# is 1:1 char-positional, so the pair must stay in lockstep)
ACCENT_FROM = "àáâãäåāçćèéêëēìíîïīñòóôõöōùúûüūýÿžšÀÁÂÃÄÅĀÇĆÈÉÊËĒÌÍÎÏĪÑÒÓÔÕÖŌÙÚÛÜŪÝŽŠ"
ACCENT_TO = "aaaaaaacceeeeeiiiiinoooooouuuuuyyzsAAAAAAACCEEEEEIIIIINOOOOOOUUUUUYZS"
assert len(ACCENT_FROM) == len(ACCENT_TO)


def fold_accents(c: Column) -> Column:
    """Latin accent folding (café → cafe) — the normalize-before-dedup
    step that keeps 'naïve'/'naive' variants from defeating exact and
    shingle dedup. Pure `translate` (narrow, codegen, engine-portable:
    the identical call runs in any SQL engine for oracle parity). For
    full Unicode NFKD folding bring ICU at the edge; this map covers
    the Latin-1/Latin-A accents that dominate European corpora."""
    return F.translate(c, ACCENT_FROM, ACCENT_TO)


def fold_accents_sql(expr: str) -> str:
    """The identical fold as portable SQL for the correctness oracle."""
    return f"translate({expr}, '{ACCENT_FROM}', '{ACCENT_TO}')"
