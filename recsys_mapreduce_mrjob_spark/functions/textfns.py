"""Text-analysis column expressions (SURVEY.md §2.2.K).

Whitespace tokenization matches the testdata's space-separated text
(FIXTURES.md §A).  Everything here is a Catalyst expression — language ID,
quality scoring, token counting and fingerprinting all run JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram-free heuristic
# language ID.  Public-knowledge function words; good enough for a
# deterministic, testable heuristic (real corpora would use fastText etc.).
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "with"),
    "es": ("el", "la", "de", "que", "los", "las", "una", "por"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr": ("le", "la", "les", "des", "est", "une", "dans", "pour"),
    "zh": ("的", "是", "了", "在", "和", "有", "我", "不"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokens, empties dropped (clean split per FIXTURES.md)."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: word chunks + digits + punctuation marks,
    a BPE-flavored regex approximation for budget estimation."""
    return F.size(
        F.filter(
            F.split(text, r"(?<=\W)|(?=\W)"),
            lambda t: F.trim(t) != "",
        )
    )


def lang_score(text: Column, lang: str) -> Column:
    """Fraction of this language's marker words present in the text."""
    toks = tokens(F.lower(text))
    markers = _LANG_MARKERS[lang]
    hits = sum(
        (F.array_contains(toks, m).cast("int") for m in markers),
        F.lit(0),
    )
    return hits / F.lit(len(markers))


def lang_id(text: Column) -> Column:
    """Heuristic language ID: argmax of marker-word hit rate, 'und' if none."""
    scores = F.array(
        *[F.struct(lang_score(text, l).alias("score"), F.lit(l).alias("lang")) for l in _LANG_MARKERS]
    )
    best = F.array_max(scores)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_score(text: Column) -> Column:
    """Composite doc-quality heuristic in [0,1]: mean-word-length band,
    alpha ratio, and repetition penalty (distinct/total token ratio)."""
    toks = tokens(text)
    n = F.size(toks)
    mean_len = F.when(n > 0, F.length(F.concat_ws("", toks)) / n).otherwise(F.lit(0.0))
    len_ok = F.when((mean_len >= 3) & (mean_len <= 10), 1.0).otherwise(0.0)
    alpha_ratio = F.when(
        F.length(text) > 0,
        F.length(F.regexp_replace(text, r"[^A-Za-z ]", "")) / F.length(text),
    ).otherwise(F.lit(0.0))
    distinct_ratio = F.when(n > 0, F.size(F.array_distinct(toks)) / n).otherwise(F.lit(0.0))
    return F.round((len_ok + alpha_ratio + distinct_ratio) / 3.0, 6)


def fingerprint(text: Column) -> Column:
    """Deterministic 64-bit document fingerprint (xxhash64 of normalized
    text) — the rolling-hash analogue for exact-dup detection at scale."""
    return F.xxhash64(F.lower(F.trim(text)))


def shingles(text: Column, k: int = 3) -> Column:
    """k-token shingles (arrays of k-grams) for MinHash / Jaccard."""
    toks = tokens(text)
    n = F.size(toks)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
