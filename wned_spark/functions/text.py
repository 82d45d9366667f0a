"""Text-analysis functions for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure Catalyst expressions — each returns a Column usable in a
select over a 100 TB documents scan without leaving whole-stage
codegen. DuckDB-oracle-friendly (deterministic, no hashing except the
md5 fingerprint which both engines share).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Minimal stopword profiles for n-gram/stopword-ratio language ID.
_LANG_PROFILES = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "les", "et", "des", "est", "pas", "une", "dans", "que"],
    "es": ["el", "la", "los", "las", "es", "una", "por", "con", "para", "del"],
}


def tokens_of(col: Column) -> Column:
    return F.filter(F.split(F.lower(col), r"[^\p{L}0-9]+"), lambda t: t != "")


def token_count_ws(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.filter(F.split(col, r"\s+"), lambda t: t != ""))


def token_count_bpe_ish(col: Column) -> Column:
    """BPE-ish token estimate: split on whitespace AND
    alpha/digit/punct boundaries (a cheap proxy for subword merges),
    then count. Deterministic, expression-only."""
    pieces = F.split(
        col, r"(?<=[a-zA-Z])(?=[0-9])|(?<=[0-9])(?=[a-zA-Z])|(?=[^\w\s])|(?<=[^\w\s])|\s+"
    )
    return F.size(F.filter(pieces, lambda t: t != ""))


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    toks = tokens_of(col)
    sw = F.array(*[F.lit(w) for w in _LANG_PROFILES[lang]])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(n_sw / F.size(toks))


def detect_language(col: Column) -> Column:
    """Argmax stopword-profile ratio over the built-in language set;
    'und' (undetermined) when no profile scores > 0."""
    scores = [(lang, stopword_ratio(col, lang)) for lang in _LANG_PROFILES]
    best_lang = F.lit("und")
    best_score = F.lit(0.0)
    # fold: deterministic tie-break = first profile in insertion order wins
    for lang, s in scores:
        is_better = s > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, s).otherwise(best_score)
    return best_lang


def quality_features(col: Column) -> dict[str, Column]:
    """Length / punctuation-ratio / stopword-ratio / mean-word-length —
    the standard cheap quality-filter family."""
    toks = tokens_of(col)
    n_chars = F.length(col)
    n_punct = n_chars - F.length(F.regexp_replace(col, r"[^\w\s]", ""))
    mean_wl = F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)) / F.size(toks)
    )
    return {
        "n_chars": n_chars,
        "n_tokens": F.size(toks),
        "punct_ratio": F.when(n_chars == 0, F.lit(0.0)).otherwise(n_punct / n_chars),
        "stopword_ratio": stopword_ratio(col),
        "mean_word_len": mean_wl,
    }


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality score: rewards stopword presence and
    sane word lengths, penalizes punctuation soup and shortness."""
    q = quality_features(col)
    length_ok = F.least(q["n_tokens"] / F.lit(20.0), F.lit(1.0))
    sw_ok = F.least(q["stopword_ratio"] * 4.0, F.lit(1.0))
    punct_ok = F.greatest(F.lit(1.0) - q["punct_ratio"] * 4.0, F.lit(0.0))
    wl_ok = F.when((q["mean_word_len"] >= 3) & (q["mean_word_len"] <= 10), 1.0).otherwise(0.5)
    return (length_ok + sw_ok + punct_ok + wl_ok) / 4.0


def doc_fingerprint(col: Column) -> Column:
    """Content-defined fingerprint: md5 over the sorted distinct token
    set (word-order-insensitive, whitespace/punct-insensitive) — the
    canonical-form rolling-fingerprint idea with an engine-portable
    digest (DuckDB md5 matches bit-for-bit)."""
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(tokens_of(col))))
    return F.md5(canon)
