"""Text-analysis functions for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure Catalyst expressions — each returns a Column usable in a
select over a 100 TB documents scan without leaving whole-stage
codegen. DuckDB-oracle-friendly (deterministic, no hashing except the
md5 fingerprint which both engines share).

r07 KERNEL NOTE (guide §4.1): the counting family used to be built on
``F.filter``/``F.aggregate`` lambdas over the token array — Spark's
higher-order array functions are CodegenFallback (interpreted, boxing
per element), and the token array itself was re-split per feature. The
counts are now single-pass regex kernels over the string (codegen'd):

- #tokens            == regexp_count(lower, '[\\p{L}0-9]+')
  (tokens are exactly the maximal token-char runs the split isolates);
- #stopword tokens   == regexp_count with token-boundary lookarounds
  (a stopword token is a maximal run equal to a profile word);
- Σ token lengths    == length(lower with non-token chars removed)
  (both count the token characters of the SAME lowered string).

Each identity is parity-pinned against the original lambda kernels in
tests/test_functions.py on generated + adversarial corpora, and the
driver-oracled ``text_analysis`` row re-proves the values against
DuckDB. ``tokens_of`` keeps the array form for the fingerprint's
sort/distinct but drops the lambda filter for ``array_remove`` (same
all-empties removal, non-HOF evaluation).
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

_TOKEN_CHARS = r"[\p{L}0-9]"


def tokens_of(col: Column) -> Column:
    return F.array_remove(F.split(F.lower(col), r"[^\p{L}0-9]+"), "")


def n_tokens_of(col: Column) -> Column:
    """size(tokens_of(col)) as one codegen regex pass: the nonempty
    split pieces are exactly the maximal [\\p{L}0-9] runs."""
    return F.regexp_count(F.lower(col), F.lit(_TOKEN_CHARS + "+"))


def _stopword_count(col: Column, words: list[str]) -> Column:
    """#tokens equal to one of ``words``, as one regex pass: a token is
    a maximal token-char run, so boundary lookarounds pin whole-token
    matches (alternation backtracking tries every word per position)."""
    pat = (
        f"(?<!{_TOKEN_CHARS})(?:" + "|".join(words) + f")(?!{_TOKEN_CHARS})"
    )
    return F.regexp_count(F.lower(col), F.lit(pat))


def token_count_ws(col: Column) -> Column:
    """Whitespace token count (maximal non-whitespace runs)."""
    return F.regexp_count(col, F.lit(r"\S+"))


def token_count_bpe_ish(col: Column) -> Column:
    """BPE-ish token estimate: split on whitespace AND
    alpha/digit/punct boundaries (a cheap proxy for subword merges),
    then count. Deterministic, expression-only.

    Computed by the lookaround-free decomposition the DuckDB oracle has
    always used (word runs + letter<->digit transitions + punct chars —
    verified char-for-char against the split-based count in round 6 and
    parity-pinned in tests): 4 simple regex passes in codegen instead
    of one 5-branch lookaround split + interpreted lambda filter."""
    return (
        F.regexp_count(col, F.lit(r"[0-9A-Za-z_]+"))
        + F.regexp_count(col, F.lit(r"[A-Za-z][0-9]"))
        + F.regexp_count(col, F.lit(r"[0-9][A-Za-z]"))
        + F.length(F.regexp_replace(col, r"[0-9A-Za-z_\s]", ""))
    )


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    n_tok = n_tokens_of(col)
    n_sw = _stopword_count(col, _LANG_PROFILES[lang])
    return F.when(n_tok == 0, F.lit(0.0)).otherwise(n_sw / n_tok)


def detect_language(col: Column) -> Column:
    """Argmax stopword-profile ratio over the built-in language set;
    'und' (undetermined) when no profile scores > 0.

    r07: the old sequential fold rebuilt ``best_score`` as a nested
    CASE that embedded every previous profile's score subtree TWICE per
    step — an exponentially duplicated expression tree that codegen CSE
    does not fully collapse (measured ~30 s for the 4-profile fold over
    the sf1.0 documents, vs ~1.6 s for a single profile score). The
    flat form — m = greatest(scores); winner = first profile whose
    score equals m; 'und' when m <= 0 — references each score a bounded
    number of times and is the same argmax with the same
    first-profile-wins tie-break: in the fold a later profile only took
    the crown by STRICTLY exceeding the running max, so the final
    winner is exactly the first profile attaining the overall max, and
    'und' survives iff no score exceeds the 0.0 the fold started
    with."""
    scores = [(lang, stopword_ratio(col, lang)) for lang in _LANG_PROFILES]
    m = F.greatest(*[s for _, s in scores])
    expr = None
    for lang, s in scores:
        expr = (expr.when if expr is not None else F.when)(s == m, F.lit(lang))
    # m > 0 guard (not m <= 0 -> 'und') so a NULL text (null scores,
    # null m) falls through to 'und' exactly like the old fold did
    return F.when(m > 0.0, expr).otherwise(F.lit("und"))


def quality_features(col: Column) -> dict[str, Column]:
    """Length / punctuation-ratio / stopword-ratio / mean-word-length —
    the standard cheap quality-filter family."""
    n_tok = n_tokens_of(col)
    n_chars = F.length(col)
    n_punct = n_chars - F.length(F.regexp_replace(col, r"[^\w\s]", ""))
    # Σ token lengths == #token chars in the lowered string (lower() is
    # applied in both the split and this kernel, so a Unicode lowering
    # that changes the char count changes both sides identically)
    tok_chars = F.length(F.regexp_replace(F.lower(col), r"[^\p{L}0-9]", ""))
    mean_wl = F.when(n_tok == 0, F.lit(0.0)).otherwise(tok_chars / n_tok)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
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
