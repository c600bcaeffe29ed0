"""Text-analysis column functions for training-data pipelines.

The reference's only text processing is ``.strip()`` on extracted titles
(reference: spiders/lists.py:46) and caption storage; at 100 TB a crawl
corpus needs language ID, quality scoring, token counting and
fingerprinting before it is usable as training data. All functions here are
pure Catalyst expressions (whole-stage codegen; zero Python in the hot
path), designed so a DuckDB oracle can express the same arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker lists: common function words that are
# near-unique to each language. Kept short so the heuristic is cheap and
# SQL-portable (the DuckDB oracle repeats the same list).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "that"],
    "es": ["el", "la", "los", "que", "una"],
    "fr": ["le", "les", "des", "est", "dans"],
    "de": ["der", "die", "und", "ist", "nicht"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count. size(split(trim(x))) with empty-string = 0."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: word runs plus individual punctuation marks
    (the boundaries BPE pre-tokenizers split on). Counted as regex matches of
    ``\\w+|[^\\w\\s]`` — RE2-compatible so the DuckDB oracle can repeat it."""
    return F.size(
        F.regexp_extract_all(text, F.lit(r"\w+|[^\w\s]"), F.lit(0))
    )


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are punctuation (quality signal)."""
    n = F.length(text)
    punct = n - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(punct / n.cast("double"))


def uppercase_ratio(text: Column) -> Column:
    n = F.length(text)
    upper = n - F.length(F.regexp_replace(text, r"[A-Z]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(upper / n.cast("double"))


def digit_ratio(text: Column) -> Column:
    n = F.length(text)
    digits = n - F.length(F.regexp_replace(text, r"[0-9]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(digits / n.cast("double"))


def stopword_hits(text: Column, lang: str = "en") -> Column:
    """Count of occurrences of the language's marker words (word-bounded)."""
    words = LANG_MARKERS[lang]
    pattern = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pattern), F.lit(1)))


def lang_id(text: Column) -> Column:
    """Heuristic language ID: argmax of marker-word hit counts, 'und' if no
    marker fires. Deterministic tie-break: language order en,es,fr,de."""
    hits = {lg: stopword_hits(text, lg) for lg in LANG_MARKERS}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    # build reversed so earlier languages win ties via later .when override
    for lg in reversed(list(LANG_MARKERS)):
        expr = F.when((hits[lg] > 0) & (hits[lg] == best), F.lit(lg)).otherwise(expr)
    return expr


def quality_score(text: Column) -> Column:
    """[0,1] heuristic quality score: length band + low punct/digit noise +
    presence of stopwords. A Gopher-rules-style cheap filter."""
    n_tokens = token_count(text).cast("double")
    len_ok = F.when((n_tokens >= 5) & (n_tokens <= 10000), F.lit(1.0)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(text) < 0.3, F.lit(1.0)).otherwise(F.lit(0.0))
    digit_ok = F.when(digit_ratio(text) < 0.3, F.lit(1.0)).otherwise(F.lit(0.0))
    stop_ok = F.when(stopword_hits(text, "en") > 0, F.lit(1.0)).otherwise(F.lit(0.0))
    return (len_ok + punct_ok + digit_ok + stop_ok) / F.lit(4.0)


def doc_fingerprint(text: Column) -> Column:
    """64-bit content fingerprint: xxhash64 of whitespace-normalized,
    lowercased text. The content-dedup analog of the URL fingerprint
    (reference dedup keys: 001_initial_schema.sql:4,19)."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.xxhash64(norm)


def word_shingles(text: Column, k: int = 5) -> Column:
    """Array of k-word shingles (for MinHash / Jaccard dedup). Normalizes
    whitespace + case first so shingles are layout-invariant."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    words = F.split(norm, " ")
    n = F.size(words)
    # slide a k-window: positions 1..n-k+1 (SQL arrays are 1-based)
    return F.when(n < k, F.array(norm)).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - F.lit(k - 1)),
            lambda i: F.array_join(F.slice(words, i, k), " "),
        )
    )
