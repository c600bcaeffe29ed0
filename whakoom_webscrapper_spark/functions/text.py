"""Text-analysis column functions for training-data pipelines.

The reference's only text processing is ``.strip()`` on extracted titles
(reference: spiders/lists.py:46) and caption storage; at 100 TB a crawl
corpus needs language ID, quality scoring, token counting and
fingerprinting before it is usable as training data. All functions here are
pure Catalyst expressions (whole-stage codegen; zero Python in the hot
path), designed so a DuckDB oracle can express the same arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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
    marker fires. Deterministic tie-break: language order en,es,fr,de.

    Single-reference expression shape (optimization round 6): the old
    form referenced each per-language hit count up to 7 times (greatest +
    two uses per CASE arm), so every consumer of this column — and every
    copy the optimizer makes when it pushes a filter through the
    projection — multiplied the regexp work (measured: the
    stratified_sample_docs plan carried 84 regexp_extract_all trees in
    its pushed-down Filter alone). This build makes ONE combined
    extraction pass and packs (count, tie-bonus) into a single integer
    the decode array indexes, so the expensive regexp subtree appears
    exactly once in the whole expression:

    - one ``regexp_extract_all`` over the union alternation of all
      marker words. Every match is a maximal word-char run equal to one
      marker (the ``\\b`` anchors force full-run matches and the marker
      lists are pairwise disjoint), so classifying matches by membership
      reproduces the per-language counts of the four separate scans
      bit-for-bit;
    - one ``aggregate`` over the matches accumulates the four counts and
      finishes with ``greatest(h_lg * B + bonus_lg, UND_BONUS)`` where
      B > max bonus: max count wins, ties resolve to the earlier
      language (higher bonus), all-zero resolves to the 'und' constant;
    - ``m % B`` recovers the winning bonus, which indexes a literal
      decode array.
    """
    langs = list(LANG_MARKERS)  # en, es, fr, de — tie order
    all_words = [w for ws in LANG_MARKERS.values() for w in ws]
    pattern = r"\b(" + "|".join(all_words) + r")\b"
    matches = F.regexp_extract_all(F.lower(text), F.lit(pattern), F.lit(1))
    # bonuses: en=5, es=4, fr=3, de=2; 'und' packs as count 0, bonus 6
    base = len(langs) + 3  # 7: > every bonus, so m % base == bonus
    bonus = {lg: len(langs) + 1 - i for i, lg in enumerate(langs)}
    und_bonus = len(langs) + 2  # 6
    counts = F.aggregate(
        matches,
        F.struct(*[F.lit(0).alias(f"h_{lg}") for lg in langs]),
        lambda acc, x: F.struct(
            *[
                (
                    acc[f"h_{lg}"]
                    + F.when(x.isin(*LANG_MARKERS[lg]), F.lit(1)).otherwise(
                        F.lit(0)
                    )
                ).alias(f"h_{lg}")
                for lg in langs
            ]
        ),
        lambda acc: F.greatest(
            *[acc[f"h_{lg}"] * base + bonus[lg] for lg in langs],
            F.lit(und_bonus),
        ),
    )
    # decode array indexed by bonus (1-based element_at): de,fr,es,en,und
    decode = F.array(
        F.lit("?"),  # bonus 1 unused
        *[F.lit(lg) for lg in reversed(langs)],
        F.lit("und"),
    )
    return F.coalesce(
        F.element_at(decode, (counts % base).cast("int")), F.lit("und")
    )


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


def word_tokens(text: Column) -> Column:
    """Whitespace tokens of lowercased, trimmed text — the shared
    tokenization under :func:`word_shingles` (splitting on whitespace
    RUNS is token-for-token identical to normalizing runs to one space
    and splitting on space; empty text yields the single empty token
    both ways)."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def shingles_of_tokens(w: Column, k: int) -> Column:
    """k-word shingles from a MATERIALIZED token-array column.

    Same output as :func:`word_shingles` (space-joined k-grams; short
    docs collapse to one whole-doc shingle), but built from a column
    reference instead of inlining the tokenizer: a Column-only
    ``word_shingles(text, k)`` embeds ``split(lower(trim(text)))`` at
    every ``slice``/``size`` site, so the Generate/Project that consumes
    it re-tokenizes the document once per array element — O(n²) regex
    work per doc (measured round 6: the dominant cost of every shingle
    query). Callers must project the token array first (e.g. via
    ``word_tokens``) so it is evaluated once per row; referencing the
    alias more than once also keeps CollapseProject from inlining it
    back."""
    n = F.size(w)
    return F.when(n < k, F.array(F.array_join(w, " "))).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - F.lit(k - 1)),
            lambda i: F.array_join(F.slice(w, i, k), " "),
        )
    )


def distinct_shingle_rows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    out_col: str = "shingle",
) -> DataFrame:
    """(id, shingle) rows of each document's DISTINCT k-word shingles,
    tokenizing each document exactly once (see
    :func:`shingles_of_tokens`). Drop-in for the
    ``explode(array_distinct(word_shingles(...)))`` shape the
    count-based dedup/contamination queries use — identical shingle
    strings, one regex pass per document instead of one per element."""
    w = df.select(F.col(id_col), word_tokens(F.col(text_col)).alias("_w"))
    return w.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(shingles_of_tokens(F.col("_w"), k))
        ).alias(out_col),
    )


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
