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
- ``repetition_stats`` explodes each doc into its word n-grams, then
  aggregates per (doc, gram). The shuffle key is (doc_id, gram) — high
  cardinality, uniformly distributed, no skew — and partial aggregation
  (map-side combine) collapses repeated grams before the exchange, so
  shuffled bytes are bounded by the *distinct* grams per doc, not the raw
  token count. One wide stage per metric family, reused via a persisted
  exploded frame when both metrics are requested.
- ``assign_split`` is embarrassingly parallel (one md5 per row, no
  shuffle): the split decision is a pure function of the id, so any
  executor — or any later rerun over different partitioning — assigns the
  same document to the same split. That idempotence is the whole point:
  train/holdout membership survives recrawls, compaction, and repartition.
- ``cap_per_source`` is one window over (source) — the natural skew risk
  is a mega-source (one domain contributing 10^8 docs). The window only
  materializes rank <= cap per partition after the in-partition sort, and
  cap is small, so the output is bounded; for the sort itself, a skewed
  source lands in one task — acceptable for per-host caps (hosts are
  ~10^6-row scale, not 10^10), and AQE skew-split covers the pathological
  single-host case.
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


def word_ngrams(text: Column, n: int) -> Column:
    """Word n-grams as space-joined strings (pure Catalyst HOF).

    ``transform(sequence(...))`` keeps the whole expression inside
    whole-stage codegen; a DuckDB oracle replays it with
    unnest + lead() windows over word positions.
    """
    w = _words(text)
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

    Shape (deliberate — ONE scan, TWO shuffles, ZERO joins): both gram
    widths explode from a single projection as (n, gram) structs
    (``explode_outer`` so zero-gram docs survive); first groupBy on
    (doc, n_words, n, gram) collapses repeats map-side before the
    exchange (shuffled bytes bounded by distinct grams), second groupBy
    on (doc, n_words) computes both metrics via conditional aggregates —
    n_words rides the keys (it is functionally dependent on the doc id),
    which is what removes the join back to the base table.
    """
    top_col = f"top_{top_n}gram_frac"
    dup_col = f"dup_{dup_n}gram_frac"
    text, n = F.col(text_col), F.col("ng.n")

    def _tagged(width: int) -> Column:
        return F.transform(
            word_ngrams(text, width),
            lambda g: F.struct(F.lit(width).alias("n"), g.alias("g")),
        )

    grams = df.select(
        F.col(id_col),
        F.size(_words(text)).alias("n_words"),
        F.explode_outer(F.concat(_tagged(top_n), _tagged(dup_n))).alias("ng"),
    )
    per_gram = grams.groupBy(id_col, "n_words", n.alias("n"), F.col("ng.g")).agg(
        F.count(F.lit(1)).alias("c")
    )
    c, nn = F.col("c"), F.col("n")
    return (
        per_gram.groupBy(id_col, "n_words")
        .agg(
            F.max(F.when(nn == top_n, c)).alias("_top"),
            F.sum(F.when(nn == top_n, c)).alias("_t_total"),
            F.sum(F.when(nn == dup_n, c)).alias("_d_total"),
            F.count(F.when(nn == dup_n, F.lit(1))).alias("_d_distinct"),
        )
        .select(
            id_col,
            "n_words",
            F.coalesce(
                F.round(F.col("_top") / F.col("_t_total"), 5), F.lit(0.0)
            ).alias(top_col),
            F.coalesce(
                F.round(
                    (F.col("_d_total") - F.col("_d_distinct")) / F.col("_d_total"), 5
                ),
                F.lit(0.0),
            ).alias(dup_col),
        )
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
    b = md5_bucket(F.col(id_col), 65536)
    thresh: Column = F.lit(int(round(default_rate * 65536)))
    for stratum, rate in rates.items():
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {stratum!r} must be in [0,1], got {rate}")
        thresh = F.when(
            F.col(strata_col) == stratum, F.lit(int(round(rate * 65536)))
        ).otherwise(thresh)
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
) -> DataFrame:
    """Keep at most ``cap`` rows per source, best-first, with a total-order
    tie-break on the id so the kept set is deterministic. ``order`` defaults
    to longest-text-first. Appends ``src_rank`` (1-based kept position)."""
    if order is None:
        order = [F.length(F.col("text")).desc()]
    w = Window.partitionBy(source_col).orderBy(*order, F.col(id_col))
    return (
        df.withColumn("src_rank", F.row_number().over(w))
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
