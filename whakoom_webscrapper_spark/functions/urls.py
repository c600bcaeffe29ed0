"""URL canonicalization + 64-bit fingerprinting — pure built-in expressions.

The reference relies on Scrapy's request fingerprinter v2.7 for URL identity
(reference: settings.py:139) and on ``urlparse(url).path.split("/")[1]`` for
profile extraction (reference: spiders/lists.py:35-36). Both are re-expressed
here as Catalyst column expressions — no Python UDF, so the whole pipeline
stays inside whole-stage codegen and the fingerprint is computable at
10^10-URL scale at scan speed.

Canonicalization rules (superset of Scrapy's w3lib canonicalize_url):
  1. scheme and host lowercased
  2. default ports stripped (http:80, https:443)
  3. fragment dropped
  4. query parameters sorted bytewise (``a=1&b=2`` == ``b=2&a=1``)
  5. empty path normalized to ``/``
  6. trailing ``/`` stripped from non-root paths

The 64-bit fingerprint is ``xxhash64(canonical_url)`` — Spark's built-in
(U2 in SURVEY.md §2.9); collision odds at 10^10 keys ~ 2.7e-3 across the
whole corpus, and the exact anti-join downstream makes even those harmless.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# regexp with groups: 1=scheme 2=host[:port] 3=path 4=?query 5=#fragment
_URL_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$"


def _authority_canonical(auth: Column, scheme: Column) -> Column:
    """Lowercase host, strip default port for the scheme."""
    lowered = F.lower(auth)
    return (
        F.when(
            (scheme == "http") & lowered.endswith(":80"),
            F.substring(lowered, 1, F.length(lowered) - 3),
        )
        .when(
            (scheme == "https") & lowered.endswith(":443"),
            F.substring(lowered, 1, F.length(lowered) - 4),
        )
        .otherwise(lowered)
    )


def canonicalize_url(url: Column) -> Column:
    """Canonical form of ``url`` as a single column expression."""
    scheme = F.lower(F.regexp_extract(url, _URL_RE, 1))
    auth = _authority_canonical(F.regexp_extract(url, _URL_RE, 2), scheme)
    raw_path = F.regexp_extract(url, _URL_RE, 3)
    path = F.when(raw_path == "", F.lit("/")).otherwise(
        # strip trailing slash on non-root paths
        F.when(
            (F.length(raw_path) > 1) & raw_path.endswith("/"),
            F.substring(raw_path, 1, F.length(raw_path) - 1),
        ).otherwise(raw_path)
    )
    raw_query = F.regexp_extract(url, _URL_RE, 4)  # includes leading '?'
    sorted_query = F.when(
        F.length(raw_query) > 1,
        F.concat(
            F.lit("?"),
            F.array_join(
                F.array_sort(F.split(F.substring(raw_query, 2, 1 << 20), "&")),
                "&",
            ),
        ),
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), auth, path, sorted_query)


def url_hash(url: Column, *, canonical: bool = True) -> Column:
    """64-bit URL fingerprint (Scrapy dupefilter analog, settings.py:139)."""
    c = canonicalize_url(url) if canonical else url
    return F.xxhash64(c)


def url_host(url: Column) -> Column:
    """Host (lowercased, port stripped) — politeness is keyed on this."""
    return F.lower(
        F.substring_index(F.regexp_extract(url, _URL_RE, 2), ":", 1)
    )


def url_path_segment(url: Column, index: int = 1) -> Column:
    """N-th path segment — analog of ``urlparse(url).path.split('/')[1]``
    (reference: spiders/lists.py:35-36). index=1 is the first segment."""
    path = F.regexp_extract(url, _URL_RE, 3)
    # split('/a/b', '/') = ['', 'a', 'b'] → 0-based position `index` is the
    # N-th segment; F.get returns NULL out-of-bounds (ANSI-safe, unlike
    # element_at which throws under Spark 4's default ANSI mode)
    return F.get(F.split(path, "/"), index)


def host_bucket(host: Column, num_buckets: int = 256) -> Column:
    """Salted host bucket — bounds per-partition host skew (the hot-host
    skew key called out in SURVEY.md §4 / BASELINE.json:14)."""
    return F.pmod(F.xxhash64(host), F.lit(num_buckets)).cast("int")


def host_suffixes(host: Column) -> Column:
    """Every dot-suffix of a hostname: ``a.b.c`` → ``[a.b.c, b.c, c]``.

    The blocklist primitive: "domain d is blocked" means "d is a dot-suffix
    of the host", so membership tests become set operations on this array
    instead of per-entry LIKE scans. Pure Catalyst HOF (sequence +
    array_join over the split labels) — stays in whole-stage codegen."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(labels, i, n - i + 1), "."),
    )


def host_blocked(host: Column, domains: list[str]) -> Column:
    """True when any dot-suffix of ``host`` is in ``domains`` (standard
    registrable-domain blocklist semantics: blocking ``bad.com`` blocks
    ``img.bad.com``). For list sizes that fit in a plan literal (typical
    curated blocklists: 10^3-10^5 entries) this is zero-join, zero-shuffle
    scan-speed work; for larger lists use
    :func:`whakoom_webscrapper_spark.operators.politeness.apply_blocklist`,
    the broadcast-join form."""
    arr = F.array(*[F.lit(d) for d in domains])
    return F.arrays_overlap(host_suffixes(host), arr)
