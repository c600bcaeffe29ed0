"""URL canonicalization property tests (SURVEY.md §5.1-5.2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from whakoom_webscrapper_spark.functions import urls as U

CASES = [
    ("HTTP://Example.COM:80/A/b/?b=2&a=1#frag", "http://example.com/A/b?a=1&b=2"),
    ("https://Example.com:443/", "https://example.com/"),
    ("http://example.com", "http://example.com/"),
    ("https://example.com:8443/p?q=1", "https://example.com:8443/p?q=1"),
    ("http://example.com/x/", "http://example.com/x"),
    ("http://example.com/x?z=9&a=1&m=5", "http://example.com/x?a=1&m=5&z=9"),
]


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    return [
        r[0] for r in df.select(U.canonicalize_url(F.col("url"))).collect()
    ]


def test_canonicalization_cases(spark):
    got = _canon(spark, [c[0] for c in CASES])
    assert got == [c[1] for c in CASES]


def test_canonicalization_idempotent(spark):
    once = _canon(spark, [c[0] for c in CASES])
    twice = _canon(spark, once)
    assert once == twice


def test_query_order_invariance(spark):
    a = _canon(spark, ["http://h.com/p?x=1&y=2"])
    b = _canon(spark, ["http://h.com/p?y=2&x=1"])
    assert a == b


def test_hash_equal_for_equivalent_urls(spark):
    df = spark.createDataFrame(
        [("HTTP://H.com/p?a=1&b=2",), ("http://h.com/p?b=2&a=1",)], ["url"]
    )
    hashes = [r[0] for r in df.select(U.url_hash(F.col("url"))).collect()]
    assert hashes[0] == hashes[1]


def test_host_and_bucket(spark):
    df = spark.createDataFrame([("https://Host7.TEST:443/page/1",)], ["url"])
    row = df.select(
        U.url_host(F.col("url")).alias("h"),
        U.host_bucket(U.url_host(F.col("url")), 64).alias("b"),
    ).collect()[0]
    assert row["h"] == "host7.test"
    assert 0 <= row["b"] < 64


def test_path_segment(spark):
    df = spark.createDataFrame([("https://h.test/profile/lists/3",)], ["url"])
    seg = df.select(U.url_path_segment(F.col("url"), 1)).collect()[0][0]
    assert seg == "profile"


# ---------------------------------------------------------------------------
# Domain blocklist (host_suffixes / host_blocked / politeness.apply_blocklist)
# ---------------------------------------------------------------------------


def test_host_suffixes_and_blocked(spark):
    from pyspark.sql import functions as F

    from whakoom_webscrapper_spark.functions import urls as U

    r = spark.range(1).select(
        U.host_suffixes(F.lit("img.cdn.bad.com")).alias("s"),
        U.host_blocked(F.lit("img.cdn.bad.com"), ["bad.com"]).alias("b1"),
        U.host_blocked(F.lit("notbad.com"), ["bad.com"]).alias("b2"),
        U.host_blocked(F.lit("bad.com"), ["bad.com"]).alias("b3"),
        U.host_blocked(F.lit("bad.com.evil"), ["bad.com"]).alias("b4"),
    ).first()
    assert r["s"] == ["img.cdn.bad.com", "cdn.bad.com", "bad.com", "com"]
    assert r["b1"] is True  # subdomain of blocked domain
    assert r["b2"] is False  # suffix-of-string but not dot-suffix
    assert r["b3"] is True  # exact match
    assert r["b4"] is False  # blocked domain as a PREFIX must not match


def test_apply_blocklist_join_form_matches_literal_form(spark):
    from pyspark.sql import functions as F

    from whakoom_webscrapper_spark.functions import urls as U
    from whakoom_webscrapper_spark.operators import politeness as P

    hosts = [
        "a.com", "img.a.com", "b.org", "c.b.org", "clean.net",
        "borg", "a.com.mirror",
    ]
    frontier = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hosts)], "url_id long, host string"
    )
    domains = ["a.com", "b.org"]
    bl = spark.createDataFrame([(d,) for d in domains], "domain string")
    allowed, blocked = P.apply_blocklist(frontier, bl)
    got_blocked = {r["host"] for r in blocked.collect()}
    got_allowed = {r["host"] for r in allowed.collect()}
    lit_blocked = {
        r["host"]
        for r in frontier.filter(
            U.host_blocked(F.col("host"), domains)
        ).collect()
    }
    assert got_blocked == lit_blocked == {"a.com", "img.a.com", "b.org", "c.b.org"}
    assert got_allowed == {"clean.net", "borg", "a.com.mirror"}
    assert got_blocked | got_allowed == set(hosts)
