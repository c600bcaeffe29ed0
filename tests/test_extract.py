"""HTML selector extraction tests (P4-P7/U3 — reference lists.py:39-47,
publications.py:96-102)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from whakoom_webscrapper_spark import datagen
from whakoom_webscrapper_spark.operators import extract as X


def test_cardinality_filter_excludes_single_anchor_groups():
    html = (
        "<html><body>"
        '<div><h3>One</h3><a href="https://x.test/a">only</a></div>'
        '<div><h3>Two</h3><a href="#n">nav</a><a href="https://x.test/b"> B </a></div>'
        "</body></html>"
    )
    assert X.list_links(html) == [("B", "https://x.test/b")]


def test_string_of_spans_nested_markup_and_strips():
    html = (
        '<div><h3>G</h3><a href="#n">n</a>'
        '<a href="https://x.test/c">  <b>Bold</b> and <i>ital</i>  </a></div>'
    )
    assert X.list_links(html) == [("Bold and ital", "https://x.test/c")]


def test_tolerates_misnesting_and_void_elements():
    html = (
        "<div><h3>G</h3><br><img src=x>"
        '<a href="#n">n</a><a href="https://x.test/d">D</a>'
        "</div></p></div>"  # stray close tags must not break the walk
    )
    assert X.list_links(html) == [("D", "https://x.test/d")]


def test_flat_titles_requires_title_class():
    html = (
        '<span class="title"><a href="https://x.test/f">F</a></span>'
        '<span class="other"><a href="https://x.test/g">G</a></span>'
        '<span class="big title"><a href="https://x.test/h">H</a></span>'
    )
    assert X.flat_titles(html) == [("F", "https://x.test/f"), ("H", "https://x.test/h")]


def test_empty_and_none_inputs():
    assert X.list_links("") == []
    assert X.flat_titles("no markup at all") == []


def test_extraction_matches_out_links_ground_truth():
    """The rendered page's structural extraction must reproduce the
    pre-structured out_links column exactly — including EXCLUDING the
    single-anchor decoy group (which points at a page NOT in out_links)."""
    n_urls, n_hosts, fanout = 500, 16, 6
    pdf = datagen.gen_linkgraph_batch(
        np.arange(0, 60), n_urls, n_hosts, fanout
    )
    for _, row in pdf.iterrows():
        hrefs = [h for _, h in X.list_links(row["html"])]
        assert hrefs == list(row["out_links"])
        # decoy really is a live-looking URL outside out_links for most rows
    # at least one decoy must differ from every out_link (guards the guard)
    diffs = 0
    for _, row in pdf.iterrows():
        i = int(row["url"].rsplit("/", 1)[1])
        decoy = datagen.url_of((i * 7 + 3) % n_urls, n_hosts)
        diffs += decoy not in set(row["out_links"])
    assert diffs > 0


def test_extracted_hrefs_column(spark):
    n_urls, n_hosts, fanout = 200, 8, 4
    df = datagen.gen_linkgraph(spark, n_urls, n_hosts, fanout, partitions=4)
    out = df.select(
        "out_links", X.extracted_hrefs(F.col("html")).alias("hrefs")
    ).collect()
    assert len(out) == n_urls
    for r in out:
        assert list(r["hrefs"]) == list(r["out_links"])


def test_extract_list_links_titles_trimmed(spark):
    df = datagen.gen_linkgraph(spark, 50, 4, 3, partitions=2)
    rows = (
        df.select(F.explode(X.extract_list_links(F.col("html"))).alias("l"))
        .select("l.title")
        .collect()
    )
    assert rows
    for r in rows:
        assert r["title"] == r["title"].strip() and r["title"]
