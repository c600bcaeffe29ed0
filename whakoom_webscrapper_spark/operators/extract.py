"""HTML selector extraction — P4/P5/P6/U3 in SURVEY.md §2.3/§2.9.

The reference's core parse is CSS/XPath over real HTML:

- lists.py:39-47 (structural): select every ``h3``, step to its PARENT
  node, gather all ``a`` descendants of that parent, keep groups with
  MORE THAN ONE anchor (the cardinality predicate P7), then extract the
  SECOND anchor's string() (stripped — P3 trim) and @href.
- publications.py:96-102 (flat): ``//span[@class="title"]/a`` →
  (text(), @href) per anchor.

Here both run as Arrow-batched pandas UDFs over an ``html`` string
column, returning ``array<struct<title,href>>`` — the markup parse is a
genuinely Python-side computation (like image decode), so the UDF is
the honest slow path; everything downstream (explode, trim, id
extraction, dedup) stays in Catalyst.

The parser is a minimal generic DOM built on the stdlib
``html.parser.HTMLParser`` (no external deps in the sandbox): parent
pointers for the XPath ``parent::node()`` step, recursive text for
``string()``, tolerant of unclosed/misnested tags and void elements.

Scale shape: one UDF invocation per Arrow batch; per-page work is
O(len(html)). No shuffle is introduced — extraction is a map. At 100 TB
the parse cost dominates Python-side; batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` so executor memory
stays per-task-bounded.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# elements that never take a closing tag (HTML5 void elements)
_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}

LINKS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("title", T.StringType(), True),
            T.StructField("href", T.StringType(), True),
        ]
    ),
    True,
)


class _Node:
    """``children`` holds str (text nodes) and _Node entries INTERLEAVED
    in document order — string() must respect the order text appears
    between child elements."""

    __slots__ = ("tag", "attrs", "parent", "children")

    def __init__(self, tag: str, attrs: dict, parent: "_Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.parent = parent
        self.children: list[_Node | str] = []


class _TreeBuilder(HTMLParser):
    """Builds a parent-linked DOM; tolerant of misnesting (an unmatched
    close tag pops to the nearest open ancestor, like browsers do)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", {}, None)
        self.cur = self.root

    def handle_starttag(self, tag: str, attrs) -> None:
        node = _Node(tag, dict(attrs), self.cur)
        self.cur.children.append(node)
        if tag not in _VOID:
            self.cur = node

    def handle_startendtag(self, tag: str, attrs) -> None:
        self.cur.children.append(_Node(tag, dict(attrs), self.cur))

    def handle_endtag(self, tag: str) -> None:
        n = self.cur
        while n is not self.root and n.tag != tag:
            n = n.parent
        if n is not self.root:
            self.cur = n.parent

    def handle_data(self, data: str) -> None:
        self.cur.children.append(data)


def parse_html(html: str) -> _Node:
    tb = _TreeBuilder()
    tb.feed(html or "")
    return tb.root


def iter_tags(node: _Node, tag: str):
    """All descendant elements with ``tag``, document order (``.//tag``)."""
    for c in node.children:
        if isinstance(c, str):
            continue
        if c.tag == tag:
            yield c
        yield from iter_tags(c, tag)


def string_of(node: _Node) -> str:
    """XPath ``string()``: all descendant text, document order."""
    return "".join(
        c if isinstance(c, str) else string_of(c) for c in node.children
    )


def own_text_of(node: _Node) -> str | None:
    """XPath ``text()`` + ``.get()``: the element's FIRST direct text node
    (reference publications.py:99 takes it un-stripped)."""
    for c in node.children:
        if isinstance(c, str):
            return c
    return None


# ---------------------------------------------------------------------------
# The two reference extraction semantics, as pure Python over one page
# ---------------------------------------------------------------------------
def list_links(html: str) -> list[tuple[str | None, str | None]]:
    """lists.py:39-47: for each h3 → parent → all .//a; keep groups with
    >1 anchor; emit (string(a[1]).strip(), a[1]@href)."""
    root = parse_html(html)
    out: list[tuple[str | None, str | None]] = []
    for h3 in list(iter_tags(root, "h3")):
        parent = h3.parent or root
        anchors = list(iter_tags(parent, "a"))
        if len(anchors) > 1:
            a = anchors[1]
            out.append((string_of(a).strip(), a.attrs.get("href")))
    return out


def flat_titles(html: str) -> list[tuple[str | None, str | None]]:
    """publications.py:96-102: //span[@class="title"]/a → (text(), @href)."""
    root = parse_html(html)
    out: list[tuple[str | None, str | None]] = []
    for span in iter_tags(root, "span"):
        if "title" in (span.attrs.get("class") or "").split():
            for a in span.children:
                if not isinstance(a, str) and a.tag == "a":
                    out.append((own_text_of(a), a.attrs.get("href")))
    return out


# ---------------------------------------------------------------------------
# Spark column wrappers (Arrow-batched; array<struct<title,href>> out)
# ---------------------------------------------------------------------------
def _rows(pairs: list[tuple[str | None, str | None]]) -> list[dict]:
    return [{"title": t, "href": h} for t, h in pairs]


@F.pandas_udf(LINKS_TYPE)
def extract_list_links(html: pd.Series) -> pd.Series:
    """P4/P5/P7/U3 — the h3-structural extraction as a column."""
    return html.map(lambda h: _rows(list_links(h)) if h is not None else [])


@F.pandas_udf(LINKS_TYPE)
def extract_flat_titles(html: pd.Series) -> pd.Series:
    """P6 — the flat span.title/a extraction as a column."""
    return html.map(lambda h: _rows(flat_titles(h)) if h is not None else [])


def extracted_hrefs(html_col: Column) -> Column:
    """Just the hrefs of the structural extraction (the crawl's
    out-link discovery path)."""
    return F.transform(extract_list_links(html_col), lambda s: s["href"])
