"""Outlink extraction from raw page HTML — the link-graph ingestion path
when all you have is the crawl itself (the WAT route, `spark/warc.py::
read_wat_metadata`, covers the case where Common Crawl already extracted
the links for you; this covers everything else).  Output feeds the same
consumers as the WAT tier: `pagerank_links` centrality, host-level link
stats, crawl frontier construction.

Reference tie-in: the anchors are walked with the engine's own DOM
(`readability_spark/dom.py`, the html5ever-parity parser the extraction
pipeline runs on), and URL resolution follows `urifix.py`'s public
mozilla `fixRelativeUris` rules (<base href> honored, in-page #fragment
links kept relative when no <base> redefines the base).

Scale: one vectorized mapInPandas pass — the same batch shape as
`extract_articles` — emitting one row per anchor; no shuffle, no join;
per-row parse failures isolate to zero emitted links for that page (the
extraction pass's failure-isolation discipline).
"""

from __future__ import annotations

from typing import Iterator
from urllib.parse import urljoin

import pandas as pd

from .. import dom
from ..urifix import _base_uri

OUTLINKS_SCHEMA = (
    "url string, link_no int, href string, target string, anchor_text string"
)


def _page_links(url: str, html) -> list:
    if html is None:
        return []
    try:
        raw = bytes(html).decode("utf-8")
    except (UnicodeDecodeError, TypeError):
        return []
    try:
        doc = dom.parse_document(raw)
    except Exception:
        return []
    base = _base_uri(doc, url)
    rows = []
    link_no = 0
    for node in dom.select(doc, "a"):
        href = node.attr("href")
        if href is None or not href.strip():
            continue
        href = href.strip()
        if base == url and href.startswith("#"):
            target = href  # in-page link stays relative (urifix rule)
        else:
            try:
                target = urljoin(base, href)
            except ValueError:
                target = href
        rows.append((url, link_no, href, target, node.text().strip()))
        link_no += 1
    return rows


def page_outlinks(pages, url_col="url", html_col="html"):
    """pages(url, html, ...) -> one row per <a href>, document order:
    (url, link_no, href, target, anchor_text)."""
    cols = pages.select(url_col, html_col)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, html in zip(pdf[url_col], pdf[html_col]):
                rows.extend(_page_links(url, html))
            yield pd.DataFrame(
                rows, columns=["url", "link_no", "href", "target", "anchor_text"]
            )

    return cols.mapInPandas(extract, schema=OUTLINKS_SCHEMA)


SEO_META_SCHEMA = "url string, canonical string, noindex boolean"


def _page_seo_meta(url: str, html):
    if html is None:
        return (url, None, False)
    try:
        raw = bytes(html).decode("utf-8")
    except (UnicodeDecodeError, TypeError):
        return (url, None, False)
    try:
        doc = dom.parse_document(raw)
    except Exception:
        return (url, None, False)
    base = _base_uri(doc, url)
    canonical = None
    for node in dom.select(doc, "link"):
        rel = node.attr("rel")
        href = node.attr("href")
        if rel is None or href is None or not href.strip():
            continue
        # rel is a space-separated token list, matched case-insensitively
        # (html5 link-type rules); FIRST canonical in tree order wins —
        # the Google-documented behavior for conflicting declarations
        if "canonical" in rel.strip().lower().split():
            try:
                canonical = urljoin(base, href.strip())
            except ValueError:
                canonical = href.strip()
            break
    noindex = False
    for node in dom.select(doc, "meta"):
        name = node.attr("name")
        content = node.attr("content")
        if name is None or content is None:
            continue
        if name.strip().lower() == "robots":
            # comma-separated directive tokens — 'noindex' must be a
            # whole token ('noindexing' or substring hits must not count)
            tokens = [t.strip().lower() for t in content.split(",")]
            if "noindex" in tokens:
                noindex = True
                break
    return (url, canonical, noindex)


def page_seo_meta(pages, url_col="url", html_col="html"):
    """pages(url, html, ...) -> (url, canonical, noindex): the two SEO
    dedup/curation signals a crawl pipeline reads per page — the page's
    declared canonical URL (<link rel=canonical>, first in tree order,
    href resolved like outlinks: <base href> honored) and whether robots
    directives forbid indexing.  Same vectorized mapInPandas batch shape
    and failure isolation as `page_outlinks` (undecodable pages emit
    null canonical / noindex=false rather than failing the task)."""
    cols = pages.select(url_col, html_col)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                _page_seo_meta(url, html)
                for url, html in zip(pdf[url_col], pdf[html_col])
            ]
            yield pd.DataFrame(rows, columns=["url", "canonical", "noindex"])

    return cols.mapInPandas(extract, schema=SEO_META_SCHEMA)
