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
