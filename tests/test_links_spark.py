"""Unit tests for outlink extraction (`spark/links.py`): <base href>
resolution, the in-page-fragment rule, anchors without hrefs, document
order, and failure isolation for undecodable pages.  The DuckDB oracle
gate pins the closed-form enumeration over the junk-page corpus; these
pin the resolution semantics on hand-built pages."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from readability_spark.spark.links import _page_links, page_outlinks  # noqa: E402
from readability_spark.spark.session import get_spark  # noqa: E402

URL = "https://ex.example.com/articles/doc-1.html"


def test_resolution_and_document_order():
    html = (
        b"<html><body>"
        b'<a href="/home">Home</a>'
        b'<a href="sub/page.html">Rel</a>'
        b'<a href="https://other.example.org/x">Abs</a>'
        b'<a href="#frag">Frag</a>'
        b"<a>no href</a>"
        b'<a href="  ">blank</a>'
        b"</body></html>"
    )
    rows = _page_links(URL, html)
    assert [r[1] for r in rows] == [0, 1, 2, 3]  # link_no in document order
    assert rows[0][3] == "https://ex.example.com/home"
    assert rows[1][3] == "https://ex.example.com/articles/sub/page.html"
    assert rows[2][3] == "https://other.example.org/x"
    assert rows[3][3] == "#frag"  # in-page link stays relative (no <base>)
    assert rows[0][4] == "Home"


def test_base_href_redefines_resolution():
    html = (
        b'<html><head><base href="https://cdn.example.net/root/"></head>'
        b'<body><a href="a.html">A</a><a href="#frag">F</a></body></html>'
    )
    rows = _page_links(URL, html)
    assert rows[0][3] == "https://cdn.example.net/root/a.html"
    # with a <base> redefining the base, fragments resolve absolutely too
    assert rows[1][3] == "https://cdn.example.net/root/#frag"


def test_failure_isolation():
    assert _page_links(URL, None) == []
    assert _page_links(URL, b"\xff\xfe\x00broken") == []


def test_spark_pass_is_map_only_and_matches_local():
    spark = get_spark(
        app_name="links-tests", master="local[4]", shuffle_partitions=4
    )
    try:
        pages = spark.createDataFrame(
            [
                (URL, b'<html><body><a href="/a">A</a><a href="/b">B</a></body></html>'),
                ("https://h.example.com/p.html", b"\xff\xfe"),
            ],
            "url string, html binary",
        )
        rows = sorted(
            (r.url, r.link_no, r.target) for r in page_outlinks(pages).collect()
        )
        assert rows == [
            (URL, 0, "https://ex.example.com/a"),
            (URL, 1, "https://ex.example.com/b"),
        ]
    finally:
        spark.stop()
