"""Canonical-link / robots-noindex lane: direct parser unit tests for
spark/links.py::page_seo_meta (every branch: first-wins, case-insensitive
rel tokens, relative resolution under <base>, whole-token robots match,
failure isolation) plus a closed-form replay of canonical_link_dedup."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import pyspark.sql.functions as F  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from readability_spark.spark.links import _page_seo_meta  # noqa: E402
from readability_spark.spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    spark = get_spark(
        app_name="canonical-tests", master="local[8]", shuffle_partitions=8
    )
    yield spark
    spark.stop()


URL = "https://a.example.com/articles/x.html?utm_source=feed"


def _meta(html):
    return _page_seo_meta(URL, html.encode("utf-8"))


class TestPageSeoMeta:
    def test_absolute_canonical(self):
        h = '<html><head><link rel="canonical" href="https://c.example.com/s/1"/></head><body></body></html>'
        assert _meta(h) == (URL, "https://c.example.com/s/1", False)

    def test_first_canonical_wins(self):
        h = (
            '<html><head><link rel="canonical" href="https://c.example.com/first"/>'
            '<link rel="canonical" href="https://evil.example.com/second"/>'
            "</head><body></body></html>"
        )
        assert _meta(h)[1] == "https://c.example.com/first"

    def test_rel_is_case_insensitive_token_list(self):
        h = '<html><head><link rel="alternate Canonical" href="/s/2"/></head><body></body></html>'
        assert _meta(h)[1] == "https://a.example.com/s/2"
        # substring of a token must NOT match
        h2 = '<html><head><link rel="canonicalish" href="/s/3"/></head><body></body></html>'
        assert _meta(h2)[1] is None

    def test_relative_resolution_honors_base(self):
        h = (
            '<html><head><base href="https://b.example.com/dir/"/>'
            '<link rel="canonical" href="story"/></head><body></body></html>'
        )
        assert _meta(h)[1] == "https://b.example.com/dir/story"

    def test_stylesheet_and_missing_href_ignored(self):
        h = (
            '<html><head><link rel="stylesheet" href="/site.css"/>'
            '<link rel="canonical"/></head><body></body></html>'
        )
        assert _meta(h)[1] is None

    def test_robots_whole_token_match(self):
        assert _meta(
            '<html><head><meta name="robots" content="noindex, follow"/></head><body></body></html>'
        )[2] is True
        assert _meta(
            '<html><head><meta name="ROBOTS" content=" NOINDEX "/></head><body></body></html>'
        )[2] is True
        assert _meta(
            '<html><head><meta name="robots" content="index, follow"/></head><body></body></html>'
        )[2] is False
        # substring of a directive token must not count
        assert _meta(
            '<html><head><meta name="robots" content="noindexing"/></head><body></body></html>'
        )[2] is False

    def test_failure_isolation(self):
        assert _page_seo_meta(URL, None) == (URL, None, False)
        assert _page_seo_meta(URL, b"\xff\xfe\x00bad") == (URL, None, False)


def test_canonical_dedup_replay(spark):
    """Replay the whole lane closed-form from the documents table."""
    docs = [
        (r.doc_id, r.source)
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "source")
        .collect()
    ]
    groups = {}
    for doc_id, source in docs:
        dom_ = "hot" if doc_id % 10 < 4 else source
        url = (
            f"https://{dom_}.example.com/articles/doc-{doc_id:06d}.html"
            + ("?utm_source=feed" if doc_id % 5 in (1, 2, 3) else "")
        )
        gid = doc_id // 5
        if doc_id % 5 in (1, 2):
            canonical = f"https://canonical.example.com/story/{gid}"
        elif doc_id % 5 == 3:
            canonical = f"https://{dom_}.example.com/story/{gid}"
        else:
            canonical = None
        if doc_id % 7 == 3:
            continue  # noindex dropped
        key = canonical or url
        g = groups.setdefault(key, {"urls": [], "declared": 0})
        g["urls"].append(url)
        g["declared"] += int(canonical is not None)
    got = {
        r.canon_key: (r.kept_url, r.n_pages, r.n_declared)
        for r in entry.canonical_link_dedup(spark, SF_DIR).collect()
    }
    want = {
        k: (min(g["urls"]), len(g["urls"]), g["declared"])
        for k, g in groups.items()
    }
    assert got == want
    # the lane is non-degenerate on this corpus: some group really merges
    # two tracked variants under one declared canonical
    assert any(n > 1 and d == n for (_u, n, d) in got.values())
