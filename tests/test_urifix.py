"""Unit tests for the opt-in fixRelativeUris pass (urifix.py; public
mozilla Readability.js _fixRelativeUris semantics)."""

from __future__ import annotations

from readability_spark import dom
from readability_spark.options import Options
from readability_spark.pipeline import extract
from readability_spark.urifix import fix_relative_uris

BASE = "https://example.com/articles/page.html"


def _fixed(html, uri=BASE):
    doc = dom.parse_document(html)
    fix_relative_uris(doc, uri)
    return dom.serialize(doc)


def test_relative_href_resolved():
    out = _fixed('<a href="/home">x</a>')
    assert 'href="https://example.com/home"' in out


def test_relative_path_resolved_against_page_dir():
    out = _fixed('<a href="other.html">x</a>')
    assert 'href="https://example.com/articles/other.html"' in out


def test_absolute_href_untouched():
    out = _fixed('<a href="https://other.org/a">x</a>')
    assert 'href="https://other.org/a"' in out


def test_hash_link_stays_relative_without_base():
    out = _fixed('<a href="#section-2">x</a>')
    assert 'href="#section-2"' in out


def test_hash_link_resolved_when_base_differs():
    out = _fixed('<head><base href="https://cdn.example.com/"></head><a href="#s">x</a>')
    assert 'href="https://cdn.example.com/#s"' in out


def test_base_element_changes_resolution():
    out = _fixed('<head><base href="https://cdn.example.com/static/"></head><a href="a.png">x</a>')
    assert 'href="https://cdn.example.com/static/a.png"' in out


def test_javascript_link_single_text_child_unwrapped():
    out = _fixed('<p>see <a href="javascript:void(0)">here</a> now</p>')
    assert "<a" not in out
    assert "see here now" in out


def test_javascript_link_with_markup_becomes_span():
    out = _fixed('<p><a href="javascript:go()"><b>go</b> now</a></p>')
    assert "<a" not in out
    assert "<span><b>go</b> now</span>" in out


def test_img_src_and_srcset_resolved():
    out = _fixed('<img src="/i.png" srcset="/i-1x.png 1x, /i-2x.png 2x">')
    assert 'src="https://example.com/i.png"' in out
    assert (
        'srcset="https://example.com/i-1x.png 1x, https://example.com/i-2x.png 2x"' in out
    )


def test_video_poster_and_source_resolved():
    out = _fixed('<video poster="p.jpg"><source src="v.mp4"></video>')
    assert 'poster="https://example.com/articles/p.jpg"' in out
    assert 'src="https://example.com/articles/v.mp4"' in out


def test_extract_opt_in_only():
    html = '<body><p>text here</p><a href="/x">l</a></body>'
    # default: base_url accepted but unused (reference parity)
    art = extract(html, base_url=BASE)
    assert 'href="/x"' in art.content
    # opted in: resolved
    art = extract(html, base_url=BASE, options=Options(fix_relative_uris=True))
    assert 'href="https://example.com/x"' in art.content
    # opted in but no base_url: unchanged
    art = extract(html, options=Options(fix_relative_uris=True))
    assert 'href="/x"' in art.content


def test_protocol_relative_and_query_links():
    out = _fixed('<a href="//cdn.org/lib.js">x</a><a href="?page=2">y</a>')
    assert 'href="https://cdn.org/lib.js"' in out
    assert 'href="https://example.com/articles/page.html?page=2"' in out
