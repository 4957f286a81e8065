"""Differential test: fast single-pass tokenizer vs the stdlib path.

``dom.fast_feed`` must produce the exact same tree (serialized bytes) as
``HTMLParser.feed()+close()`` for every input — the stdlib tokenizer's
tolerant-parsing behavior is part of the engine's pinned semantics
(SURVEY.md §7.4).  Runs the full fixture corpus, a table of handwritten
edge cases, and a hypothesis fuzz over HTML-ish fragments through both
tokenizers and compares serialized output and error behavior.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from readability_spark import dom
from readability_spark.fixtures import build_rows

EDGE_CASES = [
    "",
    "<p>plain",
    "<SCRIPT>var a = '<b>' && 1;</script>after",
    "<script>unterminated",
    "<style>p{}</STYLE >x",
    "<p>&amp; &lt;&#65;&#x42; &notareal; &amp",
    "<!DOCTYPE html><!-- c --><p>x<!-- unterminated",
    "<?php echo '>' ?><p>a</p>",
    "<![CDATA[raw]]><p>t",
    "<p class=a id='b' data-x=\"y\">t</p>",
    "<img src=a.png/><br/>",
    "<a href='x'>t</a><\x01bad><1tag>",
    "lone < here",
    "trail <",
    "<p",
    "<p attr",
    "<p attr='v",
    "</",
    "</>",
    "</ p>x",
    "</3>x",
    "<div/ >x",
    "<em / >y",
    "<td>foster<table><td>a</td></table>",
    "<title>A &amp; B</title><body>c",
    "<noscript><img src='x.png'></noscript>",
    "<p>a</p \n>b",
    "<b\x00c>d",
    "<p =bare =>x",
    "<p a=1 a=2>dup</p>",
    "<script src=x></script><script>a<b</script>",
]


def _both(html):
    """Parse with stdlib and fast tokenizer; return (serialized, error) pairs."""
    out = []
    for use_stdlib in (True, False):
        old = dom._USE_STDLIB_TOKENIZER
        dom._USE_STDLIB_TOKENIZER = use_stdlib
        try:
            out.append((dom.serialize(dom.parse_document(html)), None))
        except Exception as exc:  # noqa: BLE001 - error parity is the assertion
            out.append((None, repr(exc)))
        finally:
            dom._USE_STDLIB_TOKENIZER = old
    return out


@pytest.mark.parametrize("case", range(len(EDGE_CASES)))
def test_edge_case_parity(case):
    a, b = _both(EDGE_CASES[case])
    assert a == b


def test_fixture_corpus_parity():
    for row in build_rows(300):
        try:
            html = bytes(row.html).decode("utf-8")
        except UnicodeDecodeError:
            continue
        a, b = _both(html)
        assert a == b, f"tokenizer divergence for fixture url={row.url}"


# HTML-ish token soup biased toward markup metacharacters and charrefs
_frag = st.lists(
    st.sampled_from(
        list("<>/&;!?-='\"abcZ09 \n\t")
        + ["<p>", "</p>", "<script>", "</script>", "<!--", "-->", "&amp;", "&#65;", "<br/>"]
    ),
    max_size=40,
).map("".join)


@settings(max_examples=300, deadline=None)
@given(_frag)
def test_fuzz_parity(html):
    a, b = _both(html)
    assert a == b
