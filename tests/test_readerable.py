"""Unit tests for is_probably_readerable (mozilla Readability-readerable.js
semantics — see readability_spark/readerable.py docstring)."""

from __future__ import annotations

import math

from readability_spark.readerable import is_probably_readerable

LONG = "x" * 600  # sqrt(600-140) ≈ 21.4 > 20 -> readerable on its own
MID = "y" * 240  # sqrt(240-140) = 10 -> needs company
SHORT = "z" * 100  # < 140 -> never scores


def test_long_paragraph_is_readerable():
    ok, score = is_probably_readerable(f"<p>{LONG}</p>")
    assert ok is True
    assert score == math.sqrt(600 - 140)


def test_short_paragraph_is_not():
    ok, score = is_probably_readerable(f"<p>{SHORT}</p>")
    assert (ok, score) == (False, 0.0)


def test_score_accumulates_across_paragraphs():
    html = f"<p>{MID}</p><p>{MID}</p><p>{MID}</p>"
    ok, score = is_probably_readerable(html)
    assert ok is True
    assert score == 30.0  # 10 + 10 + 10, early exit after the third


def test_early_exit_score_is_partial():
    # first candidate alone crosses the threshold: later ones never counted
    html = f"<p>{LONG}</p><p>{LONG}</p>"
    ok, score = is_probably_readerable(html)
    assert ok is True
    assert score == math.sqrt(460)


def test_pre_and_article_are_candidates():
    assert is_probably_readerable(f"<pre>{LONG}</pre>")[0] is True
    assert is_probably_readerable(f"<article>{LONG}</article>")[0] is True


def test_div_br_parent_is_candidate():
    assert is_probably_readerable(f"<div>{LONG}<br></div>")[0] is True
    # br under non-div parent does not promote it
    assert is_probably_readerable(f"<span>{LONG}<br></span>")[0] is False


def test_li_p_skipped():
    assert is_probably_readerable(f"<ul><li><p>{LONG}</p></li></ul>")[0] is False
    # nested: any li ancestor counts (CSS "li p")
    assert is_probably_readerable(f"<ul><li><div><p>{LONG}</p></div></li></ul>")[0] is False
    # but pre inside li still scores (mozilla matches "li p" only)
    assert is_probably_readerable(f"<ul><li><pre>{LONG}</pre></li></ul>")[0] is True


def test_hidden_nodes_skipped():
    assert is_probably_readerable(f'<p style="display:none">{LONG}</p>')[0] is False
    assert is_probably_readerable(f'<p style="visibility: hidden">{LONG}</p>')[0] is False
    assert is_probably_readerable(f"<p hidden>{LONG}</p>")[0] is False
    assert is_probably_readerable(f'<p aria-hidden="true">{LONG}</p>')[0] is False
    assert (
        is_probably_readerable(f'<p aria-hidden="true" class="fallback-image">{LONG}</p>')[0]
        is True
    )


def test_unlikely_candidates_skipped():
    assert is_probably_readerable(f'<p class="comment">{LONG}</p>')[0] is False
    # maybe-candidate rescues it
    assert is_probably_readerable(f'<p class="comment article">{LONG}</p>')[0] is True
    assert is_probably_readerable(f'<p id="sidebar">{LONG}</p>')[0] is False


def test_thresholds_are_parameters():
    ok, _ = is_probably_readerable(f"<p>{MID}</p>", min_score=5)
    assert ok is True
    ok, _ = is_probably_readerable(f"<p>{SHORT}</p>", min_content_length=50, min_score=5)
    assert ok is True
