"""isProbablyReaderable — mozilla/readability's public pre-parse heuristic.

The reference anticipates this: its integration harness reads a
``readerable`` field from every fixture's expected-metadata JSON but never
asserts behavior (/root/reference/tests/integration.rs:48-49).  The
semantics below are the public mozilla/readability
``Readability-readerable.js`` algorithm (the reference's submodule target,
/root/reference/.gitmodules:1-3):

- candidate nodes: every ``<p>``, ``<pre>``, and the parent of every
  ``<br>`` whose parent is a ``<div>``
- skip invisible nodes (inline ``display:none`` / ``visibility:hidden``,
  ``hidden`` attr, ``aria-hidden="true"`` without a ``fallback-image``
  class)
- skip nodes whose ``"{class} {id}"`` matches the unlikely-candidates
  regex unless it also matches maybe-candidate (same verbatim patterns as
  pipeline stage 9, re_patterns)
- skip ``<p>`` nodes directly inside an ``<li>``
- for the rest: textLength = len(trim(textContent)); if
  textLength >= min_content_length, score += sqrt(textLength -
  min_content_length); return True as soon as score > min_score

The early return means the reported score is the accumulated value at the
moment the threshold is crossed, not the full-document total — kept
identical here so the score column is deterministic and oracle-checkable.
"""

from __future__ import annotations

import math

from . import dom
from .repatterns import MAYBE_CANDIDATE, UNLIKELY_CANDIDATE

DEFAULT_MIN_CONTENT_LENGTH = 140
DEFAULT_MIN_SCORE = 20.0


def _is_visible(node):
    style = (node.attr("style") or "").lower()
    if style:
        # same two-spacing containment check as pipeline stage 8
        for marker in ("display:none", "display: none", "visibility:hidden", "visibility: hidden"):
            if marker in style:
                return False
    if node.attr("hidden") is not None:
        return False
    if node.attr("aria-hidden") == "true":
        cls = node.attr("class") or ""
        if "fallback-image" not in cls:
            return False
    return True


def _candidates(document):
    """querySelectorAll("p, pre, article") in document order, then the
    parent <div> of every <div> > <br> appended if not already present —
    matching mozilla's Set insertion order (load-bearing for the
    early-exit score)."""
    out = dom.select(document, "p, pre, article")
    seen = {id(n) for n in out}
    for br in dom.select(document, "br"):
        parent = br.parent
        if parent is not None and parent.name == "div" and id(parent) not in seen:
            seen.add(id(parent))
            out.append(parent)
    return out


def _has_li_ancestor(node):
    p = node.parent
    while p is not None:
        if p.name == "li":
            return True
        p = p.parent
    return False


def is_probably_readerable(
    html_or_document,
    min_content_length=DEFAULT_MIN_CONTENT_LENGTH,
    min_score=DEFAULT_MIN_SCORE,
):
    """Returns (readerable: bool, score: float) for a raw HTML string/bytes
    or an already-parsed DOCUMENT node."""
    document = (
        html_or_document
        if isinstance(html_or_document, dom.Node)
        else dom.parse_document(html_or_document)
    )
    score = 0.0
    for node in _candidates(document):
        if not _is_visible(node):
            continue
        match_string = f'{node.attr("class") or ""} {node.attr("id") or ""}'
        if UNLIKELY_CANDIDATE.search(match_string) and not MAYBE_CANDIDATE.search(
            match_string
        ):
            continue
        if node.name == "p" and _has_li_ancestor(node):  # CSS "li p"
            continue
        text_length = len(node.text().strip())
        if text_length < min_content_length:
            continue
        score += math.sqrt(text_length - min_content_length)
        if score > min_score:
            return True, score
    return False, score
