"""fixRelativeUris — mozilla/readability's public URI-rewriting pass.

The reference accepts a ``base_url`` and ignores it
(/root/reference/src/pipeline.rs:30); the JS original it ports resolves
every link/media URI in the article content against the document's base
URI (``Readability.js`` ``_fixRelativeUris``).  This module implements
those public semantics over our DOM, opt-in via
``Options(fix_relative_uris=True)`` + a non-None ``base_url``:

- base URI = first ``<base href>`` resolved against the document URI,
  else the document URI itself
- ``<a href>``: ``javascript:`` links are unwrapped (single text child ->
  replaced by that text; otherwise replaced by a ``<span>`` keeping the
  children); in-page ``#fragment`` links stay relative when no <base>
  redefines the base; everything else is resolved to absolute
- media elements (``img picture figure video audio source``): ``src`` and
  ``poster`` resolved; ``srcset`` rewritten candidate-by-candidate with
  the same regex as the JS original

URL resolution uses RFC 3986 ``urllib.parse.urljoin`` (documented
divergence: a handful of WHATWG-URL edge cases differ; fixtures stay
inside the common subset).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

from . import dom

# JS: /(\S+)(\s+[\d.]+[xw])?(\s*(?:,|$))/g
_SRCSET_CANDIDATE = re.compile(r"(\S+)(\s+[\d.]+[xw])?(\s*(?:,|$))")

_MEDIA_TAGS = "img, picture, figure, video, audio, source"


def _base_uri(document, document_uri):
    for node in dom.select(document, "base"):
        href = node.attr("href")
        if href is not None and href.strip():
            return urljoin(document_uri, href.strip())
    return document_uri


def fix_relative_uris(root, document_uri, document=None):
    """Rewrite link/media URIs under ``root`` (mutates the tree).

    ``document`` defaults to ``root`` and is where <base> is looked up —
    pass the full document when ``root`` is a selected content subtree."""
    document = document if document is not None else root
    base_uri = _base_uri(document, document_uri)

    def to_absolute(uri):
        if base_uri == document_uri and uri.startswith("#"):
            return uri
        try:
            return urljoin(base_uri, uri)
        except ValueError:
            return uri

    for link in list(dom.select(root, "a")):
        href = link.attr("href")
        if href is None:
            continue
        if href.startswith("javascript:"):
            children = list(link.children)
            if len(children) == 1 and children[0].kind == dom.TEXT:
                link.replace_with(dom.new_text(children[0].data))
            else:
                container = dom.new_element("span")
                for child in children:
                    container.append_child(child)
                link.replace_with(container)
        else:
            link.set_attr("href", to_absolute(href))

    for media in dom.select(root, _MEDIA_TAGS):
        src = media.attr("src")
        if src is not None:
            media.set_attr("src", to_absolute(src))
        poster = media.attr("poster")
        if poster is not None:
            media.set_attr("poster", to_absolute(poster))
        srcset = media.attr("srcset")
        if srcset is not None:
            media.set_attr(
                "srcset",
                _SRCSET_CANDIDATE.sub(
                    lambda m: to_absolute(m.group(1)) + (m.group(2) or "") + m.group(3),
                    srcset,
                ),
            )
