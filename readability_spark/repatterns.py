"""Regex library, transcribed verbatim from /root/reference/src/re.rs:9-34.

Compiled once per Python worker process (module import), reused across Arrow
batches — the Spark analog of the reference's LazyLock one-time compilation
(/root/reference/src/re.rs:3-7).

Both Rust's ``regex`` crate and Python ``re`` treat ``\\s`` as Unicode
whitespace on str input, and both use leftmost/preference alternation
semantics, so these patterns behave identically on the fixture corpus.
"""

import re

BYLINE = re.compile(r"(?i)byline|author|dateline|writtenby|p-author")

MAYBE_CANDIDATE = re.compile(r"(?i)and|article|body|column|content|main|mathjax|shadow")

META_PROPERTY = re.compile(
    r"(?i)\s*(article|dc|dcterm|og|twitter)\s*:\s*(author|creator|description|published_time|title|site_name)\s*"
)

NUMERIC_HTML_ENTITY = re.compile(r"(?i)&#(?:x([0-9a-f]+)|([0-9]+));")

TITLE_HIERARCHICAL_SEPARATOR = re.compile(r"\s[\\/>»]\s")

TITLE_LEADING_JUNK = re.compile(r"(?i)^[^|\-–—\/>»]*[|\-–—\/>»]")

TITLE_NORMALIZE_WHITESPACE = re.compile(r"\s{2,}")

TITLE_SEPARATOR = re.compile(r"\s[|\-–—\/>»]\s")

UNLIKELY_CANDIDATE = re.compile(
    r"(?i)-ad-|ai2html|banner|breadcrumbs|combx|comment|community|cover-wrap|disqus|extra|footer|gdpr|header|legends|menu|related|remark|replies|rss|shoutbox|sidebar|skyscraper|social|sponsor|supplemental|ad-break|agegate|pagination|pager|popup|yom-remote"
)

# Heuristic stand-in for Rust's ``Url::parse`` success check used by
# ExtractMetaTags to reject URL-valued article:author content
# (/root/reference/src/stage/extract_meta_tags.rs:38-41): an absolute URL
# requires a scheme prefix.
URL_SCHEME = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")
