"""Data model: Metadata, Context, Article, errors.

Mirrors /root/reference/src/{metadata.rs,context.rs,article.rs,error.rs}.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .options import DEFAULT_OPTIONS, Options


class ExtractionError(Exception):
    """Base for per-document extraction failures.  In the Spark job these are
    never raised across the batch boundary: they become ``status``/``error``
    columns on the row (SURVEY.md section 1.2)."""


class ElementLimitExceeded(ExtractionError):
    """/root/reference/src/error.rs:4-5."""

    def __init__(self, found, limit):
        self.found = found
        self.limit = limit
        super().__init__(
            f"aborting parsing document; {found} elements found (limit: {limit})"
        )


@dataclass
class Metadata:
    """All-optional string fields (/root/reference/src/metadata.rs:2-8)."""

    byline: str | None = None
    excerpt: str | None = None
    published_time: str | None = None
    site_name: str | None = None
    title: str | None = None


@dataclass
class Context:
    """Per-document mutable pipeline state (/root/reference/src/context.rs:3-9).

    ``document`` is a dom.Node of kind DOCUMENT."""

    document: object
    options: Options = DEFAULT_OPTIONS
    dir: str | None = None
    lang: str | None = None
    metadata: Metadata = field(default_factory=Metadata)


@dataclass
class Article:
    """Extraction output (/root/reference/src/article.rs:4-25).

    ``length`` is the UTF-8 **byte** count of ``text_content``
    (String::len at /root/reference/src/readability.rs:57); ``title``
    defaults to "" (/root/reference/src/readability.rs:61)."""

    byline: str | None
    content: str
    dir: str | None
    excerpt: str | None
    lang: str | None
    length: int
    published_time: str | None
    site_name: str | None
    text_content: str
    title: str
