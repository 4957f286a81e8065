"""CLI parity with the reference binary: ``python -m readability_spark FILE``.

Mirrors /root/reference/src/main.rs:12-34 + arguments.rs:11-22 — read ONE
html file, run the pipeline, print ``article.content`` to stdout; errors go
to stderr with exit code 1.  Extra flags expose the engine options the
reference declares (options.rs) plus the scoring pass.
"""

from __future__ import annotations

import argparse
import json
import sys

from .options import Options
from .pipeline import extract


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="readability_spark", description="extract the article from one HTML file"
    )
    p.add_argument("file", help="path to an HTML file")
    p.add_argument("--base-url", default=None, help="accepted for API parity (unused, like the reference)")
    p.add_argument("--max-elements", type=int, default=None)
    p.add_argument("--scored", action="store_true", help="enable the Arc90 scoring pass")
    p.add_argument("--min-text-length", type=int, default=500)
    p.add_argument("--json", action="store_true", help="print the whole Article as JSON instead of content")
    args = p.parse_args(argv)

    try:
        with open(args.file, encoding="utf-8") as fh:
            html = fh.read()
        options = Options(
            max_elements=args.max_elements,
            content_extraction=args.scored,
            min_text_length=args.min_text_length,
        )
        article = extract(html, base_url=args.base_url, options=options)
    except Exception as exc:  # mirror main.rs error chain to stderr, exit 1
        print(f"error: {exc}", file=sys.stderr)
        return 1

    if args.json:
        print(json.dumps(article.__dict__, ensure_ascii=False))
    else:
        print(article.content)
    return 0


if __name__ == "__main__":
    sys.exit(main())
