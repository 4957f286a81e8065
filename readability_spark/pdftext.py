"""Minimal PDF text extraction — the "PDF/layout parse" axis of the
north_rule, implemented from the public PDF 1.x specification.

Scope: text-showing operators (Tj, ', ", TJ) inside BT..ET blocks of page
content streams, with literal-string escapes, hex strings, and
/FlateDecode-compressed streams (stdlib zlib).  That covers
programmatically-generated single-font PDFs — the common case in crawled
corpora — without any third-party dependency.  Out of scope (returns best
effort or skips): encrypted documents, CID/Type0 composite-font encodings,
object streams (/ObjStm), layout reconstruction beyond operator order.

Extraction rule (deterministic): every text-showing operator contributes
one piece — a TJ array's string elements are concatenated (its numbers are
kerning, not spacing) — and pieces are joined with "\\n" in stream order.

``build_simple_pdf`` emits a valid single-page PDF with one Tj per input
line; build -> extract round-trips exactly, which is what the golden tests
and the DuckDB oracle check.
"""

from __future__ import annotations

import re
import zlib

# ---------------------------------------------------------------- building

_ESC = {"\\": "\\\\", "(": "\\(", ")": "\\)", "\n": "\\n", "\r": "\\r", "\t": "\\t"}


def escape_pdf_string(s: str) -> str:
    return "".join(_ESC.get(ch, ch) for ch in s)


def build_simple_pdf(lines, compress=False) -> bytes:
    """A valid minimal one-page PDF showing each line via one Tj."""
    ops = ["BT", "/F1 12 Tf", "72 720 Td"]
    for line in lines:
        ops.append(f"({escape_pdf_string(line)}) Tj")
        ops.append("0 -14 Td")
    ops.append("ET")
    content = "\n".join(ops).encode("latin-1", "replace")
    filt = ""
    if compress:
        content = zlib.compress(content)
        filt = " /Filter /FlateDecode"

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        b"<< /Length %d%s >>\nstream\n%s\nendstream"
        % (len(content), filt.encode(), content),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n%s\nendobj\n" % (i, body)
    xref_at = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)


# -------------------------------------------------------------- extracting

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)endstream", re.S)
_BT_ET_RE = re.compile(rb"BT(.*?)ET", re.S)

_OCTAL_RE = re.compile(r"\\([0-7]{1,3})")
_SIMPLE_ESC = {"n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f",
               "(": "(", ")": ")", "\\": "\\"}


def _unescape_literal(raw: str) -> str:
    out = []
    i = 0
    while i < len(raw):
        ch = raw[i]
        if ch != "\\":
            out.append(ch)
            i += 1
            continue
        if i + 1 >= len(raw):
            break
        nxt = raw[i + 1]
        if nxt in _SIMPLE_ESC:
            out.append(_SIMPLE_ESC[nxt])
            i += 2
        elif nxt in "01234567":
            m = _OCTAL_RE.match(raw, i)
            out.append(chr(int(m.group(1), 8) & 0xFF))
            i = m.end()
        elif nxt == "\n":
            i += 2  # line continuation
        else:
            out.append(nxt)
            i += 2
    return "".join(out)


def _iter_strings(block: bytes):
    """Yield (kind, text, end_index) for each string token, where kind
    distinguishes literal/hex, scanning with balanced-paren rules."""
    i = 0
    n = len(block)
    while i < n:
        c = block[i : i + 1]
        if c == b"(":
            depth = 1
            j = i + 1
            buf = bytearray()
            while j < n and depth:
                b = block[j : j + 1]
                if b == b"\\" and j + 1 < n:
                    buf += block[j : j + 2]
                    j += 2
                    continue
                if b == b"(":
                    depth += 1
                elif b == b")":
                    depth -= 1
                    if depth == 0:
                        break
                buf += b
                j += 1
            yield ("lit", _unescape_literal(buf.decode("latin-1")), j + 1)
            i = j + 1
        elif c == b"<" and block[i + 1 : i + 2] != b"<":
            j = block.find(b">", i)
            if j == -1:
                return
            hexdigits = re.sub(rb"\s", b"", block[i + 1 : j])
            if len(hexdigits) % 2:
                hexdigits += b"0"
            try:
                text = bytes.fromhex(hexdigits.decode("ascii")).decode("latin-1")
            except ValueError:
                text = ""
            yield ("hex", text, j + 1)
            i = j + 1
        else:
            i += 1


def _block_pieces(block: bytes):
    """Text pieces from one BT..ET block, in operator order: one linear
    scan tracking string tokens, TJ-array grouping, and the text-showing
    operators (Tj, TJ, ', \")."""
    pieces = []
    pending = []  # strings seen since the last text-showing operator
    in_array = False
    array_buf = []
    i = 0
    n = len(block)
    while i < n:
        c = block[i : i + 1]
        if c == b"(" or (c == b"<" and block[i + 1 : i + 2] != b"<"):
            _, text, end = next(_iter_strings(block[i:]))
            if in_array:
                array_buf.append(text)
            else:
                pending.append(text)
            i += end
        elif c == b"[":
            in_array = True
            array_buf = []
            i += 1
        elif c == b"]":
            in_array = False
            pending.append("".join(array_buf))  # TJ numbers are kerning only
            array_buf = []
            i += 1
        elif c == b"T" and block[i : i + 2] in (b"Tj", b"TJ"):
            pieces.extend(pending)
            pending = []
            i += 2
        elif c in (b"'", b'"'):
            pieces.extend(pending)
            pending = []
            i += 1
        else:
            i += 1
    return pieces


def _decode_stream(params: bytes, data: bytes) -> bytes | None:
    if b"FlateDecode" in params:
        try:
            return zlib.decompress(data)
        except zlib.error:
            return None
    if b"/Filter" in params:
        return None  # unsupported filter (DCT, LZW, ...)
    return data


def extract_pdf_text(data: bytes) -> str:
    """All shown text of all content streams, pieces joined with newlines."""
    if not data.startswith(b"%PDF"):
        raise ValueError("not a PDF (missing %PDF header)")
    pieces = []
    for m in _STREAM_RE.finditer(data):
        content = _decode_stream(m.group(1), m.group(2))
        if content is None:
            continue
        for bt in _BT_ET_RE.finditer(content):
            pieces.extend(_block_pieces(bt.group(1)))
    return "\n".join(pieces)
