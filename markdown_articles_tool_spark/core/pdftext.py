"""Minimal from-scratch PDF text extraction (stdlib only: zlib + re).

The north rule's extraction tier names "PDF/layout parse" alongside
the HTML boilerplate strip.  No PDF library exists in this container
(pypdf/pdfminer verifiably absent), so this module implements a REAL
subset extractor rather than a stub: it parses the page content
streams of a PDF and recovers the text shown by the standard text
operators.  Scope and limits (documented, not hidden):

* streams: every ``stream ... endstream`` segment; FlateDecode
  (zlib) is tried first, raw bytes used when decompression fails.
  Other filters (LZW, DCT, CCITT) are out of scope — their streams
  simply yield no text operators.
* text: inside ``BT ... ET`` text objects, the ``(string) Tj``,
  ``(string) '`` and ``[ ... ] TJ`` show operators, in stream order;
  TJ array numbers (kerning) are ignored.  Literal byte strings AND
  hex strings ``<4869> Tj`` / hex elements inside ``[...] TJ``
  (PDF 32000-1 §7.3.4.3: non-hex chars ignored, odd digit count
  zero-padded; ``<<`` opens a dictionary, never a string; an
  unterminated ``<`` consumes the rest of the block and shows
  nothing).  CMap/ToUnicode re-encoding is still out of scope, so
  text in subsetted-font PDFs may come back garbled (same failure
  mode pdfminer has without ToUnicode tables).
* PDF string escapes: ``\\n \\r \\t \\b \\f \\( \\) \\\\``, octal
  ``\\ddd``, backslash-newline continuation, and the "ignore the
  backslash" fallback — per PDF 32000-1 §7.3.4.2.

DETERMINISTIC SPEC (the independent oracle twin in
tools/oracle_kernels.py reimplements exactly this):
within a BT block the shown strings concatenate with no separator;
non-empty blocks join with '\\n' in document order; spans carry
(stream_idx, block_idx, n_chars) per non-empty block.
"""

from __future__ import annotations

import re
import zlib
from typing import List, Tuple

# PDF 32000-1 §7.3.8: an EOL follows the 'stream' keyword and another
# precedes 'endstream' — both stripped from the data.  Boundary rules
# (shared spec with the oracle twin, locked by malformed-input cases
# in tests/test_kernel_equivalence.py):
# * a 'stream' that is the tail of 'endstream' is not a keyword;
# * a candidate whose first following 'endstream' lacks a preceding
#   EOL is DISCARDED (not extended to the next 'endstream'); scanning
#   resumes after that 'endstream'.
_STREAM_START_RE = re.compile(rb'(?<!end)stream\r?\n')
_BT_RE = re.compile(r'BT(.*?)ET', re.DOTALL)


def _iter_stream_payloads(data: bytes):
    pos = 0
    while True:
        m = _STREAM_START_RE.search(data, pos)
        if not m:
            return
        e = data.find(b'endstream', m.end())
        if e < 0:
            return
        end = e
        if data[end - 1:end] == b'\n':
            end -= 1
            if data[end - 1:end] == b'\r':
                end -= 1
            yield data[m.end():end]
        pos = e + 9
# a PDF literal string: ( with \-escapes, no nested-paren handling at
# the regex level (nesting handled by the scanner below)
_OCTAL_RE = re.compile(r'\\([0-7]{1,3})')

_ESCAPES = {'n': '\n', 'r': '\r', 't': '\t', 'b': '\b', 'f': '\f',
            '(': '(', ')': ')', '\\': '\\'}


def _unescape(raw: str) -> str:
    out: List[str] = []
    i = 0
    while i < len(raw):
        c = raw[i]
        if c != '\\':
            out.append(c)
            i += 1
            continue
        if i + 1 >= len(raw):
            break
        n = raw[i + 1]
        if n in _ESCAPES:
            out.append(_ESCAPES[n])
            i += 2
        elif n == '\n':
            i += 2  # line continuation
        elif n == '\r':
            i += 3 if raw[i + 2:i + 3] == '\n' else 2
        elif n.isdigit():
            m = _OCTAL_RE.match(raw, i)
            if m:
                out.append(chr(int(m.group(1), 8) & 0xFF))
                i = m.end()
            else:
                out.append(n)
                i += 2
        else:
            out.append(n)  # stray backslash: ignore the backslash
            i += 2
    return ''.join(out)


_HEX_DIGITS = set('0123456789abcdefABCDEF')


def _hex_decode(body: str) -> str:
    """PDF hex string body → chars (§7.3.4.3): non-hex chars ignored
    (whitespace is legal; lenient on the rest), odd count zero-padded."""
    digits = [c for c in body if c in _HEX_DIGITS]
    if len(digits) % 2:
        digits.append('0')
    return ''.join(
        chr(int(digits[k] + digits[k + 1], 16)) for k in range(0, len(digits), 2)
    )


def _next_op(block: str, k: int) -> str:
    n = len(block)
    while k < n and block[k] in ' \r\n\t':
        k += 1
    m = re.match(r"[^\s()<>\[\]{}/]+", block[k:k + 8])
    return m.group(0) if m else ''


def _scan_strings(block: str) -> List[Tuple[str, str, int]]:
    """[(unescaped string, next token, start position)] for one BT
    block, in order: literal ``(...)`` strings (byte-by-byte scan
    tracking parenthesis nesting and escapes) and hex ``<...>`` strings
    (``<<`` opens a dictionary, not a string)."""
    items: List[Tuple[str, str, int]] = []
    i = 0
    n = len(block)
    while i < n:
        c0 = block[i]
        if c0 == '<':
            if block[i + 1:i + 2] == '<':
                i += 2      # dictionary open, never a string
                continue
            j = block.find('>', i + 1)
            if j < 0:
                return items    # unterminated hex string: shows nothing
            items.append((_hex_decode(block[i + 1:j]), _next_op(block, j + 1), i))
            i = j + 1
            continue
        if c0 != '(':
            i += 1
            continue
        start = i
        depth = 1
        j = i + 1
        buf: List[str] = []
        while j < n and depth:
            c = block[j]
            if c == '\\' and j + 1 < n:
                buf.append(block[j:j + 2])
                j += 2
                continue
            if c == '(':
                depth += 1
            elif c == ')':
                depth -= 1
                if depth == 0:
                    break
            buf.append(c)
            j += 1
        items.append((_unescape(''.join(buf)), _next_op(block, j + 1), start))
        i = j + 1
    return items


_TJ_ARRAY_RE = re.compile(r'\[[^\[\]]*\]\s*TJ')


def _block_text(block: str) -> str:
    """Text shown by one BT block: strings with a Tj or ' operator,
    plus every string inside a ``[...] TJ`` array span (array spans
    located by ``\\[[^\\[\\]]*\\]\\s*TJ`` — a ']' inside a string
    would split the span; out of scope, same in the oracle twin)."""
    spans = [(m.start(), m.end()) for m in _TJ_ARRAY_RE.finditer(block)]
    shown: List[str] = []
    for s, op, pos in _scan_strings(block):
        if any(a <= pos < b for a, b in spans):
            shown.append(s)
        elif op == 'Tj' or op == "'":
            shown.append(s)
    return ''.join(shown)


def extract_pdf_blocks(content) -> List[Tuple[int, int, str]]:
    """[(stream_idx, block_idx, text)] of non-empty BT blocks."""
    if content is None:
        return []
    data = bytes(content)
    out: List[Tuple[int, int, str]] = []
    for si, raw in enumerate(_iter_stream_payloads(data)):
        try:
            raw = zlib.decompress(raw)
        except Exception:
            pass
        text = raw.decode('latin-1', errors='replace')
        bi = 0
        for bm in _BT_RE.finditer(text):
            bt = _block_text(bm.group(1))
            if bt:
                out.append((si, bi, bt))
                bi += 1
    return out


def pdf_text(blocks: List[Tuple[int, int, str]]) -> str:
    return '\n'.join(b[2] for b in blocks)


def pdf_spans(blocks: List[Tuple[int, int, str]]) -> List[Tuple[int, int, int]]:
    return [(si, bi, len(t)) for si, bi, t in blocks]
