"""Minimal from-scratch PDF text extraction (stdlib only: zlib + re).

The north rule's extraction tier names "PDF/layout parse" alongside
the HTML boilerplate strip.  No PDF library exists in this container
(pypdf/pdfminer verifiably absent), so this module implements a REAL
subset extractor rather than a stub: it parses the page content
streams of a PDF and recovers the text shown by the standard text
operators.  Scope and limits (documented, not hidden):

* streams: every ``stream ... endstream`` segment.  Filter choice
  (r4): the stream's own dict — the window from the last ``obj``
  keyword before ``stream`` — is checked for ``/LZWDecode`` (decode
  with the from-scratch TIFF-style LZW below, EarlyChange=1, raw on
  error); otherwise FlateDecode (zlib) is tried, raw bytes used when
  decompression fails.  LZW is never *guessed* — arbitrary bytes
  usually form a locally-valid LZW prefix, so decoding it without the
  dict marker would corrupt plain streams.  DCT/CCITT (image codecs)
  stay out of scope — their streams yield no text operators.
* text: inside ``BT ... ET`` text objects, the ``(string) Tj``,
  ``(string) '`` and ``[ ... ] TJ`` show operators, in stream order;
  TJ array numbers (kerning) are ignored.  Literal byte strings AND
  hex strings ``<4869> Tj`` / hex elements inside ``[...] TJ``
  (PDF 32000-1 §7.3.4.3: non-hex chars ignored, odd digit count
  zero-padded; ``<<`` opens a dictionary, never a string; an
  unterminated ``<`` consumes the rest of the block and shows
  nothing).
* ToUnicode re-encoding (r4): fonts reached via ``/Font <<...>>``
  resource dicts → ``/ToUnicode N 0 R`` → CMap stream (raw or Flate)
  are decoded through their bfchar/bfrange tables — the path that
  makes subsetted-font PDFs readable.  Deterministic sub-spec:

  - objects: ``N G obj`` .. first ``endobj`` over the latin-1 view;
    the ``/Font`` dict body runs to the FIRST ``>>``; name → ref,
    last binding wins; ``/ToUnicode`` must be an indirect ref.
  - CMap: hex tokens ``<..>`` (whitespace inside ignored, odd digits
    zero-padded); code width = byte length of the FIRST src token;
    bfchar pairs map src → UTF-16BE(dst, errors=replace); bfrange
    ``<lo> <hi> <start>`` maps lo+i → UTF-16BE of (start_int + i)
    rendered at start's byte width (wrapping), array form maps
    positionally; ranges with hi < lo or wider than 65535 codes are
    skipped.
  - show strings: while a CMap-bearing font is current (lexical
    ``/Name <num> Tf`` scan, per stream, last one before the string
    wins; state does not cross streams), the string's latin-1 bytes
    split into code-width units (trailing partial unit dropped);
    unmapped 1-byte codes fall back to chr(code), unmapped wider
    codes to U+FFFD.
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
    """(payload, lzw_flag) per stream; lzw_flag = '/LZWDecode' appears
    in the stream's dict window (last 'obj' keyword → 'stream')."""
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
            w = data.rfind(b'obj', 0, m.start())
            window = data[w if w >= 0 else 0:m.start()]
            yield data[m.end():end], b'/LZWDecode' in window
        pos = e + 9


def lzw_decode(data: bytes) -> bytes:
    """TIFF-style LZW (PDF 32000-1 §7.4.4), EarlyChange=1: MSB-first
    variable 9-12 bit codes, 256=clear, 257=EOD, code width bumps one
    code early.  Raises ValueError on an invalid code."""
    out = bytearray()
    prefixes: List[bytes] = [bytes([i]) for i in range(256)] + [b'', b'']
    table = list(prefixes)
    width = 9
    prev = None
    acc = 0
    nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:
                table = list(prefixes)
                width = 9
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if code < len(table) and code != 256 and code != 257:
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]
            else:
                raise ValueError('invalid LZW code')
            out += entry
            if prev is not None:
                table.append(prev + entry[:1])
            prev = entry
            # EarlyChange=1: width bumps when the NEXT code would not fit
            if len(table) + 1 >= (1 << width) and width < 12:
                width += 1
    return bytes(out)
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

# ------------------------------------------------- ToUnicode CMaps (r4)

_OBJ_RE = re.compile(r'(\d+)\s+\d+\s+obj\b(.*?)endobj', re.DOTALL)
_FONT_DICT_RE = re.compile(r'/Font\s*<<')
_FONT_ENTRY_RE = re.compile(r'/([^\s/<>\[\]()%]+)\s+(\d+)\s+\d+\s+R')
_TOUNICODE_RE = re.compile(r'/ToUnicode\s+(\d+)\s+\d+\s+R')
_HEX_TOKEN_RE = re.compile(r'<([0-9A-Fa-f\s]*)>')
_STREAM_IN_OBJ_RE = re.compile(rb'stream\r?\n(.*?)\r?\nendstream', re.DOTALL)
_TF_RE = re.compile(r'/([^\s/<>\[\]()%]+)\s+[-+]?[\d.]+\s+Tf')

CMap = Tuple[int, dict]   # (code_bytes, {code: unicode str})


def _hex_bytes(digits: str) -> bytes:
    d = ''.join(c for c in digits if c in _HEX_DIGITS)
    if len(d) % 2:
        d += '0'
    return bytes.fromhex(d)


def _u16(b: bytes) -> str:
    return b.decode('utf-16-be', errors='replace')


def parse_cmap(text: str):
    """bfchar/bfrange tables of one ToUnicode CMap (spec in the module
    docstring).  Returns (code_bytes, entries) or None when empty.

    ``entries`` is an ordered list of ('d', dict) dict batches and
    ('r', lo, hi, start, width) offset-range rules; lookup scans it in
    REVERSE so the last-defined mapping wins — identical semantics to
    materializing every range into one dict, but a 64k identity
    bfrange (the common Identity-H ToUnicode) stays O(1) per document
    instead of 65k dict inserts (the r4 bench regression: pdf_text
    0.76 s → 6.9 s before this representation)."""
    entries: list = []
    code_bytes = 0

    def src_width(b: bytes) -> int:
        nonlocal code_bytes
        if not code_bytes and b:
            code_bytes = len(b)
        return code_bytes

    pos = 0
    while True:
        c = text.find('beginbfchar', pos)
        r = text.find('beginbfrange', pos)
        if c < 0 and r < 0:
            break
        if r < 0 or (0 <= c < r):
            end = text.find('endbfchar', c)
            body = text[c + 11:end if end >= 0 else len(text)]
            toks = _HEX_TOKEN_RE.findall(body)
            batch: dict = {}
            for i in range(0, len(toks) - 1, 2):
                src = _hex_bytes(toks[i])
                dst = _hex_bytes(toks[i + 1])
                if src:
                    src_width(src)
                    batch[int.from_bytes(src, 'big')] = _u16(dst)
            if batch:
                entries.append(('d', batch))
            pos = (end + 9) if end >= 0 else len(text)
        else:
            end = text.find('endbfrange', r)
            body = text[r + 12:end if end >= 0 else len(text)]
            pos2 = 0
            while True:
                m_lo = _HEX_TOKEN_RE.search(body, pos2)
                if not m_lo:
                    break
                m_hi = _HEX_TOKEN_RE.search(body, m_lo.end())
                if not m_hi:
                    break
                lo_b, hi_b = _hex_bytes(m_lo.group(1)), _hex_bytes(m_hi.group(1))
                lo = int.from_bytes(lo_b, 'big')
                hi = int.from_bytes(hi_b, 'big')
                # dst: next '[' array or hex token, whichever first
                k = m_hi.end()
                while k < len(body) and body[k].isspace():
                    k += 1
                if k < len(body) and body[k] == '[':
                    close = body.find(']', k)
                    arr = _HEX_TOKEN_RE.findall(body[k:close if close >= 0 else len(body)])
                    if lo_b and 0 <= hi - lo <= 65535:
                        src_width(lo_b)
                        batch = {lo + i: _u16(_hex_bytes(d))
                                 for i, d in enumerate(arr[:hi - lo + 1])}
                        if batch:
                            entries.append(('d', batch))
                    pos2 = (close + 1) if close >= 0 else len(body)
                else:
                    m_dst = _HEX_TOKEN_RE.search(body, m_hi.end())
                    if not m_dst:
                        break
                    dst_b = _hex_bytes(m_dst.group(1))
                    if lo_b and dst_b and 0 <= hi - lo <= 65535:
                        src_width(lo_b)
                        entries.append(
                            ('r', lo, hi, int.from_bytes(dst_b, 'big'), len(dst_b))
                        )
                    pos2 = m_dst.end()
            pos = (end + 10) if end >= 0 else len(text)
    if not entries or not code_bytes:
        return None
    return code_bytes, entries


def _cmap_lookup(entries: list, code: int):
    for e in reversed(entries):
        if e[0] == 'd':
            got = e[1].get(code)
            if got is not None:
                return got
        else:
            _k, lo, hi, start, width = e
            if lo <= code <= hi:
                mask = (1 << (8 * width)) - 1
                return _u16(((start + code - lo) & mask).to_bytes(width, 'big'))
    return None


def font_cmaps(data: bytes) -> dict:
    """{font resource name: CMap} for every /Font entry whose font
    object carries a parseable /ToUnicode CMap stream."""
    view = data.decode('latin-1')
    objs = {int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(view)}
    names: dict = {}
    for body in [view]:   # resource dicts can sit in objects or inline
        for fm in _FONT_DICT_RE.finditer(body):
            close = body.find('>>', fm.end())
            for em in _FONT_ENTRY_RE.finditer(body[fm.end():close if close >= 0 else len(body)]):
                names[em.group(1)] = int(em.group(2))   # last binding wins
    out: dict = {}
    for name, ref in names.items():
        font_body = objs.get(ref)
        if font_body is None:
            continue
        tm = _TOUNICODE_RE.search(font_body)
        if not tm:
            continue
        cmap_body = objs.get(int(tm.group(1)))
        if cmap_body is None:
            continue
        sm = _STREAM_IN_OBJ_RE.search(cmap_body.encode('latin-1'))
        if not sm:
            continue
        payload = sm.group(1)
        try:
            payload = zlib.decompress(payload)
        except Exception:
            pass
        cmap = parse_cmap(payload.decode('latin-1', errors='replace'))
        if cmap:
            out[name] = cmap
    return out


def apply_cmap(s: str, cmap: CMap) -> str:
    """Re-encode one shown string through a ToUnicode table."""
    code_bytes, entries = cmap
    bs = s.encode('latin-1', errors='replace')
    out: List[str] = []
    for i in range(0, len(bs) - len(bs) % code_bytes, code_bytes):
        code = int.from_bytes(bs[i:i + code_bytes], 'big')
        mapped = _cmap_lookup(entries, code)
        if mapped is not None:
            out.append(mapped)
        elif code_bytes == 1:
            out.append(chr(code))
        else:
            out.append('�')
    return ''.join(out)


def _block_text(block: str, base: int = 0, tfs=(), cmaps=None) -> str:
    """Text shown by one BT block: strings with a Tj or ' operator,
    plus every string inside a ``[...] TJ`` array span (array spans
    located by ``\\[[^\\[\\]]*\\]\\s*TJ`` — a ']' inside a string
    would split the span; out of scope, same in the oracle twin).
    ``tfs``: [(abs position, font name)] of the stream's Tf operators;
    strings shown under a CMap-bearing font re-encode through it."""
    spans = [(m.start(), m.end()) for m in _TJ_ARRAY_RE.finditer(block)]
    shown: List[str] = []
    for s, op, pos in _scan_strings(block):
        if any(a <= pos < b for a, b in spans) or op == 'Tj' or op == "'":
            if cmaps:
                abs_pos = base + pos
                font = None
                for tp, tn in tfs:
                    if tp < abs_pos:
                        font = tn
                    else:
                        break
                cm = cmaps.get(font)
                if cm:
                    s = apply_cmap(s, cm)
            shown.append(s)
    return ''.join(shown)


def extract_pdf_blocks(content) -> List[Tuple[int, int, str]]:
    """[(stream_idx, block_idx, text)] of non-empty BT blocks."""
    if content is None:
        return []
    data = bytes(content)
    cmaps = font_cmaps(data)
    out: List[Tuple[int, int, str]] = []
    for si, (raw, is_lzw) in enumerate(_iter_stream_payloads(data)):
        if is_lzw:
            try:
                raw = lzw_decode(raw)
            except Exception:
                pass
        else:
            try:
                raw = zlib.decompress(raw)
            except Exception:
                pass
        text = raw.decode('latin-1', errors='replace')
        tfs = [(m.start(), m.group(1)) for m in _TF_RE.finditer(text)] if cmaps else []
        bi = 0
        for bm in _BT_RE.finditer(text):
            bt = _block_text(bm.group(1), bm.start(1), tfs, cmaps)
            if bt:
                out.append((si, bi, bt))
                bi += 1
    return out


def pdf_text(blocks: List[Tuple[int, int, str]]) -> str:
    return '\n'.join(b[2] for b in blocks)


def pdf_spans(blocks: List[Tuple[int, int, str]]) -> List[Tuple[int, int, int]]:
    return [(si, bi, len(t)) for si, bi, t in blocks]
