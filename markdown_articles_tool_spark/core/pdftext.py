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
* object streams (r5, PDF 1.5+ §7.5.7): a top-level object whose body
  contains ``/ObjStm`` and a stream is an object container — modern
  writers serialize most non-stream objects (font dicts, resource
  dicts) inside it, invisible to the raw ``N G obj`` scan.  Spec:
  payload decoded by the filter rule above (LZW marker else Flate else
  raw) → latin-1 text; ``/N <int>`` and ``/First <int>`` from the
  container body; the first ``First`` chars yield up to 2N integers
  (objnum, offset) pairs; embedded body i runs from First+off_i to
  First+off_{i+1} (last: end of payload).  Missing N/First or a
  too-short header → container skipped.  Embedded objects OVERRIDE
  same-numbered top-level ones; ``/Font <<...>>`` resource scanning
  covers the main view first, then each payload in stream order (last
  name binding wins).  ObjStm and ``/XRef`` (xref-stream, binary)
  containers are NOT content: they are excluded from the text-stream
  enumeration (stream_idx counts content streams only).
* font /Encoding fallback (r5, §9.6.5 + Annex D): a /Font WITHOUT a
  parseable ToUnicode CMap but WITH ``/Encoding`` re-encodes its
  1-byte show strings through an encoding table.  ``/Encoding`` may
  be a direct name (``/WinAnsiEncoding`` → cp1252 per code with
  U+FFFD for the five unassigned bytes, ``/MacRomanEncoding`` →
  mac_roman), an indirect ref, or an inline ``<<...>>`` dict (first
  ``>>`` closes it) carrying optional ``/BaseEncoding <name>``
  (default: identity chr(code) — the documented simplification of
  StandardEncoding) and optional ``/Differences [ ... ]`` (int sets
  the current code, ``/name`` assigns AGL_SUBSET lookup — or
  ``uniXXXX``/``uXXXX[XX]`` hex names — then increments; unknown
  names map to U+FFFD).  ToUnicode always wins when both exist.

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
            # r5: ObjStm / XRef containers hold objects or binary xref
            # rows, not page content — excluded from the text-stream
            # enumeration (stream_idx counts content streams only)
            if b'/ObjStm' not in window and b'/XRef' not in window:
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


# ------------------------------------------- object streams (r5, §7.5.7)

_N_RE = re.compile(r'/N\s+(\d+)')
_FIRST_RE = re.compile(r'/First\s+(\d+)')
_INT_RE = re.compile(r'\d+')


def objstm_objects(view: str):
    """(embedded objects {num: body}, [payload texts]) from every
    ``/ObjStm`` container in the document (spec in the module
    docstring).  Malformed containers are skipped whole."""
    objs: dict = {}
    texts: List[str] = []
    for m in _OBJ_RE.finditer(view):
        body = m.group(2)
        # container detection over the DICT WINDOW (before the first
        # 'stream' keyword), so page content mentioning '/ObjStm'
        # can't be misread as a container
        window = body[:body.find('stream')] if 'stream' in body else body
        if '/ObjStm' not in window:
            continue
        sm = _STREAM_IN_OBJ_RE.search(body.encode('latin-1'))
        if not sm:
            continue
        payload = sm.group(1)
        if '/LZWDecode' in window:
            try:
                payload = lzw_decode(payload)
            except Exception:
                pass
        else:
            try:
                payload = zlib.decompress(payload)
            except Exception:
                pass
        nm, fm = _N_RE.search(body), _FIRST_RE.search(body)
        if not nm or not fm:
            continue
        n, first = int(nm.group(1)), int(fm.group(1))
        text = payload.decode('latin-1', errors='replace')
        if first > len(text):
            continue
        ints = _INT_RE.findall(text[:first])
        pairs = [(int(ints[2 * i]), int(ints[2 * i + 1]))
                 for i in range(min(n, len(ints) // 2))]
        for i, (num, off) in enumerate(pairs):
            end = first + pairs[i + 1][1] if i + 1 < len(pairs) else len(text)
            objs[num] = text[first + off:end]
        texts.append(text)
    return objs, texts


# -------------------------------- font /Encoding fallback (r5, §9.6.5)

#: Adobe Glyph List subset (public AGL 2.0 spec data — glyph name →
#: unicode).  Covers ASCII names, Latin-1 accents, and the common
#: typographic names real /Differences arrays carry; ``uniXXXX`` /
#: ``uXXXX..`` names resolve by the hex rule in _glyph_char.  The
#: oracle twin imports THIS TABLE as spec data (like the BPE merge
#: table) — the parsing machinery around it stays independent.
AGL_SUBSET = {
    **{name: chr(32 + i) for i, name in enumerate([
        'space', 'exclam', 'quotedbl', 'numbersign', 'dollar', 'percent',
        'ampersand', 'quotesingle', 'parenleft', 'parenright', 'asterisk',
        'plus', 'comma', 'hyphen', 'period', 'slash', 'zero', 'one', 'two',
        'three', 'four', 'five', 'six', 'seven', 'eight', 'nine', 'colon',
        'semicolon', 'less', 'equal', 'greater', 'question', 'at'])},
    **{c: c for c in 'ABCDEFGHIJKLMNOPQRSTUVWXYZ'},
    'bracketleft': '[', 'backslash': '\\', 'bracketright': ']',
    'asciicircum': '^', 'underscore': '_', 'grave': '`',
    **{c: c for c in 'abcdefghijklmnopqrstuvwxyz'},
    'braceleft': '{', 'bar': '|', 'braceright': '}', 'asciitilde': '~',
    # Latin-1 supplement
    'exclamdown': '¡', 'cent': '¢', 'sterling': '£', 'currency': '¤',
    'yen': '¥', 'brokenbar': '¦', 'section': '§', 'dieresis': '¨',
    'copyright': '©', 'ordfeminine': 'ª', 'guillemotleft': '«',
    'logicalnot': '¬', 'registered': '®', 'macron': '¯', 'degree': '°',
    'plusminus': '±', 'acute': '´', 'mu': 'µ', 'paragraph': '¶',
    'periodcentered': '·', 'cedilla': '¸', 'ordmasculine': 'º',
    'guillemotright': '»', 'onequarter': '¼', 'onehalf': '½',
    'threequarters': '¾', 'questiondown': '¿',
    'Agrave': 'À', 'Aacute': 'Á', 'Acircumflex': 'Â', 'Atilde': 'Ã',
    'Adieresis': 'Ä', 'Aring': 'Å', 'AE': 'Æ', 'Ccedilla': 'Ç',
    'Egrave': 'È', 'Eacute': 'É', 'Ecircumflex': 'Ê', 'Edieresis': 'Ë',
    'Igrave': 'Ì', 'Iacute': 'Í', 'Icircumflex': 'Î', 'Idieresis': 'Ï',
    'Eth': 'Ð', 'Ntilde': 'Ñ', 'Ograve': 'Ò', 'Oacute': 'Ó',
    'Ocircumflex': 'Ô', 'Otilde': 'Õ', 'Odieresis': 'Ö', 'multiply': '×',
    'Oslash': 'Ø', 'Ugrave': 'Ù', 'Uacute': 'Ú', 'Ucircumflex': 'Û',
    'Udieresis': 'Ü', 'Yacute': 'Ý', 'Thorn': 'Þ', 'germandbls': 'ß',
    'agrave': 'à', 'aacute': 'á', 'acircumflex': 'â', 'atilde': 'ã',
    'adieresis': 'ä', 'aring': 'å', 'ae': 'æ', 'ccedilla': 'ç',
    'egrave': 'è', 'eacute': 'é', 'ecircumflex': 'ê', 'edieresis': 'ë',
    'igrave': 'ì', 'iacute': 'í', 'icircumflex': 'î', 'idieresis': 'ï',
    'eth': 'ð', 'ntilde': 'ñ', 'ograve': 'ò', 'oacute': 'ó',
    'ocircumflex': 'ô', 'otilde': 'õ', 'odieresis': 'ö', 'divide': '÷',
    'oslash': 'ø', 'ugrave': 'ù', 'uacute': 'ú', 'ucircumflex': 'û',
    'udieresis': 'ü', 'yacute': 'ý', 'thorn': 'þ', 'ydieresis': 'ÿ',
    # common typographic names
    'quoteleft': '‘', 'quoteright': '’', 'quotedblleft': '“',
    'quotedblright': '”', 'quotesinglbase': '‚',
    'quotedblbase': '„', 'endash': '–', 'emdash': '—',
    'bullet': '•', 'ellipsis': '…', 'dagger': '†',
    'daggerdbl': '‡', 'perthousand': '‰', 'guilsinglleft':
    '‹', 'guilsinglright': '›', 'trademark': '™',
    'fi': 'ﬁ', 'fl': 'ﬂ', 'florin': 'ƒ', 'fraction':
    '⁄', 'circumflex': 'ˆ', 'caron': 'ˇ', 'tilde':
    '˜', 'breve': '˘', 'dotaccent': '˙', 'ring': '˚',
    'ogonek': '˛', 'hungarumlaut': '˝', 'OE': 'Œ',
    'oe': 'œ', 'Scaron': 'Š', 'scaron': 'š',
    'Ydieresis': 'Ÿ', 'Zcaron': 'Ž', 'zcaron': 'ž',
    'Euro': '€', 'minus': '−',
    # Greek (Symbol-font Differences show up in real math PDFs)
    'alpha': 'α', 'beta': 'β', 'gamma': 'γ', 'delta': 'δ',
    'epsilon': 'ε', 'lambda': 'λ', 'pi': 'π', 'sigma': 'σ',
    'tau': 'τ', 'phi': 'φ', 'omega': 'ω', 'Delta': 'Δ',
    'Omega': 'Ω', 'Sigma': 'Σ', 'theta': 'θ', 'eta': 'η',
}

_UNI_NAME_RE = re.compile(r'(?:uni([0-9A-Fa-f]{4})|u([0-9A-Fa-f]{4,6}))$')
_ENCODING_NAME_RE = re.compile(r'/Encoding\s*/(WinAnsiEncoding|MacRomanEncoding)')
_ENCODING_REF_RE = re.compile(r'/Encoding\s+(\d+)\s+\d+\s+R')
_ENCODING_DICT_RE = re.compile(r'/Encoding\s*<<')
_BASEENC_RE = re.compile(r'/BaseEncoding\s*/(WinAnsiEncoding|MacRomanEncoding)')
_DIFF_TOKEN_RE = re.compile(r'(\d+)|/([^\s/<>\[\]()%]+)')


def _glyph_char(name: str) -> str:
    got = AGL_SUBSET.get(name)
    if got is not None:
        return got
    m = _UNI_NAME_RE.match(name)
    if m:
        try:
            return chr(int(m.group(1) or m.group(2), 16))
        except ValueError:
            return '�'
    return '�'


def _base_table(enc_name) -> List[str]:
    if enc_name == 'WinAnsiEncoding':
        codec = 'cp1252'
    elif enc_name == 'MacRomanEncoding':
        codec = 'mac_roman'
    else:
        return [chr(c) for c in range(256)]   # identity simplification
    out = []
    for c in range(256):
        try:
            out.append(bytes([c]).decode(codec))
        except UnicodeDecodeError:
            out.append('�')
    return out


def encoding_table(font_body: str, objs: dict):
    """256-entry code→char table from a font's ``/Encoding`` (direct
    name, indirect ref, or inline dict with /BaseEncoding +
    /Differences), or None when the font has no /Encoding."""
    m = _ENCODING_NAME_RE.search(font_body)
    if m:
        return _base_table(m.group(1))
    rm = _ENCODING_REF_RE.search(font_body)
    if rm:
        enc_body = objs.get(int(rm.group(1)))
        if enc_body is None:
            return None
    else:
        dm = _ENCODING_DICT_RE.search(font_body)
        if not dm:
            return None
        close = font_body.find('>>', dm.end())
        enc_body = font_body[dm.end():close if close >= 0 else len(font_body)]
    bm = _BASEENC_RE.search(enc_body)
    table = _base_table(bm.group(1) if bm else None)
    d = enc_body.find('/Differences')
    if d >= 0:
        o = enc_body.find('[', d)
        c = enc_body.find(']', o) if o >= 0 else -1
        if o >= 0:
            code = 0
            for tm in _DIFF_TOKEN_RE.finditer(enc_body[o + 1:c if c >= 0 else len(enc_body)]):
                if tm.group(1) is not None:
                    code = int(tm.group(1))
                else:
                    if 0 <= code <= 255:
                        table[code] = _glyph_char(tm.group(2))
                    code += 1
    return table


def font_cmaps(data: bytes) -> dict:
    """{font resource name: decoder} for every /Font entry that can
    re-encode its show strings — decoder is ``('cmap', code_bytes,
    entries)`` from a parseable /ToUnicode CMap stream, else
    ``('enc', table)`` from a /Encoding fallback (r5).  Objects and
    /Font resource dicts inside ObjStm containers are visible (r5)."""
    view = data.decode('latin-1')
    objs = {int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(view)}
    stm_objs, stm_texts = objstm_objects(view)
    objs.update(stm_objs)   # embedded objects override top-level ones
    names: dict = {}
    for body in [view] + stm_texts:   # resource dicts: view, then ObjStm payloads
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
        if tm:
            cmap_body = objs.get(int(tm.group(1)))
            if cmap_body is not None:
                sm = _STREAM_IN_OBJ_RE.search(cmap_body.encode('latin-1'))
                if sm:
                    payload = sm.group(1)
                    try:
                        payload = zlib.decompress(payload)
                    except Exception:
                        pass
                    cmap = parse_cmap(payload.decode('latin-1', errors='replace'))
                    if cmap:
                        out[name] = ('cmap',) + cmap
                        continue
        table = encoding_table(font_body, objs)
        if table is not None:
            out[name] = ('enc', table)
    return out


def apply_cmap(s: str, decoder) -> str:
    """Re-encode one shown string through a font decoder (ToUnicode
    CMap or /Encoding table)."""
    if decoder[0] == 'enc':
        table = decoder[1]
        return ''.join(table[b] for b in s.encode('latin-1', errors='replace'))
    _kind, code_bytes, entries = decoder
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
