"""From-scratch WARC/1.0 response reader — the Common-Crawl source tier.

WARC (ISO 28500) is the interchange format the big public crawls ship:
a ``.warc.gz`` file is a sequence of records, each one (in the CC
layout) compressed as its OWN gzip member so a reader can seek to a
record offset; a record is a version line (``WARC/1.0``), header
lines, a blank line, then exactly ``Content-Length`` payload bytes and
a ``\\r\\n\\r\\n`` trailer.  ``response`` records carry the raw HTTP
response (status line + headers + body) as their payload.

This module is stdlib-only and from scratch (the reference tool —
artiomn/markdown_articles_tool — has no crawl-source tier at all; its
sources are local/remote single articles, ``www_tools.py``).  The
INDEPENDENT second implementation used by the driver's hash gate
parses the same bytes with entirely different machinery —
``gzip.GzipFile`` member concatenation, ``email.parser`` WARC headers,
and ``http.client.HTTPResponse`` over a fake socket for the HTTP layer
— in ``tools/oracle_kernels.warc_responses_seq``.

Spec (shared with the twin)
---------------------------

Container:

* input starting with the gzip magic (``1f 8b``) is decompressed as
  CONCATENATED gzip members (the CC record-per-member layout and a
  whole-file gzip both land here); anything else is taken as plain
  WARC bytes.  Trailing non-gzip garbage after the last member is
  dropped (resilience; out of corpus).

WARC records:

* a record starts at a ``WARC/`` version line; its headers are
  ``Name: value`` lines (name lowercased, FIRST occurrence of a name
  wins, lines without ``:`` ignored) until the first empty line;
* ``Content-Length`` (mandatory per the standard) gives the exact
  payload size; the reader then skips the ``\\r\\n\\r\\n`` record
  trailer.  A record whose version line or Content-Length is missing
  or malformed is skipped by resyncing to the next ``WARC/``
  occurrence; a record whose payload is TRUNCATED (fewer bytes remain
  than Content-Length — a cut-short transfer) is dropped and parsing
  ends (it was the last).

Response extraction (``warc_responses``):

* only records with ``WARC-Type: response`` are emitted, in file
  order, with a 0-based ordinal among emitted records;
* ``url`` = ``WARC-Target-URI`` with one layer of ``<...>`` angle
  brackets stripped (the standard permits both forms);
  ``warc_date`` = the ``WARC-Date`` header value verbatim;
* the payload is parsed as an HTTP response: status line
  (``HTTP/x.y CODE [reason]`` — unparseable code drops the record),
  headers (lowercased, first-wins), body = everything after the blank
  line.  The WARC Content-Length is authoritative for the body extent;
  the HTTP Content-Length header is not consulted (CC writes it
  accurately — divergence out of corpus);
* ``Transfer-Encoding: chunked`` bodies are de-chunked (hex size
  lines, ``;ext`` chunk extensions ignored, terminated by a 0 chunk;
  trailers ignored).  Malformed chunk framing falls back to the raw
  body bytes (out of corpus);
Revisit extraction (``warc_revisits``) — the CC URL-agnostic-dedup
record type (an identical refetch stores only headers + pointers):

* only ``WARC-Type: revisit`` records are emitted, in file order,
  with a 0-based ordinal among emitted revisits;
* ``url`` = the target URI (one ``<...>`` layer stripped, as for
  responses); ``warc_date`` verbatim; ``profile`` = ``WARC-Profile``
  verbatim (``''`` when absent); ``refers_to_uri`` = the
  ``WARC-Refers-To-Target-URI`` header with the same one-layer
  bracket strip; ``refers_to_date`` = ``WARC-Refers-To-Date``
  verbatim;
* ``http_status`` = the payload's HTTP status line code when the
  payload parses as an HTTP block (revisit payloads are the headers
  of the refetch — ``200``/``304``), else ``0``; unlike responses the
  record is NOT dropped on an unparseable payload (the revisit's
  information lives in the WARC headers).

Resolution (``sources/warc.resolve_revisits``) joins
``(refers_to_uri, refers_to_date)`` against the response records'
``(url, warc_date)`` — across files, which is exactly why it is a
join and not a local lookup.

* ``mime`` = the ``Content-Type`` media type (before any ``;``),
  stripped and lowercased; ``''`` when the header is absent;
* ``charset`` = the resolved codec: the ``charset=`` parameter
  (unquoted, case-folded) when ``codecs.lookup`` accepts it, else
  ``utf-8`` — mislabeled charsets therefore decode to deterministic
  mojibake, exactly like a real crawl read;  ``text`` = the body
  decoded with that codec, ``errors='replace'``;
* ``n_bytes`` = the de-chunked body length in bytes.
"""

from __future__ import annotations

import codecs
import re
import zlib
from typing import Iterator, List, Optional, Tuple

_GZIP_MAGIC = b'\x1f\x8b'
_CHARSET_RE = re.compile(r'charset\s*=\s*"?\'?([^";\s\']+)', re.IGNORECASE)


_CHUNK_MIN = 1 << 12   # first chunk fed to a fresh member (4 KiB)
_CHUNK_MAX = 1 << 20   # steady-state chunk for long members (1 MiB)


def _iter_gzip_members(data: bytes) -> Iterator[Tuple[int, int, bytes]]:
    """(offset, compressed_length, inflated_bytes) per gzip member of a
    concatenated-member stream, O(total bytes) — the shared walk under
    ``decompress_warc`` and ``_gzip_member_spans``.

    The naive shape (feed ``data[pos:]`` to each member's
    decompressobj and resume from ``unused_data``) copies the entire
    remaining buffer once per member: a CC record-per-member archive
    (tens of thousands of members) costs O(members × file_size)
    memcpy.  Here each member is fed zero-copy memoryview slices with
    a chunk size that starts small and doubles per feed (reset per
    member): a small member's post-end ``unused_data`` materialization
    is bounded by the FIRST chunk, a large member converges to
    ``_CHUNK_MAX`` feeds — total copying is O(1) amortized per byte
    either way.

    Stops before trailing non-gzip garbage.  A truncated final member
    yields whatever inflated (its compressed_length = the rest of the
    buffer) and ends the walk — same semantics the old per-function
    loops had."""
    view = memoryview(data)
    n = len(data)
    pos = 0
    while pos + 2 <= n and data[pos:pos + 2] == _GZIP_MAGIC:
        d = zlib.decompressobj(wbits=47)  # 32+15: gzip wrapper
        parts: List[bytes] = []
        fed = pos
        chunk = _CHUNK_MIN
        while not d.eof and fed < n:
            piece = view[fed:fed + chunk]
            parts.append(d.decompress(piece))
            fed += len(piece)
            chunk = min(chunk * 2, _CHUNK_MAX)
        parts.append(d.flush())
        if not d.eof:
            # truncated member: partial output, consumed to EOF, done
            yield pos, n - pos, b''.join(parts)
            return
        consumed = (fed - pos) - len(d.unused_data)
        yield pos, consumed, b''.join(parts)
        pos += consumed
    return


def decompress_warc(data: bytes) -> bytes:
    """Concatenated-gzip-member decompression (or pass-through).
    Trailing non-gzip garbage after the last member is dropped."""
    if not data.startswith(_GZIP_MAGIC):
        return data
    return b''.join(m for _off, _clen, m in _iter_gzip_members(data))


def _parse_header_block(block: bytes) -> dict:
    """``Name: value`` lines → lowercased first-wins dict."""
    headers: dict = {}
    for line in block.split(b'\r\n'):
        if not line:
            continue
        name, sep, value = line.partition(b':')
        if not sep:
            continue
        key = name.strip().decode('latin-1').lower()
        headers.setdefault(key, value.strip().decode('latin-1'))
    return headers


def _record_spans(data: bytes) -> Iterator[Tuple[int, int, dict, int, int]]:
    """(start, end, warc_headers, body_start, body_len) per well-formed
    record in PLAIN (already-decompressed) WARC bytes — the shared walk
    under both the payload iterator and the CDX indexer.  ``end`` is
    the position after the payload and its CRLF trailer (the next
    record's scan start).  Honors Content-Length, resyncs past
    malformed headers, stops at a truncated tail."""
    pos = 0
    n = len(data)
    while pos < n:
        if not data.startswith(b'WARC/', pos):
            nxt = data.find(b'WARC/', pos + 1)
            if nxt < 0:
                return
            pos = nxt
            continue
        head_end = data.find(b'\r\n\r\n', pos)
        if head_end < 0:
            return
        # header block minus the version line
        version_end = data.find(b'\r\n', pos)
        headers = _parse_header_block(data[version_end + 2:head_end])
        try:
            length = int(headers['content-length'])
            if length < 0:
                raise ValueError
        except (KeyError, ValueError):
            nxt = data.find(b'WARC/', pos + 1)
            if nxt < 0:
                return
            pos = nxt
            continue
        body_start = head_end + 4
        if body_start + length > n:
            return  # truncated tail record: dropped, parsing ends
        start = pos
        pos = body_start + length
        # the record trailer (two CRLFs); tolerate its absence at EOF
        while pos < n and data.startswith(b'\r\n', pos):
            pos += 2
        yield start, pos, headers, body_start, length


def iter_warc_records(data: bytes) -> Iterator[Tuple[dict, bytes]]:
    """(warc_headers, payload) per record, honoring Content-Length,
    resyncing past malformed headers, stopping at a truncated tail."""
    data = decompress_warc(data)
    for _start, _end, headers, body_start, length in _record_spans(data):
        yield headers, data[body_start:body_start + length]


def _target_uri(headers: dict) -> str:
    url = headers.get('warc-target-uri', '')
    if url.startswith('<') and url.endswith('>'):
        url = url[1:-1]
    return url


def _gzip_member_spans(data: bytes) -> List[Tuple[int, int, bytes]]:
    """(offset, compressed_length, inflated_bytes) per gzip member —
    the O(total bytes) chunked-cursor walk (see _iter_gzip_members)."""
    return list(_iter_gzip_members(data))


def warc_cdx(data: bytes) -> List[Tuple[int, str, str, int, int, bool, str]]:
    """CDX-style record index: (ord, warc_type, url, offset, length,
    addressable, warc_date) per well-formed record, in file order — the offset
    index that turns file-granular crawl splits into record-granular
    ones (seek, slice, hand the slice to the SAME parser).

    ``addressable`` marks rows whose (offset, length) slice of the RAW
    file re-parses to exactly that record: true for the Common-Crawl
    record-per-gzip-member layout (the slice is one gzip member) and
    for plain uncompressed WARC; false for a whole-file gzip, where no
    in-file seek is possible and offsets address the DECOMPRESSED
    stream instead (``read_record_at`` then needs the inflated bytes).
    A gzip member holding several records (or a record not at member
    start) degrades to decompressed-stream addressing too — correct,
    just not seekable.  Ordinals count every well-formed record of any
    WARC-Type (warcinfo/request/response/metadata share the space);
    malformed records are resynced past and a truncated tail is
    dropped, exactly like ``iter_warc_records``.

    ``warc_date`` (the record's verbatim WARC-Date header, '' when
    absent) makes the index answer wayback-style ``closest`` queries
    without re-parsing archives — real CDX(J) lines carry the 14-digit
    timestamp as the second key component for exactly this reason."""
    rows: List[Tuple[int, str, str, int, int, bool, str]] = []

    def emit(spans_src: bytes, base: int, off: int = 0, clen: int = 0,
             member: bool = False) -> None:
        for start, end, headers, _bs, _bl in _record_spans(spans_src):
            if member:
                rows.append((len(rows), headers.get('warc-type', ''),
                             _target_uri(headers), off, clen, True,
                             headers.get('warc-date', '')))
            else:
                rows.append((len(rows), headers.get('warc-type', ''),
                             _target_uri(headers), base + start, end - start,
                             base == 0 and not data.startswith(_GZIP_MAGIC),
                             headers.get('warc-date', '')))

    if data.startswith(_GZIP_MAGIC):
        stream_base = 0
        for off, clen, m in _gzip_member_spans(data):
            spans = list(_record_spans(m))
            if len(spans) == 1 and spans[0][0] == 0:
                emit(m, stream_base, off, clen, member=True)
            else:
                emit(m, stream_base)
            stream_base += len(m)
    else:
        emit(data, 0)
    return rows


def read_record_at(data: bytes, offset: int, length: int,
                   addressable: bool) -> Optional[Tuple[dict, bytes]]:
    """Seek-read one record through its CDX row: slice the raw file
    (addressable rows — plain bytes or one gzip member) or the
    decompressed stream (whole-file gzip), then run the ordinary
    record walk on the slice."""
    src = data[offset:offset + length] if addressable else \
        decompress_warc(data)[offset:offset + length]
    for headers, payload in iter_warc_records(src):
        return headers, payload
    return None


def dechunk(body: bytes) -> bytes:
    """Transfer-Encoding: chunked decoder; raises ValueError on
    malformed framing (caller falls back to the raw bytes)."""
    out: List[bytes] = []
    pos = 0
    n = len(body)
    while True:
        line_end = body.find(b'\r\n', pos)
        if line_end < 0:
            raise ValueError('chunk size line missing')
        size_tok = body[pos:line_end].split(b';', 1)[0].strip()
        size = int(size_tok, 16)  # ValueError propagates
        pos = line_end + 2
        if size == 0:
            return b''.join(out)  # trailers (if any) ignored
        if pos + size > n:
            raise ValueError('chunk truncated')
        out.append(body[pos:pos + size])
        pos += size
        if body[pos:pos + 2] != b'\r\n':
            raise ValueError('chunk terminator missing')
        pos += 2


def parse_http_response(block: bytes) -> Optional[Tuple[int, dict, bytes]]:
    """(status, headers, body) from a raw HTTP response, or None when
    the status line / header framing is unparseable."""
    head_end = block.find(b'\r\n\r\n')
    if head_end < 0:
        return None
    status_end = block.find(b'\r\n')
    parts = block[:status_end].split(None, 2)
    if len(parts) < 2 or not parts[0].startswith(b'HTTP/'):
        return None
    try:
        status = int(parts[1])
    except ValueError:
        return None
    headers = _parse_header_block(block[status_end + 2:head_end])
    body = block[head_end + 4:]
    if 'chunked' in headers.get('transfer-encoding', '').lower():
        try:
            body = dechunk(body)
        except ValueError:
            pass  # malformed framing: raw bytes (out of corpus)
    body = _content_decode(body, headers.get('content-encoding', ''))
    return status, headers, body


def _content_decode(body: bytes, encoding: str) -> bytes:
    """``Content-Encoding`` decode, applied AFTER de-chunking (transfer
    coding wraps content coding): ``gzip``/``x-gzip`` inflates a gzip
    wrapper; ``deflate`` tries the zlib wrapper then raw deflate (the
    classic broken-server form); anything else — identity, br,
    multi-codings — and any decode error leaves the bytes as stored
    (a crawl keeps what it got)."""
    enc = encoding.strip().lower()
    if enc in ('gzip', 'x-gzip'):
        try:
            d = zlib.decompressobj(wbits=47)
            return d.decompress(body) + d.flush()
        except zlib.error:
            return body
    if enc == 'deflate':
        for wbits in (15, -15):
            try:
                return zlib.decompress(body, wbits)
            except zlib.error:
                continue
        return body
    return body


def resolve_charset(content_type: str) -> str:
    """The codec actually used for decoding: the charset= parameter
    when the codec registry accepts it, else utf-8."""
    m = _CHARSET_RE.search(content_type)
    if m:
        try:
            return codecs.lookup(m.group(1)).name
        except LookupError:
            pass
    return 'utf-8'


def _build_derived(entries: List[Tuple[str, str, bytes]], rec_type: str,
                   ctype: str, info_extra: str,
                   software: str = 'graft-synth/1.0') -> bytes:
    """Shared derived-archive writer (WET/WAT): warcinfo + one
    ``rec_type`` record per (url, warc_date, payload) entry, each its
    OWN gzip member (mtime=0: byte-deterministic)."""
    import gzip

    def record(rtype: str, target: str, date: str, payload: bytes,
               ct: str) -> bytes:
        head = f'WARC/1.0\r\nWARC-Type: {rtype}\r\n'
        if target:
            head += f'WARC-Target-URI: {target}\r\n'
        if date:
            head += f'WARC-Date: {date}\r\n'
        head += f'Content-Type: {ct}\r\nContent-Length: {len(payload)}\r\n\r\n'
        # WARC headers are UTF-8 per spec; latin-1 would raise on a
        # non-latin-1 crawl URL (byte-identical for ASCII headers)
        return gzip.compress(head.encode('utf-8') + payload + b'\r\n\r\n', mtime=0)

    info = (f'software: {software}\r\n'
            'format: WARC File Format 1.0\r\n'
            f'{info_extra}').encode('latin-1')
    out = [record('warcinfo', '', '', info, 'application/warc-fields')]
    for url, date, payload in entries:
        out.append(record(rec_type, url, date, payload, ctype))
    return b''.join(out)


def build_wat_records(entries: List[Tuple[str, str, str]],
                      software: str = 'graft-synth/1.0') -> bytes:
    """From-scratch WAT writer — the Common-Crawl metadata layout:
    one ``WARC-Type: metadata`` record per (url, warc_date, json_text)
    entry with ``application/json`` payloads; same gzip-member
    framing as the WET writer, so ``iter_warc_records``/``warc_cdx``
    walk and address the result identically."""
    return _build_derived(
        [(u, d, j.encode('utf-8')) for u, d, j in entries],
        'metadata', 'application/json', 'conversion: metadata extraction\r\n',
        software)


def build_wet(entries: List[Tuple[str, str, str]],
              software: str = 'graft-synth/1.0') -> bytes:
    """From-scratch WET writer — the Common-Crawl derived-text layout:
    a warcinfo record then one ``WARC-Type: conversion`` record per
    (url, warc_date, text) entry, each record its OWN gzip member
    (mtime=0: byte-deterministic), payload = the utf-8 text with
    ``Content-Type: text/plain``.  Symmetric with the reader:
    ``iter_warc_records`` walks the result member-for-member, and
    ``warc_cdx`` addresses every record by compressed extent."""
    return _build_derived(
        [(u, d, t.encode('utf-8')) for u, d, t in entries],
        'conversion', 'text/plain', 'conversion: text extraction\r\n', software)


def build_warc(entries, software: str = 'graft-synth/1.0') -> bytes:
    """From-scratch WARC response/revisit WRITER — the output side of
    the CC dedup pipeline (a deduplicated crawl republishes originals
    as ``response`` records and identical later captures as
    ``revisit`` pointers).  ``entries`` rows are
    ``(kind, url, warc_date, http_status, mime, text, refers_to_uri,
    refers_to_date)`` with kind ∈ {'response', 'revisit'}:

    * ``response`` → payload = a canonical HTTP block
      (``HTTP/1.1 <status> OK`` + ``Content-Type: <mime>;
      charset=utf-8`` + Content-Length) over the utf-8 text — so a
      reparse recovers status/mime/text exactly;
    * ``revisit`` → headers-only HTTP payload plus ``WARC-Profile:
      …/identical-payload-digest`` and the ``WARC-Refers-To-*``
      pointers.

    Same framing as the WET/WAT writers: warcinfo first, every record
    its OWN gzip member (mtime=0, byte-deterministic), so
    ``iter_warc_records``/``warc_cdx`` walk and seek-address the
    result, ``warc_responses``/``warc_revisits`` read it back, and
    ``resolve_revisits`` restores every demoted capture's text."""
    import gzip

    def record(head_extra: str, rtype: str, target: str, date: str,
               payload: bytes, ct: str) -> bytes:
        head = f'WARC/1.0\r\nWARC-Type: {rtype}\r\n'
        if target:
            head += f'WARC-Target-URI: {target}\r\n'
        if date:
            head += f'WARC-Date: {date}\r\n'
        head += head_extra
        head += f'Content-Type: {ct}\r\nContent-Length: {len(payload)}\r\n\r\n'
        # WARC headers are UTF-8 per spec; latin-1 would raise on a
        # non-latin-1 crawl URL (byte-identical for ASCII headers)
        return gzip.compress(head.encode('utf-8') + payload + b'\r\n\r\n', mtime=0)

    info = (f'software: {software}\r\n'
            'format: WARC File Format 1.0\r\n'
            'operation: digest deduplication\r\n').encode('latin-1')
    out = [record('', 'warcinfo', '', '', info, 'application/warc-fields')]
    for kind, url, date, status, mime, text, ref_uri, ref_date in entries:
        if kind == 'revisit':
            payload = (f'HTTP/1.1 {int(status)} OK\r\n'
                       f'Content-Type: {mime}; charset=utf-8\r\n\r\n').encode('latin-1')
            extra = ('WARC-Profile: http://netpreserve.org/warc/1.0/revisit/'
                     'identical-payload-digest\r\n'
                     f'WARC-Refers-To-Target-URI: {ref_uri}\r\n'
                     f'WARC-Refers-To-Date: {ref_date}\r\n')
            out.append(record(extra, 'revisit', url, date, payload,
                              'application/http; msgtype=response'))
        else:
            body = (text or '').encode('utf-8')
            payload = (f'HTTP/1.1 {int(status)} OK\r\n'
                       f'Content-Type: {mime}; charset=utf-8\r\n'
                       f'Content-Length: {len(body)}\r\n\r\n').encode('latin-1') + body
            out.append(record('', 'response', url, date, payload,
                              'application/http; msgtype=response'))
    return b''.join(out)


def warc_responses(data: bytes) -> List[Tuple[int, str, str, int, str, str, int, str]]:
    """(rec_ord, url, warc_date, http_status, mime, charset, n_bytes,
    text) per response record, in file order."""
    out: List[Tuple[int, str, str, int, str, str, int, str]] = []
    for headers, payload in iter_warc_records(data):
        if headers.get('warc-type') != 'response':
            continue
        parsed = parse_http_response(payload)
        if parsed is None:
            continue
        status, http_headers, body = parsed
        url = _target_uri(headers)
        ctype = http_headers.get('content-type', '')
        mime = ctype.split(';', 1)[0].strip().lower()
        charset = resolve_charset(ctype)
        text = body.decode(charset, errors='replace')
        out.append(
            (len(out), url, headers.get('warc-date', ''), status, mime,
             charset, len(body), text)
        )
    return out


def warc_redirects(data: bytes) -> List[Tuple[int, str, str, int, str]]:
    """(rec_ord, url, warc_date, http_status, location) per response
    record with a 3xx status, in file order — the crawl's redirect
    edges, the input to chain resolution.

    Spec (twin: tools/oracle_kernels.warc_redirects_seq on the
    email.parser + http.client machinery family):

    * the walk IS the ``warc_responses`` walk — same record resync,
      truncated-tail drop, bracket-stripped target, dropped record on
      an unparseable status line — and ``rec_ord`` shares that walk's
      ordinal space (every parseable response counts, only 3xx rows
      emit), so a redirect row joins back to its response row;
    * ``location`` = the verbatim Location header value, first
      occurrence wins (the shared duplicate-header rule), '' when the
      redirect carries none (a dead redirect — legal HTTP; chain
      resolution classifies it).
    """
    out: List[Tuple[int, str, str, int, str]] = []
    rec_ord = 0
    for headers, payload in iter_warc_records(data):
        if headers.get('warc-type') != 'response':
            continue
        parsed = parse_http_response(payload)
        if parsed is None:
            continue
        status, http_headers, _body = parsed
        ord_ = rec_ord
        rec_ord += 1
        if 300 <= status <= 399:
            out.append((ord_, _target_uri(headers),
                        headers.get('warc-date', ''), status,
                        http_headers.get('location', '').strip()))
    return out


def _strip_brackets(url: str) -> str:
    if url.startswith('<') and url.endswith('>'):
        return url[1:-1]
    return url


def warc_revisits(data: bytes) -> List[Tuple[int, str, str, str, str, str, int]]:
    """(rec_ord, url, warc_date, profile, refers_to_uri,
    refers_to_date, http_status) per ``WARC-Type: revisit`` record, in
    file order — see the module docstring's revisit spec.  The twin is
    ``tools/oracle_kernels.warc_revisits_seq`` (email.parser +
    http.client machinery)."""
    out: List[Tuple[int, str, str, str, str, str, int]] = []
    for headers, payload in iter_warc_records(data):
        if headers.get('warc-type') != 'revisit':
            continue
        parsed = parse_http_response(payload)
        status = parsed[0] if parsed is not None else 0
        out.append((
            len(out),
            _target_uri(headers),
            headers.get('warc-date', ''),
            headers.get('warc-profile', ''),
            _strip_brackets(headers.get('warc-refers-to-target-uri', '')),
            headers.get('warc-refers-to-date', ''),
            status,
        ))
    return out
