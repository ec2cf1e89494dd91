"""From-scratch CommonMark-style image-link extractor (pure Python).

This is the north-star custom operator: a line/inline tokenizer that
reproduces, for the reference's fixture grammar, the image ``src`` set
that python-markdown's element tree yields via
``root.findall('.//img')`` in the reference's ``ImgExtractor``
(/root/reference/markdown_toolset/transformers/md/transformer.py:19-32)
with extensions ``fenced_code, tables, codehilite, md_in_html``
(transformer.py:47-48).  It is NOT a port of python-markdown — it is a
purpose-built single-pass scanner designed to run inside a vectorized
pandas UDF over Arrow batches.

Supported grammar (scoped to the reference's observable behavior):

* inline images ``![alt](src)`` / ``![alt](src "title")`` /
  ``![alt](<src>)`` with balanced parentheses inside ``src``
  (e.g. ``filters:no_upscale()`` URLs in tests/data/image_mime_incorrect.md);
* reference-style images ``![alt][id]``, collapsed ``![alt][]`` and
  shortcut ``![alt]`` resolved against ``[id]: url`` definitions
  anywhere in the document (ids case-insensitive); unresolved refs are
  literal text (no extraction);
* raw HTML ``<img src=...>`` in *block-level* HTML (``md_in_html``
  semantics: inline raw HTML inside a paragraph is stashed by
  python-markdown and never reaches the tree, so it is NOT extracted);
* suppression inside fenced code blocks (``` / ~~~), indented code
  blocks, and inline code spans;
* backslash-escaped ``\\![`` is literal text;
* document order preserved (the reference's replacement mapping is
  insertion-ordered, image_downloader.py:244).

After extraction, each src is split into ``(link, w, h)`` with the
reference's size-suffix regex (transformer.py:41), preserving its
quirks: a src with a non-suffix space fails the regex and is kept whole
with no size; ``=WxH`` needs at least one space before ``=``.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Dict, List, Optional, Tuple

# verbatim semantics of the reference size-suffix regex (transformer.py:41)
SIZE_SUFFIX_RE = re.compile(r'(?P<link>^\S+)(?: +=(?P<w>\d+)?x(?P<h>\d+)?)?$', re.IGNORECASE)

_FENCE_OPEN_RE = re.compile(r'^ {0,3}(`{3,}|~{3,})(.*)$')
_LINK_DEF_RE = re.compile(r'^ {0,3}\[([^\]]*)\]:\s*(\S+)')
_HTML_BLOCK_RE = re.compile(r'^ {0,3}<[a-zA-Z!/?]')
_TITLE_SPLIT_RE = re.compile(r'^(.*?)[ \t]+(["\'])(.*)\2[ \t]*$', re.DOTALL)


class _ImgSrcGrabber(HTMLParser):
    """First ``src`` attribute with a value of each ``<img>`` start tag
    (semantics of transformers/html/transformer.py:14-31)."""

    def __init__(self) -> None:
        super().__init__()
        self.srcs: List[str] = []

    def parse_marked_section(self, i: int, report: int = 1) -> int:
        # stdlib raises on web soup: AssertionError for unknown marked-
        # section keywords ('<![foo]'), NotImplementedError via
        # ParserBase.error for an invalid name ('<![['). A crawl-scale
        # extractor must not crash per document — treat both like the
        # parser's own bogus-declaration fallback: consume through the
        # next '>' (or buffer-stop at EOF, the feed()-only -1 path).
        try:
            return super().parse_marked_section(i, report)
        except (AssertionError, NotImplementedError):
            j = self.rawdata.find('>', i + 1)
            return j + 1 if j >= 0 else -1

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == 'img':
            for name, value in attrs:
                if name == 'src' and value is not None:
                    self.srcs.append(value)
                    break

    def handle_startendtag(self, tag: str, attrs) -> None:
        self.handle_starttag(tag, attrs)


def extract_html_img_srcs(html_text: str) -> List[str]:
    """All ``<img src=...>`` values in document order (HTML pass, E4)."""
    grabber = _ImgSrcGrabber()
    grabber.feed(html_text)
    return grabber.srcs


def _collect_link_defs(lines: List[str]) -> Dict[str, str]:
    """Reference-style link definitions, with code-block suppression."""
    defs: Dict[str, str] = {}
    fence: Optional[str] = None
    in_paragraph = False
    for line in lines:
        if fence is not None:
            if _is_fence_close(line, fence):
                fence = None
            continue
        if not in_paragraph and ('`' in line[:4] or '~' in line[:4]):
            m = _FENCE_OPEN_RE.match(line)
            if m:
                fence = m.group(1)
                continue
        stripped = line.strip()
        if not stripped:
            in_paragraph = False
            continue
        if not in_paragraph and '[' in line and not line.startswith('    '):
            dm = _LINK_DEF_RE.match(line)
            if dm:
                defs.setdefault(dm.group(1).strip().lower(), dm.group(2))
                continue
        in_paragraph = True
    return defs


def _is_fence_close(line: str, fence: str) -> bool:
    s = line.strip()
    ch = fence[0]
    return s.startswith(ch * len(fence)) and s == ch * len(s) if s else False


def _code_span_ranges(line: str) -> List[Tuple[int, int]]:
    """[start, end) ranges covered by inline code spans (equal-length
    backtick-run pairing, CommonMark rule)."""
    if '`' not in line:
        return []
    runs = [(m.start(), m.end()) for m in re.finditer(r'`+', line)]
    ranges: List[Tuple[int, int]] = []
    i = 0
    while i < len(runs):
        s0, e0 = runs[i]
        n = e0 - s0
        for j in range(i + 1, len(runs)):
            s1, e1 = runs[j]
            if e1 - s1 == n:
                ranges.append((s0, e1))
                i = j
                break
        i += 1
    return ranges


def _in_ranges(pos: int, ranges: List[Tuple[int, int]]) -> bool:
    return any(s <= pos < e for s, e in ranges)


def _scan_balanced(text: str, start: int, open_ch: str, close_ch: str) -> int:
    """Index just past the matching ``close_ch`` for the opener at
    ``start`` (which must point at ``open_ch``), honoring backslash
    escapes; -1 if unbalanced."""
    depth = 0
    i = start
    while i < len(text):
        c = text[i]
        if c == '\\':
            i += 2
            continue
        if c == open_ch:
            depth += 1
        elif c == close_ch:
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    return -1


def _parse_inline_src(content: str) -> str:
    """src from the ``(...)`` body: strip, drop quoted title, unwrap <>."""
    content = content.strip()
    m = _TITLE_SPLIT_RE.match(content)
    if m:
        content = m.group(1).rstrip()
    if len(content) >= 2 and content[0] == '<' and content[-1] == '>':
        content = content[1:-1]
    return content


def _scan_inline_images(line: str, defs: Dict[str, str], out: List[str]) -> None:
    code_ranges = _code_span_ranges(line)
    n = len(line)
    i = 0
    # jump between '![' candidates with C-level find(); a candidate is
    # live unless an odd run of backslashes immediately precedes it
    # (equivalent to the sequential escape-consuming scan: a backslash
    # pairs with the following char, so '!' is consumed iff the run of
    # '\\' ending right before it has odd length)
    while True:
        p = line.find('![', i)
        if p < 0:
            return
        b = p
        while b > 0 and line[b - 1] == '\\':
            b -= 1
        if (p - b) % 2 == 1 or (code_ranges and _in_ranges(p, code_ranges)):
            i = p + 1
            continue
        alt_end = _scan_balanced(line, p + 1, '[', ']')
        if alt_end < 0:
            i = p + 1
            continue
        alt = line[p + 2:alt_end - 1]
        if alt_end < n and line[alt_end] == '(':
            paren_end = _scan_balanced(line, alt_end, '(', ')')
            if paren_end > 0:
                out.append(_parse_inline_src(line[alt_end + 1:paren_end - 1]))
                i = paren_end
                continue
        if alt_end < n and line[alt_end] == '[':
            ref_end = _scan_balanced(line, alt_end, '[', ']')
            if ref_end > 0:
                ref = line[alt_end + 1:ref_end - 1].strip().lower() or alt.strip().lower()
                if ref in defs:
                    out.append(defs[ref])
                i = ref_end
                continue
        # shortcut reference ![alt]
        ref = alt.strip().lower()
        if ref in defs:
            out.append(defs[ref])
        i = alt_end


def extract_md_img_srcs(text: str) -> List[str]:
    """All image ``src`` strings in document order (E1/E2)."""
    lines = text.split('\n')
    defs = _collect_link_defs(lines)
    out: List[str] = []

    fence: Optional[str] = None
    in_paragraph = False
    in_html_block = False
    html_buf: List[str] = []

    def flush_html() -> None:
        nonlocal in_html_block
        if html_buf:
            out.extend(extract_html_img_srcs('\n'.join(html_buf)))
            html_buf.clear()
        in_html_block = False

    for line in lines:
        if fence is not None:
            if _is_fence_close(line, fence):
                fence = None
            continue
        if in_html_block:
            if not line.strip():
                flush_html()
            else:
                html_buf.append(line)
            continue
        if not in_paragraph and ('`' in line[:4] or '~' in line[:4]):
            m = _FENCE_OPEN_RE.match(line)
            if m:
                fence = m.group(1)
                continue
        stripped = line.strip()
        if not stripped:
            in_paragraph = False
            continue
        if not in_paragraph:
            if line.startswith('    ') or line.startswith('\t'):
                continue  # indented code block
            if '<' in line[:4] and _HTML_BLOCK_RE.match(line):
                in_html_block = True
                html_buf.append(line)
                continue
            if '[' in line and _LINK_DEF_RE.match(line):
                continue  # link definition produces no output
        in_paragraph = True
        # fast path: no image-opener on this line → nothing to scan
        # (code-span state never crosses lines in this grammar)
        if '![' in line:
            _scan_inline_images(line, defs, out)
    flush_html()
    return out


def parse_size_suffix(src: str) -> Tuple[str, Optional[int], Optional[int]]:
    """Split trailing `` =WxH`` (transformer.py:41,66-83)."""
    m = SIZE_SUFFIX_RE.search(src)
    if m is None:
        return src, None, None
    w = m.group('w')
    h = m.group('h')
    return m.group('link'), (int(w) if w is not None else None), (int(h) if h is not None else None)


def extract_image_links(text: str) -> List[Tuple[str, Optional[int], Optional[int]]]:
    """Markdown pass: ordered ``(link, w, h)`` triples (E1-E3)."""
    return [parse_size_suffix(src) for src in extract_md_img_srcs(text)]


def extract_html_image_links(html_text: str) -> List[Tuple[str, Optional[int], Optional[int]]]:
    """HTML pass: ordered ``(link, None, None)`` — the HTML transformer
    has no size-suffix parsing (transformers/html/transformer.py:41-67)."""
    return [(src, None, None) for src in extract_html_img_srcs(html_text)]
