"""Main-content extraction from raw HTML: boilerplate strip via DOM
heuristics, from scratch on stdlib ``html.parser`` (no bs4/lxml/
readability/trafilatura in this container — and the north rule asks
for a from-scratch pipeline, not a port).

This is the north-rule operator family for the CC-style pages table
(url, warc_ts, html, text, lang): strip script/style/nav/header/
footer/... subtrees, segment the remaining text at block-level tag
boundaries, score each block by length + link density, and emit the
kept blocks as the document's main text plus per-block spans.

DETERMINISTIC SPEC (the sequential oracle in tools/oracle_kernels.py
reimplements exactly this, independently — divergence fails
tests/test_kernel_equivalence.py):

* bytes → str: utf-8, errors='replace'.
* a subtree is DROPPED when its root tag is in DROP_TAGS, or (r4)
  when any ``class``/``id`` attribute value contains a
  NEGATIVE_HINTS token as a lowercase substring (comment threads,
  sidebars, share bars, cookie banners etc. — the structural
  length/density rule alone cannot see them; boilerpipe-style hint
  lists accept the substring-overreach risk, e.g. 'commentary').
  Drop scope: a stack of [root_tag, same_tag_depth] — while
  dropping, only opens/closes of the INNERMOST root's tag adjust its
  depth; the subtree ends when its root tag closes at depth 0.
  Unmatched drop-tag closes outside any drop are ignored; <t/> of a
  drop root is a no-op (opens and closes immediately).
* BLOCK_TAGS delimit blocks.  A stack of open block tags attributes
  each flushed segment to its innermost enclosing block tag ('body'
  when none).  Opening a block tag flushes the pending segment first;
  closing one flushes, then pops the stack down through the matched
  tag (unclosed intermediates are popped silently); a close with no
  matching open is ignored.  <br>/<hr> flush the pending segment
  without touching the stack.
* text pieces accumulate with their raw length; pieces arriving while
  inside >=1 <a> also count toward the block's link length (the <a>
  depth is counted independently of blocks; entities are already
  resolved by convert_charrefs).
* a flushed segment becomes a block iff its whitespace-normalized
  text (' '.join(raw.split())) is non-empty.
* CORE keep rule (integer arithmetic — no float threshold edges):
  core = len(norm) >= 25 AND 3 * link_raw_len <= total_raw_len.
* CONTINUATION rule (r5): a non-core block is also kept iff it is
  link-sparse (3 * link_raw <= total_raw), shares its tag with the
  document-adjacent block (ord +/- 1), and that neighbor is kept —
  chaining allowed, i.e. the final kept set is the fixpoint: every
  maximal run of same-tag link-sparse blocks touching a core block
  on either end is kept in full.  This recovers tweet-length
  paragraphs inside articles (the r4 short-article recall gap)
  while leaving link-dense nav/list items dropped: eligibility
  still requires the density test, and isolated short boilerplate
  with no kept same-tag neighbor stays out.
* main_text = '\n'.join(norm of kept blocks); spans carry
  (ord, tag, n_chars, link_density, kept, start, end) where
  start/end are [start, end) offsets into main_text for kept blocks
  and -1 for dropped ones; link_density = round(link/total, 6).
"""

from __future__ import annotations

from dataclasses import dataclass
from html.parser import HTMLParser
from typing import List, Tuple

DROP_TAGS = frozenset(
    'script style noscript template svg head nav header footer aside form '
    'iframe button select option'.split()
)
# class/id substring hints marking boilerplate subtrees (r4): the
# structural rule keeps link-sparse prose wherever it sits, so comment
# threads / cookie banners / share bars need the semantic-ish signal
# every production extractor uses
NEGATIVE_HINTS = frozenset(
    'comment sidebar widget share social related promo advert banner '
    'breadcrumb pagination pager cookie consent menu popup newsletter '
    'subscribe'.split()
)


def _hinted_drop(attrs) -> bool:
    for name, value in attrs:
        if name in ('class', 'id') and value:
            v = value.lower()
            for h in NEGATIVE_HINTS:
                if h in v:
                    return True
    return False
BLOCK_TAGS = frozenset(
    'p div li h1 h2 h3 h4 h5 h6 td th article section blockquote pre main '
    'figcaption dd dt ul ol table tr body'.split()
)
MIN_CHARS = 25
# kept iff 3*link_len <= total_len (integer form of density <= 1/3)
LINK_DENSITY_NUM = 3


@dataclass
class Block:
    ord: int
    tag: str
    text: str           # whitespace-normalized
    total_raw: int
    link_raw: int
    kept: bool = False  # finalized by _finalize_keeps (core + continuation)

    @property
    def core(self) -> bool:
        return len(self.text) >= MIN_CHARS and LINK_DENSITY_NUM * self.link_raw <= self.total_raw

    @property
    def link_density(self) -> float:
        return round(self.link_raw / self.total_raw, 6) if self.total_raw else 0.0


def _finalize_keeps(blocks: List['Block']) -> None:
    """Core rule, then the continuation fixpoint (module docstring).

    One forward + one backward sweep reaches the fixpoint: keeps only
    ever propagate through a contiguous run of same-tag link-sparse
    blocks, so rightward spread from any kept block is complete after
    the forward pass and leftward spread after the backward pass.
    """
    for b in blocks:
        b.kept = b.core

    def eligible(b: 'Block') -> bool:
        return LINK_DENSITY_NUM * b.link_raw <= b.total_raw

    for i in range(1, len(blocks)):
        b, prev = blocks[i], blocks[i - 1]
        if not b.kept and prev.kept and prev.tag == b.tag and eligible(b):
            b.kept = True
    for i in range(len(blocks) - 2, -1, -1):
        b, nxt = blocks[i], blocks[i + 1]
        if not b.kept and nxt.kept and nxt.tag == b.tag and eligible(b):
            b.kept = True


class _Extractor(HTMLParser):
    def parse_marked_section(self, i: int, report: int = 1) -> int:
        # Same web-soup armor as mdparse._ImgSrcGrabber (r4, DIVERGENCES
        # #14): the stdlib parser raises AssertionError on unknown
        # marked-section keywords ('<![foo]') and NotImplementedError on
        # invalid names ('<![[') — a crawl-scale extractor must survive
        # one bad document per task. Fall back to the parser's own
        # bogus-declaration behavior: skip through the next '>', or
        # return -1 (wait for more data / EOF) when none is buffered.
        try:
            return super().parse_marked_section(i, report)
        except (AssertionError, NotImplementedError):
            j = self.rawdata.find('>', i + 1)
            return j + 1 if j >= 0 else -1

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.drop_stack: List[List] = []   # [root_tag, same_tag_depth]
        self.link_depth = 0
        self.block_stack: List[str] = []
        self.pieces: List[Tuple[str, bool]] = []  # (raw text, in_link)
        self.blocks: List[Block] = []

    # ------------------------------------------------------- segment fold
    def _flush(self, tag: str) -> None:
        if not self.pieces:
            return
        raw = ''.join(p for p, _ in self.pieces)
        link_raw = sum(len(p) for p, in_link in self.pieces if in_link)
        self.pieces = []
        norm = ' '.join(raw.split())
        if norm:
            self.blocks.append(Block(len(self.blocks), tag, norm, len(raw), link_raw))

    def _cur_tag(self) -> str:
        return self.block_stack[-1] if self.block_stack else 'body'

    # ------------------------------------------------------ parser events
    def handle_starttag(self, tag, attrs):
        if self.drop_stack:
            if tag == self.drop_stack[-1][0]:
                self.drop_stack[-1][1] += 1
            return
        if tag in DROP_TAGS or _hinted_drop(attrs):
            self.drop_stack.append([tag, 1])
            return
        if tag == 'a':
            self.link_depth += 1
        elif tag in ('br', 'hr'):
            self._flush(self._cur_tag())
        elif tag in BLOCK_TAGS:
            self._flush(self._cur_tag())
            self.block_stack.append(tag)

    def handle_endtag(self, tag):
        if self.drop_stack:
            if tag == self.drop_stack[-1][0]:
                self.drop_stack[-1][1] -= 1
                if not self.drop_stack[-1][1]:
                    self.drop_stack.pop()
            return
        if tag in DROP_TAGS:
            return      # unmatched drop-tag close outside any drop
        if tag == 'a':
            if self.link_depth:
                self.link_depth -= 1
        elif tag in BLOCK_TAGS and tag in self.block_stack:
            self._flush(tag)
            while self.block_stack.pop() != tag:
                pass

    def handle_startendtag(self, tag, attrs):
        # <t/> of a drop root opens and closes immediately: no-op; for
        # br/hr it flushes like the start event; block tags <p/> flush
        # but leave the stack alone (open+close cancels)
        if self.drop_stack or tag in DROP_TAGS or _hinted_drop(attrs):
            return
        if tag in ('br', 'hr') or tag in BLOCK_TAGS:
            self._flush(self._cur_tag())

    def handle_data(self, data):
        if self.drop_stack or not data:
            return
        self.pieces.append((data, self.link_depth > 0))


def extract_blocks(html: bytes | str | None) -> List[Block]:
    """All blocks (kept and dropped) of one HTML document."""
    if html is None:
        return []
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode('utf-8', errors='replace')
    p = _Extractor()
    p.feed(html)
    p.close()
    p._flush(p._cur_tag())  # trailing text outside any block
    _finalize_keeps(p.blocks)
    return p.blocks


def main_text(blocks: List[Block]) -> str:
    return '\n'.join(b.text for b in blocks if b.kept)


def spans(blocks: List[Block]) -> List[tuple]:
    """(ord, tag, n_chars, link_density, kept, start, end) rows; offsets
    index into ``main_text`` for kept blocks, -1 otherwise."""
    out = []
    off = 0
    for b in blocks:
        if b.kept:
            start, end = off, off + len(b.text)
            off = end + 1  # the joining '\n'
        else:
            start, end = -1, -1
        out.append((b.ord, b.tag, len(b.text), b.link_density, b.kept, start, end))
    return out
