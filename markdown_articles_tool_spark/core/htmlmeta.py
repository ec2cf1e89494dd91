"""HTML page metadata + outlink extraction — the crawl-frontier tier.

Two kernels every web-scale pipeline needs in front of ranking and
recrawl scheduling:

* ``extract_meta(html)`` — the head signals an index/crawl policy
  reads: title, meta description, canonical URL, og:title, and the
  robots noindex/nofollow directives;
* ``extract_outlinks(base_url, html)`` — the ``<a href>`` edges in
  document order with anchor text and a from-scratch relative→absolute
  resolution (the crawl frontier's input; feeds the host link graph
  and PageRank in ``training/linkgraph.py``).

From-scratch on the stdlib ``HTMLParser`` (same tolerant grammar and
marked-section crash armor as the other extraction kernels — r4,
DIVERGENCES #14); the INDEPENDENT second implementation (flat
event-fold + an RFC-style string-munching resolver instead of this
module's parser subclass + segment-stack resolver) lives in
``tools/oracle_kernels.html_meta_seq`` / ``outlinks_seq`` for the
driver's hash gate.

Reference scope note: the reference tool (artiomn/markdown_articles_tool)
stops at image links inside one article (www_tools.py, transformers/);
page-level metadata and the outlink graph have no counterpart there —
this module is engine-added surface for the north rule's CC-style
pages table.

Metadata spec (shared with the twin):

* ``title``: character data of the FIRST ``<title>`` element (capture
  starts at its open tag, ends at the first ``</title>``; runs to EOF
  if never closed; later titles are ignored), whitespace-normalized
  via ``' '.join(s.split())``; '' if absent.
* ``meta_description`` / ``og_title``: ``content`` attribute of the
  first ``<meta>`` whose ``name`` == 'description' (resp. ``property``
  == 'og:title') case-insensitively after strip; whitespace-normalized;
  '' if absent or content-less.
* ``canonical``: ``href`` (stripped, NOT otherwise normalized) of the
  first ``<link>`` whose ``rel`` attribute, lowercased and whitespace-
  split, contains the token ``canonical``; '' if absent.
* ``robots_noindex`` / ``robots_nofollow``: the first ``<meta>`` with
  ``name`` == 'robots' is split on ',', each token stripped and
  lowercased; the flags are token membership of 'noindex' / 'nofollow'.
  No robots meta → both False.
* Within one tag, the FIRST occurrence of an attribute name wins;
  valueless attributes count as absent for value reads.  ``<x/>``
  self-closed tags behave as open+close.  Character references are
  unescaped (stdlib ``convert_charrefs`` + attribute unescaping).

Outlink spec (shared with the twin):

* every ``<a>`` start tag opens an anchor; a new ``<a>`` implicitly
  closes the previous one (HTML forbids nesting), as do ``</a>`` and
  EOF; the anchor's text is all character data while it is open,
  whitespace-normalized.
* an anchor is EMITTED iff its (first-wins) ``href`` attribute has a
  value whose strip() survives the filter: not empty, not a bare
  fragment (leading '#'), and — when it carries a scheme
  (``^[A-Za-z][A-Za-z0-9+.-]*:``) — the scheme is http/https
  (mailto:, javascript:, data:, … are dropped).
* ``ord`` numbers the EMITTED links per document, 0-based, in
  document order of the open tag.
* resolution against the page URL (``resolve_href``):
  - absolute http(s) hrefs pass through untouched;
  - a non-hierarchical base (no '://') cannot anchor a relative link:
    the link is dropped;
  - ``//host/...`` → base scheme (lowercased) + ':' + href;
  - ``/path`` → scheme://authority + dot-normalized path (query kept);
  - ``?query`` → scheme://authority + base path (dot-normalized) + href;
  - otherwise → merge: base path up to and including its last '/',
    plus the href; dot-normalize the path component.
  - dot-normalization (``remove_dot_segments``): '.' segments vanish,
    '..' pops the previous segment (clamped at root), empty segments
    are preserved; if the input path's FINAL segment is '.' or '..'
    the result keeps a trailing slash (RFC 3986 §5.2.4 semantics).
  - the fragment ('#' and beyond) is stripped from every resolved
    result; the base path component is everything after the authority
    up to the first '?' or '#' ('/' when empty).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import List, Optional, Tuple

_SCHEME_RE = re.compile(r'^[A-Za-z][A-Za-z0-9+.\-]*:')
_HTTP_SCHEMES = ('http', 'https')


# ------------------------------------------------------------------ URLs


def _split_base(base: str) -> Optional[Tuple[str, str, str]]:
    """(scheme_lower, authority, path) of a hierarchical base URL, or
    None when the base has no '://' (nothing relative can resolve)."""
    m = base.find('://')
    if m < 0:
        return None
    scheme = base[:m].lower()
    rest = base[m + 3:]
    end = len(rest)
    for ch in ('/', '?', '#'):
        p = rest.find(ch)
        if 0 <= p < end:
            end = p
    auth = rest[:end]
    tail = rest[end:]
    pend = len(tail)
    for ch in ('?', '#'):
        p = tail.find(ch)
        if 0 <= p < pend:
            pend = p
    path = tail[:pend]
    if not path.startswith('/'):
        path = '/'
    return scheme, auth, path


def remove_dot_segments(path: str) -> str:
    """Segment-stack dot-normalizer (the twin uses an RFC-style string
    muncher instead — same spec, different machinery)."""
    segs = path.split('/')[1:] if path.startswith('/') else path.split('/')
    stack: List[str] = []
    for seg in segs:
        if seg == '.':
            continue
        if seg == '..':
            if stack:
                stack.pop()
            continue
        stack.append(seg)
    if segs and segs[-1] in ('.', '..'):
        stack.append('')
    return '/' + '/'.join(stack)


def _norm_path_query(pathq: str) -> str:
    """Dot-normalize the path component of a path[?query] string."""
    q = pathq.find('?')
    if q >= 0:
        return remove_dot_segments(pathq[:q]) + pathq[q:]
    return remove_dot_segments(pathq)


def resolve_href(base: str, href: str) -> Optional[str]:
    """Resolved absolute URL per the module spec, or None when the
    link must be dropped (empty / fragment-only / non-http scheme /
    unresolvable against a non-hierarchical base)."""
    href = href.strip()
    if not href or href.startswith('#'):
        return None
    m = _SCHEME_RE.match(href)
    if m:
        scheme = href[:m.end() - 1].lower()
        if scheme not in _HTTP_SCHEMES:
            return None
        out = href
    else:
        parts = _split_base(base)
        if parts is None:
            return None
        b_scheme, b_auth, b_path = parts
        if href.startswith('//'):
            out = b_scheme + ':' + href
        elif href.startswith('/'):
            out = b_scheme + '://' + b_auth + _norm_path_query(href)
        elif href.startswith('?'):
            out = b_scheme + '://' + b_auth + remove_dot_segments(b_path) + href
        else:
            merged = b_path[:b_path.rfind('/') + 1] + href
            out = b_scheme + '://' + b_auth + _norm_path_query(merged)
    frag = out.find('#')
    if frag >= 0:
        out = out[:frag]
    return out


# ------------------------------------------------------------ the parser


def _first_attrs(attrs) -> dict:
    d: dict = {}
    for name, value in attrs:
        if name not in d:
            d[name] = value
    return d


class _MetaGrabber(HTMLParser):
    def parse_marked_section(self, i: int, report: int = 1) -> int:
        # '<![foo]' web-soup armor (r4, DIVERGENCES #14)
        try:
            return super().parse_marked_section(i, report)
        except (AssertionError, NotImplementedError):
            j = self.rawdata.find('>', i + 1)
            return j + 1 if j >= 0 else -1

    def __init__(self, base_url: str):
        super().__init__(convert_charrefs=True)
        self.base = base_url
        self.title_parts: Optional[List[str]] = None   # open capture
        self.title: Optional[str] = None               # finished capture
        self.description: Optional[str] = None
        self.og_title: Optional[str] = None
        self.canonical: Optional[str] = None
        self.robots: Optional[str] = None
        self.links: List[Tuple[int, str, str, str]] = []
        self._a_href: Optional[str] = None
        self._a_parts: Optional[List[str]] = None

    # -- anchors -------------------------------------------------------
    def _close_anchor(self):
        if self._a_parts is None:
            return
        href, parts = self._a_href, self._a_parts
        self._a_href = self._a_parts = None
        if href is None:
            return
        resolved = resolve_href(self.base, href)
        if resolved is None:
            return
        self.links.append(
            (len(self.links), href.strip(), resolved, ' '.join(''.join(parts).split()))
        )

    # -- events --------------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag == 'a':
            self._close_anchor()
            d = _first_attrs(attrs)
            self._a_href = d.get('href')
            self._a_parts = []
        elif tag == 'title':
            if self.title is None and self.title_parts is None:
                self.title_parts = []
        elif tag == 'meta':
            d = _first_attrs(attrs)
            name = (d.get('name') or '').strip().lower()
            prop = (d.get('property') or '').strip().lower()
            content = d.get('content')
            if name == 'description' and self.description is None and content is not None:
                self.description = ' '.join(content.split())
            elif name == 'robots' and self.robots is None and content is not None:
                self.robots = content
            if prop == 'og:title' and self.og_title is None and content is not None:
                self.og_title = ' '.join(content.split())
        elif tag == 'link':
            d = _first_attrs(attrs)
            rel = (d.get('rel') or '').lower().split()
            href = d.get('href')
            if 'canonical' in rel and self.canonical is None and href is not None:
                self.canonical = href.strip()

    def handle_endtag(self, tag):
        if tag == 'a':
            self._close_anchor()
        elif tag == 'title' and self.title_parts is not None:
            self.title = ' '.join(''.join(self.title_parts).split())
            self.title_parts = None

    def handle_data(self, data):
        if self.title_parts is not None:
            self.title_parts.append(data)
        if self._a_parts is not None:
            self._a_parts.append(data)

    def finish(self):
        self.close()
        self._close_anchor()
        if self.title_parts is not None:   # unclosed <title>: runs to EOF
            self.title = ' '.join(''.join(self.title_parts).split())
            self.title_parts = None


def _parse(base_url: str, html) -> Optional[_MetaGrabber]:
    if html is None:
        return None
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode('utf-8', errors='replace')
    p = _MetaGrabber(base_url)
    p.feed(html)
    p.finish()
    return p


def extract_meta(html) -> Tuple[str, str, str, str, bool, bool]:
    """(title, meta_description, canonical, og_title, robots_noindex,
    robots_nofollow) of one document."""
    p = _parse('', html)
    if p is None:
        return ('', '', '', '', False, False)
    noindex = nofollow = False
    if p.robots is not None:
        tokens = [t.strip().lower() for t in p.robots.split(',')]
        noindex = 'noindex' in tokens
        nofollow = 'nofollow' in tokens
    return (
        p.title or '', p.description or '', p.canonical or '', p.og_title or '',
        noindex, nofollow,
    )


def extract_outlinks(base_url: str, html) -> List[Tuple[int, str, str, str]]:
    """(ord, href, abs_url, anchor) records of one document, in
    document order of the emitted ``<a href>`` open tags."""
    p = _parse(base_url, html)
    return [] if p is None else p.links
