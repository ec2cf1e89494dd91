"""From-scratch sitemaps.org XML reader — the discovery side of the
crawl-policy tier (robots.txt's ``Sitemap:`` records point here; the
entries feed the frontier).

Stdlib-only, no ``xml`` module: a from-scratch tag scanner (the
reference tool — artiomn/markdown_articles_tool — has no crawl tier
at all).  The INDEPENDENT second implementation used by the driver's
hash gate parses with ``xml.etree.ElementTree`` instead —
``tools/oracle_kernels.sitemap_entries_seq``.

Spec (shared with the twin)
---------------------------

* the document is a ``<urlset>`` of ``<url>`` entries or a
  ``<sitemapindex>`` of ``<sitemap>`` refs (both may carry the
  sitemaps.org ``xmlns``; prefixed tag names match on their LOCAL
  part, case-folded);
* one record per ``<url>``/``<sitemap>`` element that is a DIRECT
  child of the root: ``(ord, kind, loc, lastmod, changefreq,
  priority)`` with ``kind`` ``'url'`` or ``'sitemap'``, ``ord`` the
  0-based emission ordinal, and the four fields taken from the
  entry's DIRECT children only — a ``<loc>`` nested deeper (e.g.
  inside an ``<image:image>`` extension block) does NOT leak into
  the entry; missing fields are ``''``; values are
  whitespace-stripped;
* text may be ``<![CDATA[...]]>`` (verbatim) or entity-escaped (the
  five XML entities + ``&#NNN;``/``&#xHH;`` numeric forms);
  comments and processing instructions are skipped;
* the LAST occurrence of a repeated field wins (both readers
  overwrite);  input that is not a sitemap (missing/foreign root,
  or unparseable) yields no records.
"""

from __future__ import annotations

import re
from typing import List, Tuple

_FIELDS = ('loc', 'lastmod', 'changefreq', 'priority')
_ENTRY_TAGS = ('url', 'sitemap')

_TOKEN_RE = re.compile(
    r'<!\[CDATA\[(?P<cdata>.*?)\]\]>'
    r'|<!--.*?-->'
    r'|<[?!][^>]*>'
    r'|<\s*(?P<close>/?)\s*(?P<name>[A-Za-z_][^\s/>]*)(?P<attrs>[^>]*?)(?P<self>/?)\s*>'
    r'|(?P<text>[^<]+)',
    re.DOTALL,
)

_NUM_ENT_RE = re.compile(r'&(#x?[0-9A-Fa-f]+|[A-Za-z]+);')
_XML_ENTITIES = {'amp': '&', 'lt': '<', 'gt': '>', 'quot': '"', 'apos': "'"}


def _unescape_xml(s: str) -> str:
    def sub(m: 're.Match[str]') -> str:
        body = m.group(1)
        if body.startswith('#x') or body.startswith('#X'):
            try:
                return chr(int(body[2:], 16))
            except ValueError:
                return m.group(0)
        if body.startswith('#'):
            try:
                return chr(int(body[1:]))
            except ValueError:
                return m.group(0)
        return _XML_ENTITIES.get(body, m.group(0))

    return _NUM_ENT_RE.sub(sub, s)


def _local(name: str) -> str:
    return name.rsplit(':', 1)[-1].lower()


def sitemap_entries(text: str) -> List[Tuple[int, str, str, str, str, str]]:
    """(ord, kind, loc, lastmod, changefreq, priority) records."""
    out: List[Tuple[int, str, str, str, str, str]] = []
    stack: List[str] = []
    entry: dict | None = None
    entry_depth = 0
    buf: List[str] = []

    for m in _TOKEN_RE.finditer(text):
        if m.group('cdata') is not None:
            buf.append(m.group('cdata'))
            continue
        if m.group('name') is None:
            if m.group('text') is not None:
                buf.append(_unescape_xml(m.group('text')))
            continue
        name = _local(m.group('name'))
        if m.group('close'):
            # closing tag: capture a field value ending at entry depth+1
            if (entry is not None and len(stack) == entry_depth + 1
                    and name == stack[-1] and name in _FIELDS):
                entry[name] = ''.join(buf).strip()
            if stack and stack[-1] == name:
                stack.pop()
            if entry is not None and name in _ENTRY_TAGS and len(stack) == entry_depth - 1:
                out.append((len(out), entry['kind'],
                            entry.get('loc', ''), entry.get('lastmod', ''),
                            entry.get('changefreq', ''), entry.get('priority', '')))
                entry = None
            buf = []
            continue
        # opening tag
        if m.group('self'):
            buf = []
            continue  # self-closing: no text, no stack change
        stack.append(name)
        buf = []
        if (entry is None and name in _ENTRY_TAGS and len(stack) == 2
                and _local(stack[0]) in ('urlset', 'sitemapindex')):
            entry = {'kind': name}
            entry_depth = len(stack)
    return out
