"""From-scratch robots.txt parser + RFC 9309 matcher — the crawl-
policy gate of the frontier tier (core/htmlmeta.py extracts the
links; this module decides which ones a polite crawler may fetch).

Stdlib-only and from scratch (the reference tool —
artiomn/markdown_articles_tool — has no crawl tier; its per-host
politeness lives in the fetch stage we model in operators/fetch.py).
The INDEPENDENT second implementation used by the driver's hash gate
parses with a regex line splitter and matches wildcards with an
explicit backtracking segment walk (no ``re``) —
``tools/oracle_kernels.robots_rules_seq`` / ``robots_allowed_seq``.

Spec (shared with the twin)
---------------------------

Parsing (``parse_robots``):

* lines split on ``\\n`` (a trailing ``\\r`` is stripped — CRLF
  files); everything from the first ``#`` is comment; blank lines
  skipped; a line without ``:`` is ignored;
* fields are case-insensitive (``User-Agent`` == ``user-agent``);
  values keep their case (patterns and sitemap URLs are
  case-sensitive), surrounding whitespace stripped;
* ``user-agent:`` lines open a group; CONSECUTIVE user-agent lines
  share the group (their tokens are all lowercased); a user-agent
  line after at least one rule line starts a NEW group;
* ``allow:`` / ``disallow:`` / ``crawl-delay:`` lines emit one
  record per agent token of the current group; rule lines before any
  user-agent line are ignored (RFC: they belong to no group); an
  EMPTY allow/disallow value emits nothing (RFC: no restriction) but
  still closes the group like any rule line;
* ``sitemap:`` is global — one record with group_agent ``''``,
  emitted wherever it appears;
* unknown fields are ignored and do NOT close the group;
* records are ``(group_agent, ord, verb, value)`` with ``ord`` the
  0-based emission ordinal within the file.

Matching (``is_allowed``):

* the agent's rule set: all ``allow``/``disallow`` records whose
  group token equals the (lowercased) agent name; if none exist, the
  ``*`` groups; if none of those, everything is allowed;
* a pattern matches the path as a PREFIX; ``*`` matches any char
  run (including empty); a trailing ``$`` anchors the end of the
  path (inner ``$`` is literal);
* the longest matching pattern (in characters, ``$`` included —
  both sides count it identically) wins; on a length tie, allow
  wins; no matching rule → allowed;
* the path that is matched: everything after the authority incl.
  the query string, ``''`` → ``/`` (callers strip fragments —
  the outlink resolver already does).
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import List, Tuple

_RULE_VERBS = ('allow', 'disallow')


def parse_robots(text: str) -> List[Tuple[str, int, str, str]]:
    """(group_agent, ord, verb, value) records, in file order."""
    records: List[Tuple[str, int, str, str]] = []
    agents: List[str] = []
    group_closed = False  # a rule line was seen since the last user-agent
    for raw in text.split('\n'):
        line = raw.split('#', 1)[0].strip()  # strip() also eats a CRLF '\r'
        if not line:
            continue
        field, sep, value = line.partition(':')
        if not sep:
            continue
        field = field.strip().lower()
        value = value.strip()
        if field == 'user-agent':
            if group_closed:
                agents = []
                group_closed = False
            agents.append(value.lower())
        elif field in ('allow', 'disallow', 'crawl-delay'):
            group_closed = True
            if field in _RULE_VERBS and not value:
                continue  # empty pattern: no restriction
            for a in agents:
                records.append((a, len(records), field, value))
        elif field == 'sitemap':
            records.append(('', len(records), 'sitemap', value))
        # unknown fields: ignored, group stays open
    return records


@lru_cache(maxsize=4096)
def _pattern_re(pattern: str) -> 're.Pattern[str]':
    anchored = pattern.endswith('$')
    if anchored:
        pattern = pattern[:-1]
    body = '.*'.join(re.escape(seg) for seg in pattern.split('*'))
    return re.compile('^' + body + ('$' if anchored else ''))


def is_allowed(records: List[Tuple[str, int, str, str]], agent: str,
               path: str) -> bool:
    """RFC 9309 longest-match decision over parse_robots records."""
    agent = agent.lower()
    path = path or '/'
    sel = [r for r in records if r[0] == agent and r[2] in _RULE_VERBS]
    if not sel:
        sel = [r for r in records if r[0] == '*' and r[2] in _RULE_VERBS]
    best_len = -1
    best_verb = ''
    for _a, _o, verb, pattern in sel:
        if _pattern_re(pattern).match(path):
            n = len(pattern)
            if n > best_len or (n == best_len and verb == 'allow'):
                best_len = n
                best_verb = verb
    return best_len < 0 or best_verb == 'allow'


def url_path(abs_url: str) -> str:
    """The robots-matchable path of an absolute URL: everything after
    the authority incl. the query (fragments are the caller's job),
    '/' when empty."""
    m = re.match(r'^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*(/.*)?$', abs_url)
    if not m:
        return '/'
    return m.group(1) or '/'


_DELAY_RE = re.compile(r'^[0-9]+(\.[0-9]+)?$')  # ASCII digits only


def crawl_delay(records: List[Tuple[str, int, str, str]], agent: str):
    """Effective crawl-delay (seconds) for ``agent``: the LAST valid
    ``crawl-delay`` record in the agent's own groups, else the last in
    the ``*`` groups, else None.  A valid value is a non-negative
    ASCII decimal (``^[0-9]+(\\.[0-9]+)?$``); invalid values are
    ignored at selection time (a group whose only delay is junk falls
    through to ``*``).  Mirrors ``is_allowed``'s specific-agent-over-
    ``*`` preference."""
    agent = agent.lower()
    for scope in (agent, '*'):
        vals = [v for a, _o, verb, v in records
                if a == scope and verb == 'crawl-delay' and _DELAY_RE.match(v)]
        if vals:
            return float(vals[-1])
    return None
