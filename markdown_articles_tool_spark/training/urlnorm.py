"""URL canonicalization — the crawl-dedup normalizer.

A 100-TB crawl sees the same resource under many spellings: mixed-case
scheme/host, explicit default ports, tracking query params, arbitrary
query-param order, fragments.  ``canonicalize_url`` maps them to one
canonical spelling so URL-level dedup (distinct / groupBy) collapses
them — pure JVM Column algebra, no UDF, safe inside any scan-side
projection.

Canonical form (documented spec, mirrored independently by the DuckDB
oracle SQL in ``__spark_entry__.oracle_sql()['url_canonical']``):

1. fragment dropped (everything from the first ``#``);
2. scheme and host lowercased (path/query stay case-sensitive);
3. explicit DEFAULT port stripped — ``:80`` only for http, ``:443``
   only for https (``:8080``, or ``:80`` on https, is meaningful and
   stays);
4. query: split on ``&``, drop empty params and trackers matching
   ``^(utm_[^=]*|fbclid|gclid)(=|$)``, sort the rest bytewise, rejoin;
   a query that empties out drops its ``?``;
5. empty path becomes ``/``.

Scope: absolute ``scheme://...`` URLs with a single ``://`` (an
absolute URL nested inside a query VALUE is out of scope — it would
need percent-encoding-aware parsing, which dedup canonicalization
deliberately avoids: over-normalizing encoded payloads conflates
distinct resources).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_TRACKER_RE = '^(utm_[^=]*|fbclid|gclid)(=|$)'
_BIG = 1 << 30


def canonicalize_url(url: Column) -> Column:
    nofrag = F.substring_index(url, '#', 1)
    scheme = F.lower(F.substring_index(nofrag, '://', 1))
    rest = F.substring(nofrag, F.locate('://', nofrag) + F.lit(3), F.lit(_BIG))
    noq = F.substring_index(rest, '?', 1)
    q = F.when(
        rest.contains('?'),
        F.substring(rest, F.locate('?', rest) + F.lit(1), F.lit(_BIG)),
    ).otherwise(F.lit(''))
    hostport = F.lower(F.substring_index(noq, '/', 1))
    hp = (
        F.when(scheme == F.lit('http'), F.regexp_replace(hostport, ':80$', ''))
        .when(scheme == F.lit('https'), F.regexp_replace(hostport, ':443$', ''))
        .otherwise(hostport)
    )
    path0 = F.substring(noq, F.length(F.substring_index(noq, '/', 1)) + F.lit(1), F.lit(_BIG))
    path = F.when(path0 == F.lit(''), F.lit('/')).otherwise(path0)
    params = F.filter(
        F.split(q, '&'),
        lambda x: (x != F.lit('')) & ~x.rlike(_TRACKER_RE),
    )
    canon_q = F.array_join(F.array_sort(params), '&')
    return F.concat(
        scheme, F.lit('://'), hp, path,
        F.when(canon_q != F.lit(''), F.concat(F.lit('?'), canon_q)).otherwise(F.lit('')),
    )
