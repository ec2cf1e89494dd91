"""live_fetcher semantics without a network: a faked ``requests``
module exercises the reference's fetch behaviors (www_tools.py:41-65)
and the content-disposition filename fallback (www_tools.py:91-103)
end-to-end through ``derive_fetched``."""

import sys
import types

import pandas as pd

from markdown_articles_tool_spark.operators.fetch import (
    FILENAME_KEYERROR,
    derive_fetched,
    live_fetcher,
)


class _Resp:
    def __init__(self, url, status=200, content=b'', headers=None):
        self.url = url
        self.status_code = status
        self.ok = status < 400
        self.content = content
        self.headers = headers or {}


class _SSLError(Exception):
    pass


def _fake_requests(responses, ssl_fail_once=frozenset()):
    mod = types.ModuleType('requests')
    exc = types.ModuleType('requests.exceptions')
    exc.SSLError = _SSLError
    mod.exceptions = exc
    ssl_pending = set(ssl_fail_once)

    class Session:
        def get(self, url, allow_redirects=True, timeout=None, headers=None, verify=True):
            assert allow_redirects is True
            assert 'Mozilla' in headers['User-Agent']  # UA header (www_tools.py:15)
            if url in ssl_pending and verify:
                ssl_pending.discard(url)
                raise _SSLError(url)
            r = responses[url]
            if isinstance(r, Exception):
                raise r
            return r

    mod.Session = Session
    return mod


def _run(fetcher, keys):
    batches = iter([pd.DataFrame({'fetch_key': keys})])
    out = pd.concat(list(derive_fetched(fetcher)(batches)), ignore_index=True)
    return {row.fetch_key: row for row in out.itertuples(index=False)}


def test_live_fetcher_captures_content_disposition(monkeypatch):
    responses = {
        # redirect target URL is just '/': path branch yields no name,
        # so the filename must come from the content-disposition header
        'https://h/dl?id=7': _Resp(
            '/', content=b'PNGBYTES',
            headers={'content-type': 'image/png',
                     'content-disposition': 'attachment; filename=My Photo.PNG'},
        ),
        'https://h/pic.gif': _Resp('https://h/pic.gif', content=b'GIF', headers={'content-type': 'image/gif'}),
        'https://h/gone.png': _Resp('https://h/gone.png', status=404),
        'https://h/nohdr': _Resp('https://h/nohdr', content=b'X', headers={}),
        'https://ssl.h/a.png': _Resp('https://ssl.h/a.png', content=b'SSL', headers={'content-type': 'image/png'}),
    }
    monkeypatch.setitem(
        sys.modules, 'requests', _fake_requests(responses, ssl_fail_once={'https://ssl.h/a.png'})
    )
    rows = _run(live_fetcher(timeout=1.0), list(responses))

    # content-disposition branch → reference filename (slugified both parts)
    assert rows['https://h/dl?id=7'].filename_remote == 'my-photo.png'
    assert rows['https://h/dl?id=7'].content_disposition == 'attachment; filename=My Photo.PNG'
    # plain path branch
    assert rows['https://h/pic.gif'].filename_remote == 'pic.gif'
    # !ok → error row, no content (www_tools.py:60-63 raises; modeled as status row)
    assert rows['https://h/gone.png'].fetch_status == 404
    assert rows['https://h/gone.png'].sha_hex is None
    # missing content-type header with extension-less path → the
    # reference's KeyError (www_tools.py:108) → sentinel
    assert rows['https://h/nohdr'].filename_remote == FILENAME_KEYERROR
    # SSL error retried without verify (www_tools.py:49-53)
    assert rows['https://ssl.h/a.png'].fetch_status == 200
    assert bytes(rows['https://ssl.h/a.png'].content) == b'SSL'


def test_live_fetcher_per_host_politeness(monkeypatch):
    """Per-host min-interval contract: consecutive GETs to the same
    host are spaced >= per_host_interval apart (enforced by sleeping
    the remaining interval); different hosts are not throttled against
    each other."""
    import time as time_mod

    urls = [f'https://a.example/p{i}.png' for i in range(3)] + [
        f'https://b.example/q{i}.png' for i in range(2)
    ]
    responses = {
        u: _Resp(u, content=b'X', headers={'content-type': 'image/png'}) for u in urls
    }

    clock = {'t': 100.0}
    events = []  # ('get', host, t) / ('sleep', seconds)

    def fake_monotonic():
        return clock['t']

    def fake_sleep(sec):
        events.append(('sleep', round(sec, 6)))
        clock['t'] += sec

    monkeypatch.setattr(time_mod, 'monotonic', fake_monotonic)
    monkeypatch.setattr(time_mod, 'sleep', fake_sleep)

    base = _fake_requests(responses)
    orig_session = base.Session

    class Session(orig_session):
        def get(self, url, **kw):
            host = url.split('/')[2]
            events.append(('get', host, clock['t']))
            clock['t'] += 0.1  # each request takes 100 ms
            return super().get(url, **kw)

    base.Session = Session
    monkeypatch.setitem(sys.modules, 'requests', base)

    rows = _run(live_fetcher(timeout=1.0, per_host_interval=0.5), urls)
    assert all(rows[u].fetch_status == 200 for u in urls)

    # rebuild per-host GET times
    per_host = {}
    for e in events:
        if e[0] == 'get':
            per_host.setdefault(e[1], []).append(e[2])
    # hosts grouped alphabetically: all of a.example before b.example
    order = [e[1] for e in events if e[0] == 'get']
    assert order == ['a.example'] * 3 + ['b.example'] * 2
    # same-host spacing >= interval
    for host, times in per_host.items():
        for t0, t1 in zip(times, times[1:]):
            assert t1 - t0 >= 0.5 - 1e-9, (host, times)
    # sleeps fired only for same-host gaps (request takes 0.1s of the
    # 0.5s budget -> 0.4s sleeps), and the first GET of each host is
    # never delayed
    sleeps = [e[1] for e in events if e[0] == 'sleep']
    assert sleeps == [0.4, 0.4, 0.4]  # 2 gaps on host a + 1 gap on host b
    # b.example's first GET was not throttled against a.example's last
    b_first = per_host['b.example'][0]
    a_last = per_host['a.example'][-1]
    assert b_first - a_last < 0.5


def test_salt_by_host_reaches_the_fetch_exchange(spark):
    """ADVICE r3: salt_fetch_by_host must actually wire through to
    fetch_distinct — the salted plan partitions the fetch exchange on
    (xxhash64(host), pmod salt) instead of the plain key hash, and the
    transform output is byte-identical either way."""
    from markdown_articles_tool_spark import corpus
    from markdown_articles_tool_spark.core.linkflow import DedupVariant, TransformConfig
    from markdown_articles_tool_spark.operators.fetch import fetch_distinct, model_fetcher
    from markdown_articles_tool_spark.pipeline import transform_documents

    links = spark.createDataFrame(
        [(f'https://h{i % 3}.example/p{i}.png',) for i in range(30)], 'link string'
    )
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString('formatted')

    salted = fetch_distinct(links, 'link', model_fetcher, salt_by_host=True)
    plan = salted._jdf.queryExecution().explainString(mode)
    assert 'pmod' in plan and 'regexp_extract' in plan, plan

    plain = fetch_distinct(links, 'link', model_fetcher, salt_by_host=False)
    plan2 = plain._jdf.queryExecution().explainString(mode)
    assert 'pmod' not in plan2

    docs = spark.createDataFrame([corpus.doc_row(i) for i in range(12)], corpus.PAGES_SCHEMA
                                 ).select('url', 'text')
    base = TransformConfig(skip_all_errors=True, deduplication=DedupVariant.CONTENT_HASH)
    salted_cfg = TransformConfig(skip_all_errors=True, deduplication=DedupVariant.CONTENT_HASH,
                                 salt_fetch_by_host=True)
    a = {r['url']: r['text_out'] for r in transform_documents(docs, base).docs_out.collect()}
    b = {r['url']: r['text_out'] for r in transform_documents(docs, salted_cfg).docs_out.collect()}
    assert a == b


def test_polite_model_fetcher_matches_model_fetcher(monkeypatch):
    """polite_model_fetcher == model_fetcher row-for-row (modeled
    corpus URLs and unknown-host 599s alike) — only ORDER differs
    (host-grouped) — and it sleeps exactly the same-host gaps the
    live fetcher would (bench.py --skew relies on both properties)."""
    import time as time_mod

    from markdown_articles_tool_spark.corpus import doc_text, doc_url
    from markdown_articles_tool_spark.operators.fetch import (
        model_fetcher,
        polite_model_fetcher,
    )
    from markdown_articles_tool_spark.core.mdparse import extract_md_img_srcs
    from markdown_articles_tool_spark.core.wwwtools import get_base_url

    # real modeled-corpus image URLs (resolved like the pipeline does)
    urls = []
    for i in range(4):
        base = get_base_url(doc_url(i))
        for src in extract_md_img_srcs(doc_text(i)):
            urls.append(src if src.startswith('http') else f'{base}/{src}')
    urls = sorted(set(urls))[:10] + ['https://nowhere.example/missing.png']

    sleeps = []
    monkeypatch.setattr(time_mod, 'sleep', lambda s: sleeps.append(round(s, 3)))

    def rows(fetcher):
        batch = pd.DataFrame({'fetch_key': urls})
        out = pd.concat(list(fetcher(iter([batch]))), ignore_index=True)
        return {
            r.fetch_key: (r.final_url, bytes(r.content) if r.content is not None else None,
                          r.content_type, r.fetch_status)
            for r in out.itertuples()
        }

    assert rows(polite_model_fetcher(0.5)) == rows(model_fetcher)
    # same-host gaps slept: hosts with k>1 urls contribute k-1 sleeps
    from collections import Counter
    per_host = Counter(u.split('/')[2] for u in urls)
    assert len(sleeps) == sum(k - 1 for k in per_host.values())
    assert all(0 < s <= 0.5 for s in sleeps)
