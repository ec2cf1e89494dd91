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
