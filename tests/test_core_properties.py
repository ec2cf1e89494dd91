"""Property-based checks (hypothesis): the pure core must agree with
the stdlib machinery the reference builds on, across arbitrary inputs —
not just the fixture corpus."""

import mimetypes
import posixpath
import re
from urllib.parse import urlparse, urlunparse

from hypothesis import given, settings, strategies as st

from markdown_articles_tool_spark.core import mdparse
from markdown_articles_tool_spark.core.wwwtools import (
    _posix_splitext,
    guess_mime_type,
    is_url,
    remove_protocol_prefix,
    slugify,
    split_file_ext,
)

url_chars = st.text(
    alphabet='abcXYZ019:/.?&=%#_- ~+!()[]сю',  # incl. cyrillic + specials
    min_size=0,
    max_size=60,
)

_slashes_re = re.compile(r'^\s*:?//', re.IGNORECASE)
_db = mimetypes.MimeTypes()
_db.types_map[True].pop('.jpe', None)


def _reference_remove_protocol_prefix(url: str) -> str:
    """Spec: the reference's implementation (www_tools.py:33-38)."""
    return _slashes_re.sub('', str(urlunparse(urlparse(url)._replace(scheme=''))))


class TestAgainstStdlib:
    @given(url_chars)
    @settings(max_examples=300)
    def test_splitext_matches_posixpath(self, s):
        assert _posix_splitext(s) == posixpath.splitext(s)

    @given(url_chars)
    @settings(max_examples=300)
    def test_mime_gate_matches_stdlib(self, s):
        try:
            want = _db.guess_type(s)[0]
        except Exception:
            return  # stdlib itself rejects (e.g. embedded NUL) — out of scope
        assert guess_mime_type(s) == want, s

    @given(st.from_regex(r'(?:[A-Za-z][A-Za-z0-9+.\-]{0,8}:)?(?://)?[A-Za-z0-9./?&=_%-]{0,40}', fullmatch=True))
    @settings(max_examples=300)
    def test_protocol_prefix_matches_reference_on_wellformed(self, s):
        """On well-formed URL-ish strings (no spaces/brackets — where
        urlparse semantics are unambiguous) the one-regex strip equals
        the reference's urlparse round-trip."""
        try:
            want = _reference_remove_protocol_prefix(s)
        except ValueError:
            return
        assert remove_protocol_prefix(s) == want, s

    @given(url_chars)
    @settings(max_examples=200)
    def test_split_file_ext_rsplit_spec(self, s):
        parts = s.rsplit('.', 1)
        want = (parts[0], None) if len(parts) == 1 else (parts[0], parts[1])
        assert split_file_ext(s) == want

    @given(url_chars)
    @settings(max_examples=200)
    def test_is_url_prefix_spec(self, s):
        want = any(s.lower().startswith(p) for p in ('http', 'ftp', 'https', 'ftps'))
        assert is_url(s) == want

    @given(st.text(max_size=40))
    @settings(max_examples=200)
    def test_slugify_never_crashes_and_is_ascii(self, s):
        out = slugify(s)
        assert out == out.lower()
        out.encode('ascii')  # must be pure ascii


class TestExtractorRobustness:
    @given(st.text(alphabet='![]()`# \n<>="wxh123./:', max_size=200))
    @settings(max_examples=300)
    def test_extractor_never_crashes(self, s):
        links = mdparse.extract_image_links(s)
        for link, w, h in links:
            assert isinstance(link, str)
            assert w is None or isinstance(w, int)

    @given(st.text(alphabet='abc<>img src="/.&;', max_size=150))
    @settings(max_examples=200)
    def test_html_extractor_never_crashes(self, s):
        mdparse.extract_html_image_links(s)

    @given(st.text(alphabet='az09._/- ', min_size=1, max_size=30),
           st.integers(0, 9999), st.integers(0, 9999))
    @settings(max_examples=200)
    def test_size_suffix_roundtrip(self, link, w, h):
        if ' ' in link:
            return
        got = mdparse.parse_size_suffix(f'{link} ={w}x{h}')
        assert got == (link, w, h)
