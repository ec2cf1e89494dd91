"""Page metadata + outlink extraction (core/htmlmeta.py): golden spec
edges, resolver branch table, engine-vs-twin differential over the
corpus + hypothesis soup, Spark operator shape."""

import os
import sys

import pytest
from hypothesis import given, settings, strategies as st

from markdown_articles_tool_spark import corpus
from markdown_articles_tool_spark.core.htmlmeta import (
    extract_meta,
    extract_outlinks,
    remove_dot_segments,
    resolve_href,
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))
from oracle_kernels import (  # noqa: E402
    _rfc_remove_dot_segments,
    html_meta_seq,
    outlinks_seq,
    resolve_href_seq,
)

BASE = 'https://host.example/a/b/doc.html?q=1'


class TestResolver:
    # (href, expected) against BASE — every branch of the spec
    CASES = [
        ('https://other.example/x', 'https://other.example/x'),
        ('HTTPS://Mixed.Example/P#frag', 'HTTPS://Mixed.Example/P'),  # untouched but defragged
        ('http://h/p?q=2#s', 'http://h/p?q=2'),
        ('ftp://files.example/x', None),          # non-http scheme
        ('mailto:a@b.c', None),
        ('javascript:void(0)', None),
        ('JavaScript:void(0)', None),             # scheme match is case-insensitive
        ('', None),
        ('   ', None),
        ('#top', None),                            # bare fragment
        (' #top ', None),
        ('//cdn.example/lib.js', 'https://cdn.example/lib.js'),
        ('/abs/path', 'https://host.example/abs/path'),
        ('/abs/../x', 'https://host.example/x'),
        ('/abs/path?k=v', 'https://host.example/abs/path?k=v'),
        ('?page=2', 'https://host.example/a/b/doc.html?page=2'),
        ('rel.html', 'https://host.example/a/b/rel.html'),
        ('../up.html', 'https://host.example/a/up.html'),
        ('../../../clamp.html', 'https://host.example/clamp.html'),
        ('./sub/./x/../p.html', 'https://host.example/a/b/sub/p.html'),
        ('dir/', 'https://host.example/a/b/dir/'),
        ('..', 'https://host.example/a/'),         # final-'..' trailing slash
        ('.', 'https://host.example/a/b/'),
        ('x.html#sec', 'https://host.example/a/b/x.html'),
        # scheme-ish but not a scheme (digit first / space) → relative
        ('1:2', 'https://host.example/a/b/1:2'),
    ]

    def test_branch_table_engine_and_twin(self):
        for href, want in self.CASES:
            assert resolve_href(BASE, href) == want, href
            assert resolve_href_seq(BASE, href) == want, href

    def test_non_hierarchical_base_drops_relative(self):
        for base in ('not-a-url', 'mailto:x@y.z', ''):
            assert resolve_href(base, 'rel.html') is None
            assert resolve_href_seq(base, 'rel.html') is None
            # absolute links still pass
            assert resolve_href(base, 'https://a.example/p') == 'https://a.example/p'

    def test_base_without_path(self):
        assert resolve_href('https://h.example', 'x.html') == 'https://h.example/x.html'
        assert resolve_href('https://h.example?q=1', '?z=2') == 'https://h.example/?z=2'

    def test_dot_segment_twins(self):
        cases = ['/a/b/../c', '/a/..', '/a/.', '/..', '/.', '/', '/a//b/../../x',
                 '/a/b/c/./../../g', '/x/..//y', '/../../a']
        for p in cases:
            assert remove_dot_segments(p) == _rfc_remove_dot_segments(p), p

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.sampled_from(['a', 'bb', '.', '..', '']), max_size=8))
    def test_dot_segment_property(self, segs):
        p = '/' + '/'.join(segs)
        assert remove_dot_segments(p) == _rfc_remove_dot_segments(p), p

    @settings(max_examples=200, deadline=None)
    @given(st.text(alphabet='ab/.?#:h tp', max_size=24))
    def test_resolver_soup_property(self, href):
        assert resolve_href(BASE, href) == resolve_href_seq(BASE, href), href


class TestMeta:
    def test_golden_full(self):
        html = ('<html><head><title> Doc  One </title>'
                '<meta name=" Description " content=" a  b ">'
                '<meta name="description" content="second ignored">'
                '<meta property="OG:TITLE" content=" og  t ">'
                '<link rel="alternate CANONICAL" href=" /canon ">'
                '<link rel="canonical" href="/second-ignored">'
                '<meta name="robots" content=" NOINDEX , nofollow ">'
                '</head><body></body></html>')
        want = ('Doc One', 'a b', '/canon', 'og t', True, True)
        assert extract_meta(html) == want
        assert html_meta_seq(html) == want

    def test_empty_and_none(self):
        for h in (None, '', b'', '<p>no head</p>'):
            assert extract_meta(h) == ('', '', '', '', False, False)
            assert html_meta_seq(h) == ('', '', '', '', False, False)

    def test_unclosed_title_runs_to_eof(self):
        h = '<title>runs  on'
        assert extract_meta(h)[0] == 'runs on'
        assert html_meta_seq(h)[0] == 'runs on'

    def test_later_titles_ignored_and_selfclosed_counts(self):
        h = '<title>first</title><title>second</title>'
        assert extract_meta(h)[0] == 'first'
        h2 = '<title/><title>late</title>'
        assert extract_meta(h2)[0] == ''
        assert html_meta_seq(h2)[0] == ''

    def test_first_attr_occurrence_wins(self):
        h = '<meta name="description" content="A" content="B">'
        assert extract_meta(h)[1] == 'A'
        assert html_meta_seq(h)[1] == 'A'

    def test_valueless_attrs_are_absent(self):
        h = '<meta name="description" content><link rel="canonical" href>'
        assert extract_meta(h) == ('', '', '', '', False, False)

    def test_robots_token_membership(self):
        assert extract_meta('<meta name=robots content="noindexx">')[4:] == (False, False)
        assert extract_meta('<meta name=robots content="nofollow">')[4:] == (False, True)
        assert extract_meta('<meta name=robots content="none,noindex">')[4:] == (True, False)

    def test_marked_section_soup_survives(self):
        h = '<title>t</title><![weird]<meta name=robots content=noindex>'
        assert extract_meta(h) == html_meta_seq(h)


class TestOutlinks:
    def test_golden_order_and_filters(self):
        h = ('<a href="/one">first</a> gap '
             '<a href="#x">dropped</a>'
             '<a href="mailto:a@b">dropped</a>'
             '<a href="two.html">second  link</a>'
             '<a name="anchor-only">dropped</a>')
        want = [
            (0, '/one', 'https://host.example/one', 'first'),
            (1, 'two.html', 'https://host.example/a/b/two.html', 'second link'),
        ]
        assert extract_outlinks(BASE, h) == want
        assert outlinks_seq(BASE, h) == want

    def test_nested_anchor_implicit_close(self):
        h = '<a href="/s1">one <a href="/s2">two</a></a>'
        want = [
            (0, '/s1', 'https://host.example/s1', 'one'),
            (1, '/s2', 'https://host.example/s2', 'two'),
        ]
        assert extract_outlinks(BASE, h) == want
        assert outlinks_seq(BASE, h) == want

    def test_unclosed_anchor_emits_at_eof(self):
        h = '<a href="/open">tail text'
        assert extract_outlinks(BASE, h) == [(0, '/open', 'https://host.example/open', 'tail text')]
        assert outlinks_seq(BASE, h) == extract_outlinks(BASE, h)

    def test_href_first_wins_and_stripped(self):
        h = '<a href=" /padded " href="/ignored">t</a>'
        got = extract_outlinks(BASE, h)
        assert got == [(0, '/padded', 'https://host.example/padded', 't')]
        assert outlinks_seq(BASE, h) == got

    def test_selfclosed_anchor(self):
        h = '<a href="/sc"/>after'
        got = extract_outlinks(BASE, h)
        assert got == [(0, '/sc', 'https://host.example/sc', '')]
        assert outlinks_seq(BASE, h) == got


class TestDifferential:
    def test_corpus_differential(self):
        n_links = 0
        metas = set()
        for i in range(150):
            h = corpus.doc_html(i)
            url = corpus.doc_url(i)
            m = extract_meta(h)
            assert m == html_meta_seq(h), i
            la = extract_outlinks(url, h)
            assert la == outlinks_seq(url, h), i
            n_links += len(la)
            metas.add((m[2] != '', m[3] != '', m[4], m[5]))
        assert n_links > 1500          # the corpus genuinely links out
        assert len(metas) >= 8         # ...and rotates the meta shapes

    @settings(max_examples=150, deadline=None)
    @given(st.text(alphabet='<>/a href="m:#?.t l!&;x-[]\n\t ', max_size=220))
    def test_soup_differential(self, soup):
        assert extract_meta(soup) == html_meta_seq(soup)
        assert extract_outlinks(BASE, soup) == outlinks_seq(BASE, soup)


@pytest.mark.usefixtures('spark')
class TestOperators:
    def test_meta_operator_matches_kernel_no_shuffle(self, spark):
        from markdown_articles_tool_spark.operators.htmlmeta import extract_page_meta

        pages = corpus.pages_df(spark, 30)
        got = sorted(tuple(r) for r in extract_page_meta(pages).collect())
        want = sorted(
            (corpus.doc_url(i), *extract_meta(corpus.doc_html(i))) for i in range(30)
        )
        assert got == want
        plan = extract_page_meta(pages)._jdf.queryExecution().executedPlan().toString()
        assert 'Exchange' not in plan  # embarrassingly parallel, no shuffle

    def test_outlinks_operator_matches_kernel_no_shuffle(self, spark):
        from markdown_articles_tool_spark.operators.htmlmeta import extract_page_outlinks

        pages = corpus.pages_df(spark, 30)
        got = sorted(tuple(r) for r in extract_page_outlinks(pages).collect())
        want = sorted(
            (corpus.doc_url(i), ord_, href, abs_url, anchor)
            for i in range(30)
            for ord_, href, abs_url, anchor in extract_outlinks(
                corpus.doc_url(i), corpus.doc_html(i)
            )
        )
        assert got == want
        plan = extract_page_outlinks(pages)._jdf.queryExecution().executedPlan().toString()
        assert 'Exchange' not in plan
