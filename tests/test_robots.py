"""Crawl-policy tier (core/robots.py, operators/robots.py): parse and
match goldens, engine-vs-twin differentials (twin = regex line
splitter + no-regex segment-walk matcher), property soup over random
patterns/paths, and the broadcast-join plan lock."""

import os
import random
import re
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))

from markdown_articles_tool_spark import corpus
from markdown_articles_tool_spark.core import robots as R

from oracle_kernels import (
    _robots_match_seq,
    robots_allowed_seq,
    robots_dst_host_seq,
    robots_rules_seq,
    robots_url_path_seq,
)


class TestParse:
    def test_groups_fold_and_close(self):
        txt = ('User-agent: a\nUser-agent: b\nDisallow: /x\n'
               'User-agent: c\nAllow: /y\n')
        assert R.parse_robots(txt) == [
            ('a', 0, 'disallow', '/x'), ('b', 1, 'disallow', '/x'),
            ('c', 2, 'allow', '/y')]

    def test_orphan_rules_comments_case_unknown(self):
        txt = ('Disallow: /orphan\n# full comment\n'
               'USER-AGENT: GraftBot # trailing\nDisAllow: /a\n'
               'Noindex: /ignored\nAllow: /a/b\nnot a field line\n')
        assert R.parse_robots(txt) == [
            ('graftbot', 0, 'disallow', '/a'), ('graftbot', 1, 'allow', '/a/b')]

    def test_empty_value_and_crlf_and_sitemap(self):
        txt = 'User-agent: *\r\nDisallow:\r\nSitemap: https://h/s.xml\r\nCrawl-delay: 2\r\n'
        assert R.parse_robots(txt) == [
            ('', 0, 'sitemap', 'https://h/s.xml'), ('*', 1, 'crawl-delay', '2')]

    def test_sitemap_value_keeps_colons_and_case(self):
        recs = R.parse_robots('Sitemap: https://H.Example/S.xml\n')
        assert recs == [('', 0, 'sitemap', 'https://H.Example/S.xml')]


class TestMatch:
    @pytest.mark.parametrize('pattern,path,expect', [
        ('/a', '/a/b', True),          # prefix
        ('/a/b', '/a', False),
        ('/a*/c', '/a/x/c/d', True),   # wildcard run
        ('/a*/c', '/a/x/d', False),
        ('/*.js$', '/lib/app.js', True),   # anchored suffix
        ('/*.js$', '/lib/app.js?v=1', False),
        ('/a$', '/a', True),
        ('/a$', '/a/', False),
        ('/see/*/1$', '/see/9/1', True),
        ('/see/*/1$', '/see/9/10', False),
        ('*', '/anything', True),
        ('/$', '/', True),
        ('/$', '/x', False),
    ])
    def test_pattern_semantics_both_matchers(self, pattern, path, expect):
        assert bool(R._pattern_re(pattern).match(path)) is expect
        assert _robots_match_seq(pattern, path) is expect

    def test_longest_match_wins_and_tie_allows(self):
        recs = R.parse_robots('User-agent: *\nDisallow: /cat/\nAllow: /cat/1\n')
        assert not R.is_allowed(recs, 'x', '/cat/2')
        assert R.is_allowed(recs, 'x', '/cat/1-deep')  # longer allow wins
        tie = R.parse_robots('User-agent: *\nDisallow: /consent\nAllow: /consent\n')
        assert R.is_allowed(tie, 'x', '/consent')      # equal length: allow

    def test_agent_selection_specific_over_star(self):
        recs = R.parse_robots('User-agent: graftbot\nDisallow: /a\n'
                              'User-agent: *\nDisallow: /\n')
        assert R.is_allowed(recs, 'GRAFTBOT', '/b')    # specific group only
        assert not R.is_allowed(recs, 'graftbot', '/a/x')
        assert not R.is_allowed(recs, 'otherbot', '/b')  # falls to *
        none = R.parse_robots('User-agent: graftbot\nDisallow: /\n')
        assert R.is_allowed(none, 'strangerbot', '/a')   # no group at all

    def test_no_rules_or_empty_file_allows(self):
        assert R.is_allowed([], 'x', '/a')
        assert R.is_allowed(R.parse_robots(''), 'x', '/a')
        assert R.is_allowed(R.parse_robots('User-agent: g\nDisallow:\n'), 'g', '/a')

    def test_url_path_extraction(self):
        assert R.url_path('https://h.example/a/b?q=1') == '/a/b?q=1'
        assert R.url_path('https://h.example') == '/'
        assert R.url_path('HTTPS://Mixed.Example/Path7') == '/Path7'


class TestDifferential:
    def test_parse_parity_on_corpus_and_all_shapes(self):
        shapes = set()
        for h in corpus.ROBOTS_HOSTS:
            txt = corpus.robots_txt_for(h)
            assert R.parse_robots(txt) == robots_rules_seq(txt), h
            shapes.add(corpus.ROBOTS_HOSTS.index(h) % 8)
        assert shapes == set(range(8))

    def test_decision_parity_on_corpus_outlinks(self):
        from markdown_articles_tool_spark.core.htmlmeta import extract_outlinks

        parsed = {h: R.parse_robots(corpus.robots_txt_for(h))
                  for h in corpus.ROBOTS_HOSTS}
        checked = blocked = 0
        for i in range(60):
            url = corpus.doc_url(i)
            for _o, _h, abs_url, _a in extract_outlinks(url, corpus.doc_html(i)):
                host = robots_dst_host_seq(abs_url)
                path = R.url_path(abs_url)
                assert path == robots_url_path_seq(abs_url), abs_url
                recs = parsed.get(host)
                if recs is None:
                    continue
                for agent in ('graftbot', 'otherbot', 'somebot'):
                    ea = R.is_allowed(recs, agent, path)
                    assert ea == robots_allowed_seq(recs, agent, path), (abs_url, agent)
                    checked += 1
                    blocked += not ea
        assert checked > 1000
        assert 0 < blocked < checked  # the gate is non-trivial both ways

    def test_matcher_property_soup(self):
        rng = random.Random(7)
        alphabet = '/abc.js?*'
        for _ in range(4000):
            pat = ''.join(rng.choice(alphabet) for _ in range(rng.randrange(0, 9)))
            if rng.random() < 0.4:
                pat += '$'
            path = '/' + ''.join(rng.choice('/abc.js?') for _ in range(rng.randrange(0, 10)))
            assert bool(R._pattern_re(pat).match(path)) == _robots_match_seq(pat, path), \
                (pat, path)

    def test_parser_property_soup(self):
        rng = random.Random(11)
        fields = ['User-agent', 'Disallow', 'Allow', 'Crawl-delay', 'Sitemap',
                  'Noindex', 'uSeR-AgEnT', 'disallow']
        for _ in range(300):
            lines = []
            for _ in range(rng.randrange(0, 12)):
                f = rng.choice(fields)
                v = rng.choice(['', '/a', '/a/*.js$', '*', 'bot', 'https://h/x:y',
                                '  /pad  ', '# only'])
                sep = rng.choice([':', ' : ', ':  '])
                comment = rng.choice(['', ' # c', '#'])
                lines.append(f'{f}{sep}{v}{comment}')
            txt = rng.choice(['\n', '\r\n']).join(lines)
            assert R.parse_robots(txt) == robots_rules_seq(txt), txt


class TestSparkOperators:
    def test_rules_operator_and_gate_plan(self, spark):
        from markdown_articles_tool_spark.corpus import pages_df, robots_files_df
        from markdown_articles_tool_spark.operators.htmlmeta import extract_page_outlinks
        from markdown_articles_tool_spark.operators.robots import (
            crawl_allowed, extract_robots_rules)

        rules = sorted(tuple(r) for r in extract_robots_rules(robots_files_df(spark)).collect())
        exp = sorted((h, *rec) for h in corpus.ROBOTS_HOSTS
                     for rec in robots_rules_seq(corpus.robots_txt_for(h)))
        assert rules == exp

        links = extract_page_outlinks(pages_df(spark, 40))
        gated = crawl_allowed(links, robots_files_df(spark), agent='graftbot')
        rows = gated.collect()
        assert rows and any(not r['allowed'] for r in rows) \
            and any(r['allowed'] for r in rows)

        jdf = gated._jdf
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString('formatted')
        plan_str = jdf.queryExecution().explainString(mode)
        assert 'BroadcastExchange' in plan_str
        blocks = re.findall(r'\(\d+\) Exchange\b', plan_str)
        assert not blocks, f'links side must not shuffle: {blocks}'

    def test_mixed_case_robots_host_still_gates(self, spark):
        """A robots dim whose host column carries mixed case must match
        the (lowercased) destination host — without the join-side
        lower() the gate fails OPEN for exactly the hosts that
        published a policy (r5 ADVICE).  Same for the crawl-delay
        budget join."""
        from markdown_articles_tool_spark.operators.robots import crawl_allowed
        from markdown_articles_tool_spark.training.frontier import frontier_budget

        links = spark.createDataFrame(
            [('https://src/a', 0, 'https://Example.COM/private/x'),
             ('https://src/a', 1, 'https://example.com/open')],
            'url string, ord int, abs_url string')
        robots = spark.createDataFrame(
            [('Example.COM', 'User-agent: *\nDisallow: /private\nCrawl-delay: 30\n')],
            'host string, robots_txt string')
        got = {r['abs_url']: r['allowed']
               for r in crawl_allowed(links, robots, 'anybot').collect()}
        assert got == {'https://Example.COM/private/x': False,
                       'https://example.com/open': True}
        frontier = spark.createDataFrame(
            [('https://example.com/open', 'example.com', 3, 1)],
            'abs_url string, dst_host string, n_refs long, rank_units long')
        out = frontier_budget(frontier, robots).collect()
        # delay 30 → clamp(floor(60/30),1,8) = 2, NOT the default 8
        assert [r['budget'] for r in out] == [2]
