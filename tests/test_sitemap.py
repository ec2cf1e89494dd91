"""Sitemap tier (core/sitemap.py): spec goldens, engine-vs-ET-twin
parity on the corpus dim and generated soup, and no-crash fuzz."""

import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))

from markdown_articles_tool_spark import corpus
from markdown_articles_tool_spark.core.sitemap import sitemap_entries

from oracle_kernels import sitemap_entries_seq


class TestGoldens:
    def test_urlset_fields_and_order(self):
        xml = ('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
               '<url><loc>https://h/a</loc><lastmod>2020-01-01</lastmod>'
               '<changefreq>daily</changefreq><priority>0.8</priority></url>'
               '<url><loc> https://h/b </loc></url></urlset>')
        assert sitemap_entries(xml) == [
            (0, 'url', 'https://h/a', '2020-01-01', 'daily', '0.8'),
            (1, 'url', 'https://h/b', '', '', '')]

    def test_sitemapindex_refs_and_comments(self):
        xml = ('<sitemapindex><sitemap><loc>https://h/s1.xml</loc></sitemap>'
               '<!-- c --><sitemap><loc>https://h/s2.xml</loc>'
               '<lastmod>2020-02-02</lastmod></sitemap></sitemapindex>')
        assert sitemap_entries(xml) == [
            (0, 'sitemap', 'https://h/s1.xml', '', '', ''),
            (1, 'sitemap', 'https://h/s2.xml', '2020-02-02', '', '')]

    def test_cdata_and_entities(self):
        xml = ('<urlset><url><loc><![CDATA[https://h/q?a=1&b=2]]></loc></url>'
               '<url><loc>https://h/p?x=1&amp;y=&#50;&#x41;</loc></url></urlset>')
        recs = sitemap_entries(xml)
        assert recs[0][2] == 'https://h/q?a=1&b=2'
        assert recs[1][2] == 'https://h/p?x=1&y=2A'

    def test_nested_extension_does_not_leak(self):
        xml = ('<sm:urlset xmlns:sm="x" xmlns:image="y"><sm:url>'
               '<image:image><image:loc>https://h/img.png</image:loc></image:image>'
               '<sm:loc>https://h/page</sm:loc></sm:url></sm:urlset>')
        assert sitemap_entries(xml) == [(0, 'url', 'https://h/page', '', '', '')]

    def test_repeated_field_last_wins(self):
        xml = ('<urlset><url><loc>https://h/a</loc><loc>https://h/b</loc>'
               '</url></urlset>')
        assert sitemap_entries(xml)[0][2] == 'https://h/b'
        assert sitemap_entries_seq(xml)[0][2] == 'https://h/b'

    def test_foreign_root_and_garbage_yield_nothing(self):
        for bad in ('<rss><url><loc>x</loc></url></rss>', 'not xml at all', '',
                    '<url><loc>orphan</loc></url>'):
            assert sitemap_entries(bad) == []
        assert sitemap_entries_seq('<rss><url><loc>x</loc></url></rss>') == []
        assert sitemap_entries_seq('not xml') == []

    def test_deep_nested_entry_not_direct_child_skipped(self):
        xml = ('<urlset><wrapper><url><loc>https://h/deep</loc></url></wrapper>'
               '<url><loc>https://h/top</loc></url></urlset>')
        assert sitemap_entries(xml) == [(0, 'url', 'https://h/top', '', '', '')]
        assert sitemap_entries_seq(xml) == [(0, 'url', 'https://h/top', '', '', '')]


class TestDifferential:
    def test_parity_on_corpus_dim(self):
        kinds = set()
        for h in corpus.ROBOTS_HOSTS:
            xml = corpus.sitemap_xml_for(h)
            recs = sitemap_entries(xml)
            assert recs == sitemap_entries_seq(xml), h
            kinds |= {r[1] for r in recs}
        assert kinds == {'url', 'sitemap'}

    def test_parity_on_generated_soup(self):
        rng = random.Random(19)
        for _ in range(300):
            root = rng.choice(['urlset', 'sitemapindex'])
            parts = [f'<{root} xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">']
            for _ in range(rng.randrange(0, 6)):
                kind = rng.choice(['url', 'sitemap'])
                fields = []
                for f in rng.sample(['loc', 'lastmod', 'changefreq', 'priority'],
                                    rng.randrange(0, 4)):
                    v = rng.choice(['https://h/x?a=1&amp;b=2', ' padded ', '0.5',
                                    '<![CDATA[raw&stuff]]>', '&#65;bc'])
                    fields.append(f'<{f}>{v}</{f}>')
                rng.shuffle(fields)
                parts.append(f'<{kind}>' + ''.join(fields) + f'</{kind}>')
                if rng.random() < 0.2:
                    parts.append('<!-- comment -->')
            parts.append(f'</{root}>')
            xml = ''.join(parts)
            assert sitemap_entries(xml) == sitemap_entries_seq(xml), xml

    def test_engine_never_crashes_on_mutations(self):
        rng = random.Random(23)
        base = corpus.sitemap_xml_for(corpus.ROBOTS_HOSTS[0])
        for _ in range(80):
            chars = list(base)
            for _ in range(rng.randrange(1, 5)):
                chars[rng.randrange(len(chars))] = rng.choice('<>/&[]!x')
            mutated = ''.join(chars)[:rng.randrange(1, len(base))]
            assert isinstance(sitemap_entries(mutated), list)


class TestSparkOperator:
    def test_operator_matches_twin(self, spark):
        from markdown_articles_tool_spark.corpus import sitemap_files_df
        from markdown_articles_tool_spark.operators.sitemap import extract_sitemap_entries

        got = sorted(tuple(r) for r in
                     extract_sitemap_entries(sitemap_files_df(spark)).collect())
        exp = sorted((h, *rec) for h in corpus.ROBOTS_HOSTS
                     for rec in sitemap_entries_seq(corpus.sitemap_xml_for(h)))
        assert got == exp and got
