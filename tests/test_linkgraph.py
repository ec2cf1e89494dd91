"""Host link graph + integer PageRank (training/linkgraph.py): edge
collapse semantics, engine-vs-sequential-twin equality, bit-exact
partition invariance, dangling mass, plan shape."""

import os
import sys

import pytest
from pyspark.sql import functions as F

from markdown_articles_tool_spark.training.linkgraph import (
    SCALE,
    host_edges,
    pagerank_hosts,
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))
from oracle_kernels import pagerank_seq  # noqa: E402


def _edges_df(spark, triples):
    return spark.createDataFrame(
        triples, 'src_host string, dst_host string, n_links long'
    )


def _ranks(df):
    return {r['host']: r['rank_units'] for r in df.collect()}


@pytest.mark.usefixtures('spark')
class TestHostEdges:
    def test_collapse_drops_selfloops_and_hostless(self, spark):
        links = spark.createDataFrame(
            [
                ('https://a.example/p1', 'https://b.example/x'),
                ('https://a.example/p2', 'https://b.example/y'),
                ('https://a.example/p1', 'https://a.example/nav'),   # self-loop
                ('https://b.example/q', 'https://a.example/z'),
                ('not-a-url', 'https://b.example/x'),                # host-less src
                ('https://a.example/p3', 'garbage'),                 # host-less dst
            ],
            'url string, abs_url string',
        )
        got = {
            (r['src_host'], r['dst_host']): r['n_links']
            for r in host_edges(links).collect()
        }
        assert got == {('a.example', 'b.example'): 2, ('b.example', 'a.example'): 1}

    def test_one_exchange_only(self, spark):
        links = spark.createDataFrame(
            [('https://a.example/p', 'https://b.example/x')], 'url string, abs_url string'
        )
        plan = host_edges(links)._jdf.queryExecution().executedPlan().toString()
        # host extraction + self-loop filter are scan-side; ONE shuffle
        # (the groupBy) is the whole cost
        assert plan.count('Exchange') == 1


@pytest.mark.usefixtures('spark')
class TestPageRank:
    # a small asymmetric graph with a dangling sink (d has no out-edges)
    GRAPH = [
        ('a', 'b', 2), ('a', 'c', 1), ('b', 'c', 3),
        ('c', 'a', 1), ('b', 'd', 1),
    ]

    def test_matches_sequential_twin(self, spark):
        got = _ranks(pagerank_hosts(_edges_df(spark, self.GRAPH), iterations=7))
        want = pagerank_seq(self.GRAPH, iterations=7)
        assert got == want
        # mass sanity: floor division only ever loses units
        assert 0 < sum(got.values()) <= SCALE

    def test_partition_invariance_bit_exact(self, spark):
        base = None
        for parts in (1, 3, 16):
            df = _edges_df(spark, self.GRAPH).repartition(parts)
            got = _ranks(pagerank_hosts(df, iterations=5))
            if base is None:
                base = got
            else:
                assert got == base, parts

    def test_dangling_mass_redistributes(self, spark):
        # star into a sink: without dangling redistribution the sink
        # hoards everything and sources decay to the floor
        graph = [('s1', 'hub', 1), ('s2', 'hub', 1), ('s3', 'hub', 1)]
        got = _ranks(pagerank_hosts(_edges_df(spark, graph), iterations=10))
        want = pagerank_seq(graph, iterations=10)
        assert got == want
        assert got['hub'] > got['s1']
        # dangling share flows back: sources stay above the bare
        # teleport floor 15% * base
        assert got['s1'] > (15 * (SCALE // 4)) // 100

    def test_empty_graph(self, spark):
        df = _edges_df(spark, [])
        out = pagerank_hosts(df, iterations=3)
        assert out.count() == 0
        assert [f.name for f in out.schema.fields] == ['host', 'rank_units']

    def test_weights_matter(self, spark):
        # same topology, different multiplicities → different fixpoint
        g1 = [('a', 'b', 1), ('a', 'c', 1), ('b', 'a', 1), ('c', 'a', 1)]
        g9 = [('a', 'b', 9), ('a', 'c', 1), ('b', 'a', 1), ('c', 'a', 1)]
        r1 = _ranks(pagerank_hosts(_edges_df(spark, g1), iterations=6))
        r9 = _ranks(pagerank_hosts(_edges_df(spark, g9), iterations=6))
        assert r1['b'] == r1['c']
        assert r9['b'] > r9['c']
        assert r9 == pagerank_seq(g9, iterations=6)

    def test_corpus_end_to_end(self, spark):
        """pages → outlinks → host edges → pagerank equals the twin fed
        with the sequentially-derived edge list."""
        import re

        from markdown_articles_tool_spark import corpus
        from markdown_articles_tool_spark.operators.htmlmeta import extract_page_outlinks
        from oracle_kernels import outlinks_seq

        n = 60
        pages = corpus.pages_df(spark, n)
        got = _ranks(pagerank_hosts(host_edges(extract_page_outlinks(pages)), iterations=4))

        host_re = re.compile(r'^[a-zA-Z]+://([^/]+)')
        edges: dict = {}
        for i in range(n):
            url = corpus.doc_url(i)
            src = host_re.match(url).group(1)
            for _ord, _href, abs_url, _anchor in outlinks_seq(url, corpus.doc_html(i)):
                m = host_re.match(abs_url)
                if m and m.group(1) != src:
                    k = (src, m.group(1))
                    edges[k] = edges.get(k, 0) + 1
        want = pagerank_seq([(s, d, w) for (s, d), w in edges.items()], iterations=4)
        assert got == want
        assert len(got) >= 8   # ring sites + cdn hosts + Mixed.Example


@pytest.mark.usefixtures('spark')
class TestAnchorProfiles:
    def _links(self, spark, rows):
        return spark.createDataFrame(rows, 'url string, abs_url string, anchor string')

    def test_external_only_empty_dropped_and_rank_order(self, spark):
        from markdown_articles_tool_spark.training.linkgraph import anchor_profiles

        rows = (
            # 2x "Great page", 1x "a page" → rank by count desc then anchor asc
            [('https://s1.example/p', 'https://t.example/x', 'Great page')] * 2
            + [('https://s2.example/p', 'https://t.example/x', 'a page')]
            # ties at count 1 break on anchor text
            + [('https://s1.example/p', 'https://t.example/y', 'zzz'),
               ('https://s2.example/p', 'https://t.example/y', 'aaa'),
               # self-loop and empty anchor never count
               ('https://t.example/p', 'https://t.example/x', 'nav self'),
               ('https://s1.example/p', 'https://t.example/x', ''),
               # host-less src dropped
               ('garbage', 'https://t.example/x', 'spam')]
        )
        got = [
            (r['abs_url'], r['rank'], r['anchor'], r['n_links'])
            for r in anchor_profiles(self._links(spark, rows), k=5)
            .orderBy('abs_url', 'rank').collect()
        ]
        assert got == [
            ('https://t.example/x', 1, 'Great page', 2),
            ('https://t.example/x', 2, 'a page', 1),
            ('https://t.example/y', 1, 'aaa', 1),
            ('https://t.example/y', 2, 'zzz', 1),
        ]

    def test_k_cut_and_min_count(self, spark):
        from markdown_articles_tool_spark.training.linkgraph import anchor_profiles

        rows = [
            ('https://s%d.example/p' % i, 'https://t.example/x', 'anchor %d' % (i % 4))
            for i in range(12)   # anchors 0..3 with 3 links each
        ]
        top = anchor_profiles(self._links(spark, rows), k=2).collect()
        assert [r['anchor'] for r in sorted(top, key=lambda r: r['rank'])] == \
            ['anchor 0', 'anchor 1']
        floor = anchor_profiles(self._links(spark, rows), k=9, min_count=4).collect()
        assert floor == []

    def test_corpus_differential(self, spark):
        """Spark aggregation == a plain Counter fold over the twin's
        outlink records, row for row."""
        from collections import Counter
        import re

        from markdown_articles_tool_spark import corpus
        from markdown_articles_tool_spark.operators.htmlmeta import extract_page_outlinks
        from markdown_articles_tool_spark.training.linkgraph import anchor_profiles
        from oracle_kernels import outlinks_seq

        n, k = 60, 3
        pages = corpus.pages_df(spark, n)
        got = [
            (r['abs_url'], r['rank'], r['anchor'], r['n_links'])
            for r in anchor_profiles(extract_page_outlinks(pages), k=k)
            .orderBy('abs_url', 'rank').collect()
        ]

        host_re = re.compile(r'^[a-zA-Z]+://([^/]+)')
        counts: Counter = Counter()
        for i in range(n):
            url = corpus.doc_url(i)
            src = host_re.match(url).group(1)
            for _ord, _href, abs_url, anchor in outlinks_seq(url, corpus.doc_html(i)):
                m = host_re.match(abs_url)
                if m and m.group(1) != src and anchor:
                    counts[(abs_url, anchor)] += 1
        want = []
        by_target: dict = {}
        for (abs_url, anchor), c in counts.items():
            by_target.setdefault(abs_url, []).append((anchor, c))
        for abs_url in sorted(by_target):
            ranked = sorted(by_target[abs_url], key=lambda ac: (-ac[1], ac[0]))[:k]
            want.extend(
                (abs_url, rnk + 1, anchor, c) for rnk, (anchor, c) in enumerate(ranked)
            )
        assert got == want
        assert len(got) > 10

    def test_two_exchanges_with_partial_agg(self, spark):
        from markdown_articles_tool_spark.training.linkgraph import anchor_profiles

        links = self._links(
            spark, [('https://s.example/p', 'https://t.example/x', 'hi')]
        )
        plan = anchor_profiles(links)._jdf.queryExecution().executedPlan().toString()
        assert plan.count('Exchange') == 2          # (abs_url, anchor) agg + abs_url window
        assert 'partial_count' in plan or 'HashAggregate' in plan
