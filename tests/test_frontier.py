"""Crawl-frontier composition (training/frontier.py): differential vs
the chained independent twins, exclusion/dedup goldens, and the plan
lock for the one-page-sized-shuffle shape."""

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))

from markdown_articles_tool_spark import corpus
from markdown_articles_tool_spark.core import robots as R
from markdown_articles_tool_spark.core.htmlmeta import extract_outlinks

from oracle_kernels import (
    pagerank_seq,
    robots_allowed_seq,
    robots_dst_host_seq,
    robots_url_path_seq,
)

HOST_RE = re.compile(r'^[a-zA-Z]+://([^/]+)')


def twin_frontier(n):
    parsed = {h: R.parse_robots(corpus.robots_txt_for(h)) for h in corpus.ROBOTS_HOSTS}
    crawled = {corpus.doc_url(i) for i in range(n)}
    refs, dhost, edges = defaultdict(int), {}, defaultdict(int)
    for i in range(n):
        url = corpus.doc_url(i)
        m = HOST_RE.match(url)
        src = m.group(1) if m else ''
        for _o, _h, abs_url, _a in extract_outlinks(url, corpus.doc_html(i)):
            md = HOST_RE.match(abs_url)
            dst = md.group(1) if md else ''
            if src and dst and src != dst:
                edges[(src, dst)] += 1
            host = robots_dst_host_seq(abs_url)
            recs = parsed.get(host)
            ok = True if recs is None else robots_allowed_seq(
                recs, 'graftbot', robots_url_path_seq(abs_url))
            if ok and abs_url not in crawled:
                refs[abs_url] += 1
                dhost[abs_url] = host
    ranks = pagerank_seq([(s, d, w) for (s, d), w in edges.items()], iterations=10)
    low = {}
    for h, r in ranks.items():
        low[h.lower()] = max(low.get(h.lower(), 0), r)
    return sorted((u, dhost[u], c, low.get(dhost[u], 0)) for u, c in refs.items())


class TestFrontier:
    def test_matches_twin_composition(self, spark):
        from markdown_articles_tool_spark.corpus import pages_df, robots_files_df
        from markdown_articles_tool_spark.operators.htmlmeta import extract_page_outlinks
        from markdown_articles_tool_spark.training.frontier import crawl_frontier

        n = 40
        pages = pages_df(spark, n)
        df = crawl_frontier(extract_page_outlinks(pages), robots_files_df(spark),
                            pages.select('url'))
        got = sorted(tuple(r) for r in df.collect())
        assert got == twin_frontier(n)
        assert got  # non-empty
        assert any(r[3] > 0 for r in got)  # priorities attached

    def test_crawled_and_blocked_targets_excluded(self, spark):
        from markdown_articles_tool_spark.corpus import pages_df, robots_files_df
        from markdown_articles_tool_spark.operators.htmlmeta import extract_page_outlinks
        from markdown_articles_tool_spark.operators.robots import crawl_allowed
        from markdown_articles_tool_spark.training.frontier import crawl_frontier

        n = 40
        pages = pages_df(spark, n)
        links = extract_page_outlinks(pages)
        frontier = {r['abs_url'] for r in crawl_frontier(
            links, robots_files_df(spark), pages.select('url')).collect()}
        crawled = {r['url'] for r in pages.select('url').collect()}
        assert not frontier & crawled
        gated = crawl_allowed(links, robots_files_df(spark), 'graftbot').collect()
        blocked = {r['abs_url'] for r in gated if not r['allowed']}
        assert blocked and not frontier & blocked
        # the planted in-corpus document links (i%6==2 → decade leader)
        # make the already-crawled anti-join non-vacuous
        in_corpus = {r['abs_url'] for r in gated if r['abs_url'] in crawled}
        assert in_corpus

    def test_schedule_waves_and_partition_invariance(self, spark):
        from markdown_articles_tool_spark.training.frontier import frontier_schedule

        rows = [('https://h1/x', 'h1', 5, 100), ('https://h1/y', 'h1', 5, 100),
                ('https://h1/z', 'h1', 9, 100), ('https://h2/a', 'h2', 1, 7)]
        df = spark.createDataFrame(
            rows, 'abs_url string, dst_host string, n_refs long, rank_units long')
        got = {r['abs_url']: r['wave'] for r in frontier_schedule(df).collect()}
        # n_refs desc, then abs_url asc inside the tie
        assert got == {'https://h1/z': 1, 'https://h1/x': 2, 'https://h1/y': 3,
                       'https://h2/a': 1}
        capped = frontier_schedule(df, max_wave=2).collect()
        assert {r['abs_url'] for r in capped} == {
            'https://h1/z', 'https://h1/x', 'https://h2/a'}
        for parts in (2, 7):
            again = {r['abs_url']: r['wave'] for r in
                     frontier_schedule(df.repartition(parts)).collect()}
            assert again == got

    def test_one_page_sized_shuffle_plan(self, spark):
        from markdown_articles_tool_spark.corpus import pages_df, robots_files_df
        from markdown_articles_tool_spark.operators.htmlmeta import extract_page_outlinks
        from markdown_articles_tool_spark.training.frontier import crawl_frontier

        old = spark.conf.get('spark.sql.autoBroadcastJoinThreshold')
        spark.conf.set('spark.sql.autoBroadcastJoinThreshold', '-1')
        try:
            pages = pages_df(spark, 20)
            df = crawl_frontier(extract_page_outlinks(pages), robots_files_df(spark),
                                pages.select('url'))
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString('formatted'))
        finally:
            spark.conf.set('spark.sql.autoBroadcastJoinThreshold', old)
        shuffles = re.findall(
            r'\(\d+\) Exchange\nInput \[\d+\]: \[[^\]]*\]\nArguments: hashpartitioning\(([^,]+),',
            plan)
        keys = [s.split('#')[0] for s in shuffles]
        # exactly: anti-join left (abs_url) + right (_crawled_url) +
        # the host-sized edge aggregation; the distinct-target groupBy
        # REUSES the abs_url partitioning and adds no Exchange
        assert sorted(keys) == ['_crawled_url', '_groupingexpression', 'abs_url'], keys
        assert 'BroadcastExchange' in plan  # the rank-priority dim join
