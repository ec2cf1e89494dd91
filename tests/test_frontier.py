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


class TestBoundedSchedule:
    """r6 mega-host armor: a capped schedule must never sort a host's
    whole frontier in one task — Catalyst's WindowGroupLimit handles
    caps <= windowGroupLimitThreshold (pinned in the plan), the salted
    grouped_topk path handles the rest; both must equal the exact
    window cut (the order is total)."""

    def _hot_df(self, spark, n=400):
        # >50% of the frontier on one host
        rows = [(f'https://hot/{i:04d}', 'hot', i % 17, 1) for i in range(n // 2 + 60)]
        rows += [(f'https://h{i % 9}/p{i}', f'h{i % 9}', i % 5, 1)
                 for i in range(n - len(rows))]
        return spark.createDataFrame(
            rows, 'abs_url string, dst_host string, n_refs long, rank_units long')

    def test_window_group_limit_pinned_in_plan(self, spark):
        from markdown_articles_tool_spark.training.frontier import frontier_schedule

        df = self._hot_df(spark)
        plan = frontier_schedule(df, max_wave=5)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString('formatted'))
        # Partial (map-side, before the exchange) + Final — the
        # two-level bounded top-k, done by the optimizer itself
        assert plan.count('WindowGroupLimit') >= 2, plan

    def test_hot_host_capped_paths_match_exact(self, spark):
        from markdown_articles_tool_spark.training.frontier import frontier_schedule

        df = self._hot_df(spark)
        exact = sorted(
            tuple(r) for r in frontier_schedule(df).collect() if r['wave'] <= 4)
        got_wgl = sorted(tuple(r) for r in frontier_schedule(df, max_wave=4).collect())
        got_salted = sorted(
            tuple(r) for r in frontier_schedule(df, max_wave=4, n_salts=8).collect())
        assert got_wgl == exact
        assert got_salted == exact

    def test_salted_path_partition_invariance(self, spark):
        from markdown_articles_tool_spark.training.frontier import frontier_schedule

        df = self._hot_df(spark, 240)
        want = sorted(tuple(r) for r in
                      frontier_schedule(df.coalesce(1), max_wave=3, n_salts=4).collect())
        for parts in (5, 16):
            got = sorted(tuple(r) for r in frontier_schedule(
                df.repartition(parts), max_wave=3, n_salts=4).collect())
            assert got == want

    def test_salted_path_no_unsalted_host_window(self, spark):
        """The salted plan's FIRST window partitions on (host, salt) —
        the only per-host-alone window runs over the bounded level-1
        survivors."""
        from markdown_articles_tool_spark.training.frontier import frontier_schedule

        df = self._hot_df(spark)
        plan = frontier_schedule(df, max_wave=4, n_salts=8)._jdf.queryExecution() \
            .explainString(spark._jvm.org.apache.spark.sql.execution.ExplainMode
                           .fromString('formatted'))
        # level-1 exchange keys on (dst_host, _gtk_salt)
        assert re.search(r'hashpartitioning\(dst_host#\d+, _gtk_salt#\d+', plan), plan


class TestCrawlDelayBudget:
    def test_crawl_delay_selection_goldens(self):
        from markdown_articles_tool_spark.core.robots import crawl_delay, parse_robots

        r = parse_robots(
            'User-agent: graftbot\nDisallow: /x\nCrawl-delay: 20\n'
            'User-agent: *\nCrawl-delay: 5\n')
        assert crawl_delay(r, 'graftbot') == 20.0   # specific over *
        assert crawl_delay(r, 'GraftBot') == 20.0   # case-folded
        assert crawl_delay(r, 'nobot') == 5.0
        assert crawl_delay([], 'x') is None
        # junk values ignored; last VALID wins; floats; zero kept
        assert crawl_delay(parse_robots('User-agent: *\nCrawl-delay: abc\n'), 'x') is None
        assert crawl_delay(parse_robots(
            'User-agent: *\nCrawl-delay: 3\nCrawl-delay: 30\n'), 'x') == 30.0
        assert crawl_delay(parse_robots(
            'User-agent: *\nCrawl-delay: 30\nCrawl-delay: bad\n'), 'x') == 30.0
        assert crawl_delay(parse_robots('User-agent: *\nCrawl-delay: 12.5\n'), 'x') == 12.5
        assert crawl_delay(parse_robots('User-agent: *\nCrawl-delay: 0\n'), 'x') == 0.0
        for junk in ('5.', '.5', '1.2.3', '²', '１２', '-1', ' '):
            assert crawl_delay(parse_robots(
                f'User-agent: *\nCrawl-delay: {junk}\n'), 'x') is None, junk

    def test_budget_math_and_host_decision_once(self, spark):
        from markdown_articles_tool_spark import corpus
        from markdown_articles_tool_spark.operators.htmlmeta import extract_page_outlinks
        from markdown_articles_tool_spark.training.frontier import (
            crawl_frontier, frontier_budget, frontier_schedule)

        pages = corpus.pages_df(spark, 40)
        links = extract_page_outlinks(pages)
        robots = corpus.robots_files_df(spark)
        frontier = crawl_frontier(links, robots, pages.select('url'))
        out = frontier_budget(frontier, robots).collect()
        assert out
        # clamp(floor(60/delay),1,8): delays 4→8(clamped) 20→3 12.5→4
        # 30→2 0→8 none→8; budget constant per host and wave<=budget
        by_host = {}
        for r in out:
            by_host.setdefault(r['dst_host'], set()).add(r['budget'])
            assert 1 <= r['budget'] <= 8
            assert r['wave'] <= r['budget']
        assert all(len(b) == 1 for b in by_host.values())
        budgets = {h: next(iter(b)) for h, b in by_host.items()}
        assert len(set(budgets.values())) >= 3  # rotation gives a real spread
        # budgeted output == schedule filtered by the per-host budget
        sched = frontier_schedule(frontier).collect()
        want = {(r['abs_url'], r['wave']) for r in sched
                if r['wave'] <= budgets.get(r['dst_host'], 8)
                and r['dst_host'] in budgets}
        got = {(r['abs_url'], r['wave']) for r in out
               if r['dst_host'] in budgets}
        assert got == want


class TestFrontierBloom:
    def _inputs(self, spark):
        from markdown_articles_tool_spark import corpus
        from markdown_articles_tool_spark.operators.htmlmeta import (
            extract_page_outlinks)

        pages = corpus.pages_df(spark, 60)
        return (extract_page_outlinks(pages), corpus.robots_files_df(spark),
                pages.select('url'))

    def test_subset_of_exact_and_equal_at_generous_m(self, spark):
        from markdown_articles_tool_spark.training.frontier import (
            crawl_frontier, crawl_frontier_bloom)

        links, robots, crawled = self._inputs(spark)
        exact = {tuple(r) for r in crawl_frontier(links, robots, crawled).collect()}
        tiny = {tuple(r) for r in crawl_frontier_bloom(
            links, robots, crawled, m_bits=512, k_hashes=3).collect()}
        # FP drops only — never an extra (already-crawled) admission
        assert tiny <= exact
        big = {tuple(r) for r in crawl_frontier_bloom(
            links, robots, crawled, m_bits=1 << 20, k_hashes=5).collect()}
        assert big == exact  # FP ~ 0 at generous sizing

    def test_no_antijoin_membership_is_scan_side(self, spark):
        from markdown_articles_tool_spark.training.frontier import (
            crawl_frontier_bloom)

        links, robots, crawled = self._inputs(spark)
        plan = (crawl_frontier_bloom(links, robots, crawled)
                ._jdf.queryExecution().executedPlan().toString())
        assert 'LeftAnti' not in plan  # the membership test left the join world
