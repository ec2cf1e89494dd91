"""Crawl frontier assembly — the tier composition: outlink records
(core/htmlmeta.py) gated by robots policy (core/robots.py), minus the
already-crawled set, collapsed to distinct fetch targets and
prioritized by host PageRank (training/linkgraph.py).

The reference tool (artiomn/markdown_articles_tool) fetches a fixed
article list; a crawl loop needs the NEXT list — this operator builds
it from what the current batch of pages linked to.

Scale shape
-----------
* the robots gate is the broadcast join + pandas pass of
  ``operators/robots.crawl_allowed`` — no shuffle of the link table;
* the already-crawled exclusion is a SHUFFLE left-anti join on the
  URL: at web scale the crawled set is page-sized (10^12), so
  broadcasting it is impossible — both sides hash-partition on the
  join key, the honest shape;
* the distinct-target collapse ``groupBy('abs_url')`` REUSES the
  anti-join's partitioning (same key), so it adds NO Exchange — the
  plan test pins that;
* the priority join broadcasts the HOST-sized rank table (lowercased
  at join time — ``host_edges`` keys ranks by verbatim host case,
  the gate by lowercased authority; case-colliding hosts collapse
  under max, none exist in corpus).

Total: the page-sized data crosses the wire exactly once (anti-join),
everything else is map-side or host-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.robots import crawl_allowed
from .linkgraph import host_edges, pagerank_hosts

FRONTIER_COLUMNS = ('abs_url', 'dst_host', 'n_refs', 'rank_units')


def crawl_frontier(outlinks: DataFrame, robots: DataFrame, crawled: DataFrame,
                   agent: str = 'graftbot', iterations: int = 10,
                   url_col: str = 'url') -> DataFrame:
    """(abs_url, dst_host, n_refs, rank_units) per NEW fetch target:
    robots-allowed for ``agent``, not in ``crawled``, with the number
    of referencing link records and the destination host's integer
    PageRank (0 for hosts outside the rank table)."""
    # the outlink records feed BOTH the robots gate and the PageRank
    # edge build — persist the narrow projection so the extraction
    # UDF upstream runs once per build, not once per consumer (the
    # pipeline.extract_pass_links discipline; r6 verdict #2)
    outlinks = outlinks.persist()
    gated = crawl_allowed(outlinks, robots, agent).where('allowed')
    fresh = gated.join(
        crawled.select(F.col(url_col).alias('_crawled_url')),
        gated.abs_url == F.col('_crawled_url'), 'left_anti',
    )
    return _assemble_frontier(fresh, outlinks, iterations)


def _assemble_frontier(fresh: DataFrame, outlinks: DataFrame,
                       iterations: int) -> DataFrame:
    '''Shared frontier tail: collapse fresh link records to distinct
    targets (the groupBy reuses the upstream partitioning where one
    exists) and attach the broadcast host-rank priority.'''
    targets = fresh.groupBy('abs_url').agg(
        F.count(F.lit(1)).alias('n_refs'),
        F.min('dst_host').alias('dst_host'),  # functionally dependent on abs_url
    )
    ranks = (
        pagerank_hosts(host_edges(outlinks), iterations=iterations)
        .groupBy(F.lower('host').alias('_rank_host'))
        .agg(F.max('rank_units').alias('rank_units'))
    )
    return targets.join(
        F.broadcast(ranks), targets.dst_host == ranks._rank_host, 'left'
    ).select(
        'abs_url', 'dst_host', 'n_refs',
        F.coalesce('rank_units', F.lit(0)).alias('rank_units'),
    )


def frontier_schedule(frontier: DataFrame, max_wave: int | None = None,
                      n_salts: int | None = None) -> DataFrame:
    """Politeness scheduling: assign every frontier target its fetch
    WAVE — the 1-based position within its host under the total order
    (n_refs desc, abs_url asc) — so a crawler that issues one request
    per host per cycle fetches wave 1 everywhere, then wave 2, …
    deterministic under any partitioning (the order is total).

    Scale shape (r6 — mega-host armor): a per-host window numbers a
    host's ENTIRE frontier in one task, and crawl frontiers are
    Zipf-hosted — one domain can hold 10^9 targets.  When ``max_wave``
    is set (every production consumer cuts at a small budget):

    * ``max_wave <= spark.sql.optimizer.windowGroupLimitThreshold``
      (default 1000): the plain window + rank filter is kept and
      Catalyst's InferWindowGroupLimit turns it into the two-level
      bounded top-k itself — a Partial WindowGroupLimit keeps only
      ``max_wave`` rows per host per MAP partition before the
      exchange, the Final one ranks the ≤ max_wave·n_map_parts
      survivors (plan-pinned in tests/test_plan_quality.py);
    * above the threshold (or with ``n_salts`` forced) the explicit
      salted two-level ``util.grouped_topk`` takes over — identical
      output for wave ≤ max_wave because the order is total.

    ``max_wave=None`` is the labeled EXACT path (unbounded numbering,
    full per-host sort) — correct, and the right tool only when the
    complete ordering is genuinely wanted."""
    from pyspark.sql import Window

    order = [F.desc('n_refs'), F.asc('abs_url')]
    if max_wave is None:
        w = Window.partitionBy('dst_host').orderBy(*order)
        return frontier.withColumn('wave', F.row_number().over(w))
    try:
        threshold = int(frontier.sparkSession.conf.get(
            'spark.sql.optimizer.windowGroupLimitThreshold'))
    except Exception:
        threshold = 1000
    if n_salts is None and 0 <= int(max_wave) <= threshold:
        w = Window.partitionBy('dst_host').orderBy(*order)
        return (
            frontier.withColumn('wave', F.row_number().over(w))
            .where(F.col('wave') <= int(max_wave))
        )
    from .util import grouped_topk

    return grouped_topk(
        frontier, ['dst_host'], order, int(max_wave),
        salt_on=['abs_url'], rank_col='wave', n_salts=n_salts or 32,
    )


def frontier_budget(
    frontier: DataFrame,
    robots: DataFrame,
    agent: str = 'graftbot',
    cycle_seconds: float = 60.0,
    default_delay: float = 5.0,
    max_budget: int = 8,
) -> DataFrame:
    """Crawl-delay-aware politeness budgets: the wave schedule of
    ``frontier_schedule``, cut per host at
    ``budget = clamp(floor(cycle_seconds / delay), 1, max_budget)``
    where ``delay`` is the agent's effective robots crawl-delay
    (core/robots.crawl_delay: last valid value, specific agent over
    ``*``), ``default_delay`` when the host has no robots or no valid
    delay, and an explicit ``delay: 0`` means "no delay constraint" →
    ``max_budget``.

    Scale shape: the delay decision runs ONCE PER HOST over the
    host-sized robots dim (one Arrow pass over the broadcast side —
    never per frontier row), then the tiny (host, budget) frame
    broadcast-joins onto the scheduled frontier; the only window is
    frontier_schedule's host-partitioned one.  Returns (abs_url,
    dst_host, n_refs, wave, budget).
    """
    import pandas as pd
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    from ..core.robots import crawl_delay, parse_robots

    def _budget(delay) -> int:
        if delay is None:
            delay = float(default_delay)
        if delay == 0:
            return int(max_budget)
        return max(1, min(int(max_budget), int(float(cycle_seconds) // delay)))

    out_schema = StructType([
        StructField('host', StringType()),
        StructField('budget', IntegerType()),
    ])

    def per_host(batches):
        for pdf in batches:
            rows = [
                (h, _budget(crawl_delay(parse_robots(txt or ''), agent)))
                for h, txt in zip(pdf['host'], pdf['robots_txt'])
            ]
            yield pd.DataFrame(rows, columns=['host', 'budget'])

    budgets = robots.select('host', 'robots_txt').mapInPandas(per_host, out_schema)
    # budgets clamp to [1, max_budget], so waves beyond max_budget can
    # never survive the cut — route through the BOUNDED schedule path
    # (identical output; a mega-host's frontier is never fully sorted)
    sched = frontier_schedule(frontier, max_wave=int(max_budget))
    # dst_host is lowercased upstream (crawl_allowed extracts it with
    # F.lower); lowercase the robots-dim side at join time too, or a
    # mixed-case host in the robots table silently never matches and
    # its budget falls back to the default (ADVICE r5)
    out = (
        sched.join(F.broadcast(budgets),
                   sched.dst_host == F.lower(budgets.host), 'left')
        .withColumn('budget', F.coalesce(F.col('budget'), F.lit(_budget(None))))
        .where(F.col('wave') <= F.col('budget'))
    )
    return out.select('abs_url', 'dst_host', 'n_refs', 'wave', 'budget')


def crawl_frontier_bloom(outlinks: DataFrame, robots: DataFrame,
                         crawled: DataFrame, agent: str = 'graftbot',
                         iterations: int = 10, url_col: str = 'url',
                         m_bits: int = 1 << 20,
                         k_hashes: int = 5) -> DataFrame:
    """``crawl_frontier`` with the already-seen test done by a BLOOM
    FILTER over the crawled URL set instead of the exact anti-join --
    the Heritrix/Nutch already-seen-URI structure, and the shape the
    anti-join grows into at 10^12 crawled pages: the exact form
    re-shuffles the outlink records against a corpus-sized crawled
    table on every frontier build, while the filter is built once by
    a bounded aggregation (<= m/64 rows regardless of corpus size),
    broadcast, and probed SCAN-SIDE -- the outlinks never shuffle for
    the membership test at all.

    The trade is explicit and one-sided: a false positive silently
    drops a genuinely-new URL from the frontier (rate ~
    (1-e^(-kn/m))^k -- size m accordingly; the URL resurfaces on the
    next build from any new reference), while already-crawled URLs
    are NEVER re-admitted (no false negatives) -- the safe direction
    for a politeness-bound crawler.  Same frozen position spec as
    training/bloomdedup (JVM xxhash64 -> Kirsch-Mitzenmacher), so the
    sequential twin replays every verdict including the FP drops.
    """
    from .bloomdedup import bloom_probe, build_bloom

    # same double-consumer shape as crawl_frontier: robots gate +
    # PageRank edges — one persist, one extraction pass
    outlinks = outlinks.persist()
    gated = crawl_allowed(outlinks, robots, agent).where('allowed')
    bloom = build_bloom(
        crawled.select(F.col(url_col).alias('_k')), '_k', m_bits, k_hashes)
    fresh = (
        bloom_probe(gated, bloom, key_col='abs_url',
                    m_bits=m_bits, k_hashes=k_hashes)
        .where('novel').drop('novel')
    )
    return _assemble_frontier(fresh, outlinks, iterations)
