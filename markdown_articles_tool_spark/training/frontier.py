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
    gated = crawl_allowed(outlinks, robots, agent).where('allowed')
    fresh = gated.join(
        crawled.select(F.col(url_col).alias('_crawled_url')),
        gated.abs_url == F.col('_crawled_url'), 'left_anti',
    )
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


def frontier_schedule(frontier: DataFrame, max_wave: int | None = None) -> DataFrame:
    """Politeness scheduling: assign every frontier target its fetch
    WAVE — the 1-based position within its host under the total order
    (n_refs desc, abs_url asc) — so a crawler that issues one request
    per host per cycle fetches wave 1 everywhere, then wave 2, …
    deterministic under any partitioning (the order is total).

    Scale shape: ONE window over dst_host — host-sized partitions of
    the already-collapsed distinct targets (a mega-host's partition
    holds its frontier entries, not its raw inlinks); ``max_wave``
    caps the per-host fetch budget for the cycle, the standard
    window-top-k cut."""
    from pyspark.sql import Window

    w = Window.partitionBy('dst_host').orderBy(
        F.desc('n_refs'), F.asc('abs_url'))
    out = frontier.withColumn('wave', F.row_number().over(w))
    if max_wave is not None:
        out = out.where(F.col('wave') <= max_wave)
    return out


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
    sched = frontier_schedule(frontier)
    out = (
        sched.join(F.broadcast(budgets), sched.dst_host == budgets.host, 'left')
        .withColumn('budget', F.coalesce(F.col('budget'), F.lit(_budget(None))))
        .where(F.col('wave') <= F.col('budget'))
    )
    return out.select('abs_url', 'dst_host', 'n_refs', 'wave', 'budget')
