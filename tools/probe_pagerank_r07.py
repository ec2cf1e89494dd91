#!/usr/bin/env python
"""r7 probe: leaner PageRank iteration body vs the shipped one.

Variants (all must produce BIT-IDENTICAL (host, rank_units)):

  shipped  — training/linkgraph.pagerank_hosts as committed
  union    — the nodes_f left-join folded into the contribution
             aggregation (union + ONE groupBy per iteration); dangling
             share still a crossJoin(broadcast(agg)).
  lit      — union shape + dangling share collected to the driver as a
             scalar per iteration (ranks are already materialized by
             the eager localCheckpoint, so the collect is a cached
             one-stage job) and embedded as a LITERAL — no broadcast
             exchange, no crossJoin node.

Times each variant's full 10-iteration build (min of N trials) over
the sf0.1 host graph, isolated through the noop sink.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from markdown_articles_tool_spark.session import get_spark
from markdown_articles_tool_spark.training.linkgraph import SCALE, host_edges, pagerank_hosts

SF_DIR = os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.1')
CPUS = int(os.environ.get('SPARK_GRAFT_CPUS', '32'))


def pagerank_union(edges, iterations=10, use_literal_dang=False):
    edges = edges.select('src_host', 'dst_host', 'n_links').persist()
    nodes = (
        edges.select(F.col('src_host').alias('host'))
        .union(edges.select(F.col('dst_host').alias('host')))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()
    base = SCALE // n_nodes
    out_w = edges.groupBy('src_host').agg(F.sum('n_links').alias('out_w'))
    edges_w = edges.join(out_w, 'src_host').persist()
    srcs = edges_w.select(F.col('src_host').alias('host')).distinct().withColumn('_has_out', F.lit(True))
    nodes_f = nodes.join(srcs, 'host', 'left').select(
        'host', F.coalesce('_has_out', F.lit(False)).alias('_has_out')
    ).persist()

    ranks = nodes_f.withColumn('rank_units', F.lit(base).cast('long'))
    ranks = ranks.localCheckpoint(eager=True)

    for _it in range(iterations):
        contrib_rows = (
            edges_w.join(ranks, edges_w.src_host == ranks.host)
            .select(
                F.col('dst_host').alias('host'),
                F.expr(
                    'CAST((CAST(rank_units AS DECIMAL(38,0)) * n_links) DIV out_w AS LONG)'
                ).alias('contrib'),
                F.lit(None).cast('boolean').alias('_flag'),
            )
        )
        node_rows = nodes_f.select(
            'host', F.lit(0).cast('long').alias('contrib'),
            F.col('_has_out').alias('_flag'),
        )
        agg = (
            contrib_rows.union(node_rows)
            .groupBy('host')
            .agg(F.sum('contrib').alias('in_units'), F.max('_flag').alias('_has_out'))
        )
        if use_literal_dang:
            dang_mass = (
                ranks.where(~F.col('_has_out'))
                .agg(F.coalesce(F.sum('rank_units'), F.lit(0)).alias('m'))
                .collect()[0]['m']
            )
            dang_share = dang_mass // n_nodes
            new_ranks = agg.select(
                'host', '_has_out',
                F.expr(
                    f'(15 * {base} + 85 * (in_units + {dang_share})) DIV 100'
                ).alias('rank_units'),
            )
        else:
            dang_row = (
                ranks.where(~F.col('_has_out'))
                .agg(F.coalesce(F.sum('rank_units'), F.lit(0)).alias('dang_mass'))
                .select(F.expr(f'dang_mass DIV {n_nodes}').alias('dang_share'))
            )
            new_ranks = (
                agg.crossJoin(F.broadcast(dang_row))
                .select(
                    'host', '_has_out',
                    F.expr(
                        f'(15 * {base} + 85 * (in_units + dang_share)) DIV 100'
                    ).alias('rank_units'),
                )
            )
        ranks = new_ranks.localCheckpoint(eager=True)

    nodes.unpersist()
    edges_w.unpersist()
    nodes_f.unpersist()
    edges.unpersist()
    return ranks.select('host', 'rank_units')


def main():
    trials = int(os.environ.get('TRIALS', '3'))
    spark = get_spark(app_name='probe-pagerank', master=f'local[{CPUS}]',
                      shuffle_partitions=CPUS)
    from markdown_articles_tool_spark.corpus import pages_df
    from markdown_articles_tool_spark.operators.htmlmeta import extract_page_outlinks
    import __spark_entry__ as entry

    n = entry._corpus_n(SF_DIR)

    def build_edges():
        return host_edges(extract_page_outlinks(pages_df(spark, n)))

    # correctness first: bit-identical ranks across variants
    shipped = {r['host']: r['rank_units'] for r in pagerank_hosts(build_edges(), 10).collect()}
    spark.catalog.clearCache()
    union_v = {r['host']: r['rank_units'] for r in pagerank_union(build_edges(), 10, False).collect()}
    spark.catalog.clearCache()
    lit_v = {r['host']: r['rank_units'] for r in pagerank_union(build_edges(), 10, True).collect()}
    spark.catalog.clearCache()
    assert union_v == shipped, 'union variant diverged'
    assert lit_v == shipped, 'literal variant diverged'
    print(f'identical over {len(shipped)} hosts: OK', flush=True)

    def timed(fn):
        best = float('inf')
        for _ in range(trials):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn().write.format('noop').mode('overwrite').save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    for name, fn in [
        ('shipped', lambda: pagerank_hosts(build_edges(), 10)),
        ('union', lambda: pagerank_union(build_edges(), 10, False)),
        ('lit', lambda: pagerank_union(build_edges(), 10, True)),
        ('shipped2', lambda: pagerank_hosts(build_edges(), 10)),
    ]:
        print(name, timed(fn), flush=True)
    spark.stop()


if __name__ == '__main__':
    main()
