#!/usr/bin/env python
"""Benchmark harness.

Default mode: run the headline queries at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and
print ONE JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1, "docs_per_sec": ...}

``--dual`` mode: evidence for the north_rule's two-cluster-size scaling
criterion — run the same corpus transform in two subprocesses at
local[8] and local[32] (standing in for N vs 4N executors; no real
cluster in this sandbox), compute throughput at both plus scaling
efficiency = tput(32) / (4 x tput(8)), and write BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.1')
CPUS = int(os.environ.get('SPARK_GRAFT_CPUS', '32'))
BENCH_DOCS = int(os.environ.get('SPARK_GRAFT_BENCH_DOCS', '48000'))
SCALE_DOCS = int(os.environ.get('SPARK_GRAFT_SCALE_DOCS', '200000'))


def _force(df) -> int:
    """Force full evaluation of every column (count() alone lets
    Catalyst prune the expensive ones)."""
    df.write.format('noop').mode('overwrite').save()
    return 0


def run_bench(emit_json: bool = True) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry_mod
    from markdown_articles_tool_spark.corpus import pages_df
    from markdown_articles_tool_spark.pipeline import transform_documents
    from markdown_articles_tool_spark.session import get_spark

    spark = get_spark(app_name='mats-bench', master=f'local[{CPUS}]', shuffle_partitions=max(CPUS, 8))

    sf = 0.1 if 'sf0.1' in SF_DIR else (0.01 if 'sf0.01' in SF_DIR else 0.001)
    qs = entry_mod.queries()
    timings: dict[str, float] = {}

    # headline 1: full corpus transform at bench scale (docs/sec metric).
    # The corpus (realistic multi-KB "fat" pages) is materialized to
    # parquet first — production reads an Iceberg/parquet table, so the
    # timed run measures scan + transform, not synthetic generation.
    # One untimed warmup run excludes JVM-JIT / Python-worker-pool
    # spin-up; each timed trial clears the cache and rebuilds the plan,
    # so a trial is a complete cold-data run; min-of-N defeats the
    # noisy-neighbor load on this shared box.
    import tempfile

    trials = int(os.environ.get('SPARK_GRAFT_BENCH_TRIALS', '3'))
    tmp = tempfile.mkdtemp(prefix='mats_bench_')
    pages_path = os.path.join(tmp, 'pages')
    pages_df(spark, BENCH_DOCS, fat=True).select('url', 'text').write.mode('overwrite').parquet(pages_path)
    docs = spark.read.parquet(pages_path)
    _force(transform_documents(docs.limit(2000), entry_mod._transform_cfg()).docs_out)  # warmup
    spark.catalog.clearCache()

    transform_sec = float('inf')
    for _ in range(trials):
        t0 = time.perf_counter()
        res = transform_documents(docs, entry_mod._transform_cfg())
        _force(res.docs_out)
        transform_sec = min(transform_sec, time.perf_counter() - t0)
        spark.catalog.clearCache()
    timings['transform_corpus'] = round(transform_sec, 3)

    import shutil

    shutil.rmtree(tmp, ignore_errors=True)

    headline = [
        'extract_links_corpus',
        'pricing_summary',
        'revenue_topk',
        'events_sessionize',
        'exact_dedup',
        'ngram_jaccard_adjacent',
        'minhash_candidates',
        'token_stats',
        'langid',
        'fingerprint',
        'ann_cosine_topk',
    ]
    for name in headline:
        # two runs, report the min: excludes first-scan/JIT effects so
        # numbers are comparable across parallelism levels
        best = float('inf')
        for _ in range(2):
            t0 = time.perf_counter()
            _force(qs[name](spark, SF_DIR))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    out = {
        'metric': 'headline query wall time (sum); docs/sec for the corpus transform',
        'value': total,
        'unit': 'sec',
        'queries': timings,
        'sf': sf,
        'bench_docs': BENCH_DOCS,
        'docs_per_sec': round(BENCH_DOCS / transform_sec, 2),
        'cpus': CPUS,
    }
    spark.stop()
    if emit_json:
        print(json.dumps(out))
    return out


def run_dual() -> None:
    """local[8] vs local[32] scaling-efficiency evidence (N vs 4N).

    Runs at SCALE_DOCS (larger than the default bench corpus) so the
    distributed compute dwarfs the per-action orchestration floor —
    the regime a 10^12-doc production run actually lives in."""
    results = {}
    for cpus in (8, 32):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=SF_DIR,
                   SPARK_GRAFT_BENCH_DOCS=str(SCALE_DOCS))
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env, capture_output=True, text=True,
            check=True,
        )
        line = proc.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)
    t8 = results[8]['queries']['transform_corpus']
    t32 = results[32]['queries']['transform_corpus']
    tput8 = SCALE_DOCS / t8
    tput32 = SCALE_DOCS / t32
    eff = tput32 / (4 * tput8)
    total8 = results[8]['value']
    total32 = results[32]['value']
    eff_total = (1 / total32) / (4 * (1 / total8))

    os.makedirs('BENCH', exist_ok=True)
    with open('BENCH/BASELINE.md', 'w') as f:
        f.write(
            '# BENCH/BASELINE — throughput + scaling efficiency\n\n'
            'Two-cluster-size criterion evidenced at two parallelism levels on one\n'
            'machine (no real cluster in this sandbox): identical input + code, only\n'
            '`local[8]` vs `local[32]` (N vs 4N cores standing in for N vs 4N\n'
            'executors). Corpus transform = full extraction → fetch-dedup → rewrite\n'
            f'pipeline over {SCALE_DOCS} synthetic CC-style documents (multi-KB fat\n'
            'pages, ~12 image links each); min of cache-cleared trials per level\n'
            'to defeat noisy-neighbor load on this shared box.\n\n'
            '| metric | local[8] | local[32] | scaling efficiency tput32/(4·tput8) |\n'
            '|---|---|---|---|\n'
            f'| corpus transform (sec) | {t8:.2f} | {t32:.2f} | |\n'
            f'| corpus transform (docs/sec) | {tput8:.1f} | {tput32:.1f} | **{eff:.3f}** |\n'
            f'| all headline queries (sec) | {total8:.2f} | {total32:.2f} | {eff_total:.3f} |\n\n'
            f'North-rule target: efficiency >= 0.8 → **{"MET" if eff >= 0.8 else "NOT MET"}**\n\n'
            '## Per-query seconds\n\n'
            '| query | local[8] | local[32] |\n|---|---|---|\n'
            + '\n'.join(
                f"| {name} | {results[8]['queries'][name]} | {results[32]['queries'][name]} |"
                for name in results[8]['queries']
            )
            + '\n'
        )
    print(json.dumps({'efficiency': round(eff, 4), 'tput8': round(tput8, 2), 'tput32': round(tput32, 2)}))


if __name__ == '__main__':
    if '--dual' in sys.argv:
        run_dual()
    else:
        run_bench()
