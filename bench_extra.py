#!/usr/bin/env python
"""Extra benchmarks for the optimization rounds (guide §1.1/§1.4).

``bench.py`` is FROZEN for measurement; this file is the round's
instrumentation: isolated per-query timing through the noop sink
(min of N cache-cleared trials, same discipline as bench.py) and
``explain('formatted')`` capture for the plan artifacts under
``plans/r*/``.

Usage::

    python bench_extra.py q1 q2 ...            # time the named queries
    python bench_extra.py --trials 3 q1 ...    # override trial count
    python bench_extra.py --explain plans/r07 --suffix before q1 ...
                                               # also dump <q>_<suffix>.txt
    python bench_extra.py --all                # every headline query
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.1')
CPUS = int(os.environ.get('SPARK_GRAFT_CPUS', '32'))


def _force(df) -> None:
    df.write.format('noop').mode('overwrite').save()


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry_mod
    from markdown_articles_tool_spark.session import get_spark

    args = sys.argv[1:]
    trials = 2
    explain_dir = None
    suffix = 'before'
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == '--trials':
            trials = int(args[i + 1]); i += 2
        elif a == '--explain':
            explain_dir = args[i + 1]; i += 2
        elif a == '--suffix':
            suffix = args[i + 1]; i += 2
        elif a == '--all':
            names = 'ALL'; i += 1  # type: ignore[assignment]
        else:
            names.append(a); i += 1

    mult = int(os.environ.get('SPARK_GRAFT_SHUFFLE_MULT', '1'))
    spark = get_spark(app_name='mats-bench-extra', master=f'local[{CPUS}]',
                      shuffle_partitions=max(mult * CPUS, 8))
    qs = entry_mod.queries()
    if names == 'ALL':
        names = list(qs)

    timings: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f'bench_extra: {name}')
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            df = qs[name](spark, SF_DIR)
            with open(os.path.join(explain_dir, f'{name}_{suffix}.txt'), 'w') as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
                    df._jdf.queryExecution(), 'formatted'))
            spark.catalog.clearCache()
        if trials > 0:
            best = float('inf')
            for _ in range(trials):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                _force(qs[name](spark, SF_DIR))
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
            print(json.dumps({name: timings[name]}), flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({'sf_dir': SF_DIR, 'cpus': CPUS, 'trials': trials,
                      'queries': timings,
                      'total': round(sum(timings.values()), 3)}))
    spark.stop()


if __name__ == '__main__':
    main()
