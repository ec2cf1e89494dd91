#!/usr/bin/env python
"""r7 probe: where do span_dedup's seconds go, and is the window-hash
kernel (O(k·n) matmul + per-element int() boxing) the bottleneck?

Stages timed in isolation (noop sink, min of N trials):
  occ      — the positional-hash Arrow pass + posexplode only
  winners  — occ (unpersisted single consumer) -> min-struct owner agg
  full     — the shipped q_span_dedup
Kernel micro-bench: shipped _window_hashes vs a rolling O(n)
reformulation that must be BIT-IDENTICAL.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from markdown_articles_tool_spark.training.dedup import _POLY_B, _window_hashes

SF_DIR = os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.1')
CPUS = int(os.environ.get('SPARK_GRAFT_CPUS', '32'))


def window_hashes_rolling(t: str, shingle: int):
    """Bit-identical rolling reformulation of _window_hashes:
    h[i] = sum_j cp[i+j] * B^(k-1-j)  (mod 2^64)
         = (A[i+k] - A[i]) * B^(i+k-1)      with A[m] = sum_{j<m} cp[j]*Binv^j
    B is odd -> invertible mod 2^64; all uint64 ops wrap exactly."""
    t = ' '.join((t or '').lower().split())
    if not t:
        return np.empty(0, dtype=np.uint64)
    cp = np.frombuffer(t.encode('utf-32-le'), dtype=np.uint32).astype(np.uint64)
    n = len(cp)
    k = min(n, shingle)
    B = np.uint64(_POLY_B)
    # modular inverse of B mod 2^64 (Newton iteration)
    inv = int(_POLY_B)
    x = inv
    for _ in range(6):
        x = (x * (2 - inv * x)) % (1 << 64)
    Binv = np.uint64(x)
    # Binv^j for j in 0..n-1
    invp = np.empty(n, dtype=np.uint64)
    invp[0] = 1
    if n > 1:
        invp[1:] = Binv
        np.cumprod(invp, out=invp)
    # A[m] = sum_{j<m} cp[j] * Binv^j, need A at offsets 0..n-k and k..n
    A = np.zeros(n + 1, dtype=np.uint64)
    np.cumsum(cp * invp, out=A[1:])
    nw = n - k + 1
    diff = A[k:] - A[:nw]
    # multiplier B^(i+k-1) for i in 0..n-k
    m0 = np.uint64(pow(int(_POLY_B), k - 1, 1 << 64))
    mult = np.empty(nw, dtype=np.uint64)
    mult[0] = m0
    if nw > 1:
        mult[1:] = B
        np.cumprod(mult, out=mult)
    hs = diff * mult
    z = hs + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def kernel_check_and_time():
    import random

    random.seed(7)
    texts = [
        '', 'a', 'short text', 'x' * 24, 'y' * 25, 'z' * 26,
        ' '.join('word%d' % random.randrange(50) for _ in range(400)),
        ''.join(chr(random.randrange(32, 0x300)) for _ in range(5000)),
    ] + [' '.join('tok%d' % random.randrange(999) for _ in range(1200)) for _ in range(50)]
    for t in texts:
        a = _window_hashes(t, 25)
        b = window_hashes_rolling(t, 25)
        assert a.shape == b.shape and (a == b).all(), f'MISMATCH on {t[:40]!r}'
        a5 = _window_hashes(t, 5)
        b5 = window_hashes_rolling(t, 5)
        assert (a5 == b5).all(), f'MISMATCH k=5 on {t[:40]!r}'
    print('kernel bit-identical: OK', flush=True)

    big = [' '.join('tok%d' % (i * 7 % 997) for i in range(1500)) for _ in range(200)]
    for name, fn in [('shipped_kernel', _window_hashes), ('rolling_kernel', window_hashes_rolling)]:
        t0 = time.perf_counter()
        for t in big:
            fn(t, 25)
        print(name, round(time.perf_counter() - t0, 3), flush=True)
    # boxing cost: list-of-int vs ndarray return
    arrs = [_window_hashes(t, 25) for t in big]
    t0 = time.perf_counter()
    _ = [[int(x) for x in a.astype(np.int64)] for a in arrs]
    print('int_boxing', round(time.perf_counter() - t0, 3), flush=True)
    t0 = time.perf_counter()
    _ = [a.astype(np.int64) for a in arrs]
    print('ndarray_view', round(time.perf_counter() - t0, 3), flush=True)


def stage_times():
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from markdown_articles_tool_spark.session import get_spark
    from markdown_articles_tool_spark.training.dedup import make_span_hash_udf

    spark = get_spark(app_name='probe-span', master=f'local[{CPUS}]', shuffle_partitions=CPUS)
    trials = int(os.environ.get('TRIALS', '2'))

    def timed(mk):
        best = float('inf')
        for _ in range(trials):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            mk().write.format('noop').mode('overwrite').save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    def docs():
        return entry._t(spark, SF_DIR, 'documents')

    def occ():
        return docs().select(
            F.col('doc_id').alias('_id'),
            F.posexplode(make_span_hash_udf(25)(F.col('text'))).alias('pos', 'fp'),
        )

    def winners():
        return occ().groupBy('fp').agg(
            F.min(F.struct(F.col('_id').alias('doc_id'), F.col('pos').alias('pos'))).alias('_w'))

    qs = entry.queries()
    print('hash_pass_only', timed(lambda: docs().select(make_span_hash_udf(25)(F.col('text')).alias('h'))), flush=True)
    print('occ', timed(occ), flush=True)
    print('winners', timed(winners), flush=True)
    print('full_query', timed(lambda: qs['span_dedup'](spark, SF_DIR)), flush=True)
    spark.stop()


if __name__ == '__main__':
    kernel_check_and_time()
    if os.environ.get('KERNEL_ONLY') != '1':
        stage_times()
