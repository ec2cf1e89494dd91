"""Resume semantics: kill-after-k-shards restart must produce
byte-identical final tables and skip completed shards (SURVEY.md §5
rebuild test plan, point e) — and a sharded/resumed run must be
byte-identical to a NON-sharded global run, including cross-shard
content-dedup winners (r01 DIVERGENCES #12, now closed)."""

import os

import pytest

from markdown_articles_tool_spark import corpus
from markdown_articles_tool_spark.checkpoint import (
    lineage,
    pass_lineage,
    read_images,
    read_output,
    run_with_resume,
)
from markdown_articles_tool_spark.core.linkflow import DedupVariant, TransformConfig
from markdown_articles_tool_spark.pipeline import transform_documents


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(corpus.docs_list(24), 'url string, text string')


def _texts(spark, out):
    return {r['url']: r['text_out'] for r in read_output(spark, out).collect()}


def _images(spark, out):
    return {r['real_path']: bytes(r['content']) for r in read_images(spark, out).collect()}


def test_full_run_then_resume_noop(spark, docs, tmp_path):
    out = str(tmp_path / 'out')
    cfg = TransformConfig(skip_all_errors=True)
    rep1 = run_with_resume(spark, docs, cfg, out, n_shards=4)
    assert sorted(rep1.shards_run) == [0, 1, 2, 3]
    texts1 = _texts(spark, out)

    rep2 = run_with_resume(spark, docs, cfg, out, n_shards=4)
    assert rep2.shards_run == []
    assert sorted(rep2.shards_skipped) == [0, 1, 2, 3]
    assert _texts(spark, out) == texts1


def test_crash_and_resume_byte_identical(spark, docs, tmp_path):
    out_a = str(tmp_path / 'a')
    out_b = str(tmp_path / 'b')
    cfg = TransformConfig(skip_all_errors=True)

    # uninterrupted run
    run_with_resume(spark, docs, cfg, out_a, n_shards=4)

    # "crashed" run: simulate dying after 2 shard commits, before the
    # global finish — wipe the markers of shards 2,3 and the finals
    run_with_resume(spark, docs, cfg, out_b, n_shards=4)
    for name in ('pass=0_shard=2', 'pass=0_shard=3', 'pass=0_final', 'images_final'):
        os.remove(os.path.join(out_b, 'commits', name))
    rep = run_with_resume(spark, docs, cfg, out_b, n_shards=4)
    assert sorted(rep.shards_run) == [2, 3]
    assert sorted(rep.shards_skipped) == [0, 1]

    assert _texts(spark, out_a) == _texts(spark, out_b)
    assert _images(spark, out_a) == _images(spark, out_b)


def test_lineage_rows(spark, docs, tmp_path):
    out = str(tmp_path / 'out')
    cfg = TransformConfig(skip_all_errors=True)
    run_with_resume(spark, docs, cfg, out, n_shards=2)
    rows = lineage(out)
    assert len(rows) == 2
    assert sum(r['n_docs'] for r in rows) == 24
    assert all('status_counts' in r and 'wall_sec' in r for r in rows)
    prows = pass_lineage(out)
    assert len(prows) == 1 and prows[0]['n_docs_out'] == 24


def test_xxhash64_twin_matches_spark(spark):
    """The stdlib XXH64 reimplementation the lineage oracle shards with
    is bit-identical to Spark's xxhash64() over UTF-8 string bytes —
    empty, short, 8/4-byte-word, 32-byte-stripe, and multibyte cases."""
    import random
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))
    from oracle_extract import xxhash64_spark

    rng = random.Random(42)
    cases = ['', 'a', 'abc', 'x' * 31, 'y' * 32, 'z' * 100,
             'https://h0.example.com/articles/7.md', 'héllo wörld ü££'] + [
        ''.join(rng.choices('abcdefghij:/._-é', k=rng.randint(0, 90))) for _ in range(30)
    ]
    got = {r['u']: r['h'] for r in spark.createDataFrame(
        [(c,) for c in cases], 'u string'
    ).selectExpr('u', 'xxhash64(u) as h').collect()}
    for c in cases:
        assert got[c] == xxhash64_spark(c.encode('utf-8')), c


def test_lineage_df_matches_independent_twin(spark, docs, tmp_path):
    """lineage_df over a RESUMED run == the sequential twin: shard
    assignment via the XXH64 reimplementation, per-link statuses via
    oracle_extract.link_status — the engine's staged-links lineage and
    an independent single-threaded walk must agree row-for-row."""
    import sys as _sys
    from collections import defaultdict

    _sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))
    from oracle_extract import link_status, md_image_links, shard_of

    from markdown_articles_tool_spark.checkpoint import lineage_df

    out = str(tmp_path / 'out')
    cfg = TransformConfig(skip_all_errors=True)
    run_with_resume(spark, docs, cfg, out, n_shards=3)
    rep = run_with_resume(spark, docs, cfg, out, n_shards=3)  # resumed
    assert rep.shards_run == []

    got = sorted(
        tuple(r) for r in lineage_df(spark, out)
        .select('pass_idx', 'shard', 'n_docs', 'n_links', 'status', 'n_status').collect()
    )

    assets = corpus.ModelAssetStore()
    n_docs, n_links = defaultdict(int), defaultdict(int)
    counts = defaultdict(lambda: defaultdict(int))
    for url, text in corpus.docs_list(24):
        k = shard_of(url, 3)
        n_docs[k] += 1
        for src, _w, _h in md_image_links(text):
            n_links[k] += 1
            counts[k][link_status(cfg, url, src, assets)] += 1
    want = sorted(
        (0, k, n_docs[k], n_links[k], s, c)
        for k in range(3) for s, c in counts[k].items()
    )
    assert got == want


def test_sharded_equals_global_on_dup_heavy_corpus(spark, tmp_path):
    """The r2 gate: sharded-resume output == non-sharded output,
    byte-for-byte, on a dup-heavy corpus with content-hash dedup —
    cross-shard dedup winners must be GLOBAL, not per-shard."""
    out = str(tmp_path / 'out')
    cfg = TransformConfig(skip_all_errors=True, deduplication=DedupVariant.CONTENT_HASH)
    docs120 = corpus.docs_list(120)  # includes cross-document dup groups
    docs_df = spark.createDataFrame(docs120, 'url string, text string')

    run_with_resume(spark, docs_df, cfg, out, n_shards=5)
    got_texts = _texts(spark, out)
    got_images = _images(spark, out)

    res = transform_documents(docs_df, cfg)
    want_texts = {r['url']: r['text_out'] for r in res.docs_out.collect()}
    want_images = {r['real_path']: bytes(r['content']) for r in res.images_out.collect()}

    mismatches = [u for u in want_texts if got_texts.get(u) != want_texts[u]]
    assert not mismatches, f'{len(mismatches)} docs differ sharded vs global: {mismatches[:3]}'
    assert got_images == want_images


def test_sharded_parallel_beats_sequential(spark, tmp_path, monkeypatch):
    """Phase A submits shard jobs from a bounded thread pool (r2 ran
    them strictly sequentially, leaving a scheduling bubble per shard).
    Gate: the pooled run must be meaningfully faster than the
    serialized run on the same 8-shard corpus.

    Why not "within 1.15x of a NON-sharded run": at unit-test scale
    each shard pays a constant ~2 s floor (plan analysis + pandas-UDF
    stage spin-up + staging writes x 8 shards) that dwarfs its share
    of a 240-doc corpus — measured here: global 3.4 s warm, sharded
    22 s sequential, 11 s pooled (4 workers on 4 cores).  That floor
    amortizes to nothing when shards carry 10^8 docs each; the thing
    THIS test can check honestly is that shard jobs overlap."""
    import time

    cfg = TransformConfig(skip_all_errors=True, deduplication=DedupVariant.CONTENT_HASH)
    docs_df = spark.createDataFrame(corpus.docs_list(240), 'url string, text string')

    def timed(workers: int, out: str) -> float:
        monkeypatch.setenv('SPARK_GRAFT_SHARD_WORKERS', str(workers))
        t0 = time.perf_counter()
        run_with_resume(spark, docs_df, cfg, out, n_shards=8)
        return time.perf_counter() - t0

    t_seq = timed(1, str(tmp_path / 'seq'))
    t_par = timed(4, str(tmp_path / 'par'))
    # generous margin: on a loaded shared box (full-suite runs) the
    # measured ratio drifts; solo it is ~0.5 (11s vs 22s at 8 shards)
    assert t_par <= 0.95 * t_seq, f'pooled {t_par:.1f}s vs sequential {t_seq:.1f}s'
    # and identical outputs either way (the hard invariant)
    assert _texts(spark, str(tmp_path / 'seq')) == _texts(spark, str(tmp_path / 'par'))


def test_sharded_equals_global_multipass_chain(spark, tmp_path):
    """Same gate for a chained md+html run with shared dedup state."""
    out = str(tmp_path / 'out')
    cfg = TransformConfig(
        skip_all_errors=True,
        input_formats=('md', 'html'),
        deduplication=DedupVariant.CONTENT_HASH,
    )
    docs48 = corpus.docs_list(48)
    docs_df = spark.createDataFrame(docs48, 'url string, text string')

    run_with_resume(spark, docs_df, cfg, out, n_shards=3)
    got_texts = _texts(spark, out)
    got_images = _images(spark, out)

    res = transform_documents(docs_df, cfg)
    want_texts = {r['url']: r['text_out'] for r in res.docs_out.collect()}
    want_images = {r['real_path']: bytes(r['content']) for r in res.images_out.collect()}
    assert got_texts == want_texts
    assert got_images == want_images
