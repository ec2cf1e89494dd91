"""Resume semantics: kill-after-k-shards restart must produce
byte-identical final tables and skip completed shards (SURVEY.md §5
rebuild test plan, point e)."""

import os

import pytest

from markdown_articles_tool_spark import corpus
from markdown_articles_tool_spark.checkpoint import lineage, read_output, run_with_resume
from markdown_articles_tool_spark.core.linkflow import TransformConfig


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(corpus.docs_list(24), 'url string, text string')


def _texts(spark, out):
    return {r['url']: r['text_out'] for r in read_output(spark, out).collect()}


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

    # "crashed" run: simulate by committing only 2 shards, then resume
    run_with_resume(spark, docs, cfg, out_b, n_shards=4)
    # wipe commit markers of shards 2,3 + their outputs (as if the job
    # died mid-write)
    for k in (2, 3):
        os.remove(os.path.join(out_b, 'commits', f'shard={k}'))
    rep = run_with_resume(spark, docs, cfg, out_b, n_shards=4)
    assert sorted(rep.shards_run) == [2, 3]
    assert sorted(rep.shards_skipped) == [0, 1]

    assert _texts(spark, out_a) == _texts(spark, out_b)


def test_lineage_rows(spark, docs, tmp_path):
    out = str(tmp_path / 'out')
    cfg = TransformConfig(skip_all_errors=True)
    run_with_resume(spark, docs, cfg, out, n_shards=2)
    rows = lineage(out)
    assert len(rows) == 2
    assert sum(r['n_docs'] for r in rows) == 24
    assert all('status_counts' in r and 'wall_sec' in r for r in rows)
