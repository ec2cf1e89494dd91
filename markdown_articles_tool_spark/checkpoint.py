"""Checkpointed, resumable corpus runs with per-partition lineage.

North-rule requirement: the 10^12-doc job must be resumable from
checkpoint with per-partition lineage + metrics.  The reference has no
fault tolerance at all (a crash re-runs the article from scratch;
partially written images are skipped by the exists-check,
image_downloader.py:287-289) — this module is the cluster-grade
replacement (SURVEY.md §4 "Resume / fault tolerance").

Design (batch-incremental, no Structured Streaming — the reference has
no streaming concept):

* work is split into deterministic **shards** by ``pxxhash64(url) % n``;
* each shard's outputs land under ``out/docs/shard=K`` and
  ``out/images/shard=K`` followed by a ``_SHARD_COMMIT`` marker and a
  lineage row — marker-last gives idempotent, atomic-enough commits on
  any filesystem (on Iceberg this becomes a MERGE + snapshot);
* restart = anti-join of the shard list against committed markers:
  completed shards are skipped byte-for-byte, incomplete shard dirs are
  overwritten;
* lineage parquet rows: (shard, n_docs, n_links, per-status counts,
  wall_sec) — the per-partition metrics table.

Determinism note: content-hash dedup state is scoped per shard under
resume (each shard computes its own winners).  A canonical total order
(url, ord) keeps that deterministic; cross-shard dedup is recovered at
read time by mapping image paths through the global winners view, or
by running dedup globally in a non-resumable pass.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from .core.linkflow import TransformConfig
from .pipeline import transform_documents

SHARD_COMMIT = '_SHARD_COMMIT'


@dataclass
class RunReport:
    n_shards: int
    shards_run: List[int]
    shards_skipped: List[int]


def _committed_shards(out_dir: str) -> set:
    marker_dir = os.path.join(out_dir, 'commits')
    if not os.path.isdir(marker_dir):
        return set()
    return {
        int(name.split('=', 1)[1])
        for name in os.listdir(marker_dir)
        if name.startswith('shard=')
    }


def run_with_resume(
    spark: SparkSession,
    docs: DataFrame,
    cfg: TransformConfig,
    out_dir: str,
    n_shards: int = 8,
    fetcher=None,
) -> RunReport:
    """Transform ``docs`` (url, text) shard by shard, committing each
    shard atomically; re-running after a crash skips committed shards."""
    os.makedirs(os.path.join(out_dir, 'commits'), exist_ok=True)
    done = _committed_shards(out_dir)
    run, skipped = [], []

    sharded = docs.withColumn('shard', F.pmod(F.xxhash64('url'), F.lit(n_shards)))
    for k in range(n_shards):
        if k in done:
            skipped.append(k)
            continue
        t0 = time.time()
        shard_docs = sharded.where(F.col('shard') == k).select('url', 'text')
        res = transform_documents(shard_docs, cfg, fetcher=fetcher)

        docs_path = os.path.join(out_dir, 'docs', f'shard={k}')
        imgs_path = os.path.join(out_dir, 'images', f'shard={k}')
        res.docs_out.write.mode('overwrite').parquet(docs_path)
        res.images_out.write.mode('overwrite').parquet(imgs_path)

        status_counts = {
            r['status']: r['count']
            for r in res.links_audit.groupBy('status').count().collect()
        }
        # lineage doc count comes from the just-written parquet (footer
        # metadata — near-free) instead of re-counting the unpersisted
        # transform, which would recompute the whole shard a second time
        n_docs = spark.read.parquet(docs_path).count()
        lineage_row = {
            'shard': k,
            'n_docs': n_docs,
            'status_counts': status_counts,
            'wall_sec': round(time.time() - t0, 3),
        }
        lineage_path = os.path.join(out_dir, 'lineage')
        os.makedirs(lineage_path, exist_ok=True)
        with open(os.path.join(lineage_path, f'shard-{k}.json'), 'w') as f:
            json.dump(lineage_row, f)

        # marker LAST: a crash before this line leaves the shard
        # uncommitted → fully re-run on restart (idempotent overwrite)
        with open(os.path.join(out_dir, 'commits', f'shard={k}'), 'w') as f:
            f.write('ok')
        run.append(k)
        res.cleanup()  # drop this shard's cached intermediates

    return RunReport(n_shards, run, skipped)


def read_output(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, 'docs', 'shard=*'))


def lineage(out_dir: str) -> List[dict]:
    p = os.path.join(out_dir, 'lineage')
    if not os.path.isdir(p):
        return []
    rows = []
    for name in sorted(os.listdir(p)):
        with open(os.path.join(p, name)) as f:
            rows.append(json.load(f))
    return rows
