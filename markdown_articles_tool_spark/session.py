"""SparkSession factory with the configs this engine assumes.

Tuned for correctness-critical determinism plus the scale posture from
SURVEY.md §4: AQE on (skew joins, coalesced shuffle), Arrow on (every
row-level op here is a pandas UDF), and shuffle partitions sized for
the local harness (on a real cluster these come from spark-submit).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = 'markdown-articles-tool-spark',
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    master = master or os.environ.get('SPARK_GRAFT_MASTER', f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get('SPARK_GRAFT_SHUFFLE_PARTITIONS', '32'))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config('spark.sql.shuffle.partitions', str(shuffle_partitions))
        .config('spark.sql.adaptive.enabled', 'false' if os.environ.get('SPARK_GRAFT_AQE') == '0' else 'true')
        .config('spark.sql.adaptive.skewJoin.enabled', 'true')
        .config('spark.sql.adaptive.coalescePartitions.enabled', 'true')
        # AQE coalesces by shuffle-read BYTES; several of our stages are
        # compute-heavy on byte-narrow input (pandas-UDF extraction,
        # fetch fan-out, rewrite), so the 1MB default floor starves them
        # of parallelism on small-to-mid corpora
        .config('spark.sql.adaptive.coalescePartitions.minPartitionSize', '64k')
        # advisory stays at Spark's 64MB default: an 8MB A/B on the
        # 8-core corpus transform LOST 40% (21.0s vs 12.5s) — finer
        # post-shuffle partitions pay more in pandas-UDF batch setup
        # and scheduling than they win back in tail smoothing, same
        # verdict as the shuffle-mult and input-file-count A/Bs
        .config(
            'spark.sql.adaptive.advisoryPartitionSizeInBytes',
            os.environ.get('SPARK_GRAFT_AQE_ADVISORY', '64m'),
        )
        .config('spark.sql.execution.arrow.pyspark.enabled', 'true')
        # 20k-row Arrow batches: measured A/B on the 32-core corpus
        # transform — 10k: 7.80s, 20k: 7.20s (+8%), 40k: 7.44s,
        # 80k: 7.55s; bigger batches amortize per-batch UDF setup +
        # Arrow transfer until batch-tail skew wins
        .config(
            'spark.sql.execution.arrow.maxRecordsPerBatch',
            os.environ.get('SPARK_GRAFT_ARROW_BATCH', '20000'),
        )
        # keep the broadcast threshold at Spark's default 10MB: the
        # pipeline carries binary image content in several tables and an
        # over-eager broadcast of one of those kills the driver
        .config('spark.sql.autoBroadcastJoinThreshold', str(10 * 1024 * 1024))
        .config('spark.driver.memory', os.environ.get('SPARK_GRAFT_DRIVER_MEM', '16g'))
        # throughput collector: G1's concurrent phases compete with task
        # threads for cores on small executors (measured 25s → 14s on
        # the 8-core corpus transform); batch pipelines want ParallelGC
        .config(
            'spark.driver.extraJavaOptions',
            os.environ.get('SPARK_GRAFT_JAVA_OPTS', '-XX:+UseParallelGC'),
        )
        # same collector on real executors (driver==executor in local mode)
        .config(
            'spark.executor.extraJavaOptions',
            os.environ.get('SPARK_GRAFT_JAVA_OPTS', '-XX:+UseParallelGC'),
        )
        .config('spark.ui.enabled', 'false')
        # image bytes are high-entropy (already-compressed formats):
        # columnar-cache compression burns CPU for ~no size win
        .config(
            'spark.sql.inMemoryColumnarStorage.compressed',
            os.environ.get('SPARK_GRAFT_CACHE_COMPRESS', 'false'),
        )
        .config('spark.sql.session.timeZone', 'UTC')
    )
    return builder.getOrCreate()
