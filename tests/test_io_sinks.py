"""Sink seam (io_sinks): name mapping, parquet sink behavior, and the
env-gate on the Iceberg implementation (no Iceberg runtime here)."""

import pytest

from markdown_articles_tool_spark.io_sinks import (
    IcebergTableSink,
    ParquetMarkerSink,
    parse_table_name,
)


class TestNameMapping:
    def test_plain(self):
        assert parse_table_name('docs') == ('docs', [])

    def test_partitions(self):
        assert parse_table_name('stage/pass=0/links/shard=3') == (
            'stage_links', [('pass', '0'), ('shard', '3')]
        )

    def test_wildcard(self):
        assert parse_table_name('stage/pass=*/images') == ('stage_images', [('pass', None)])

    def test_no_table_segment(self):
        with pytest.raises(ValueError):
            parse_table_name('pass=0')


class TestParquetMarkerSink:
    def test_write_read_roundtrip_with_partition_discovery(self, spark, tmp_path):
        sink = ParquetMarkerSink(str(tmp_path))
        df = spark.createDataFrame([(1, 'a'), (2, 'b')], 'id long, v string')
        sink.write(df, 'stage/pass=0/links/shard=0')
        sink.write(df, 'stage/pass=0/links/shard=1')
        # leaf read: no partition columns
        leaf = sink.read(spark, 'stage/pass=0/links/shard=1')
        assert sorted(leaf.columns) == ['id', 'v'] and leaf.count() == 2
        # prefix read: trailing partition discovered as a column
        pref = sink.read(spark, 'stage/pass=0/links')
        assert 'shard' in pref.columns and pref.count() == 4

    def test_markers(self, tmp_path):
        sink = ParquetMarkerSink(str(tmp_path))
        assert not sink.is_committed('pass=0_shard=1')
        sink.mark_committed('pass=0_shard=1')
        assert sink.is_committed('pass=0_shard=1')
        assert not sink.is_committed('pass=0_shard=2')


class TestIcebergGate:
    def test_refuses_without_catalog(self, spark):
        with pytest.raises(RuntimeError, match='Iceberg'):
            IcebergTableSink(spark, 'nosuchcatalog.db')
