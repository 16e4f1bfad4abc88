"""Layout-maintenance operators: compaction file-count math, content
preservation, and the clustering -> row-group-pruning payoff (asserted on
the actual parquet metadata, not just plan text)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from scopus_spark.catalog import load_table
from scopus_spark.operators import compaction


def _parquet_files(path):
    return [
        os.path.join(r, f)
        for r, _d, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    ]


def test_compact_many_small_files_to_one(spark, sf_dir):
    root = tempfile.mkdtemp(prefix="scopus_compact_")
    src, dst = os.path.join(root, "src"), os.path.join(root, "dst")
    try:
        orders = load_table(spark, sf_dir, "orders")
        orders.repartition(64).write.parquet(src)  # simulate micro-batch litter
        assert len(_parquet_files(src)) == 64
        n = compaction.compact(spark, src, dst, target_file_bytes=1 << 30)
        assert n == 1 and len(_parquet_files(dst)) == 1
        # content preserved exactly
        assert (
            spark.read.parquet(dst).orderBy("o_orderkey").collect()
            == orders.orderBy("o_orderkey").collect()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_compact_splits_at_target_size(spark, sf_dir):
    root = tempfile.mkdtemp(prefix="scopus_compact_")
    src, dst = os.path.join(root, "src"), os.path.join(root, "dst")
    try:
        load_table(spark, sf_dir, "orders").write.parquet(src)
        n_bytes = compaction._dir_bytes(spark, src)
        n = compaction.compact(spark, src, dst, target_file_bytes=n_bytes // 3)
        assert n in (3, 4)  # ceil division
        assert len(_parquet_files(dst)) == n
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_cluster_by_gives_disjoint_rowgroup_ranges(spark, sf_dir):
    """After cluster_by(o_custkey), each file's row-group min/max ranges
    must be narrow and essentially disjoint — the property partition
    pruning at 100 TB rides on."""
    root = tempfile.mkdtemp(prefix="scopus_cluster_")
    dst = os.path.join(root, "dst")
    try:
        orders = load_table(spark, sf_dir, "orders")
        compaction.cluster_by(orders, dst, ["o_custkey"], n_partitions=8)
        files = _parquet_files(dst)
        assert len(files) == 8
        ranges = []
        for f in files:
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index("o_custkey")
            lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
            ranges.append((lo, hi))
        ranges.sort()
        # disjoint (or touching) consecutive ranges
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            assert hi1 <= lo2, ranges
        # content preserved
        assert spark.read.parquet(dst).count() == orders.count()
    finally:
        shutil.rmtree(root, ignore_errors=True)
