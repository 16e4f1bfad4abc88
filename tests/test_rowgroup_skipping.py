"""Row-group-grain data skipping (a39): per-file row-group [min, max]
recorded in the manifest from parquet FOOTERS at write time
(executor-side pyarrow, metadata-only), consumed by read(prune=...) to
skip individual FILES a directory-grain range cannot disprove.

Contracts:
- footer stats are recorded per written file per row group for
  stats_cols;
- scan_paths() reports kept vs skipped files; a pruned read skips
  files but returns EXACTLY the rows of the unpruned read filtered to
  the range (superset rule: pruning never loses rows);
- files/dirs without recorded stats are scanned whole;
- file stats survive append (carried), merge and compact (rewritten
  files get fresh footer stats; dead files' entries drop);
- a delete (tombstone) commit leaves file stats untouched and pruned
  merge-on-read reads stay exact.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from scopus_spark.operators.manifest import VersionedTable


def _docs(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .select(
            F.col("id").alias("k"),
            F.concat(F.lit("v"), F.col("id")).alias("v"),
            (F.col("id") % 2).alias("b"),
        )
    )


def _table(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    # range-clustered layout: 8 spark partitions by k -> up to 8 files
    # per bucket dir, each covering a narrow k range (dir-grain stats
    # span everything, so only FILE-grain skipping can prune)
    t.write_initial(
        _docs(spark, 0, 800).repartitionByRange(8, "k"),
        "b",
        stats_cols=["k"],
        # keep the deliberate range-sliced file layout (r10: commits
        # cluster rows by dir unless the caller opts out — clustering
        # would fold each dir into one file and leave file-grain
        # skipping nothing to prune)
        cluster=False,
    )
    return t


def _rows(df):
    return sorted((r.k, r.v, r.b) for r in df.collect())


def test_footer_stats_recorded_and_files_skipped(spark, tmp_path):
    t = _table(spark, tmp_path)
    fstats = t._read_manifest()["file_stats"]
    assert fstats  # per-file entries exist
    for rel, rec in fstats.items():
        assert rel.endswith(".parquet")
        assert rec["k"] and all(len(rg) == 2 for rg in rec["k"])
    rep = t.scan_paths(prune=("k", 100, 150))
    assert rep["skipped_files"]  # most range-disjoint files pruned
    assert rep["files"]  # the covering file(s) kept
    assert not rep["dirs"]  # every dir had recorded files
    # dir-grain alone could NOT have pruned (both dirs span 0..799)
    assert len(t.data_dirs(prune=("k", 100, 150))) == len(t.data_dirs())
    # pruned read == full read filtered (the superset contract)
    want = _rows(t.read(spark).filter(F.col("k").between(100, 150)))
    got = _rows(
        t.read(spark, prune=("k", 100, 150)).filter(
            F.col("k").between(100, 150)
        )
    )
    assert got == want and len(want) == 51


def test_unstatted_commits_scan_whole(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_docs(spark, 0, 100), "b")  # no stats_cols
    assert t._read_manifest().get("file_stats", {}) == {}
    rep = t.scan_paths(prune=("k", 5, 6))
    assert rep["files"] == [] and rep["skipped_files"] == []
    assert sorted(rep["dirs"]) == sorted(t.data_dirs())
    assert len(_rows(t.read(spark, prune=("k", 5, 6)))) == 100


def test_file_stats_survive_append_merge_compact(spark, tmp_path):
    t = _table(spark, tmp_path)
    n_before = len(t._read_manifest()["file_stats"])
    t.append(_docs(spark, 800, 1000).repartitionByRange(4, "k"))
    assert len(t._read_manifest()["file_stats"]) > n_before  # carried+new
    # merge rewrites touched partitions: fresh footer stats, dead drop
    t.merge(
        _docs(spark, 10, 12).withColumn("v", F.lit("patched")),
        key_cols=["k"],
        partition_col="b",
    )
    m = t._read_manifest()
    live_dirs = {d for ds in m["partitions"].values() for d in ds}
    assert all(
        os.path.dirname(p) in live_dirs for p in m["file_stats"]
    )
    want = _rows(t.read(spark).filter(F.col("k").between(850, 900)))
    got = _rows(
        t.read(spark, prune=("k", 850, 900)).filter(
            F.col("k").between(850, 900)
        )
    )
    assert got == want and len(want) == 51
    t.compact(spark)
    m2 = t._read_manifest()
    live2 = {d for ds in m2["partitions"].values() for d in ds}
    assert m2["file_stats"] and all(
        os.path.dirname(p) in live2 for p in m2["file_stats"]
    )
    assert _rows(
        t.read(spark, prune=("k", 850, 900)).filter(
            F.col("k").between(850, 900)
        )
    ) == want


def test_pruned_merge_on_read_stays_exact(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.delete_keys(
        spark.createDataFrame(
            [(120, 0), (121, 1)], "k long, b long"
        ),
        key_cols=["k"],
    )
    got = _rows(
        t.read(spark, prune=("k", 100, 150)).filter(
            F.col("k").between(100, 150)
        )
    )
    assert len(got) == 49
    assert all(k not in (120, 121) for k, _, _ in got)
