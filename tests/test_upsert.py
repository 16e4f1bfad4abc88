"""Keyed-upsert (MERGE) semantics over partitioned parquet (operators/upsert.py)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from scopus_spark.operators.upsert import upsert_partitioned


def _rows(spark, data):
    return spark.createDataFrame(data, "id long, seg string, val double")


def test_upsert_insert_update_untouched(spark):
    with tempfile.TemporaryDirectory(prefix="scopus_upsert_") as tmp:
        path = f"{tmp}/t"
        base = _rows(
            spark,
            [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0), (4, "c", 4.0)],
        )
        upsert_partitioned(path, base, ["id"], "seg")

        delta = _rows(spark, [(2, "a", 20.0), (5, "a", 5.0), (6, "b", 6.0)])
        upsert_partitioned(path, delta, ["id"], "seg")

        got = {
            r.id: (r.seg, r.val) for r in spark.read.parquet(path).collect()
        }
        assert got == {
            1: ("a", 1.0),   # untouched row in touched partition survives
            2: ("a", 20.0),  # updated
            3: ("b", 3.0),   # untouched row in touched partition b
            4: ("c", 4.0),   # partition c never rewritten
            5: ("a", 5.0),   # inserted
            6: ("b", 6.0),   # inserted
        }


def test_upsert_is_idempotent(spark):
    with tempfile.TemporaryDirectory(prefix="scopus_upsert_") as tmp:
        path = f"{tmp}/t"
        base = _rows(spark, [(1, "a", 1.0), (2, "b", 2.0)])
        upsert_partitioned(path, base, ["id"], "seg")
        delta = _rows(spark, [(1, "a", 10.0)])
        upsert_partitioned(path, delta, ["id"], "seg")
        once = sorted(map(tuple, spark.read.parquet(path).collect()))
        upsert_partitioned(path, delta, ["id"], "seg")
        twice = sorted(map(tuple, spark.read.parquet(path).collect()))
        assert once == twice


def test_upsert_only_rewrites_touched_partitions(spark):
    import os

    with tempfile.TemporaryDirectory(prefix="scopus_upsert_") as tmp:
        path = f"{tmp}/t"
        base = _rows(spark, [(1, "a", 1.0), (2, "b", 2.0)])
        upsert_partitioned(path, base, ["id"], "seg")
        mtime_b = os.path.getmtime(f"{path}/seg=b")
        upsert_partitioned(path, _rows(spark, [(3, "a", 3.0)]), ["id"], "seg")
        assert os.path.getmtime(f"{path}/seg=b") == mtime_b  # b untouched
        assert spark.read.parquet(path).count() == 3
