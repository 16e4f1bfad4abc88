"""Determinism gate (SURVEY §5.2.7): every HASH query must produce an
identical canonical rowset under different shuffle-partition counts.

Flushes out accidental order/FP dependence (partial-agg order, arbitrary-row
dedup) before the driver's hash compare sees it.
"""

from __future__ import annotations

import pytest

from scopus_spark import registry
from tests.oracle_harness import _rowset

QUERIES = registry.all_queries()
HASH_KEYS = sorted(registry.all_oracles())


@pytest.mark.parametrize("key", HASH_KEYS)
def test_partition_invariance(spark, sf_dir, key):
    def run():
        df = QUERIES[key](spark, sf_dir)
        return _rowset(df.columns, [tuple(r) for r in df.collect()])

    spark.conf.set("spark.sql.shuffle.partitions", "1")
    one = run()
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    many = run()
    assert one == many, f"{key}: result depends on shuffle partitioning"
