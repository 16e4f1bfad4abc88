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
def test_partition_invariance(spark, sf_dir, spark_result, key):
    # r11: the many-partitions side comes from the session result cache
    # (executed once at the default 32 shuffle partitions); only the
    # 1-partition run executes here. Same assertion as before.
    cols, _dtypes, rows = spark_result(key)
    many = _rowset(cols, rows)

    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try:
        df = QUERIES[key](spark, sf_dir)
        one = _rowset(df.columns, [tuple(r) for r in df.collect()])
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert one == many, f"{key}: result depends on shuffle partitioning"
