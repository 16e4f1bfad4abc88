"""Shared pytest fixtures: one SparkSession per test run, sf-dir helpers."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scopus_spark._vendor import ensure_protobuf  # noqa: E402
from scopus_spark.session import get_spark  # noqa: E402

# Arm the vendored protobuf runtime BEFORE any SparkSession exists: the JVM
# (and therefore every executor Python worker) inherits PYTHONPATH at launch,
# and the transformWithState workers need google.protobuf (streaming/tws.py).
ensure_protobuf()

# t2 correctness tier is sf0.01 (TESTDATA.md); override for quick iteration:
#   SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.001 pytest ...
TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
SMOKE_SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="scopus_spark_tests")
    yield s
    # no stop(): one JVM reused across the whole pytest session


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return TEST_SF_DIR


# r11 (VERDICT r10 item 1 — make the suite complete inside the driver's
# verify window): the three registry-wide gates (oracle hash-parity,
# partition-invariance determinism, representation policy) each executed
# every declared query independently — 3-4 full executions per key, and
# the construction-eager keys (streaming lifecycles, versioned-table
# staging) paid their staging in every gate. One session-scoped execution
# per key at the DEFAULT session config now feeds: the spark side of
# hash-parity, the default-partitions side of partition-invariance, the
# schema/rows checks of the representation + rows-only gates. Assertions
# are unchanged — only the redundant executions are shared. Results at
# the t2 tier are a few MB total (bounded: sf0.01 outputs).
_SPARK_RESULT_CACHE: dict[str, tuple[list[str], list[tuple], list[tuple]]] = {}


@pytest.fixture(scope="session")
def spark_result(spark, sf_dir):
    """get(key) -> (columns, dtypes, rows) for a declared query, executed
    once per session at the default shuffle-partition count (pinned to the
    session's configured value so a test that tweaked the conf cannot
    poison the shared run)."""
    from scopus_spark import registry
    from scopus_spark.session import SQL_CONFS

    queries = registry.all_queries()
    default_parts = SQL_CONFS["spark.sql.shuffle.partitions"]

    def get(key: str) -> tuple[list[str], list[tuple], list[tuple]]:
        if key not in _SPARK_RESULT_CACHE:
            old = spark.conf.get("spark.sql.shuffle.partitions")
            spark.conf.set("spark.sql.shuffle.partitions", default_parts)
            try:
                df = queries[key](spark, sf_dir)
                _SPARK_RESULT_CACHE[key] = (
                    df.columns,
                    df.dtypes,
                    [tuple(r) for r in df.collect()],
                )
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", old)
        return _SPARK_RESULT_CACHE[key]

    return get
