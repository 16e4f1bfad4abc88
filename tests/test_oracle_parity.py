"""Driver-mirror correctness gate: every HASH key vs its DuckDB oracle.

Parametrized over the full registry; runs at TEST_SF_DIR (default sf0.01,
the driver's t2 tier).
"""

from __future__ import annotations

import pytest

from scopus_spark import registry
from tests.conftest import TEST_SF_DIR
from tests.oracle_harness import compare, duckdb_conn

QUERIES = registry.all_queries()
ORACLES = registry.all_oracles()
HASH_KEYS = sorted(ORACLES)


@pytest.fixture(scope="module")
def duck():
    con = duckdb_conn(TEST_SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("key", HASH_KEYS)
def test_hash_parity(spark_result, duck, key):
    # r11: spark side comes from the session-scoped one-execution-per-key
    # cache (tests/conftest.py) — the compare itself is unchanged.
    cols, _dtypes, rows = spark_result(key)
    compare((cols, rows), duck, ORACLES[key])


def test_rows_only_keys_return_rows(spark_result):
    """Keys without an oracle still must run and return a stable schema."""
    for key in sorted(set(QUERIES) - set(ORACLES)):
        cols, _dtypes, rows = spark_result(key)
        assert cols, key
        assert len(rows) >= 0, key


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.queries()) >= set(e.oracle_sql())
