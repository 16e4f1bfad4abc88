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
