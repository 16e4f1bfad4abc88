"""Source/sink unit tests beyond the oracle harness (SURVEY §2.A)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scopus_spark import registry
from scopus_spark.catalog import table
from scopus_spark.sources.jdbc import jdbc_available, write_jdbc

QUERIES = registry.all_queries()


def test_a5_partition_pruning(spark, sf_dir):
    """The partitioned re-scan must prune to one partition directory."""
    df = QUERIES["a5"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(l_returnflag" in plan, plan


def test_a6_jdbc_graceful_without_driver(spark, sf_dir):
    """No JDBC driver jar in this container: the sink must fail with a clear
    RuntimeError naming the missing driver, not a Py4J stack."""
    driver = "org.sqlite.JDBC"
    df = table(spark, sf_dir, "region")
    if jdbc_available(spark, driver):  # pragma: no cover - not in this env
        pytest.skip("driver present; exercised by integration envs")
    with pytest.raises(RuntimeError, match="org.sqlite.JDBC"):
        write_jdbc(df, "jdbc:sqlite:/tmp/x.db", "region", driver)


def test_a2_csv_rereads_with_pushdown(spark, sf_dir):
    """CSV reader path still supports predicate filters (no pushdown to CSV,
    but the filter must apply)."""
    df = QUERIES["a2"](spark, sf_dir).filter(F.col("l_quantity") > 25)
    assert df.count() > 0


def test_a6_derby_jdbc_roundtrip_executes(spark, sf_dir):
    """Embedded Derby ships on Spark's classpath, so the JDBC sink runs for
    real: write a keyed slice, read it back, full value parity (the a6
    oracle additionally hash-checks this end-to-end each round)."""
    from scopus_spark.sources.jdbc import (
        DERBY_DRIVER,
        derby_url,
        jdbc_available,
        read_jdbc,
        write_jdbc,
    )

    assert jdbc_available(spark, DERBY_DRIVER)
    import tempfile

    with tempfile.TemporaryDirectory(prefix="scopus_derby_") as tmp:
        url = derby_url(f"{tmp}/db")
        src = table(spark, sf_dir, "nation")
        write_jdbc(src, url, "nation_rt", DERBY_DRIVER, mode="overwrite")
        back = read_jdbc(spark, url, "nation_rt", DERBY_DRIVER)
        assert sorted(map(tuple, back.collect())) == sorted(
            map(tuple, src.collect())
        )


def test_a16_observation_metrics(spark, sf_dir):
    """a16's df.observe counters must accumulate the true input-side
    stats during the SAME action that computes the grouped result (no
    second pass over the scan)."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from scopus_spark.catalog import table
    from scopus_spark.queries import scans

    obs = Observation("a16_qa")
    result = scans._a16_build(spark, sf_dir, observation=obs)
    n_lines_total = sum(r["n_lines"] for r in result.collect())
    got = obs.get
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp")
    )
    expected_rows = li.count()
    assert got["rows_in"] == expected_rows == n_lines_total
    assert got["null_qty_rows"] == 0
    assert got["total_qty"] == li.agg(F.sum("l_quantity")).first()[0]
