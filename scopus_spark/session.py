"""SparkSession factory + session-level configuration (SURVEY.md §2.0 C4).

Two entry paths:

- ``get_spark()``         — build our own session (tests, bench).
- ``configure(spark)``    — apply the runtime-settable engine configs to a
  session we did NOT build (the driver hands us one). All configs below are
  Spark *SQL* configs, which are runtime-settable; nothing here requires a
  restart.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable SQL configs every engine session needs (SURVEY §2.0 C4).
SQL_CONFS: dict[str, str] = {
    # G3: corpus timestamps are tz-naive; DuckDB treats them as such.
    "spark.sql.session.timeZone": "UTC",
    # G1: events.ts is INT64 TIMESTAMP(NANOS) parquet; Spark 4 hard-errors
    # without this. The loader converts to a proper timestamp (catalog.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Arrow for every Python boundary (toPandas, pandas UDFs).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Bench tier: default 200 shuffle partitions wastes ~300ms/query on empty
    # tasks at sf<=0.1 (BASELINE.md). AQE coalescing handles the rest; at
    # cluster scale this is set per-deployment, not hardcoded.
    "spark.sql.shuffle.partitions": os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"
    ),
    # AQE on: runtime coalescing + skew-join splitting (100 TB safety valve).
    "spark.sql.adaptive.enabled": "true",
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply engine SQL configs to an externally-created session."""
    for k, v in SQL_CONFS.items():
        spark.conf.set(k, v)
    return spark


def get_spark(
    app_name: str = "scopus_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build the engine's SparkSession (local test/bench tier).

    On a real cluster the same SQL confs apply; master/memory come from the
    deployment (spark-submit / k8s), not from here.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.warehouse.dir", "/tmp/scopus_spark_warehouse")
    )
    for k, v in SQL_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # getOrCreate may return a pre-existing session: re-assert runtime confs.
    configure(spark)
    spark.sparkContext.setLogLevel("WARN")
    return spark
