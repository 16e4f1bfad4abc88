"""JDBC/RDBMS sink — the reference pipeline's terminal stage (SURVEY §2.A a6).

The scopus reference ETLs its normalized tables into an RDBMS [U]; this
engine's equivalent is a partition-parallel `DataFrame.write.jdbc` with the
batching/idempotence knobs a 100 TB load needs. Execution is gated:
`jdbc_available()` probes the driver class, so callers get a clear error
instead of a Py4J stack when a jar is missing.

Round 3: the sink EXECUTES end-to-end in this container after all —
Apache Derby's embedded driver ships on Spark's own classpath (it backs
the Hive metastore), so the a6 key drives write.jdbc -> Derby ->
read.jdbc and hash-checks the round trip. Embedded Derby is single-JVM
(fine under local[*]); a cluster deployment points the SAME code at a
server RDBMS URL + driver jar.

Design notes (scale contract):
- numPartitions bounds the RDBMS connection fan-in; each Spark partition
  streams one batched INSERT connection (batchsize rows per round trip).
- mode="overwrite" + truncate=true keeps the target's DDL (no drop/create
  churn); append is the idempotent retry-safe path when the write is keyed.
- For >RDBMS-scale outputs use the partitioned parquet sink (a5) and bulk
  COPY from object storage — JDBC is for serving-DB-sized results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BATCH_SIZE = 10_000

# On Spark's classpath out of the box (metastore dependency).
DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_url(db_path: str, create: bool = True) -> str:
    return f"jdbc:derby:{db_path}{';create=true' if create else ''}"


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """JDBC source with the driver-availability gate of write_jdbc."""
    if not jdbc_available(spark, driver):
        raise RuntimeError(
            f"JDBC driver {driver!r} is not on the classpath; add the driver "
            "jar via spark.jars."
        )
    reader = (
        spark.read.format("jdbc")
        .option("driver", driver)
        .option("url", url)
        .option("dbtable", table)
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def jdbc_available(spark: SparkSession, driver: str) -> bool:
    """True if the given JDBC driver class is loadable in the JVM."""
    try:
        spark._jvm.java.lang.Class.forName(driver)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    driver: str,
    mode: str = "append",
    num_partitions: int | None = None,
    batch_size: int = DEFAULT_BATCH_SIZE,
    truncate: bool = False,
    properties: dict[str, str] | None = None,
) -> None:
    """Partition-parallel JDBC sink with explicit batching.

    Raises RuntimeError (not a JVM stack) when the driver jar is absent.
    """
    spark = df.sparkSession
    if not jdbc_available(spark, driver):
        raise RuntimeError(
            f"JDBC driver {driver!r} is not on the classpath; add the driver "
            "jar via spark.jars. (Embedded Derby is always available — "
            "sources.jdbc.DERBY_DRIVER.)"
        )
    writer = df
    if num_partitions is not None:
        writer = df.repartition(num_partitions)
    opts = {
        "driver": driver,
        "batchsize": str(batch_size),
        "truncate": str(truncate).lower(),
        **(properties or {}),
    }
    writer.write.mode(mode).options(**opts).jdbc(url, table)
