"""Physical-layout operators: bucketing for co-located joins, salting for
skewed keys (SURVEY §4 / task brief "Partitioning & shuffle").

These are the two techniques AQE cannot fully replace at 100 TB:

- **Bucketing** removes the shuffle from recurring fact-fact joins
  entirely: both tables are written pre-hashed into the same bucket count
  on the join key, so a sort-merge join reads co-located buckets with NO
  Exchange on either side (asserted in tests/test_partitioning.py).
- **Salting** spreads one pathological key across `salt_factor` synthetic
  sub-keys when even AQE skew-splitting can't help (e.g. a build side too
  big to split): the skewed side gets a random-free deterministic salt from
  a uniqueness column; the other side is replicated salt_factor times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist df as a bucketed (+optionally sorted) managed table.

    Idempotent: drops any prior table AND its leftover warehouse location
    (a stale location with no catalog entry makes saveAsTable fail with
    LOCATION_ALREADY_EXISTS)."""
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "").removeprefix("file:")
    if warehouse:
        shutil.rmtree(f"{warehouse}/{table_name.lower()}", ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables — planner elides both Exchanges."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_from: str,
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys split across salt_factor
    sub-partitions.

    The salt derives deterministically from an existing uniqueness column
    (`salt_from`, e.g. a row id) — never rand(), which breaks retries and
    cross-run determinism. The small side is replicated salt_factor x
    (bounded: |small| * salt_factor rows).
    """
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(salt_factor))
    )
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(salt_factor - 1))
    ).alias("_salt")
    replicated_small = small.select("*", salts).withColumn(
        "_salt", F.col("_salt").cast("bigint")
    )
    out = salted_big.join(
        replicated_small,
        (salted_big[key] == replicated_small[key])
        & (salted_big["_salt"] == replicated_small["_salt"]),
        how,
    )
    return out.drop(salted_big["_salt"]).drop(replicated_small["_salt"]).drop(
        replicated_small[key]
    )
