"""Keyed upsert (MERGE) into partitioned parquet — the engine's idempotent
incremental-load primitive.

The reference's load stage appends/replaces rows in RDBMS tables [U]; on a
data lake without a table format (no Delta/Iceberg in this container) the
equivalent is partition-scoped read-merge-rewrite:

1. Identify the partitions the incoming batch touches (distinct partition
   values of the delta — driver-side list, bounded by partition
   cardinality).
2. Read ONLY those partitions from the target (partition-pruned scan).
3. Anti-join existing rows against the delta on the key (old versions of
   updated rows drop out), union the delta, rewrite just those partitions
   with dynamic partition overwrite.

At 100 TB this touches |affected partitions| of data, never the full
table; idempotent because re-running the same delta rewrites the same
partitions to the same content.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def upsert_partitioned(
    target_path: str,
    delta: DataFrame,
    key_cols: list[str],
    partition_col: str,
) -> None:
    """MERGE `delta` into the parquet table at target_path.

    Rows whose key exists are replaced; new keys are inserted. Only
    partitions present in the delta are rewritten.

    CONTRACT: partition_col must be a pure function of key_cols (e.g. a
    hash bucket of the key). If a key's partition value could change
    between versions, its old row would sit in a partition this merge
    never reads, surviving as a duplicate.
    """
    spark = delta.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        if not os.path.exists(target_path):
            delta.write.partitionBy(partition_col).parquet(target_path)
            return
        touched = [
            r[0] for r in delta.select(partition_col).distinct().collect()
        ]
        existing = spark.read.parquet(target_path).filter(
            F.col(partition_col).isin(touched)
        )
        survivors = existing.join(
            delta.select(*key_cols), key_cols, "left_anti"
        )
        merged = survivors.unionByName(delta)
        # Dynamic overwrite replaces exactly the touched partition dirs.
        # Reading and overwriting the same path is safe here because the
        # file-commit protocol stages output in _temporary and only deletes
        # the old partition files at job commit — after every task has
        # finished reading its input splits.
        merged.write.mode("overwrite").partitionBy(partition_col).parquet(
            target_path
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
