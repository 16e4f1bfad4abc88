"""Physical-layout maintenance operators (SURVEY §2 — 100 TB design).

A long-lived lake table degrades in two ways the query layer can't fix:
small files (every streaming micro-batch / incremental upsert adds a few)
and scattered rows (no clustering, so even pruned scans read every file).
These operators are the maintenance pass a 100 TB deployment schedules:

- `compact`: rewrite a parquet directory into ~target-sized files.
  File count is computed from the measured input bytes (a driver-side
  listing, not a data scan), then a single repartition(n) rewrite.
- `cluster_by`: rewrite range-partitioned AND sorted on the given keys —
  repartitionByRange (one range-exchange with a sampled boundary pass)
  + sortWithinPartitions (no extra shuffle). Each output file then covers
  a narrow key range, so parquet row-group min/max statistics prune scans
  on those keys: the poor man's Z-order for single-dimension access
  paths, with zero query-side cooperation needed.

Both write to a NEW directory and leave the source untouched: at scale,
swap-in is a metastore location flip (atomic), never an in-place rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _dir_bytes(spark: SparkSession, path: str) -> int:
    """Total data bytes under `path` via the Hadoop FileSystem API, so any
    configured scheme works (file://, hdfs://, s3a://, ...) — an os.walk
    would silently return 0 for non-local URIs and compact everything into
    one file. Metadata sidecars (_SUCCESS, .crc) are excluded.
    """
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total = 0
    it = fs.listFiles(hpath, True)  # recursive
    while it.hasNext():
        status = it.next()
        name = status.getPath().getName()
        if not name.startswith(("_", ".")):
            total += status.getLen()
    return total


def compact(
    spark: SparkSession,
    source_path: str,
    dest_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite source_path's parquet into ceil(bytes/target) files at
    dest_path. Returns the file count written."""
    n_bytes = _dir_bytes(spark, source_path)
    n_files = max(1, -(-n_bytes // target_file_bytes))
    df = spark.read.parquet(source_path)
    df.repartition(n_files).write.mode("overwrite").parquet(dest_path)
    return n_files


def cluster_by(
    df: DataFrame,
    dest_path: str,
    cluster_cols: list[str],
    n_partitions: int,
) -> None:
    """Write df range-partitioned and sorted on cluster_cols: each output
    file covers a disjoint key range -> row-group stats prune scans."""
    (
        df.repartitionByRange(n_partitions, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(dest_path)
    )
