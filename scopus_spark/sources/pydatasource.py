"""Custom Python data source (Spark 4 DataSource API) — SURVEY §2.A a9.

The reference ingests a vendor-delivered corpus of thousands of archives
via a per-archive worker fan-out [U — SURVEY §3.1]; the modern Spark
rendering of "teach the engine a new input format" is the Python
DataSource API: declare the schema, split the input into InputPartitions,
and let executors pull each partition in parallel — no driver-side
materialization, no RDD glue.

`SynthCorpusDataSource` is a deterministic synthetic shard source
(id, md5 content hash, bucket) used to exercise the full API surface:
option parsing, schema declaration, partition planning, and per-partition
row generation. Being pure-function-of-id it is HASH-checkable against a
DuckDB range()+md5 oracle — proving the custom source produces exactly
the declared rows, partitioning included.

At 100 TB the same shape holds: partitions() returns one InputPartition
per shard/archive (a listing, not data), and read() streams rows from
that shard only.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _ShardPartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SynthCorpusReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 4))

    def partitions(self):
        per = -(-self.n_rows // self.n_parts)
        return [
            _ShardPartition(lo, min(lo + per, self.n_rows))
            for lo in range(0, self.n_rows, per)
        ]

    def read(self, partition: _ShardPartition):
        for i in range(partition.start, partition.end):
            content_hash = hashlib.md5(str(i).encode()).hexdigest()
            yield (i, content_hash, i % 16)


class SynthCorpusDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthcorpus"

    def schema(self) -> str:
        return "id long, content_hash string, bucket long"

    def reader(self, schema) -> SynthCorpusReader:
        return SynthCorpusReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the synthcorpus format."""
    spark.dataSource.register(SynthCorpusDataSource)
