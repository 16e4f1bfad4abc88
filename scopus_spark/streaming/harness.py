"""Structured Streaming test harness (SURVEY §5.2.4).

Runs the SAME logical plan builders from scopus_spark.queries.streaming
over a file-source stream (readStream + availableNow trigger + foreachBatch
accumulation) so tests can assert batch/stream equivalence, and supports
SCRIPTED MICRO-BATCHES (drop file A, run; drop file B, run with the same
checkpoint) for watermark late-drop and streaming-dedup semantics.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from collections.abc import Callable
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


@contextmanager
def scaled_stream_shuffle(spark: SparkSession):
    """Run an availableNow streaming pass at a REDUCED, scale-adaptive
    shuffle-partition count (r10, guide §2 'make partitioning
    scale-adaptive'): every stateful streaming operator instantiates one
    state-store instance PER SHUFFLE PARTITION per micro-batch —
    checkpoint dirs, commit files, task launches — so a bench-scale
    trigger paid 32 state commits for a handful of state rows. cores/4
    (floor 8) keeps the fan-out proportional to the session's
    parallelism (on a cluster defaultParallelism tracks the executor
    fleet, so state still scales out); override with
    SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS where per-trigger volume
    warrants more. Spark pins the count into the query's checkpoint at
    first start (later passes reuse it); partition count changes state
    LAYOUT only, never aggregate contents."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    # r11 (VERDICT r10 item 6): cores/8 floor 4, measured against the r10
    # cores/4 floor 8 at sf0.1 idle — i16 2.14->2.07 s, i17 2.19->2.06 s
    # (min-of-N; state-store commits per trigger halve), i14 4.43->4.65 s
    # (within its ±0.3 s noise band — its cost is three real merges, not
    # state stores). Still proportional to the session's parallelism on a
    # cluster and env-overridable where per-trigger volume warrants more.
    n = int(
        os.environ.get(
            "SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS",
            max(4, spark.sparkContext.defaultParallelism // 8),
        )
    )
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


class StreamRig:
    """A file-source streaming rig: an input dir files are dropped into, a
    checkpoint dir carrying watermark/state across runs, and a collector."""

    def __init__(self, spark: SparkSession, schema: T.StructType = EVENTS_STREAM_SCHEMA):
        self.spark = spark
        self.schema = schema
        root = tempfile.mkdtemp(prefix="scopus_stream_")
        self.input_dir = os.path.join(root, "in")
        self.checkpoint_dir = os.path.join(root, "ckpt")
        os.makedirs(self.input_dir)
        self._root = root
        self._file_no = 0

    def drop_file(self, df: DataFrame) -> None:
        """Write one parquet file into the source dir (one scripted batch)."""
        staging = os.path.join(self._root, f"stage_{self._file_no}")
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        part = next(
            f for f in os.listdir(staging) if f.endswith(".parquet")
        )
        shutil.move(
            os.path.join(staging, part),
            os.path.join(self.input_dir, f"batch_{self._file_no:04d}.parquet"),
        )
        self._file_no += 1

    def run(
        self,
        build: Callable[[DataFrame], DataFrame],
        output_mode: str = "update",
        sink: Callable[[DataFrame, int], None] | None = None,
    ) -> list:
        """One availableNow pass over files not yet seen by the checkpoint;
        returns all rows emitted this pass. With a custom ``sink``
        (e.g. streaming/sinks.foreach_batch_versioned_upsert) the rows go
        to the sink instead and the return is empty — batch ids keep
        incrementing across runs through the shared checkpoint, which is
        what gives commit tokens their replay identity."""
        stream = self.spark.readStream.schema(self.schema).parquet(self.input_dir)
        out = build(stream)
        collected: list = []

        def collect_sink(batch_df: DataFrame, _batch_id: int) -> None:
            # TEST-TIER ONLY (bounded: the test's tiny stream): pulls
            # every micro-batch to the driver so
            # the UNIT tier can assert on rows. A declared key must
            # never route through this — production sinks are the
            # distributed writers in streaming/sinks.py (i14/i15 commit
            # via VersionedTable without any driver collect).
            collected.extend(batch_df.collect())

        with scaled_stream_shuffle(self.spark):
            q = (
                out.writeStream.outputMode(output_mode)
                .trigger(availableNow=True)
                .option("checkpointLocation", self.checkpoint_dir)
                .foreachBatch(sink if sink is not None else collect_sink)
                .queryName(f"rig_{uuid.uuid4().hex[:8]}")
                .start()
            )
            q.awaitTermination()
        return collected

    def cleanup(self) -> None:
        shutil.rmtree(self._root, ignore_errors=True)


def stream_events_equivalent(
    spark: SparkSession,
    sf_dir: str,
    build: Callable[[DataFrame], DataFrame],
    output_mode: str = "complete",
) -> list:
    """Run a builder over the events table as a one-shot file stream and
    return the final emitted rows (for complete mode, the last snapshot)."""
    from scopus_spark.catalog import load_table

    rig = StreamRig(spark)
    try:
        rig.drop_file(load_table(spark, sf_dir, "events"))
        rows = rig.run(build, output_mode=output_mode)
        return rows
    finally:
        rig.cleanup()
