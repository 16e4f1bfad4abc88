"""Streaming sinks beyond the built-in file/console sinks (SURVEY §2.I).

`foreach_batch_upsert` is the engine's CDC-style terminal stage: a
Structured Streaming query whose every micro-batch is MERGEd (keyed upsert)
into a partitioned parquet table — the streaming rendering of the
reference's incremental RDBMS load stage [U — SURVEY §3.1 step 2].

Semantics per micro-batch:

1. Collapse the batch to its latest row per key (max_by on the ordering
   column) — a batch may carry several versions of one key.
2. `upsert_partitioned` merges them into the target: existing versions of
   those keys drop out, only touched partitions rewrite.

End-to-end exactly-once-per-key-version: the file source + checkpoint
guarantee each input file is processed once; the upsert is idempotent per
batch (re-running a batch rewrites the same partitions to the same
content), which is exactly the contract foreachBatch requires of its sink
on retry. State stays bounded — nothing accumulates in the streaming state
store; the table IS the state.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scopus_spark.operators.upsert import upsert_partitioned


def latest_per_key(df: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """One row per key: the one with the max order_col value (deterministic
    for distinct order values — CDC sequence numbers/timestamps)."""
    payload = [c for c in df.columns if c not in key_cols]
    return (
        df.groupBy(*key_cols)
        .agg(F.max_by(F.struct(*payload), F.col(order_col)).alias("_latest"))
        .select(*key_cols, "_latest.*")
    )


def foreach_batch_upsert(
    target_path: str,
    key_cols: list[str],
    partition_col: str,
    order_col: str,
) -> Callable[[DataFrame, int], None]:
    """Build a foreachBatch sink that MERGEs each micro-batch into the
    partitioned parquet table at target_path."""

    def sink(batch_df: DataFrame, _batch_id: int) -> None:
        delta = latest_per_key(batch_df, key_cols, order_col)
        upsert_partitioned(target_path, delta, key_cols, partition_col)

    return sink
